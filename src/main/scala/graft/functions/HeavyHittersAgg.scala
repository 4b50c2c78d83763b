package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory frequency summary (Misra–Gries 1982): at most `capacity`
  * (item, counter) pairs. For every item, the counter under-estimates the
  * true count by at most n/(capacity+1) where n is the stream length — so
  * any item with true count above that bound is guaranteed present.
  *
  * When the distinct-item count never exceeds `capacity` the summary is
  * EXACT (no decrement ever fires) and, because merge is then plain
  * count addition, the result is independent of partitioning — the
  * operating point the catalog oracle runs at.
  */
final class MGSummary(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)
  /** Total decrement depth applied so far (the error bound actually
    * incurred: est >= true - decrements for every item). */
  var decrements: Long = 0L

  def add(item: String, by: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      counts.put(item, cur + by)
    } else if (counts.size < capacity) {
      counts.put(item, by)
    } else {
      // classic MG step generalized to weight `by`: remove min(by, smallest
      // counter strata) from every counter. One pass finds how deep we can
      // decrement; a second applies it. `by` is 1 in the streaming update
      // path, so this stays the textbook O(capacity) amortized step.
      var remaining = by
      while (remaining > 0 && counts.size >= capacity) {
        var minV = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < minV) minV = v }
        val step = math.min(remaining, minV)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - step
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        decrements += step
        remaining -= step
      }
      if (remaining > 0 && counts.size < capacity) counts.put(item, remaining)
    }
  }

  /** Mergeable-summaries combine (Agarwal et al. 2012): sum counts
    * item-wise, then if over capacity subtract the (capacity+1)-th largest
    * counter from every counter and drop the non-positive ones. Preserves
    * the n/(capacity+1) error bound of the combined stream. */
  def mergeFrom(other: MGSummary): Unit = {
    decrements += other.decrements
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-capacity-1 in ascending order
      val cut = vals(vals.length - capacity - 1)
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
      decrements += cut
    }
  }
}

/** Distributed heavy hitters as a typed aggregate: a Misra–Gries summary
  * per group, emitted as array<struct<item, cnt>> sorted (cnt desc, item
  * asc).
  *
  * Scale shape: each map task keeps ONE capacity-bounded summary; the
  * shuffle moves at most `capacity` entries per partition regardless of the
  * key-domain size — the bounded-memory answer to "top URLs / top hosts /
  * top templates over 100 TB" where a full groupBy would shuffle a
  * counter per distinct key. At capacity >= distinct-items the result is
  * exact and layout-independent; below it, every emitted count
  * under-estimates by at most n/(capacity+1) (spec-verified).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val entries = new Array[(String, Long)](buffer.counts.size)
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    val out = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      out(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    out.writeLong(buffer.decrements)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MGSummary(capacity)
    buf.decrements = in.readLong()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Column API: bounded-memory frequency summary of a string column. */
  def summary(item: Column, capacity: Int): Column =
    GraftBridge.column(MisraGriesAgg(GraftBridge.expression(item), capacity)
      .toAggregateExpression())
}
