package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs by score descending,
  * ties by id ascending. Backed by a worst-first binary heap so update is
  * O(log k) and the buffer never exceeds k entries. */
final class TopKBuffer(val k: Int) {
  // parallel arrays, heap-ordered with the WORST element at index 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a is worse than b: lower score, or same score and larger id. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id
      size += 1
      // sift up toward the worst-first root
      var sifting = i > 0
      while (sifting) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
          sifting = i > 0
        } else sifting = false
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      // better than the current worst: replace root, sift down
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Indices of entries sorted best-first (score desc, id asc). */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size)
    scala.util.Sorting.stableSort(idx, (a: Int, b: Int) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b)))
    idx
  }
}

/** Exact distributed top-k as a typed aggregate: per input group, the k
  * best (score, id) pairs, emitted best-first as array<struct<score, id>>.
  *
  * This is the scale-correct replacement for rank-by-window top-k: partial
  * aggregation keeps a k-bounded heap per group per partition MAP-SIDE, so
  * the shuffle moves at most k rows per (partition, group) instead of the
  * entire scored set — on a 1000-executor cluster the difference between
  * shuffling |corpus| rows per query and k rows per partition per query.
  * Ordering matches rank-by-window with ORDER BY score DESC, id ASC.
  */
case class TopKByScoreAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buffer.insert(row.getDouble(0), row.getLong(1))
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val idx = buffer.sortedIndices
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      out(i) = InternalRow(buffer.scores(idx(i)), buffer.ids(idx(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_by_score"
}

object TopKByScoreAgg {
  /** Column API: top-k of a struct<score: double, id: long> column. */
  def topK(scoreId: Column, k: Int): Column =
    GraftBridge.column(TopKByScoreAgg(GraftBridge.expression(scoreId), k)
      .toAggregateExpression())
}
