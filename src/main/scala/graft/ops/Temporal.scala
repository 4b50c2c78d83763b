package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed Spark-first.
  *
  * asofJoin: the classic ASOF join (each left row matched to the most
  * recent right row at-or-before its timestamp, per key) via the
  * union-and-carry-forward trick — one shuffle on (key), one window pass,
  * no inequality join. Scale: state per partition is one carried value;
  * skew on hot keys is AQE's problem, not a cross product.
  *
  * rangeJoinBinned: interval join (left time within [right start, right
  * end]) via time-bin bucketing — the right side is exploded to the bins
  * its interval covers, the join is an equi-join on (key, bin), and the
  * exact range predicate filters bin-edge false positives. Candidate pairs
  * are bounded by bin occupancy instead of |L| x |R|.
  */
object Temporal {

  /** For each left row: the nearest right row with the same key in the
    * given direction ("backward": latest rightTime <= leftTime, the ASOF
    * default; "forward": earliest rightTime >= leftTime), optionally
    * bounded by `toleranceSec` (pandas merge_asof semantics: a match
    * farther than the tolerance comes back null). Right payload columns
    * come back null when no match exists (ASOF LEFT JOIN semantics). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got $direction")
    val backward = direction == "backward"
    val lCols = left.columns
    // union schema: all left columns + right payload (renamed asof_*) + tags.
    // Tie ordering on equal timestamps makes the match inclusive: backward
    // needs the right row to sort BEFORE the left row, forward AFTER.
    // The matched right ROW travels as one nullable struct wrapper, so the
    // carried payload and the timestamp the tolerance checks always come
    // from the SAME row — carrying payload columns individually with
    // ignoreNulls would skip a nearer row whose payload happens to be null
    // and break merge_asof semantics (which matches the nearest row, null
    // payload and all).
    val rowStructFields = payload.map(p => col(p).as(p)) :+ col(rightTime).as("__mt")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(if (backward) 1 else 0))
      .withColumn("__asof_row",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)) :+
            org.apache.spark.sql.types.StructField("__mt", right.schema(rightTime).dataType))))
    val r0 = right.select(col(key), col(rightTime).as("__t"), struct(rowStructFields: _*).as("__asof_row"))
      .withColumn("__src", lit(if (backward) 0 else 1))
    val rPadded = lCols.filterNot(c => c == key).foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.unionByName(rPadded.select(l.columns.map(col): _*))
    val w0 = Window.partitionBy(key).orderBy(col("__t"), col("__src"))
    val w =
      if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("__asof_row",
      if (backward) last(col("__asof_row"), ignoreNulls = true).over(w)
      else first(col("__asof_row"), ignoreNulls = true).over(w))
    val leftSrc = if (backward) 1 else 0
    val matchedOnly = carried.where(col("__src") === leftSrc)
    // tolerance: drop matches farther than the bound (signed gap is
    // non-negative in the match direction by construction)
    val keep = toleranceSec match {
      case None => col("__asof_row").isNotNull
      case Some(tol) =>
        val gap =
          if (backward) unix_micros(col("__t")) - unix_micros(col("__asof_row.__mt"))
          else unix_micros(col("__asof_row.__mt")) - unix_micros(col("__t"))
        col("__asof_row").isNotNull && gap <= tol * 1000000L
    }
    val unpacked = payload.foldLeft(matchedOnly) { (d, p) =>
      d.withColumn(s"asof_$p", when(keep, col(s"__asof_row.$p")))
    }
    unpacked.drop("__t", "__src", "__asof_row")
  }

  /** Pairs (left, right) with same key and leftTime in
    * [rightTime - windowBefore, rightTime], via time-bin equi-join. */
  def rangeJoinBinned(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      windowBeforeSec: Long,
      binSec: Long): DataFrame = {
    val lBin = left
      .withColumn("__bin", floor(unix_micros(col(leftTime)) / (binSec * 1000000L)))
    val rBins = right
      .withColumn("__start", unix_micros(col(rightTime)) - windowBeforeSec * 1000000L)
      .withColumn("__end", unix_micros(col(rightTime)))
      .withColumn("__bin", explode(sequence(
        floor(col("__start") / (binSec * 1000000L)),
        floor(col("__end") / (binSec * 1000000L)))))
    lBin.join(rBins, Seq(key, "__bin"))
      .where(unix_micros(col(leftTime)).between(col("__start"), col("__end")))
      .drop("__bin", "__start", "__end")
  }
}
