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

  /** For each left row: the latest right row with the same key and
    * rightTime <= leftTime. Right payload columns come back null when no
    * prior right row exists (ASOF LEFT JOIN semantics). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // union schema: all left columns + right payload (renamed asof_*) + tags
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    val lPadded = payload.foldLeft(l)((d, p) => d.withColumn(s"asof_$p", lit(null).cast(right.schema(p).dataType)))
    val r0 = right.select((Seq(col(key), col(rightTime).as("__t")) ++ payload.map(p => col(p).as(s"asof_$p"))): _*)
      .withColumn("__src", lit(0))
    val rPadded = lCols.filterNot(c => c == key).foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lPadded.unionByName(rPadded.select(lPadded.columns.map(col): _*))
    // right rows sort before left rows on timestamp ties -> inclusive match
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (d, p) =>
      d.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w))
    }
    carried.where(col("__src") === 1).drop("__t", "__src")
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
