package graft

import org.apache.spark.sql.functions._

/** One-off plan dump for the dedup index probe — prints the formatted
  * physical plan so stage parallelism issues can be read off directly.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.DiagPlan */
object DiagPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = io.Tables.table(spark, dir, "documents")
    ops.Dedup.dedupIndexBuild(docs.where(pmod(col("doc_id"), lit(10)) =!= 0),
      "text", "doc_id", "graft_dedup_idx_diag")
    val probe = ops.Dedup.dedupIndexProbe(docs.where(pmod(col("doc_id"), lit(10)) === 0),
      "text", "doc_id", "graft_dedup_idx_diag")
    probe.explain("formatted")
    spark.stop()
  }
}
