package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB): every variant here is a shuffle-on-key groupBy or
  * a bucket join with map-side partial aggregation — never an O(n²)
  * cross-join. Candidate generation (LSH bands, shingle buckets) bounds the
  * pair space; exact verification runs only within buckets.
  */
object Dedup {

  /** Exact dedup by normalized-content hash: one row per distinct content,
    * keeping the minimum id as the canonical representative. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of `text` (distinct, space-joined). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(TextAnalysis.normalize(text), " ")
    array_distinct(
      filter(
        transform(toks, (_, i) => when(i + n <= size(toks), array_join(slice(toks, i + 1, lit(n)), " "))),
        _.isNotNull))
  }

  /** Exact n-gram Jaccard similar pairs via shingle inverted index:
    * explode shingles → co-group by shingle → count shared shingles per
    * candidate pair → Jaccard = shared / (|A| + |B| - shared) ≥ threshold.
    * Only pairs sharing ≥1 shingle are ever materialized.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String, n: Int, threshold: Double): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sh_size", size(col("sh")))
    val exploded = sh.select(col("id"), col("sh_size"), explode(col("sh")).as("shingle"))
    val a = exploded.toDF("a_id", "a_size", "shingle")
    val b = exploded.toDF("b_id", "b_size", "shingle")
    a.join(b, Seq("shingle"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_size", "b_size")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") / (col("a_size") + col("b_size") - col("shared")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }
}
