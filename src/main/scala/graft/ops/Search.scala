package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Keyword retrieval over a document corpus — the "find me the documents
  * about X" primitive a data-curation workflow runs before targeted
  * sampling or inspection.
  */
object Search {

  /** BM25 top-k retrieval for a fixed keyword query (Robertson/Walker
    * Okapi BM25; idf in the +1 form that keeps every term's contribution
    * positive, as in Lucene).
    *
    * Plan shape: one codegen kernel pass computes (dl, tf per term) per
    * document; corpus statistics (N, avgdl, per-term df) are ONE tiny
    * aggregate row broadcast back via cross join; scoring is a narrow map
    * in fixed term order (so the float arithmetic is reproducible on any
    * engine evaluating the same tree); the top-k is a
    * TakeOrderedAndProject (map-side partial top-k, k rows per partition
    * to the driver — no global sort shuffle). The corpus is read exactly
    * twice (stats pass + score pass), both narrow off the scan.
    *
    * Scores are rounded to 4 decimals and the ordering uses the ROUNDED
    * value with the id as tie-break, so the top-k cut is a total order
    * shared with the SQL oracle. Documents matching no term (score 0)
    * are excluded. */
  def bm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    Dedup.requireLongId(docs, idCol)
    // dedupe after lowercasing: a repeated query term must not double-count
    // its score contribution
    val lower = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.toArray
    val stats = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        gf.termFreqs(col(textCol), lower).as("s"))
    val aggCols =
      (count(lit(1)).as("n_docs") +:
        avg(col("s").getItem(0)).as("avgdl") +:
        lower.indices.map(i =>
          sum(when(col("s").getItem(i + 1) > 0, 1L).otherwise(0L)).as(s"df_$i"))).toSeq
    val corpusStats = stats.agg(aggCols.head, aggCols.tail: _*)
    // guard the avgdl denominator: on an all-empty corpus avgdl is 0 and
    // dl/avgdl would poison every score with NaN; with the floor, tf = 0
    // everywhere so every score is exactly 0 and the > 0 cut returns empty
    val safeAvgdl = greatest(col("avgdl"), lit(1e-9))
    val score = lower.indices.map { i =>
      val tf = col("s").getItem(i + 1).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("s").getItem(0) / safeAvgdl))
    }.reduce(_ + _)
    stats
      .crossJoin(broadcast(corpusStats))
      .select(col("doc_id"), round(score, 4).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
