package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{gf, Kernels}

/** Corpus-trained character-bigram language model — the CCNet-style
  * "perplexity" quality signal a training-data pipeline uses to rank or
  * filter documents, without any external model artifact.
  *
  * Two distributed passes, the same shape as the IVF quantizer:
  *
  *  1. TRAIN: per-document bigram counts (one-pass codegen kernel, ~100
  *     distinct bigrams per doc) -> groupBy code with map-side combine ->
  *     at most 128x128 = 16,384 rows collected to the driver. The shuffle
  *     carries (int, long) pairs; the collect is constant-bounded no
  *     matter the corpus size.
  *  2. SCORE: the Laplace-smoothed log-prob table rides the plan as a
  *     16k-double array (addReferenceObj, like the IVF centroids), and
  *     scoring is a narrow codegen map — no shuffle, no driver loop.
  *
  * Determinism: counts are exact integers; the per-document score
  * accumulates count*lnP over ASCENDING bigram codes, an order any engine
  * can reproduce with an ORDER BY code left-fold, so the only cross-engine
  * wobble is the last ulp of ln() — absorbed by rounding the final average
  * to 6 decimals.
  */
object LangModel {

  /** Train: global bigram counts -> Laplace-smoothed conditional log
    * probabilities lnP(b|a) = ln((count(ab)+1) / (total(a)+V)), V=128. */
  def trainBigramLogProbs(docs: DataFrame, textCol: String): Array[Double] = {
    val v = Kernels.BigramVocab
    val rows = docs
      .select(explode(gf.charBigramCounts(col(textCol))).as("p"))
      .select(
        shiftright(col("p"), 32).cast("int").as("code"),
        col("p").bitwiseAND(lit(0xFFFFFFFFL)).as("cnt"))
      .groupBy("code")
      .agg(sum(col("cnt")).as("c"))
      .collect()
    val counts = new Array[Long](v * v)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val rowTotals = new Array[Long](v)
    var i = 0
    while (i < v * v) { rowTotals(i / v) += counts(i); i += 1 }
    Array.tabulate(v * v)(code =>
      math.log((counts(code) + 1.0) / (rowTotals(code / v) + v.toDouble)))
  }

  /** Score every document under a trained table: (id, n_bigrams,
    * avg_logprob rounded to 6 decimals). Documents shorter than two
    * characters have no bigrams and are excluded. Higher (less negative)
    * scores mean more corpus-typical text. */
  def scoreByBigramModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lnP: Array[Double]): DataFrame = {
    require(lnP.length == Kernels.BigramVocab * Kernels.BigramVocab,
      s"lnP must have ${Kernels.BigramVocab * Kernels.BigramVocab} entries")
    docs
      .where(length(col(textCol)) >= 2)
      .select(col(idCol), gf.bigramLogScore(col(textCol), lnP).as("s"))
      .select(
        col(idCol),
        element_at(col("s"), 1).cast("long").as("n_bigrams"),
        round(element_at(col("s"), 2) / element_at(col("s"), 1), 6).as("avg_logprob"))
  }

  /** Train on the corpus and score it in one call. */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreByBigramModel(docs, idCol, textCol, trainBigramLogProbs(docs, textCol))
}
