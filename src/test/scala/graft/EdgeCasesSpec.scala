package graft

import graft.ops.{Corpus, Dedup, Similarity}
import graft.llm.Elo
import org.apache.spark.sql.functions._

/** Empty and degenerate inputs: every operator should return an empty
  * (correctly-schemed) result or a clear error — never crash or hang. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String, String, String)]
    .toDF("doc_id", "text", "lang", "source")
  private def emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup family on an empty corpus returns empty") {
    assert(Dedup.exact(emptyDocs, "text", "doc_id").count() === 0L)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "text", "doc_id", 3, 0.5).count() === 0L)
    assert(Dedup.minhashLshPairsVerified(emptyDocs, "text", "doc_id").count() === 0L)
    assert(Dedup.simhashPairsCanonical(emptyDocs, "text", "doc_id").count() === 0L)
    assert(Dedup.embeddingPairsLsh(emptyEmb, "vec_id", "embedding", 0.4).count() === 0L)
  }

  test("connectedComponents and dropNearDuplicates on empty pairs") {
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(noPairs).count() === 0L)
    val docs = Seq((1L, "a", "en", "s")).toDF("doc_id", "text", "lang", "source")
    assert(Dedup.dropNearDuplicates(docs, noPairs, "doc_id").count() === 1L)
  }

  test("corpus operators on an empty corpus") {
    // rollup still emits the grand-total row (count 0 over nothing is a
    // deliberate SQL-standard choice: GROUP BY ROLLUP of zero rows -> one
    // all-null row in Spark and DuckDB alike)
    assert(Corpus.stats(emptyDocs).count() <= 1L)
    assert(Corpus.deterministicSample(emptyDocs, "doc_id", 50).count() === 0L)
    assert(Corpus.capPerStratum(emptyDocs, "source", "doc_id", 10).count() === 0L)
    assert(Corpus.packSequences(emptyDocs, "doc_id", "text", "source", 100).count() === 0L)
  }

  test("similarity: empty queries yield empty results; empty corpus for IVF errors clearly") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    assert(Similarity.bruteForceTopK(emb, emptyEmb, "vec_id", "embedding", 5).count() === 0L)
    assert(Similarity.lshTopK(emb, emptyEmb, "vec_id", "embedding", 5).count() === 0L)
    val ex = intercept[IllegalArgumentException](
      Similarity.ivfTopK(emptyEmb, emb, "vec_id", "embedding", 5))
    assert(ex.getMessage.contains("empty corpus"))
  }

  test("elo: empty and single-label ballots") {
    assert(Elo.ratings(Seq.empty[Seq[String]].toDF("ballot"), "ballot").count() === 0L)
    // a single-entry ballot has no pairs -> no ratings
    assert(Elo.ratings(Seq(Seq("only")).toDF("ballot"), "ballot").count() === 0L)
  }

  test("string ids are rejected with a clear error, not silently corrupted") {
    val strDocs = Seq(("a", "text one"), ("b", "text two")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairs(strDocs, "text", "doc_id", 3, 0.5))
    assert(ex.getMessage.contains("integral"))
  }
}
