package graft

import graft.ops.LangModel
import graft.functions.Kernels
import org.apache.spark.unsafe.types.UTF8String

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("charBigramCodes: exact counts, ascending order, ASCII fold") {
    val m = Kernels.charBigramCodes(UTF8String.fromString("abab"))
    // bigrams: ab, ba, ab
    val ab = 'a'.toInt * 128 + 'b'.toInt
    val ba = 'b'.toInt * 128 + 'a'.toInt
    assert(m.size === 2)
    assert(m.get(ab) === 2 && m.get(ba) === 1)
    assert(m.firstKey === ab) // ascending
    // non-ASCII folds to bucket 127
    val f = Kernels.charBigramCodes(UTF8String.fromString("é."))
    assert(f.firstKey === 127 * 128 + '.'.toInt)
  }

  test("trainBigramLogProbs: Laplace-smoothed probabilities sum to 1 per row") {
    val docs = Seq((1L, "abab"), (2L, "abc")).toDF("doc_id", "text")
    val lnP = LangModel.trainBigramLogProbs(docs, "text")
    assert(lnP.length === 128 * 128)
    // each conditional row is a distribution: sum_b P(b|a) == 1
    val rowSums = lnP.grouped(128).map(_.map(math.exp).sum).toArray
    rowSums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
    // observed bigram "ab" (3 corpus occurrences) beats unobserved "zq"
    val ab = 'a'.toInt * 128 + 'b'.toInt
    val zq = 'z'.toInt * 128 + 'q'.toInt
    assert(lnP(ab) > lnP(zq))
  }

  test("perplexityScore: corpus-typical text scores above atypical text") {
    val docs = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "zzxqj vvkww qqpzx")).toDF("doc_id", "text"))
    val out = LangModel.perplexityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(99L))
    // every doc long enough is scored
    assert(out.size === 21)
  }

  test("perplexityScore: deterministic across partition layouts") {
    val docs = (1L to 50L).map(i => (i, s"doc number $i with shared phrasing"))
      .toDF("doc_id", "text")
    val a = LangModel.perplexityScore(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2)).toSeq
    val b = LangModel.perplexityScore(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2)).toSeq
    assert(a === b)
  }
}
