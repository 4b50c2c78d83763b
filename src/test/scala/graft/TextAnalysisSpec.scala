package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount + normalize + fingerprint") {
    val df = Seq("  Hello   World ", "hello world").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fps(0) === fps(1)) // same normalized content -> same fingerprint
    val n = df.select(TextAnalysis.tokenCount(col("t")).as("n")).as[Int].collect()
    assert(n(1) === 2)
  }

  test("qualityScore: bounded in [0,100], penalizes punctuation") {
    val clean = Seq("a clean readable sentence with diverse words").toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Int].head()
    val punct = Seq("a!!! clean??? readable;;; sentence::: ###").toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Int].head()
    assert(clean >= 0 && clean <= 100 && punct >= 0 && punct <= 100)
    assert(clean > punct)
  }

  test("langId: marker-word argmax with unknown fallback") {
    val df = Seq(
      "the cat sat on a mat of wool",
      "der hund und die katze",
      "el perro y la casa que",
      "xyzzy plugh").toDF("t")
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "es", "unknown"))
  }
}
