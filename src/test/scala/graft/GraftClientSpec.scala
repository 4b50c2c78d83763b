package graft

import graft.llm.EchoModel

/** End-to-end SDK facade flow mirroring the reference's quickstart:
  * load -> infer -> submit job -> fetch cached results. */
class GraftClientSpec extends SparkSpec {
  import spark.implicits._

  test("facade: infer over a list input, job round trip") {
    val g = Graft(spark)
    val df = g.fromSeq(Seq("hello world", "second row"))
    val inferred = g.infer(df, EchoModel(maxChars = 5), Seq("text"))
    val id = g.submitJob(inferred, Some("quickstart"))
    assert(g.jobStatus(id).isTerminal)
    val res = g.jobResults(id).orderBy("text").select("inference_result").as[String].collect()
    assert(res.toSeq === Seq("hello", "secon"))
  }

  test("facade: inferPerModel fans out one job per model (sdk.py:745)") {
    val g = Graft(spark)
    val df = g.fromSeq(Seq("hello world"))
    val ids = g.inferPerModel(df,
      Seq(EchoModel(maxChars = 3), graft.llm.TemplateModel("T:")), Seq("text"))
    assert(ids.length === 2)
    val r0 = g.jobResults(ids(0)).select("inference_result").collect()(0).getString(0)
    val r1 = g.jobResults(ids(1)).select("inference_result").collect()(0).getString(0)
    assert(r0 === "hel")
    assert(r1 === "T:hello world")
    val e = intercept[IllegalArgumentException](
      g.inferPerModel(df, Seq(EchoModel()), Seq("text"), names = Some(Seq("a", "b"))))
    assert(e.getMessage.contains("same length"))
  }

  test("facade: structured scoring with unpack") {
    val g = Graft(spark)
    val df = g.fromSeq(Seq("abc", "defg"))
    val out = g.infer(df, graft.llm.JudgeScorer(0, 10), Seq("text"), unpackJson = true)
    assert(out.columns.contains("score"))
    assert(out.count() === 2)
  }
}
