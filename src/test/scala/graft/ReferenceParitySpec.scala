package graft

import graft.llm._
import org.apache.spark.sql.functions._

/** Semantics mirrored from the reference's test suite
  * (tests/test_id_column.py, tests/test_sdk.py) plus reasoning-model
  * unpacking, per-input seeds, and dry-run cost estimation. */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  test("unpackJson: id column preserved through unpack (test_id_column.py:139)") {
    val df = Seq(("row-1", """{"score":7}"""), ("row-2", """{"score":3}"""))
      .toDF("my_id", "inference_result")
    val out = Results.unpackJson(df)
    assert(out.columns.toSeq === Seq("my_id", "score"))
    assert(out.orderBy("my_id").select("my_id").as[String].collect().toSeq === Seq("row-1", "row-2"))
  }

  test("unpackJson: id/structured-field collision rejected (test_id_column.py:113)") {
    val df = Seq(("row-1", """{"my_id":9}""")).toDF("my_id", "inference_result")
    val e = intercept[IllegalArgumentException](Results.unpackJson(df))
    assert(e.getMessage.contains("my_id"))
  }

  test("unpackJson: reasoning-model {content, reasoning_content} nesting (sdk.py:1313)") {
    val df = Seq(
      (1L, """{"content":{"answer":"yes","score":9},"reasoning_content":"because"}"""),
      (2L, """{"content":{"answer":"no","score":2},"reasoning_content":"hence"}"""))
      .toDF("id", "inference_result")
    val out = Results.unpackJson(df)
    assert(out.columns.sorted.toSeq === Seq("answer", "id", "reasoning_content", "score"))
    val r = out.orderBy("id").select("answer", "reasoning_content").as[(String, String)].collect()
    assert(r(0) === (("yes", "because")))
  }

  test("randomSeedPerInput: stable per input, distinct across inputs (sdk.py:479)") {
    val df = Seq("alpha", "beta", "alpha").toDF("text")
    val out = Infer.infer(df, EchoModel(), Seq("text"), randomSeedPerInput = true)
    assert(out.columns.contains("inference_result_seed"))
    val seeds = out.select("text", "inference_result_seed").as[(String, Long)].collect().toMap
    val all = out.select("inference_result_seed").as[Long].collect()
    assert(all.count(_ == seeds("alpha")) === 2) // same input -> same seed
    assert(seeds("alpha") !== seeds("beta"))
  }

  test("dry run: cost estimate frame instead of inference (sdk.py:501)") {
    val g = Graft(spark)
    val df = Seq("one two three", "four five").toDF("text")
    val est = g.infer(df, EchoModel(), Seq("text"), dryRun = true).collect()(0)
    assert(est.getAs[Long]("n_rows") === 2L)
    assert(est.getAs[Long]("total_tokens") === 5L)
    assert(est.getAs[Double]("est_cost_usd") >= 0.0)
  }

  test("jobs: priority recorded; await returns terminal state immediately") {
    val id = Jobs.submit(Seq(1).toDF("x"), Some("prio"), priority = 1)
    assert(Jobs.list().find(_.id === id).get.priority === 1)
    assert(Jobs.await(id).isTerminal)
  }
}
