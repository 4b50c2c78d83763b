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

  test("run_function: standardized {response, confidence, predictions, run_id} shape (sdk.py:539)") {
    val g = Graft(spark)
    val r = g.runFunction("keyword-classifier-1", Map("text" -> "a window function demo"))
    assert(r.response.contains("\"classification\":\"window\""))
    assert(r.confidence === 0.9)
    // every class + fallback scored, sorted confidence desc then label
    assert(r.predictions.map(_.label).toSet === Set("join", "window", "stream", "other"))
    assert(r.predictions.head.label === "window" && r.predictions.head.confidence === 0.9)
    assert(r.predictions.tail.forall(p => math.abs(p.confidence - (0.1 / 3)) < 1e-9))
    assert(r.run_id.startsWith("run-"))
    // non-classifier: single prediction mirroring the response
    val e = g.runFunction("echo-1", Map("text" -> "hello"))
    assert(e.response === "hello" && e.predictions === Seq(Functions.Prediction("hello", 1.0)))
  }

  test("run_function: multi-field input joins values in sorted key order; unknown name rejected") {
    val g = Graft(spark)
    val r = g.runFunction("echo-1", Map("b_second" -> "world", "a_first" -> "hello"))
    assert(r.response === "hello\nworld")
    intercept[NoSuchElementException](g.runFunction("no-such-function", Map("x" -> "y")))
  }

  test("batch_run_function: priority-1 job over whole rows; dry run estimates (sdk.py:617)") {
    val g = Graft(spark)
    val df = Seq(("a window demo", 1L), ("plain text", 2L)).toDF("text", "row_id")
    val id = g.batchRunFunction("keyword-classifier-1", df)
    assert(Jobs.list().find(_.id === id).get.priority === 1)
    val res = g.jobResults(id, unpackJson = false).collect()
    assert(res.length === 2)
    assert(res.map(_.getAs[String]("inference_result")).exists(_.contains("window")))
    val dry = g.batchRunFunction("echo-1", df, dryRun = true)
    val est = g.jobResults(dry, unpackJson = false).collect()(0)
    assert(est.getAs[Long]("n_rows") === 2L)
  }

  test("infer with output_schema: schema-driven unpack, no data probe (sdk.py json_schema)") {
    import org.apache.spark.sql.types._
    val g = Graft(spark)
    val df = Seq("one two three", "four").toDF("text")
    val out = g.infer(df, JudgeScorer(0, 10), Seq("text"),
      outputSchema = Some(StructType(Seq(StructField("score", LongType)))))
    assert(out.columns.contains("score") && !out.columns.contains("inference_result"))
    assert(out.select("score").collect().forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 10))
  }

  test("rankWithElo: run_elo=True chaining (evals.py:171) fits Elo over produced ballots") {
    val g = Graft(spark)
    val df = Seq(("long option text", "a"), ("longer option text here", "b"))
      .toDF("opt_x", "opt_y")
    val (ranked, elo) = g.rankWithElo(df, Seq("opt_x", "opt_y"), criteria = Seq("clarity"))
    assert(ranked.columns.contains("ranking") && ranked.columns.contains("winner"))
    val byLabel = elo.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // opt_x is longer in both rows -> always ranked first -> higher elo
    assert(byLabel("opt_x") > byLabel("opt_y"))
  }

  test("infer validates sampling_params keys against the supported set") {
    val g = Graft(spark)
    val df = Seq("hello").toDF("text")
    // known keys accepted (deterministic local models are sampling-independent)
    val out = g.infer(df, EchoModel(), Seq("text"),
      samplingParams = Map("temperature" -> 0.7, "top_p" -> 0.9))
    assert(out.count() === 1)
    val ex = intercept[IllegalArgumentException](
      g.infer(df, EchoModel(), Seq("text"), samplingParams = Map("tempurature" -> 1.0)))
    assert(ex.getMessage.contains("tempurature"))
  }

  test("awaitJobCompletion returns the results frame (sdk.py:1643)") {
    val g = Graft(spark)
    val id = g.submitJob(Seq(("x", 1L)).toDF("text", "row_id"), Some("await-test"))
    val res = g.awaitJobCompletion(id)
    assert(res.count() === 1)
    intercept[Exception](g.awaitJobCompletion("job-nonexistent"))
  }

  test("registerFunction: custom model addressable by name") {
    val g = Graft(spark)
    g.registerFunction("shout", TemplateModel("LOUD: "))
    assert(g.runFunction("shout", Map("t" -> "hi")).response === "LOUD: hi")
  }
}
