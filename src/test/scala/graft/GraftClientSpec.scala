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

  test("job progress: ticks stream during submit and end with complete totals") {
    val g = Graft(spark)
    val ticks = new java.util.concurrent.CopyOnWriteArrayList[graft.llm.Jobs.JobProgress]()
    val df = spark.range(1000).toDF("row_id").repartition(4)
    val id = g.submitJob(df, Some("progress-test"), 0, p => { ticks.add(p); () })
    assert(g.jobStatus(id) === graft.llm.Jobs.Succeeded)
    // the final tick is guaranteed but the listener bus is asynchronous —
    // wait for it rather than racing it
    val deadline = System.currentTimeMillis() + 10000
    while (System.currentTimeMillis() < deadline &&
      (ticks.isEmpty || ticks.get(ticks.size - 1).rowsWritten < 1000L)) Thread.sleep(20)
    import scala.jdk.CollectionConverters._
    val seq = ticks.asScala.toSeq
    assert(seq.nonEmpty)
    val last = seq.last
    assert(last.rowsWritten === 1000L)
    assert(last.tasksDone === last.tasksTotal && last.tasksTotal >= 4L)
    // ticks are monotone in tasksDone
    assert(seq.map(_.tasksDone).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("job failure reason captured; None for unknown/succeeded jobs") {
    val g = Graft(spark)
    import spark.implicits._
    val poison = spark.range(10).as[Long].map { i =>
      if (i > 5) throw new RuntimeException("boom at row " + i) else i
    }.toDF("v")
    val before = g.listJobs().map(_.id).toSet
    intercept[Exception](g.submitJob(poison, Some("poison")))
    val failedId = g.listJobs().map(_.id).filterNot(before).max
    assert(g.jobStatus(failedId) === graft.llm.Jobs.Failed)
    assert(g.jobFailureReason(failedId).exists(_.contains("boom")))
    assert(g.jobFailureReason("job-does-not-exist").isEmpty)
    val okId = g.submitJob(g.fromSeq(Seq("fine")))
    assert(g.jobFailureReason(okId).isEmpty)
  }

  test("attachJob streams status transitions; terminal job reports once") {
    val g = Graft(spark)
    val id = g.submitJob(g.fromSeq(Seq("attach me")), Some("attach-test"))
    val seen = scala.collection.mutable.ArrayBuffer[graft.llm.Jobs.Status]()
    val last = g.attachJob(id, s => { seen += s; () })
    assert(last === graft.llm.Jobs.Succeeded)
    assert(seen.toSeq === Seq(graft.llm.Jobs.Succeeded))
  }
}
