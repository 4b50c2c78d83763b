package graft

import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("attached listener records action traces with durations and outcomes") {
    Observability.clear()
    Observability.attach(spark)
    Observability.attach(spark) // idempotent
    Seq(1, 2, 3).toDF("x").agg(sum(col("x"))).collect()
    // listener delivery is async — poll briefly
    var tries = 0
    while (Observability.recent().isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
    val ts = Observability.recent()
    assert(ts.nonEmpty)
    assert(ts.forall(_.success))
    assert(ts.exists(_.action == "collect"))
    assert(ts.forall(_.durationMs >= 0))
  }

  test("jobs stamp their id into the trace log (observability.py:48 parity)") {
    val id = graft.llm.Jobs.submit(Seq((1, "x"), (2, "y")).toDF("a", "b"), Some("trace-me"))
    // recorded synchronously at the submit site — no listener race
    val ts = Observability.forJob(id)
    assert(ts.size === 1)
    val t = ts.head
    assert(t.success)
    assert(t.action === "jobs.submit:trace-me")
    assert(t.jobId === Some(id))
    assert(t.durationMs >= 0)
    // ad-hoc actions carry no job id; forJob filters them out
    assert(Observability.forJob("job-nonexistent").isEmpty)
  }
}
