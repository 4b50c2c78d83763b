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
}
