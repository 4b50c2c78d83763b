package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("windowAggAvailableNow equals the batch window aggregation") {
    val streamed = Streams.windowAggAvailableNow(spark, sfDir)
      .orderBy("window_start", "event_type")
    val batch = graft.io.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
    val s = streamed.collect()
    val b = batch.collect()
    assert(s.length === b.length)
    assert(s.sameElements(b))
  }
}
