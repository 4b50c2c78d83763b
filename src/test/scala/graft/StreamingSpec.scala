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

  test("windowAggAppendAvailableNow (watermark-evicting) equals the batch window aggregation") {
    val streamed = Streams.windowAggAppendAvailableNow(spark, sfDir)
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

  test("parquet sink + checkpoint: exactly-once output, restart writes nothing new") {
    val work = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val first = Streams.windowAggAppendToParquet(spark, sfDir, work)
    val batchCount = graft.io.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
    assert(first.count() === batchCount)
    // restart with the same checkpoint: no new input -> output unchanged
    val second = Streams.windowAggAppendToParquet(spark, sfDir, work)
    assert(second.count() === batchCount)
  }

  test("dedupExactAvailableNow equals batch exact dedup") {
    val streamed = Streams.dedupExactAvailableNow(spark, sfDir)
      .orderBy("content_key").collect()
    val batch = graft.ops.Dedup.exact(
        graft.io.Tables.table(spark, sfDir, "documents"), "text", "doc_id")
      .orderBy("content_key").collect()
    assert(streamed.length === batch.length)
    assert(streamed.sameElements(batch))
  }

  test("sessionizeAvailableNow (flatMapGroupsWithState) equals batch sessionization") {
    import org.apache.spark.sql.expressions.Window
    val streamed = Streams.sessionizeAvailableNow(spark, sfDir, gapMinutes = 30)
      .select("user_id", "n_sessions", "n_events").orderBy("user_id")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = graft.io.Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      .select(col("user_id").cast("long"), col("n_sessions"), col("n_events"))
      .orderBy("user_id")
    val s = streamed.collect()
    val b = batch.collect()
    assert(s.length === b.length)
    assert(s.sameElements(b))
  }
}
