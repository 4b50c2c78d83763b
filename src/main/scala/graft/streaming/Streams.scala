package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface over the events table.
  *
  * The reference's job-progress streaming (sutro/sdk.py await/stream) is a
  * service-side concern; graft's streaming story is the Spark-native one:
  * file-source streams -> event-time windowed aggregation with a watermark
  * -> sink. Tested via the memory sink with Trigger.AvailableNow, which
  * processes the backlog exactly once and terminates — so the result is
  * deterministic and batch-equivalent (single batch: no state eviction).
  */
object Streams {

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Tumbling 1-hour window aggregation over the events stream: event count
    * and value sum per (window, event_type). Returns the materialized
    * result after the AvailableNow run completes. */
  def windowAggAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // file stream source needs an explicit schema: take the batch-read one
    // (ts arrives as long nanos under spark.sql.legacy.parquet.nanosAsLong).
    // The source path must be a directory — point it at the sf dir and
    // select just the events file via pathGlobFilter.
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val events = {
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    }
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))
    val name = s"graft_stream_agg_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Per-user session state for streaming sessionization. */
  case class SessionState(lastTsMicros: Long, nSessions: Long, nEvents: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming sessionization via flatMapGroupsWithState — the custom-state
    * path (gap-based sessions per user, like the batch q_sessionize).
    *
    * State is one (lastTs, counters) record per user: constant-size,
    * partitioned by user across executors — the shape that scales to
    * billions of users. AvailableNow + NoTimeout processes the backlog in
    * one batch and emits each user's final counts.
    */
  def sessionizeAvailableNow(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val path = s"$sfDir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val events = {
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    }
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    val updates = events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_micros"),
        col("event_id").cast("long").as("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          // within a batch, order by event time then id (batch arrival order
          // is not time order)
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { case (_, ts, _) =>
            val newSession = st.lastTsMicros == Long.MinValue || ts > st.lastTsMicros + gapMicros
            st = SessionState(ts, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          Iterator(SessionUpdate(userId, st.nSessions, st.nEvents))
      }

    val name = s"graft_stream_sessions_${counter.incrementAndGet()}"
    val q = updates.toDF().writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
