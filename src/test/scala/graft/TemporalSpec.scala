package graft

import graft.ops.Temporal
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: most recent at-or-before match per key; null when none") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (2L, 102L, ts("2024-01-01 09:00:00"))
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), // ties match inclusively
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (2L, ts("2024-01-01 09:30:00"), "c")  // after left -> no match
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").orderBy("id")
      .as[(Long, Option[String])].collect()
    assert(out.toSeq === Seq((100L, Some("a")), (101L, Some("b")), (102L, None)))
  }

  test("asofJoin forward: earliest at-or-after match, ties inclusive") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (2L, 102L, ts("2024-01-01 09:40:00"))
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), // tie at 10:00 -> inclusive
      (1L, ts("2024-01-01 11:00:00"), "b"), // before 12:00 -> no forward match for 101
      (2L, ts("2024-01-01 09:30:00"), "c")  // before left -> no match
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"), direction = "forward")
      .select("id", "asof_v").orderBy("id")
      .as[(Long, Option[String])].collect()
    assert(out.toSeq === Seq((100L, Some("a")), (101L, None), (102L, None)))
  }

  test("asofJoin tolerance: matches beyond the bound come back null (merge_asof semantics)") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // match 30 min old -> within 1h
      (1L, 101L, ts("2024-01-01 13:00:00"))  // match 2h old -> nulled
    ).toDF("k", "id", "t")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b")).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"),
        toleranceSec = Some(3600L))
      .select("id", "asof_v").orderBy("id")
      .as[(Long, Option[String])].collect()
    assert(out.toSeq === Seq((100L, Some("a")), (101L, None)))
  }

  test("asofJoin matches the nearest ROW even when its payload is null (merge_asof semantics)") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("k", "id", "t")
    // nearest right row (9:50) has a null payload; an older row (9:00) has
    // a value — merge_asof matches 9:50 and returns null
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some("a")),
      (1L, ts("2024-01-01 09:50:00"), None: Option[String])).toDF("k", "t", "v")
    val noTol = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect()
    assert(noTol.toSeq === Seq((100L, None)))
    // and the tolerance is measured against that same nearest row (10 min),
    // not the older valued row (60 min)
    val tol = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"),
        toleranceSec = Some(1800L))
      .select("id", "asof_v").as[(Long, Option[String])].collect()
    assert(tol.toSeq === Seq((100L, None)))
  }

  test("rangeJoinBinned equals the naive inequality join on sf0.001 events") {
    val events = graft.io.Tables.events(spark, sfDir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val binned = Temporal.rangeJoinBinned(clicks, purchases, "user_id", "click_ts", "ts", 3600, 3600)
      .select("event_id", "click_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = purchases.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("p.ts") - expr("INTERVAL 1 HOUR") &&
          col("c.click_ts") <= col("p.ts"))
      .select("p.event_id", "c.click_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
  }
}
