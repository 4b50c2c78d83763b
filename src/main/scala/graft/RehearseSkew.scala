package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key skew rehearsal (SURVEY §9.7): builds an sf1 variant where ONE
  * key owns ~30% of all rows, then times the join / groupBy / dedup
  * family shapes with and without their mitigations:
  *
  *  - shuffle join on the hot key: AQE skew-join ON vs OFF vs explicit
  *    salting ([[graft.ops.Skew.saltedJoin]]), broadcast disabled so the
  *    join actually shuffles (at 100 TB the dim side wouldn't broadcast)
  *  - groupBy on the hot key: hash aggregation's map-side partial combine
  *    is the built-in mitigation — measured against the unskewed twin
  *  - exact dedup with 30% identical content: the same partial-combine
  *    argument applied to the content-key aggregation
  *
  * Prints [skew] lines; env: GRAFT_SKEW_SRC (default data/sf1),
  * GRAFT_SKEW_DST (default /tmp/graft-skew). Run twice internally,
  * steady-state = run 2.
  */
object RehearseSkew {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def bench(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
    val times = (1 to 2).map(_ => time(Bench.exec(df)))
    println(f"[skew] $label%-46s run1=${times(0)}%6.2f s  run2=${times(1)}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    import spark.implicits._
    val src = sys.env.getOrElse("GRAFT_SKEW_SRC", "/root/repo/data/sf1")
    val dst = sys.env.getOrElse("GRAFT_SKEW_DST", "/tmp/graft-skew")

    // ---- skewed variants: one key owns ~30% of rows ----
    val orders = spark.read.parquet(s"$src/orders.parquet")
    orders
      .withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(10)) < 3, lit(1L))
          .otherwise(col("o_custkey")))
      .write.mode("overwrite").parquet(s"$dst/orders_skew.parquet")
    val events = spark.read.parquet(s"$src/events.parquet")
    events
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < 3, lit(1L))
          .otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$dst/events_skew.parquet")
    // unskewed TWIN with the same rewrite (same file count/layout/encoding
    // AND the same user_id type the when/otherwise coerces to) so the
    // groupBy comparison isolates the key distribution, not the scan
    events.withColumn("user_id", col("user_id").cast("long"))
      .write.mode("overwrite").parquet(s"$dst/events_unskew.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 3,
          lit("the one hot boilerplate page every mirror serves"))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$dst/documents_skew.parquet")

    val ordersSkew = spark.read.parquet(s"$dst/orders_skew.parquet")
    val eventsSkew = spark.read.parquet(s"$dst/events_skew.parquet")
    val docsSkew = spark.read.parquet(s"$dst/documents_skew.parquet")
    val customer = spark.read.parquet(s"$src/customer.parquet")
    val hot = ordersSkew.where(col("o_custkey") === 1L).count()
    println(s"[skew] hot key owns $hot of ${ordersSkew.count()} orders")

    // ---- join family: force a real shuffle join on the hot key ----
    def shuffleJoin(l: DataFrame): DataFrame =
      l.join(customer, l("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tp"))
    val bcKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val skewKey = "spark.sql.adaptive.skewJoin.enabled"
    val priors = bcKeys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      bcKeys.foreach(spark.conf.set(_, "-1"))
      spark.conf.set(skewKey, "false")
      bench(spark, "join hot-key, AQE skew OFF")(shuffleJoin(ordersSkew))
      bench(spark, "join unskewed,  AQE skew OFF")(shuffleJoin(orders))
      spark.conf.set(skewKey, "true")
      bench(spark, "join hot-key, AQE skew ON (default thresholds)")(shuffleJoin(ordersSkew))
      // AQE only splits partitions above skewedPartitionThresholdInBytes
      // (256 MB default) — the rehearsal's hot partition is ~180 MB, i.e.
      // real-cluster skew scaled down; lower the threshold in proportion
      // to show the split actually engaging
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      bench(spark, "join hot-key, AQE skew ON (16MB threshold)")(shuffleJoin(ordersSkew))
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      bench(spark, "join hot-key, salted x32 (AQE skew OFF)")({
        spark.conf.set(skewKey, "false")
        graft.ops.Skew.saltedJoin(
            ordersSkew, customer.withColumnRenamed("c_custkey", "o_custkey"),
            Seq("o_custkey"), salt = 32)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tp"))
      })
    } finally {
      priors.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
      spark.conf.set(skewKey, "true")
    }

    // ---- groupBy family: partial aggregation is the mitigation ----
    // warm BOTH inputs untimed first: at sub-second scale, whichever
    // variant runs first pays codegen + page-cache for the whole family
    // and fakes a 2x "skew penalty" that order-swapping reverses
    def byUser(e: DataFrame): DataFrame =
      e.groupBy("user_id").agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val eventsUnskew = spark.read.parquet(s"$dst/events_unskew.parquet")
    Bench.exec(byUser(eventsUnskew))
    Bench.exec(byUser(eventsSkew))
    bench(spark, "groupBy hot user (30% of events)")(byUser(eventsSkew))
    bench(spark, "groupBy unskewed users (same layout)")(byUser(eventsUnskew))

    // ---- dedup family: 30% identical content ----
    bench(spark, "dedup_exact, 30% one content")(
      graft.ops.Dedup.exact(docsSkew, "text", "doc_id"))
    bench(spark, "dedup_exact, unskewed")(
      graft.ops.Dedup.exact(docs, "text", "doc_id"))
    // the near-dup path canonicalizes exact dups to ONE rep first, so a
    // 30% duplicate cluster costs one group row, not occupancy²; emitted
    // within-group pairs are quadratic in the GROUP (inherent to
    // all-pairs output semantics) — so measure the cluster/apply shape,
    // whose output is linear (keeper per doc), instead
    bench(spark, "dedup keeper-assignment, 30% one content")(
      graft.ops.Dedup.exact(docsSkew, "text", "doc_id")
        .join(docsSkew.select(col("doc_id"),
          graft.ops.TextAnalysis.fingerprint(col("text")).as("content_key")), "content_key")
        .select(col("doc_id"), col("keeper_id")))

    spark.stop()
  }
}
