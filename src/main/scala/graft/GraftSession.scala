package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the defaults every graft entrypoint wants.
  *
  * Local mode is a single JVM; on a real cluster the same conf block applies
  * (AQE handles skew/coalesce at 100 TB, shuffle partitions are sized by the
  * driver env rather than the 200 default).
  */
object GraftSession {
  def getOrCreate(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Prefer shuffled-hash over sort-merge when the planner's size
      // conditions allow, and let AQE rewrite SMJ->SHJ at runtime when
      // every post-shuffle partition of the build side is under the
      // threshold (guide §3.1: SHJ skips the sort on both sides and is
      // usually faster when a per-partition build fits in memory; AQE's
      // skew-join splitting still applies, and the threshold bounds the
      // per-task build at a size far under executor heaps at any scale).
      // Both are strategy-only knobs — join results are unchanged.
      // GRAFT_PREFER_SMJ=1 restores the engine default for A/B runs.
      .config("spark.sql.join.preferSortMergeJoin",
        if (sys.env.get("GRAFT_PREFER_SMJ").contains("1")) "true" else "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // GRAFT_STATE_STORE=rocksdb swaps streaming state from the
    // heap-backed default to the RocksDB provider — the production store
    // for large stateful streams (state spills to local disk instead of
    // executor heap). Results are provider-independent (spec-asserted);
    // the §9.6 rehearsal measures both.
    val withState =
      if (sys.env.get("GRAFT_STATE_STORE").contains("rocksdb"))
        builder.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else builder
    val spark = withState.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
