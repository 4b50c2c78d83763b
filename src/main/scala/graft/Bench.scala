package graft

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Uses GraftSession
  * (AQE on, shuffle partitions = cores) — the same conf the library
  * recommends in production.
  *
  * A failing query is recorded as {"err": "..."} under its name (and
  * counted in "errors") instead of a bogus elapsed time — a broken plan
  * must never masquerade as a fast one.
  *
  * Queries are materialized through the noop datasource writer, NOT
  * count(): under count() Catalyst prunes every unreferenced projection,
  * so a narrow-map query (e.g. per-doc text analysis) would time the bare
  * parquet scan instead of the operator it claims to measure.
  *
  * State hygiene (the round-5 lesson): a 296-execution marathon in one JVM
  * accumulates localCheckpoint blocks (eager, only GC'd when the
  * ContextCleaner notices) and streaming memory-sink tables that are never
  * dropped; the resulting memory pressure inflated recorded medians up to
  * 140x over fresh-JVM truth (infer_echo 51s recorded vs 0.36s real). Every
  * measured run is therefore followed by an UNTIMED cleanup — clear the
  * cache manager (memory-sink tables are cached plans), drop the
  * graft_stream_* temp views, unpersist every tracked RDD (localCheckpoints
  * live there) — and a System.gc() runs between queries so one query's
  * garbage never bills the next. */
object Bench {

  /** Force full-row materialization of every output column. */
  private[graft] def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Untimed inter-run cleanup: release every piece of state a catalog
    * query can leave behind. Runs OUTSIDE the timed window.
    *
    * The round-6 lesson: each streaming run starts a fresh memory-sink
    * query with a fresh checkpoint, and every micro-batch loads state-store
    * providers that stay LOADED in the executor JVM after the query stops
    * (the provider cache is keyed by checkpoint, so a marathon of
    * one-shot queries accumulates hundreds of providers plus their
    * maintenance-thread churn — recorded streaming medians ran 3-8x over
    * fresh-JVM truth). StateStore.stop() unloads them all; the maintenance
    * pool restarts lazily on the next streaming query. */
  private[graft] def cleanup(spark: org.apache.spark.sql.SparkSession): Unit = {
    try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => () }
    try {
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("graft_stream"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    } catch { case _: Throwable => () }
    try spark.sharedState.cacheManager.clearCache() catch { case _: Throwable => () }
    try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => () }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }
    sweepTempCheckpoints()
    // the streaming harness's own per-query checkpoint/file-sink dirs: all
    // queries are stopped above, so everything under this JVM's root is
    // disposable (errored queries' checkpoints, file-sink outputs). Stale
    // sibling roots whose owning JVM is dead are swept too; a LIVE
    // sibling's dirs are never touched. Only PID-SHAPED directories are
    // candidates: the scratch parent is user-configurable
    // (GRAFT_STREAM_SCRATCH), so a non-numeric entry is somebody else's
    // data, not a dead sibling — sweeping everything that fails the
    // is-it-alive probe would silently destroy unrelated content under a
    // shared /tmp or scratch volume.
    try {
      val own = graft.streaming.Streams.scratchRoot
      deleteRecursively(own)
      Option(own.getParentFile.listFiles()).getOrElse(Array.empty).foreach { f =>
        f.getName.toLongOption match {
          case Some(pid) if f.isDirectory =>
            val ownerAlive =
              java.lang.ProcessHandle.of(pid).map[java.lang.Boolean](_.isAlive).orElse(false)
            if (!ownerAlive) deleteRecursively(f)
          case _ => () // not a per-JVM scratch dir — never touch it
        }
      }
    } catch { case _: Throwable => () }
  }

  /** Delete the temp checkpoint dirs one-shot streaming queries leave in
    * java.io.tmpdir. Clean AvailableNow stops delete their own, but a
    * query that errors (or a sink that stops uncleanly) leaves its
    * "temporary-*" dir behind — a marathon must not let them pile up. */
  private def sweepTempCheckpoints(): Unit = try {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("temporary-"))
      .foreach(deleteRecursively)
  } catch { case _: Throwable => () }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** 3-decimal fixed-point seconds: 74 queries x 17-digit doubles overflowed
    * the driver's captured stdout tail in round 5 (parsed: null). Formatted
    * under Locale.ROOT — the default-locale f-interpolator would print
    * comma decimals on a de/tr JVM and break the JSON. */
  private def j3(sec: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    var spark = GraftSession.getOrCreate()
    // A fatal executor/driver error (an OOM, typically) stops the
    // SparkContext; without recovery every LATER query is billed a bogus
    // stopped-context error (r9's first 100x run: one broadcast OOM → 79
    // cascade errors in the artifact). Recreate the session and drop
    // SparkEntry's per-dir memos (their in-memory-catalog tables died with
    // the context) so each query is measured on a live context and only
    // the query that actually failed records an error.
    def ensureLive(): Unit = if (spark.sparkContext.isStopped) {
      SparkEntry.invalidateSessionCaches()
      spark = GraftSession.getOrCreate()
    }
    // JIT/codegen warmup: run the whole catalog once at the smallest sf so
    // each measured number reflects the plan, not that query family's
    // first-run codegen compilation (measured up to 5s of the first run)
    SparkEntry.queries.foreach { case (_, fn) =>
      ensureLive()
      try { exec(fn(spark, warmDir)) } catch { case _: Throwable => () }
      cleanup(spark)
    }
    System.gc()
    // Median of 3 materialized runs per query at the measured sf: a single
    // cold run overstates a query by up to 10x (first-touch page cache, JIT
    // profile at the measured data shape), which the sf0.001 warmup above
    // cannot absorb — the recorded number must reflect steady state.
    val runsPerQuery = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    // SPARK_GRAFT_BENCH_ONCE: comma-separated queries measured with ONE
    // run instead of the median-of-N — for the declared O(n²) exact-oracle
    // baselines at 100x, where three runs would dominate the whole bench
    // wall-clock; the artifact records which queries ran once.
    val onceSet = sys.env.get("SPARK_GRAFT_BENCH_ONCE")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // SPARK_GRAFT_BENCH_SKIP: comma-separated queries EXCLUDED from this
    // artifact — the declared O(n²) exact-oracle baselines whose wall-clock
    // at the measured sf is hours (dedup_embedding ≈ 7.5 h at sf100). The
    // exclusion is recorded in the artifact ("skipped": [...]) so a decade
    // total is never silently missing work: the skipped entries' scale
    // twins (the LSH/CSR paths) are in the measured set.
    val skipSet = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // a typo'd skip name would silently fail to exclude the hours-long
    // query it was meant to drop while still being recorded in "skipped" —
    // misdescribing the artifact. Same check for the once-list.
    val unknownSkips = skipSet.diff(SparkEntry.queries.keySet) ++
      onceSet.diff(SparkEntry.queries.keySet)
    require(unknownSkips.isEmpty,
      s"SPARK_GRAFT_BENCH_SKIP/ONCE name(s) not in the catalog: ${unknownSkips.toSeq.sorted.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => skipSet.contains(name) }
    // prime the first measured query at the MEASURED sf (untimed): it alone
    // pays the first-touch page cache of the sf files, which the sf0.001
    // warmup loop cannot absorb (r6: ann_bruteforce, first alphabetically,
    // recorded well above its steady state even after warmup)
    ordered.headOption.foreach { case (_, fn) =>
      ensureLive()
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
      cleanup(spark)
    }
    val results: Seq[(String, Either[String, Double])] =
      ordered.map { case (name, fn) =>
        val r = try {
          val nRuns = if (onceSet.contains(name)) 1 else runsPerQuery
          val times = (1 to nRuns).map { _ =>
            ensureLive()
            val t0 = System.nanoTime()
            exec(fn(spark, sfDir))
            val sec = (System.nanoTime() - t0) / 1e9
            cleanup(spark)
            sec
          }.sorted
          name -> Right(times(times.length / 2))
        } catch {
          case e: Throwable =>
            cleanup(spark)
            ensureLive()
            name -> Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
        System.gc()
        r
      }
    val qs = results.map {
      case (k, Right(sec)) => s"${jstr(k)}:${j3(sec)}"
      case (k, Left(err)) => s"""${jstr(k)}:{"err":${jstr(err)}}"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(sec)) => sec }.sum
    val errors = results.count(_._2.isLeft)
    val onceRan = results.map(_._1).filter(onceSet.contains)
    val onceJson =
      if (onceRan.isEmpty) ""
      else s""","runs_once":${onceRan.sorted.map(jstr).mkString("[", ",", "]")}"""
    val skipJson =
      if (skipSet.isEmpty) ""
      else s""","skipped":${skipSet.toSeq.sorted.map(jstr).mkString("[", ",", "]")}"""
    // "runs" records the median-of-N policy in the artifact itself: a
    // decade marathon at runs=1 and a canonical runs=3 artifact must be
    // distinguishable without reconstructing the launch command
    val line =
      s"""{"metric":"total","value":${j3(total)},"unit":"sec","errors":$errors,"runs":$runsPerQuery,"queries":$qs,"sf":"$sfDir"$onceJson$skipJson}"""
    // file copy survives any stdout truncation by the caller
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
    // full per-query line first, after Spark's shutdown chatter
    println(line)
    // ...then a short summary line as the VERY last stdout: the 88-query
    // line (~3.6 KB) outgrew the caller's captured stdout tail in round 7
    // (BENCH_r07 parsed: null — the head of the line fell off the window).
    // Whatever tail window the caller keeps, this line always fits whole,
    // so there is always one complete parseable JSON object; per-query
    // detail lives in the file named by "queries_file".
    println(
      s"""{"metric":"total","value":${j3(total)},"unit":"sec","errors":$errors,"n_queries":${results.size},"sf":"$sfDir","queries_file":${jstr(outPath)}}""")
  }
}
