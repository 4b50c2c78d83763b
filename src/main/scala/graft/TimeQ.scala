package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // rehearsal knobs: run count (3-run steady-state by default; giant
    // decade queries can be dialed down) and an append-mode JSONL artifact
    // so a rehearsal that dies mid-marathon still leaves every completed
    // run on disk (the committed raw evidence for SURVEY's decade tables)
    val runs = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_RUNS", "3").toInt
    val out = sys.env.get("SPARK_GRAFT_TIMEQ_OUT")
    // free-form provenance marker for the JSONL lines (e.g. "cold" for
    // page-cache-dropped runs) so protocol variants are distinguishable
    // in the committed evidence
    val tag = sys.env.get("SPARK_GRAFT_TIMEQ_TAG")
      .map(t => s""","tag":"$t"""").getOrElse("")
    for (name <- args; i <- 1 to runs) {
      // bounded-state evidence: the streaming harness accumulates input
      // rows + peak state-store rows per run; the snapshot lands in the
      // JSONL line so SURVEY's §16.2 table is reproducible from committed
      // artifacts alone (not prose)
      graft.streaming.Streams.ProgressStats.reset()
      val t0 = System.nanoTime()
      // noop write, not count(): count() lets Catalyst prune the computed
      // columns, timing the scan instead of the operator
      Bench.exec(SparkEntry.queries(name)(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeq] $name run$i: $sec%.2f s")
      // GRAFT_PIN_REPORT=1: block-store footprint of the query's lineage
      // pins (localCheckpoints), captured AFTER the timed run and BEFORE
      // cleanup unpersists them — the committed evidence for pin-narrowing
      // claims (round-14: corpus_clean s3). Outside the timed region.
      if (sys.env.contains("GRAFT_PIN_REPORT")) {
        val infos = spark.sparkContext.getRDDStorageInfo
        val mem = infos.map(_.memSize).sum
        val disk = infos.map(_.diskSize).sum
        println(s"[pin-report] $name run$i rdds=${infos.length} " +
          s"mem_bytes=$mem disk_bytes=$disk")
      }
      out.foreach { p =>
        // Locale.ROOT, not the f-interpolator: a comma-decimal default
        // locale would emit invalid JSON (same rule as Bench.j3)
        val secJson = String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
        val (nStream, inRows, statePeak) = graft.streaming.Streams.ProgressStats.snapshot
        val streamJson =
          if (nStream == 0) ""
          else s""","input_rows":$inRows,"state_rows_peak":$statePeak"""
        val line =
          s"""{"query":"$name","run":$i,"sec":$secJson,"sf_dir":"$dir"$streamJson$tag}""" + "\n"
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
      // the Bench marathon's state hygiene applies here too: without the
      // untimed cleanup, accumulated state-store providers + memory-sink
      // tables drove a 100x-scale streaming run3 into a full-GC spiral
      Bench.cleanup(spark)
      System.gc()
    }
    spark.stop()
  }
}
