package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      // noop write, not count(): count() lets Catalyst prune the computed
      // columns, timing the scan instead of the operator
      Bench.exec(SparkEntry.queries(name)(spark, dir))
      println(f"[timeq] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      // the Bench marathon's state hygiene applies here too: without the
      // untimed cleanup, accumulated state-store providers + memory-sink
      // tables drove a 100x-scale streaming run3 into a full-GC spiral
      Bench.cleanup(spark)
      System.gc()
    }
    spark.stop()
  }
}
