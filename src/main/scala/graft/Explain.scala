package graft

/** Plan-review main: prints the formatted physical plan of selected catalog
  * queries so scan pruning (ReadSchema/PushedFilters), broadcast joins, and
  * WholeStageCodegen spans can be audited. Usage:
  *   runMain graft.Explain [sfDir] [query ...]
  *
  * GRAFT_EXPLAIN_EXECUTED=1 additionally RUNS each query (noop sink) and
  * prints the AQE-final executed plan — the only place runtime join
  * rewrites (SMJ -> shuffled-hash/broadcast, AQEShuffleRead coalescing)
  * are visible; the pre-execution plan always says isFinalPlan=false.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val executed = sys.env.get("GRAFT_EXPLAIN_EXECUTED").contains("1")
    val spark = GraftSession.getOrCreate()
    names.foreach { name =>
      println(s"\n===== $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
        if (executed) {
          // run THIS df's own QueryExecution (a write — and even
          // Dataset.foreach, via rddQueryExecution — wraps the query in a
          // fresh execution and leaves this plan un-finalized): executing
          // the executedPlan's own RDD finalizes the AdaptiveSparkPlanExec
          // we are about to print. Traversed DISTRIBUTED (foreach of unit,
          // every row consumed executor-side) — the former executeCollect()
          // pulled the full result set into the driver, unbounded for large
          // sfDir arguments (round-13 ADVICE item 4)
          df.queryExecution.executedPlan.execute()
            .foreach((_: org.apache.spark.sql.catalyst.InternalRow) => ())
          println(s"----- $name AQE-final executed plan -----")
          println(df.queryExecution.executedPlan.toString.take(20000))
          Bench.cleanup(spark)
        }
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
