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
  * parquet scan instead of the operator it claims to measure. */
object Bench {

  /** Force full-row materialization of every output column. */
  private[graft] def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    // JIT/codegen warmup: run the whole catalog once at the smallest sf so
    // each measured number reflects the plan, not that query family's
    // first-run codegen compilation (measured up to 5s of the first run)
    SparkEntry.queries.foreach { case (_, fn) =>
      try { exec(fn(spark, warmDir)) } catch { case _: Throwable => () }
    }
    // Median of 3 materialized runs per query at the measured sf: a single
    // cold run overstates a query by up to 10x (first-touch page cache, JIT
    // profile at the measured data shape), which the sf0.001 warmup above
    // cannot absorb — the recorded number must reflect steady state.
    val runsPerQuery = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        try {
          val times = (1 to runsPerQuery).map { _ =>
            val t0 = System.nanoTime()
            exec(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.sorted
          name -> Right(times(times.length / 2))
        } catch {
          case e: Throwable =>
            name -> Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
    val qs = results.map {
      case (k, Right(sec)) => s"${jstr(k)}:$sec"
      case (k, Left(err)) => s"""${jstr(k)}:{"err":${jstr(err)}}"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(sec)) => sec }.sum
    val errors = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","errors":$errors,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
