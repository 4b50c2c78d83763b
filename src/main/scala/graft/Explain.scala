package graft

/** Plan-review main: prints the formatted physical plan of selected catalog
  * queries so scan pruning (ReadSchema/PushedFilters), broadcast joins, and
  * WholeStageCodegen spans can be audited. Usage:
  *   runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate()
    names.foreach { name =>
      println(s"\n===== $name =====")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
