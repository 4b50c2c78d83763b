package graft.ops

/** Shared warehouse hygiene for the persistent-index operators
  * ([[Similarity]] IVF/IVFADC indexes, [[Dedup]] incremental-dedup index). */
private[ops] object Warehouse {

  /** Drop a saveAsTable-backed table AND its orphan warehouse directory.
    *
    * With the default in-memory catalog a previous JVM's table metadata is
    * gone but its warehouse location persists, and saveAsTable refuses the
    * orphan dir — drop both so cross-JVM rebuild is idempotent. The catalog
    * lowercases identifiers, so the on-disk directory is the lowercased
    * name; delete that path (a mixed-case `names` entry would otherwise
    * miss the orphan on case-sensitive filesystems). */
  def dropTables(spark: org.apache.spark.sql.SparkSession, names: Seq[String]): Unit =
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(warehouse, t.toLowerCase(java.util.Locale.ROOT)))
    }

  /** Position-based dynamic partition overwrite: rows replace exactly the
    * partitions present in `df` — the idempotent-append primitive the
    * persistent indexes share. A RETRY of the same batch (crash recovery,
    * speculative re-run) overwrites its own partitions instead of
    * double-counting; partitions absent from `df` are untouched. */
  def dynOverwrite(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.get(modeKey)
    try {
      spark.conf.set(modeKey, "dynamic")
      df.select(spark.table(table).schema.fieldNames
          .map(org.apache.spark.sql.functions.col).toSeq: _*)
        .write.mode("overwrite").insertInto(table)
    } finally spark.conf.set(modeKey, prior)
  }
}
