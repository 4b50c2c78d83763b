package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading mirroring the reference's input handling
  * (reference: sutro/common.py:119 `prepare_input_data` — list, DataFrame,
  * csv/parquet/txt path, dataset id). Spark-side, every input becomes a
  * DataFrame read through the DataSource API so filters/projection push down.
  */
object Tables {
  /** Load one of the driver-generated test tables from an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** events.parquet has carried two parquet encodings across driver data
    * generations: TIMESTAMP(NANOS), which Spark has no native type for (with
    * spark.sql.legacy.parquet.nanosAsLong=true it arrives as long nanos), and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    * TIMESTAMP_NTZ. Both normalize to session-TZ TimestampType here so every
    * consumer (watermarks, unix_micros, window()) sees one type. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(table(spark, sfDir, "events"), "ts")

  /** Normalize a timestamp-carrying column to microsecond TimestampType:
    * long nanos are truncated with DIV (not double math — ns values exceed
    * the 53-bit double mantissa); TIMESTAMP_NTZ is reinterpreted in the
    * session time zone (UTC for every graft session, so the wall-clock is
    * preserved exactly); TimestampType passes through. */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Generic file loader keyed on extension, like prepare_input_data:
    * .csv → header csv, .parquet → parquet, .txt/no-ext → one line per row. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i  => path.substring(i + 1).toLowerCase
    }
    ext match {
      case "parquet"       => spark.read.parquet(path)
      case "orc"           => spark.read.orc(path)
      case "csv"           => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" | "jsonl" => spark.read.json(path)
      case "txt" | ""      => spark.read.text(path).withColumnRenamed("value", "line")
      case other           => throw new IllegalArgumentException(s"Unsupported file type: .$other")
    }
  }
}

/** Physical-layout helpers for the 100 TB posture: partitioned writes (so
  * scans prune directories) and bucketed tables (so repeated equi-joins
  * and aggregations on the bucket key run with NO shuffle on either side).
  * Local tests assert the plan properties (PartitionFilters on the scan;
  * no Exchange under a bucketed join) — the same properties that hold on
  * a real cluster.
  */
object Layout {
  import org.apache.spark.sql.DataFrame

  /** Write `df` partitioned by the given columns; readers filtering on
    * them scan only the matching directories (partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Persist `df` as a bucketed+sorted managed table: `numBuckets` by
    * `bucketCol`. Joins/aggregations between tables bucketed the same way
    * skip the shuffle entirely — the co-location is in the layout. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
