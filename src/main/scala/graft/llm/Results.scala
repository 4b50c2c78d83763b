package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Result-shaping semantics of the reference's `get_job_results`
  * (sutro/sdk.py:1131): structured-output JSON unpacking into columns,
  * collision checks, column ordering, original-DataFrame join-back.
  */
object Results {

  /** Unpack a JSON-string output column into one column per top-level field
    * (reference `unpack_json`, sutro/sdk.py:1283).
    *
    * Schema is inferred from the data (a 1-row sample job, mirroring the
    * reference's first-row `json.loads` probe) unless the caller provides
    * field names via a known schema. If the first row is not valid JSON the
    * frame is returned unchanged. Raises on field/column collisions, like
    * the reference.
    */
  def unpackJson(df: DataFrame, outputColumn: String = "inference_result"): DataFrame = {
    val spark = df.sparkSession
    val sample: Dataset[String] = {
      import spark.implicits._
      df.select(col(outputColumn).cast("string")).na.drop().limit(1).as[String]
    }
    val parsed = spark.read.json(sample)
    val fields = parsed.schema.fields.map(_.name)
    if (fields.isEmpty || parsed.schema.fields.exists(_.name == "_corrupt_record"))
      return df

    val conflicting = fields.toSet.intersect(df.columns.toSet - outputColumn).toSeq.sorted
    if (conflicting.nonEmpty)
      throw new IllegalArgumentException(
        "Cannot unpack structured output fields that conflict with existing result columns: " +
          conflicting.mkString(", ") + ". Set unpack_json=False to preserve the metadata and raw structured output.")

    val schema = parsed.schema
    val unpacked = df
      .withColumn("__parsed", from_json(col(outputColumn).cast("string"), schema))
    val withFields = fields.foldLeft(unpacked) { (d, f) =>
      d.withColumn(f, col(s"__parsed.$f"))
    }
    val flat = withFields.drop("__parsed").drop(outputColumn)

    // Reasoning-model outputs nest the real payload one level down:
    // {content: {...}, reasoning_content: ...} — unpack content's fields
    // and drop the wrapper (reference: sutro/sdk.py:1313).
    if (fields.sorted.toSeq == Seq("content", "reasoning_content")) {
      flat.schema("content").dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          val inner = s.fields.map(_.name)
          inner.foldLeft(flat) { (d, f) => d.withColumn(f, col(s"content.$f")) }
            .drop("content")
        case _ => flat
      }
    } else flat
  }

  /** Unpack with a caller-provided schema (the `output_schema` analog,
    * reference normalize_output_schema, sutro/common.py:170) — no data
    * probe, collision checks as in [[unpackJson]]. */
  def unpackJsonWithSchema(
      df: DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      outputColumn: String = "inference_result"): DataFrame = {
    val fields = schema.fields.map(_.name)
    val conflicting = fields.toSet.intersect(df.columns.toSet - outputColumn).toSeq.sorted
    if (conflicting.nonEmpty)
      throw new IllegalArgumentException(
        "Cannot unpack structured output fields that conflict with existing result columns: " +
          conflicting.mkString(", ") + ". Set unpack_json=False to preserve the metadata and raw structured output.")
    val unpacked = df.withColumn("__parsed", from_json(col(outputColumn).cast("string"), schema))
    fields.foldLeft(unpacked)((d, f) => d.withColumn(f, col(s"__parsed.$f")))
      .drop("__parsed").drop(outputColumn)
  }

  /** Reference column ordering (sutro/sdk.py:1251): inputs first, then
    * caller metadata columns, then the output column, then diagnostics. */
  def orderColumns(
      df: DataFrame,
      outputColumn: String = "inference_result",
      includeInputs: Boolean = false,
      includeCumulativeLogprobs: Boolean = false): DataFrame = {
    val standard = Set("inputs", outputColumn, "cumulative_logprobs", "confidence_score")
    val metadata = df.columns.filterNot(standard.contains)
    val ordered = Seq(
      "inputs" -> includeInputs) ++
      metadata.map(_ -> true) ++ Seq(
      outputColumn -> true,
      "cumulative_logprobs" -> includeCumulativeLogprobs,
      "confidence_score" -> df.columns.contains("confidence_score"))
    val keep = ordered.collect { case (c, true) if df.columns.contains(c) => c }
    df.select(keep.map(col): _*)
  }

  /** Join results back onto the original frame by a shared id column
    * (reference `with_original_df` concatenation is positional; at Spark
    * scale positional concat is an anti-pattern, so graft carries an id). */
  def withOriginalDf(original: DataFrame, results: DataFrame, idColumn: String): DataFrame =
    original.join(results, Seq(idColumn), "left")
}
