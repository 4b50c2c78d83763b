package graft

import graft.llm._
import org.apache.spark.sql.functions._

/** Mirrors the reference's results-shaping tests: unpack_json field
  * explosion, collision detection (tests/test_id_column.py), column
  * ordering, join-back. */
class ResultsSpec extends SparkSpec {
  import spark.implicits._

  test("unpackJson: fields become columns, raw column dropped") {
    val df = Seq((1L, """{"score":7,"label":"good"}"""), (2L, """{"score":3,"label":"bad"}"""))
      .toDF("id", "inference_result")
    val out = Results.unpackJson(df)
    assert(out.columns.sorted.toSeq === Seq("id", "label", "score"))
    val r = out.orderBy("id").select("id", "score", "label").as[(Long, Long, String)].collect()
    assert(r(0) === ((1L, 7L, "good")))
  }

  test("unpackJson: collision with existing column raises like the reference (sdk.py:1283)") {
    val df = Seq((1L, "x", """{"id":9}""")).toDF("id", "text", "inference_result")
    val e = intercept[IllegalArgumentException](Results.unpackJson(df))
    assert(e.getMessage.contains("conflict"))
  }

  test("unpackJson: non-JSON output left unchanged") {
    val df = Seq((1L, "plain text")).toDF("id", "inference_result")
    val out = Results.unpackJson(df)
    assert(out.columns.toSeq === Seq("id", "inference_result"))
  }

  test("orderColumns: metadata first, output, then diagnostics (sdk.py:1251)") {
    val df = Seq((1L, "t", "out", 0.9)).toDF("id", "text", "inference_result", "confidence_score")
    val out = Results.orderColumns(df)
    assert(out.columns.toSeq === Seq("id", "text", "inference_result", "confidence_score"))
  }

  test("withOriginalDf: left join preserves all original rows") {
    val orig = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val res = Seq((1L, "r1")).toDF("id", "out")
    val joined = Results.withOriginalDf(orig, res, "id").orderBy("id")
    assert(joined.count() === 2)
    assert(joined.where(col("out").isNull).count() === 1)
  }
}
