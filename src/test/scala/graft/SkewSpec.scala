package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted-join skew utility: the contract is exact equality with the
  * plain join. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join, including duplicate rows") {
    val left = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("k", "lv")
    val right = Seq((1L, 10.0), (1L, 20.0), (2L, 30.0), (4L, 40.0))
      .toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = canon(left.join(right, Seq("k")))
    val salted = canon(Skew.saltedJoin(left, right, Seq("k"), salt = 4))
    assert(salted === plain)
  }

  test("saltedJoin on real tables matches the plain join rollup") {
    val orders = graft.io.Tables.table(spark, sfDir, "orders")
      .select("o_custkey", "o_totalprice")
    val cust = graft.io.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("c_mktsegment").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rollup(Skew.saltedJoin(orders, cust, Seq("o_custkey"), 8)) ===
      rollup(orders.join(cust, Seq("o_custkey"))))
  }

  test("saltedJoin validates its parameters") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] { Skew.saltedJoin(df, df, Seq("k"), 1) }
    intercept[IllegalArgumentException] { Skew.saltedJoin(df, df, Seq.empty, 4) }
  }
}
