package graft

import org.apache.spark.sql.functions._
import graft.functions.gf

/** The round-13 long-cents money sums (gf.cents / gf.moneySum) must be
  * BIT-IDENTICAL to the decimal formulation they replaced — the catalog
  * queries' oracle hashes depend on it. Checked here on the real test
  * tables (every money column the catalog sums) and on an adversarial
  * synthetic range. */
class MoneySumSpec extends SparkSpec {

  private def decSum(x: org.apache.spark.sql.Column, scale: Int) =
    sum(x.cast(s"decimal(18,$scale)")).cast("double")

  test("moneySum == decimal sum on every catalog money column (sf0.001)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val byGroup = li.groupBy("l_returnflag", "l_linestatus").agg(
      decSum(col("l_quantity"), 2).as("d_q"),
      gf.moneySum(col("l_quantity"), 2).as("c_q"),
      decSum(col("l_extendedprice"), 2).as("d_p"),
      gf.moneySum(col("l_extendedprice"), 2).as("c_p"),
      decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("d_dp"),
      gf.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("c_dp"))
    val bad = byGroup.where(
      col("d_q") =!= col("c_q") || col("d_p") =!= col("c_p") ||
        col("d_dp") =!= col("c_dp")).count()
    assert(bad === 0L)

    val ev = graft.io.Tables.events(spark, sfDir).where(col("value").isNotNull)
    val evAgg = ev.groupBy("event_type").agg(
      decSum(col("value"), 2).as("d"), gf.moneySum(col("value"), 2).as("c"))
    assert(evAgg.where(col("d") =!= col("c")).count() === 0L)
  }

  test("per-row cents == decimal cast on an adversarial synthetic range") {
    // the guarantee's domain: near-k-dp money values (id/100, id/10000) plus
    // EXACT dyadic ties (id/8 — e.g. x.125, x.375: representable exactly, so
    // both formulations face a true HALF_UP tie and must agree on it)
    val vals = spark.range(0, 200000).select(
      (col("id").cast("double") / 100.0).as("x2"),
      (col("id").cast("double") / 10000.0).as("x4"),
      (col("id").cast("double") / 8.0).as("x8"))
    val bad2 = vals.where(
      gf.cents(col("x2"), 2) =!= (col("x2").cast("decimal(18,2)") * 100).cast("long")).count()
    val bad4 = vals.where(
      gf.cents(col("x4"), 4) =!= (col("x4").cast("decimal(18,4)") * 10000).cast("long")).count()
    val bad8 = vals.where(
      gf.cents(col("x8"), 2) =!= (col("x8").cast("decimal(18,2)") * 100).cast("long")).count()
    assert(bad2 === 0L)
    assert(bad4 === 0L)
    assert(bad8 === 0L)
  }

  test("fp10 sum == decimal(25,10) sum on real embeddings and float grids") {
    // the groupCentroids / drift-monitor replacement: per-element AND
    // group-mean equality with the decimal formulation, on the real
    // embedding table and on a dense float grid crossing every magnitude
    // the catalog's unit-scale coordinates use
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("embedding").isNotNull)
      .select(col("label").as("grp"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("grp"), col("pos"), col("x").cast("double").as("x"))
    val grid = spark.range(-200000, 200000).select(
      (col("id") % 37).as("grp"), lit(0).as("pos"),
      (col("id").cast("float") / 131072.0f).cast("double").as("x"))
    for (df <- Seq(emb, grid)) {
      val badRow = df.where(
        gf.fp10(col("x")) =!= (col("x").cast("decimal(25,10)") * 10000000000L).cast("long")).count()
      assert(badRow === 0L)
      val agg = df.groupBy("grp", "pos").agg(
        (sum(col("x").cast("decimal(25,10)")).cast("double") / count(lit(1))).as("d"),
        (gf.fp10ToDouble(sum(gf.fp10(col("x")))) / count(lit(1))).as("c"))
      assert(agg.where(col("d") =!= col("c")).count() === 0L)
    }
  }

  private def chainMessages(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("finishers fail loudly past the guard bound (r13 What's-wrong #1)") {
    // fp10: the decimal(18,0) dividend holds exactly |sum| <= 1e18 - 1. AT
    // the bound the finisher still emits the exact quotient; ONE unit past
    // it the old code silently NULL'd the mean — now it raises.
    val fpBound = 999999999999999999L
    val atBound = spark.range(1)
      .select(gf.fp10ToDouble(lit(fpBound)).as("m")).head().getDouble(0)
    assert(atBound === (BigDecimal(fpBound) / BigDecimal(10000000000L)).toDouble)
    val exFp = intercept[Exception] {
      spark.range(1).select(gf.fp10ToDouble(lit(fpBound) + lit(1L))).head()
    }
    assert(chainMessages(exFp).contains("gf.fp10 overflow"),
      s"expected a loud fp10 overflow, got: ${chainMessages(exFp)}")

    // moneySum: totals within 2^62 units pass through exactly; past the
    // documented headroom the finisher raises instead of flowing on.
    val mBound = 1L << 62
    val atMoneyBound = spark.range(1)
      .select(gf.centsToMoney(lit(mBound), 2).as("m")).head().getDouble(0)
    assert(atMoneyBound === (BigDecimal(mBound) / 100).toDouble)
    val exMoney = intercept[Exception] {
      spark.range(1).select(gf.centsToMoney(lit(mBound) + lit(1L), 2)).head()
    }
    assert(chainMessages(exMoney).contains("gf.moneySum overflow"),
      s"expected a loud moneySum overflow, got: ${chainMessages(exMoney)}")

    // negative side: the guard is two compares, not abs() — Long.MinValue
    // (abs() == itself, negative) must still fail loudly
    val exNeg = intercept[Exception] {
      spark.range(1).select(gf.fp10ToDouble(lit(Long.MinValue))).head()
    }
    assert(chainMessages(exNeg).contains("gf.fp10 overflow"))
  }
}
