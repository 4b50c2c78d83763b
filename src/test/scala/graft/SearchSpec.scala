package graft

import graft.ops.Search

/** BM25 keyword retrieval. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores and ordering on a tiny corpus") {
    val df = Seq(
      (1L, "spark spark join"),
      (2L, "join window filter"),
      (3L, "nothing here at all")).toDF("doc_id", "text")
    val out = Search.bm25(df, "text", "doc_id", Seq("spark", "join"), k = 10).collect()

    // recompute with the same formula: N=3, dl=(3,3,4), avgdl=10/3,
    // df(spark)=1, df(join)=2
    val n = 3.0; val avgdl = 10.0 / 3.0
    def term(tf: Double, df: Double, dl: Double): Double =
      if (tf == 0) 0.0
      else math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp1 = BigDecimal(term(2, 1, 3) + term(1, 2, 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(term(0, 1, 3) + term(1, 2, 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 3 matches nothing -> excluded; doc 1 outranks doc 2
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getDouble(1) === exp1)
    assert(out(1).getDouble(1) === exp2)
  }

  test("bm25: k bounds the result and ordering is (score desc, id asc)") {
    val df = (1L to 30L).map(i => (i, ("join " * i.toInt).trim)).toDF("doc_id", "text")
    val out = Search.bm25(df, "text", "doc_id", Seq("join"), k = 5).collect()
    assert(out.length === 5)
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // equal scores tie-break by id ascending
    val dup = Seq((10L, "alpha join beta"), (2L, "alpha join beta"), (5L, "no match"))
      .toDF("doc_id", "text")
    val tied = Search.bm25(dup, "text", "doc_id", Seq("join"), k = 10).collect()
    assert(tied.map(_.getLong(0)).toSeq === Seq(2L, 10L))
  }

  test("bm25: rejects an empty term list") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Search.bm25(df, "text", "doc_id", Seq.empty) }
  }
}
