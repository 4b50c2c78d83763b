package graft

import graft.ops.Fuzzy
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join: the prefix-filtered plan's contract is exact
  * equality with the brute-force all-pairs twin (recall 1 by the
  * prefix-filter lemma — candidate pruning must be invisible). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String, Int)] =
    df.select("a_str", "b_str", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("fuzzyJoin finds known near-matches and respects the threshold") {
    val df = Seq(
      (1L, "kitten"), (2L, "sitting"), (3L, "mitten"), (4L, "kitchen"),
      (5L, "apple"), (6L, "apples")).toDF("id", "s")
    val got = pairs(Fuzzy.fuzzyJoin(df, "id", "s", tau = 2))
    assert(got.contains(("kitten", "mitten", 1)))   // substitution
    assert(got.contains(("apple", "apples", 1)))    // insertion
    assert(got.contains(("kitten", "kitchen", 2)))  // two edits
    // kitten->sitting is distance 3: past tau, must be absent
    assert(!got.exists(p => p._1 == "kitten" && p._2 == "sitting"))
  }

  test("prefix-filtered join equals brute force on the part dictionary") {
    val names = graft.io.Tables.table(spark, sfDir, "part")
      .select(col("p_name")).distinct()
    val fast = pairs(Fuzzy.fuzzyJoin(names, "p_name", "p_name", tau = 2))
    val exact = pairs(Fuzzy.fuzzyJoinExact(names, "p_name", "p_name", tau = 2))
    assert(fast === exact)
    assert(exact.nonEmpty) // the color-word dictionary has near-pairs
  }

  test("short strings (below the prefix guarantee) are still matched") {
    // length <= q*(tau+1)-1 = 5 at q=2, tau=2 — including zero-gram 1-char
    val df = Seq((1L, "ab"), (2L, "cd"), (3L, "abc"), (4L, "a"), (5L, "xbc"))
      .toDF("id", "s")
    val got = pairs(Fuzzy.fuzzyJoin(df, "id", "s", tau = 2))
    val exact = pairs(Fuzzy.fuzzyJoinExact(df, "id", "s", tau = 2))
    assert(got === exact)
    assert(got.contains(("ab", "cd", 2)))  // no shared gram at all
    assert(got.contains(("abc", "xbc", 1)))
    assert(got.contains(("abc", "a", 2)))  // zero-gram string matched (id 3 < 4)
  }

  test("prefix filter equals brute force on seeded random small-alphabet strings") {
    // dense near-miss space: alphabet of 3, lengths 1..9 straddle the
    // short-string bound (5 at q=2,tau=2), many true pairs at every edge
    // class (prefix-vs-short, insert/delete/substitute)
    val rnd = new scala.util.Random(42)
    val strings = (1L to 150L).map { i =>
      val len = 1 + rnd.nextInt(9)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = spark.createDataFrame(strings).toDF("id", "s")
    def idPairs(d: org.apache.spark.sql.DataFrame) =
      d.select("a_id", "b_id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (tau <- Seq(1, 2)) {
      val fast = idPairs(Fuzzy.fuzzyJoin(df, "id", "s", tau))
      val exact = idPairs(Fuzzy.fuzzyJoinExact(df, "id", "s", tau))
      assert(fast === exact, s"prefix filter diverged from brute force at tau=$tau")
      assert(exact.nonEmpty)
    }
  }

  test("fuzzyJoinAgainst matches probes to the dictionary, dist 0 included") {
    import spark.implicits._
    val dict = Seq((1L, "kitten"), (2L, "mitten"), (3L, "ab"), (4L, "zzzzzz"))
      .toDF("id", "s")
    val probes = Seq((100L, "kitten"), (101L, "cd"), (102L, "sitting"))
      .toDF("id", "s")
    val got = Fuzzy.fuzzyJoinAgainst(dict, probes, "id", "s", tau = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got === Set(
      (100L, 1L, 0), // exact dictionary hit
      (100L, 2L, 1), // near dictionary hit
      (101L, 3L, 2))) // short-short cross pair, no shared gram
  }

  test("fuzzyJoinAgainst equals the brute-force cross twin on random strings") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int, base: Long) = (1 to n).map { i =>
      val len = 1 + rnd.nextInt(8)
      (base + i, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val dict = spark.createDataFrame(gen(80, 0L)).toDF("id", "s")
    val probes = spark.createDataFrame(gen(40, 1000L)).toDF("id", "s")
    val got = Fuzzy.fuzzyJoinAgainst(dict, probes, "id", "s", tau = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    import org.apache.spark.sql.functions._
    val want = probes.as("p").join(dict.as("d"),
        abs(length(col("p.s")) - length(col("d.s"))) <= 2)
      .withColumn("dist", levenshtein(col("p.s"), col("d.s"), 2))
      .filter(col("dist") >= 0)
      .select(col("p.id"), col("d.id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("fuzzyJoin validates parameters and ignores null strings") {
    val df = Seq((1L, "abc"), (2L, null: String)).toDF("id", "s")
    intercept[IllegalArgumentException] { Fuzzy.fuzzyJoin(df, "id", "s", tau = 0) }
    intercept[IllegalArgumentException] { Fuzzy.fuzzyJoin(df, "id", "s", tau = 1, q = 1) }
    assert(Fuzzy.fuzzyJoin(df, "id", "s", tau = 2).count() === 0L)
  }
}
