package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Corpus operators: rollup stats, reproducible sampling, sequence packing. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.io.Tables.table(spark, sfDir, "documents")

  test("stats: rollup emits per-(lang,source), per-lang subtotal, and grand total") {
    val out = Corpus.stats(docs).collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_docs") === docs.count())
    val perLang = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(perLang.map(_.getAs[Long]("n_docs")).sum === docs.count())
  }

  test("deterministicSample: stable across runs and partition layouts, ~pct kept") {
    val a = Corpus.deterministicSample(docs, "doc_id", 20).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.deterministicSample(docs.repartition(7), "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    val n = docs.count().toDouble
    assert(a.size > n * 0.1 && a.size < n * 0.3, s"kept ${a.size} of $n")
    // pct=0 and pct=100 behave as empty / identity
    assert(Corpus.deterministicSample(docs, "doc_id", 0).count() === 0L)
    assert(Corpus.deterministicSample(docs, "doc_id", 100).count() === docs.count())
  }

  test("capPerStratum: every stratum capped, selection stable across layouts") {
    val capped = Corpus.capPerStratum(docs, "source", "doc_id", 10)
    val sizes = capped.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) <= 10))
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Corpus.capPerStratum(docs.repartition(5), "source", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // strata smaller than the cap keep everything
    val total = docs.groupBy("source").count().collect()
      .map(r => math.min(r.getLong(1), 10L)).sum
    assert(a.size.toLong === total)
  }

  test("packSequences: per-stratum token budget respected at the bin boundaries") {
    val packed = Corpus.packSequences(docs, "doc_id", "text", "source", 500)
    // tokens before a doc's bin = seq_id * budget <= cumulative tokens so far
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val check = packed
      .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("expected", floor(col("before") / 500))
      .where(col("seq_id") =!= col("expected"))
    assert(check.count() === 0L)
    // sequences are contiguous per stratum starting at 0
    val firsts = packed.groupBy("source").agg(min("seq_id").as("m")).collect()
    assert(firsts.forall(_.getLong(1) === 0L))
  }

  test("chunk: 32/24 windows cover every word; last chunk short") {
    val doc = (1L, (1 to 10).map(i => s"w$i").mkString(" "))
    val out = Corpus.chunk(Seq(doc).toDF("doc_id", "text"), "doc_id", "text",
        chunkWords = 4, strideWords = 3)
      .orderBy("chunk_idx").collect()
    // 10 words, window 4, stride 3 -> 1 + ceil((10-4)/3) = 3 chunks; the
    // window starting at 9 would be a pure suffix of chunk 2 and is not cut
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L))
    assert(out(0).getString(3) === "w1 w2 w3 w4")
    assert(out(2).getString(3) === "w7 w8 w9 w10")
    // exactly-chunk-sized and shorter docs yield one chunk
    assert(Corpus.chunk(Seq((3L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 4, 3).count() === 1L)
    // empty doc yields no chunks
    assert(Corpus.chunk(Seq((2L, "  ")).toDF("doc_id", "text"), "doc_id", "text", 4, 3).count() === 0L)
  }

  test("mixToTarget: exact integer caps, binding stratum, absent strata dropped") {
    val docs = ((1L to 100L).map(i => (i, "a")) ++ (101L to 130L).map(i => (i, "b")) ++
      (131L to 140L).map(i => (i, "c"))).toDF("id", "s")
    // weights a:3 b:1 (c unlisted -> dropped); W=4
    // N* = min(100*4/3, 30*4/1) = min(133, 120) = 120; caps: a 90, b 30
    val out = Corpus.mixToTarget(docs, "s", "id", Map("a" -> 3L, "b" -> 1L))
    val by = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by === Map("a" -> 90L, "b" -> 30L))
    // deterministic across partition layouts
    val ids1 = out.orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    val ids2 = Corpus.mixToTarget(docs.repartition(7), "s", "id", Map("a" -> 3L, "b" -> 1L))
      .orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids1 === ids2)
  }

  test("cleanPipeline: each doc lands in its first dropping stage") {
    import graft.functions.gf
    val all = Seq(
      1L -> "the cat sat on a mat of wool and the dog slept near a fire of warmth",
      2L -> "the sun rose over a hill of green and the birds sang a song of joy",
      3L -> "the old ship sailed across a sea of storms and the crew held a course of hope tonight",
      // 4 = exact dup of 2 (case/whitespace variant)
      4L -> "The  sun rose over a hill of green and the birds sang a song of joy",
      // 5 = near dup of 3 (one word changed: J = 17/19)
      5L -> "the old ship sailed across a sea of storms and the crew held a course of hope yesterday",
      6L -> "tiny doc",
      // 7 = near match of eval doc 10
      7L -> "a river ran through the valley of stone and a bridge stood over the water of time today",
      10L -> "a river ran through the valley of stone and a bridge stood over the water of time forever"
    ).toDF("doc_id", "text")
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    val evalSet = all.where(col("doc_id") % 10 === 0)
    val out = Corpus.cleanPipeline(corpus, evalSet, "text", "doc_id",
        gf.regroupLines(col("text"), 2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "kept", 2L -> "kept", 3L -> "kept",
      4L -> "exact_dup", 5L -> "near_dup", 6L -> "too_short",
      7L -> "contaminated"))
  }

  test("topNgrams: true multiplicities, deterministic tie-break, layout-stable") {
    val tiny = Seq(
      1L -> "a b c a b c a b",   // "a b c" x2, "b c a" x2, "c a b" x2, "a b" irrelevant (n=3)
      2L -> "a b c d",           // "a b c" +1, "b c d" +1
      3L -> "x y"                // shorter than n -> contributes nothing
    ).toDF("doc_id", "text")
    val out = Corpus.topNgrams(tiny, "text", n = 3, k = 3).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a b c", 3L), ("b c a", 2L), ("c a b", 2L)))
    // corpus run: layout-invariant and totals conserved vs a full count
    val a = Corpus.topNgrams(docs, "text", 3, 20).collect().toSeq
    val b = Corpus.topNgrams(docs.repartition(7), "text", 3, 20).collect().toSeq
    assert(a === b && a.length === 20)
  }

  test("quantiles: exact per-stratum percentiles; approx twin within rank error") {
    val exact = Corpus.quantiles(docs, "n_chars", "lang", Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy(asc_nulls_first("lang")).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val Seq(q25, q50, q75, q95) = (2 to 5).map(r.getDouble)
      assert(q25 <= q50 && q50 <= q75 && q75 <= q95)
    }
    // the approx twin's guarantee is on RANK, not value (it returns a real
    // order statistic, no interpolation): each approx quantile must lie
    // between the exact quantiles at p ± 0.1
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val lo = Corpus.quantiles(docs, "n_chars", "lang", ps.map(p => math.max(0.0, p - 0.1)))
      .orderBy(asc_nulls_first("lang")).collect()
    val hi = Corpus.quantiles(docs, "n_chars", "lang", ps.map(p => math.min(1.0, p + 0.1)))
      .orderBy(asc_nulls_first("lang")).collect()
    val approx = Corpus.quantilesApprox(docs, "n_chars", "lang", ps)
      .orderBy(asc_nulls_first("lang")).collect()
    exact.zip(approx).zipWithIndex.foreach { case ((e, a), row) =>
      assert(e.get(0) === a.get(0) && e.getLong(1) === a.getLong(1))
      (2 to 5).foreach { i =>
        val (l, h, v) = (lo(row).getDouble(i), hi(row).getDouble(i), a.getDouble(i))
        assert(l <= v && v <= h, s"q$i for stratum ${e.get(0)}: $v outside [$l, $h]")
      }
    }
  }

  test("dupeProfile: exact rates from a duplicated frame; HLL twin within rsd") {
    // 10 distinct texts in source s1, each x3; 5 distinct in s2, each x1
    val dup = ((1 to 30).map(i => (i.toLong, s"text number ${i % 10}", "s1")) ++
      (31 to 35).map(i => (i.toLong, s"unique $i", "s2")))
      .toDF("doc_id", "text", "source")
    val out = Corpus.dupeProfile(dup, "text", "source").orderBy("source").collect()
    assert(out(0).toSeq === Seq("s1", 30L, 10L, 0.6667))
    assert(out(1).toSeq === Seq("s2", 5L, 5L, 0.0))
    val approx = Corpus.dupeProfileApprox(docs, "text", "source", rsd = 0.02)
      .orderBy(asc_nulls_first("source")).collect()
    val ex = Corpus.dupeProfile(docs, "text", "source")
      .orderBy(asc_nulls_first("source")).collect()
    ex.zip(approx).foreach { case (e, a) =>
      assert(e.get(0) === a.get(0) && e.getLong(1) === a.getLong(1))
      val (de, da) = (e.getLong(2).toDouble, a.getLong(2).toDouble)
      assert(math.abs(de - da) <= 0.06 * de, s"distinct for ${e.get(0)}: exact $de approx $da")
    }
  }

  test("split: total coverage, cut-point agreement with sampleBucket, and layout independence") {
    val out = Corpus.assignSplits(docs, "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("split"),
        Corpus.sampleBucket(col("doc_id")).as("b"))
      .collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      val expected =
        if (r.getLong(2) < 80) "train" else if (r.getLong(2) < 90) "val" else "test"
      assert(r.getString(1) === expected, s"doc ${r.getLong(0)} bucket ${r.getLong(2)}")
    }
    // same assignment under a different partition layout (pure id function)
    val again = Corpus.assignSplits(docs.repartition(7), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach(r => assert(again(r.getLong(0)) === r.getString(1)))
  }

  test("topFractionPerStratum: ceil cut per stratum, kept scores dominate, layout-stable") {
    val df = ((1L to 10L).map(i => (i, "a", i)) ++ (11L to 13L).map(i => (i, "b", i)))
      .toDF("id", "s", "score")
    val out = Corpus.topFractionPerStratum(df, "s", "id", "score", fracPct = 30)
    val by = out.collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // stratum a: ceil(10*0.3)=3 kept, the top scores 8,9,10; b: ceil(3*0.3)=1, score 13
    assert(by.count(_._1 == "a") === 3)
    assert(by.filter(_._1 == "a").map(_._3).sorted.toSeq === Seq(8L, 9L, 10L))
    assert(by.filter(_._1 == "b").map(_._3).toSeq === Seq(13L))
    // deterministic under a different layout (hash tie-break, no rand)
    val again = Corpus.topFractionPerStratum(df.repartition(5), "s", "id", "score", 30)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === by.map(_._2).toSet)
    intercept[IllegalArgumentException] {
      Corpus.topFractionPerStratum(df, "s", "id", "score", 0)
    }
  }

  test("split: rejects cuts that do not sum to 100 or are non-positive") {
    intercept[IllegalArgumentException] {
      Corpus.assignSplits(docs, "doc_id", Seq("train" -> 80, "test" -> 10))
    }
    intercept[IllegalArgumentException] {
      Corpus.assignSplits(docs, "doc_id", Seq("train" -> 100, "test" -> 0))
    }
  }

  test("shards: cover all rows, roughly balanced, layout-independent, seed varies order") {
    val out = Corpus.assignShards(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard", "sort_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.length === docs.count())
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((0 until 8).toSet))
    // md5 buckets are near-uniform: no shard over 3x the fair share
    assert(sizes.values.max <= 3 * out.length / 8)
    // pure function of (seed, id): identical under any partition layout
    val again = Corpus.assignShards(docs.repartition(7), "doc_id", nShards = 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(again === out.map(t => (t._1, t._2)).toMap)
    // a different seed reshuffles: the induced order must differ
    val orderA = out.sortBy(_._3).map(_._1).toSeq
    val orderB = Corpus.assignShards(docs, "doc_id", 8, seed = "epoch2")
      .select("doc_id", "sort_key").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._2).map(_._1).toSeq
    assert(orderA !== orderB)
    assert(orderA.toSet === orderB.toSet)
    // narrow map: no Exchange in the plan
    val plan = Corpus.assignShards(docs, "doc_id", 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignShards must not shuffle:\n$plan")
    intercept[IllegalArgumentException](Corpus.assignShards(docs, "doc_id", 0))
  }

  test("weightedSample: acceptance tracks the weight, exact and layout-independent") {
    val df = spark.range(0, 20000).toDF("id")
      .withColumn("w", (col("id") % 3 * 5000).cast("long")) // weights 0, 5000, 10000
    val kept = Corpus.weightedSample(df, "id", "w", den = 10000)
    val byW = kept.groupBy("w").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!byW.contains(0L)) // weight 0 keeps nothing
    assert(byW(10000L) > 6600) // weight >= den keeps everything (6667 rows)
    val half = byW(5000L).toDouble / 6667.0
    assert(half > 0.4 && half < 0.6, s"p=0.5 weight kept $half")
    // exact reproducibility across layouts
    val again = Corpus.weightedSample(df.repartition(7), "id", "w", den = 10000)
      .orderBy("id").collect()
    assert(kept.orderBy("id").collect().sameElements(again))
    // narrow map; integral weights enforced
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weightedSample must not shuffle:\n$plan")
    intercept[IllegalArgumentException](
      Corpus.weightedSample(df.withColumn("w", col("w").cast("double")), "id", "w", 10000))
  }

  test("cooccurrencePmi: hand-computed PMI on a tiny corpus, layout-independent") {
    // "new york" always adjacent (3x); "the cat" 2x but 'the' is everywhere
    val df = Seq(
      "new york is big the cat sat",
      "i like new york the cat slept",
      "new york the end the start").toDF("text")
    val out = Corpus.cooccurrencePmi(df, "text", k = 10, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    val t = 20.0 // total tokens
    val b = 17.0 // total bigrams (3 docs: 6+6+5)
    val ny = math.rint(math.log(3.0 * t * t / (b * 3.0 * 3.0)) * 1e6) / 1e6
    val tc = math.rint(math.log(2.0 * t * t / (b * 4.0 * 2.0)) * 1e6) / 1e6
    assert(out.exists { case (bg, c, p) => bg == "new york" && c == 3L && math.abs(p - ny) < 1e-9 })
    assert(out.exists { case (bg, c, p) => bg == "the cat" && c == 2L && math.abs(p - tc) < 1e-9 })
    // always-together rare pair scores above the common-word pair
    assert(ny > tc)
    // sorted by (pmi desc, bigram asc)
    assert(out === out.sortBy { case (bg, _, p) => (-p, bg) })
    val again = Corpus.cooccurrencePmi(df.repartition(5), "text", k = 10, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(again === out)
  }
  test("temperatureSample flattens the group distribution toward the tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 425).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val kept = graft.ops.Corpus.temperatureSample(df, "doc_id", "lang", budgetPct = 50)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigRate = kept.getOrElse("big", 0L).toDouble / 400
    val smallRate = kept.getOrElse("small", 0L).toDouble / 25
    // alpha = 0.5: the tail group's keep rate must exceed the head's
    assert(smallRate > bigRate,
      s"small rate $smallRate should exceed big rate $bigRate")
    // budget is approximate (per-row md5 acceptance) but must be in range
    val total = kept.values.sum
    assert(total > 100 && total < 350, s"total $total far from the 212 target")
    // determinism: identical keep set on a different partition layout
    val again = graft.ops.Corpus.temperatureSample(df.repartition(7), "doc_id", "lang", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = graft.ops.Corpus.temperatureSample(df, "doc_id", "lang", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === first)
    intercept[IllegalArgumentException] {
      graft.ops.Corpus.temperatureSample(df, "doc_id", "lang", 0)
    }
  }

  test("bpeTrain: hand-computed merges, greedy-left grouping, early exhaustion") {
    import spark.implicits._
    // words: "abab" x2, "ab" x1 -> pair (a,b) count 5, then (ab,ab) count 2
    val df = Seq("abab abab", "ab").toDF("text")
    val got = Corpus.bpeTrain(df, "text", merges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, "a b", "ab", 5L), (2L, "ab ab", "abab", 2L)))
    // greedy-left: 'aaa' merges (a,a) twice -> 'aa a', then (aa,a)
    val g = Corpus.bpeTrain(Seq("aaa").toDF("text"), "text", merges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(g === Seq((1L, "a a", "aa", 2L), (2L, "aa a", "aaa", 1L)))
    // layout independence
    val a = Corpus.bpeTrain(docs, "text", merges = 4).collect().map(_.toSeq).toSeq
    val b = Corpus.bpeTrain(docs.repartition(9), "text", merges = 4).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("bpeTokenize: per-doc counts under trained merges on a hand corpus") {
    import spark.implicits._
    // merges learned: (a,b)->ab then (ab,ab)->abab; both words collapse
    // to single symbols, so token count = word count
    val df = Seq((1L, "abab abab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Corpus.bpeTokenize(df, "text", "doc_id", merges = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (2L, 1L, 1L)))
    // one merge only: "abab" = [ab, a, b] -> wait, greedy merges BOTH (a,b)
    // pairs: [ab, ab] = 2 symbols; "ab" = 1
    val one = Corpus.bpeTokenize(df, "text", "doc_id", merges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one === Set((1L, 2L, 4L), (2L, 1L, 1L)))
  }

  test("heavyHitters: exact at capacity >= vocab, layout-independent") {
    val exact = docs.where(col("text").isNotNull)
      .select(explode(graft.functions.gf.ngramsAll(col("text"), 1)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = Corpus.heavyHitters(docs, "text", capacity = 256, k = exact.size + 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === exact)
    val hh2 = Corpus.heavyHitters(docs.repartition(11), "text", capacity = 256, k = exact.size + 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh2 === exact)
  }

  test("heavyHitters: under capacity every count under-estimates by <= n/(c+1)") {
    val exact = docs.where(col("text").isNotNull)
      .select(explode(graft.functions.gf.ngramsAll(col("text"), 1)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 8 // vocabulary is 31 words — forces the decrement path
    val hh = Corpus.heavyHitters(docs, "text", capacity = cap, k = cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.nonEmpty && hh.size <= cap)
    val bound = n / (cap + 1)
    hh.foreach { case (w, est) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est <= truth, s"$w: est $est exceeds true $truth")
      assert(est >= truth - bound, s"$w: est $est below true $truth - bound $bound")
    }
    // any item with true count above the bound is guaranteed present
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(hh.contains(w), s"guaranteed heavy hitter $w missing")
    }
  }

  test("overlap: exact counts and estimate on a constructed corpus") {
    // A = {1..60}, B = {41..100}: inter 20, union 100, J = 0.2
    val a = (1 to 60).map(i => (i.toLong, s"content-$i")).toDF("doc_id", "text")
    val b = (41 to 100).map(i => (i.toLong, s"content-$i")).toDF("doc_id", "text")
    val r = Corpus.overlap(a, b, "text", k = 64).collect().head
    assert(r.getAs[Long]("n_a") === 60L)
    assert(r.getAs[Long]("n_b") === 60L)
    assert(r.getAs[Long]("n_inter") === 20L)
    assert(r.getAs[Double]("jaccard_exact") === 0.2)
    val est = r.getAs[Double]("jaccard_est")
    // k=64 MinHash: std ~ sqrt(J(1-J)/k) ~ 0.05; allow 4 sigma
    assert(math.abs(est - 0.2) < 0.2, s"estimate $est far from 0.2")
    // layout independence: the estimate is md5-deterministic
    val r2 = Corpus.overlap(a.repartition(7), b.repartition(3), "text", k = 64).collect().head
    assert(r2.getAs[Double]("jaccard_est") === est)
    // disjoint corpora: zero everywhere
    val d = Corpus.overlap(a, a.withColumn("text", concat(col("text"), lit("-x"))), "text", 32)
      .collect().head
    assert(d.getAs[Long]("n_inter") === 0L)
    assert(d.getAs[Double]("jaccard_exact") === 0.0)
    assert(d.getAs[Double]("jaccard_est") === 0.0)
  }
}
