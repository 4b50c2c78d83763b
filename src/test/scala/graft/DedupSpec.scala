package graft

import graft.functions.{gf, Kernels}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.io.Tables.documents(spark, sfDir)

  test("exact: whitespace/case variants collapse to one content key") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id").orderBy("keeper_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 1L && out(0).getLong(2) === 2L)
  }

  test("ngramJaccard: near-identical pair found, disjoint pair not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again yesterday"),
      (3L, "completely different content with no shared shingles at all ok")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minhashLsh: recovers the exact-jaccard pair set on sf0.001 documents") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 128, 32, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH estimates sim by signature agreement: demand high recall and that
    // every extra pair is a near-threshold estimate, not garbage
    val recall = (exact & lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"LSH recall $recall too low (${exact.size} exact, ${lsh.size} lsh)")
    assert(lsh.size <= exact.size + 5, "LSH emitted implausibly many extra pairs")
  }

  test("simhash pairs = brute-force hamming<=3 pairs (banding is complete)") {
    val fps = docs.select(col("doc_id"), gf.simhash64(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, fpa) <- fps; (idb, fpb) <- fps
      if ida < idb && java.lang.Long.bitCount(fpa ^ fpb) <= 3
    } yield (ida, idb)).toSet
    val banded = Dedup.simhashPairs(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
  }

  test("embeddingPairs threshold behaves like a filter on exact cosine") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4).count()
    val loose = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.3).count()
    assert(pairs <= loose)
  }

  test("embeddingPairsLsh: subset of exact pairs with useful recall") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.35, bits = 6, tables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // exact-cosine verify: no false positives
    assert(exact.isEmpty || (exact & lsh).size.toDouble / exact.size >= 0.5,
      s"recall ${(exact & lsh).size}/${exact.size}")
  }

  test("simhashPairsCanonical equals naive simhashPairs (incl. exact-duplicate groups)") {
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    // add exact duplicates so fingerprint groups have >1 member
    val dups = docs.limit(5).withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = docs.unionByName(dups)
    val naive = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val canonical = Dedup.simhashPairsCanonical(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(canonical === naive)
    assert(canonical.nonEmpty) // the planted duplicates guarantee pairs
  }

  test("nearDupPipeline: replicated corpus collapses to one keeper per content cluster") {
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    // 3 exact replicas of every doc — the pipeline must keep exactly the
    // min-id copy of each near-dup cluster
    val replicated = (0 until 3).map(r =>
      docs.withColumn("doc_id", col("doc_id") + lit(r * 1000000L))).reduce(_ unionByName _)
    val deduped = Dedup.nearDupPipeline(replicated, "text", "doc_id")
    val direct = Dedup.dropNearDuplicates(replicated,
      Dedup.minhashLshPairsVerified(replicated, "text", "doc_id"), "doc_id")
    assert(deduped.count() === direct.count())
    // every surviving doc is an original (min-id replica), and at most one
    // per content survives
    val ids = deduped.select("doc_id").collect().map(_.getLong(0))
    assert(ids.forall(_ < 1000000L))
    assert(deduped.count() <= docs.count())
  }

  test("decontaminate drops exact and near eval matches, keeps everything else") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about streaming joins"),
      (3L, "completely unrelated text concerning window functions")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (7L, "the quick brown fox jumps over the lazy dog today"),        // exact match of 1
      (8L, "an entirely different document about streaming joins now")  // near match of 2
    ).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(3L))
  }

  test("decontaminate rep-fetch canonicalization (variant B) equals the " +
      "single-shuffle path (variant A) for plain and bloom variants") {
    val corpus = (0L until 60L).map { i =>
      val base = s"document number ${i % 20} with shared structural words and tail $i"
      (i, if (i % 3 == 0) base.replace(s"tail $i", "tail shared") else base)
    }.toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "document number 7 with shared structural words and tail shared"),
      (101L, "totally absent from the corpus in every shingle dimension")
    ).toDF("doc_id", "text")
    def withMode[T](mode: String)(f: => T): T = {
      spark.conf.set("spark.graft.dedup.repFetch", mode)
      try f finally spark.conf.unset("spark.graft.dedup.repFetch")
    }
    val keptB = withMode("on")(
      Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    val keptA = withMode("off")(
      Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(keptB === keptA)
    val bloomB = withMode("on")(
      Dedup.decontaminateBloom(corpus, evalSet, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    val bloomA = withMode("off")(
      Dedup.decontaminateBloom(corpus, evalSet, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(bloomB === bloomA)
    assert(bloomB === keptB)
  }

  test("null texts never pair: canonical paths match the naive paths' empty output") {
    val docs = Seq((1L, "some real document text here"), (2L, null), (3L, null), (4L, null))
      .toDF("doc_id", "text")
    // naive simhash emits nothing for nulls; canonical must not invent a null group
    assert(Dedup.simhashPairs(docs, "text", "doc_id").count() === 0L)
    assert(Dedup.simhashPairsCanonical(docs, "text", "doc_id").count() === 0L)
    assert(Dedup.minhashLshPairsVerified(docs, "text", "doc_id").count() === 0L)
  }

  test("connectedComponents: multi-hop chains collapse to the min id (multiple iterations)") {
    // chain 1-2-3-4-5 (needs propagation over 4 hops), plus clique {10,11,12}
    // and isolated pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comps(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(comps(_) === 10L))
    assert(Seq(20L, 21L).forall(comps(_) === 20L))
    assert(comps.size === 10)
  }

  test("connectedComponentsStar: long chain where min-label refuses; agreement on cliques") {
    // a 60-node path: diameter 59 >> the min-label default bound of 20
    val path = (0L until 59L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(path).collect()
    }
    val comps = Dedup.connectedComponentsStar(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps.size === 60)
    assert(comps.values.toSet === Set(0L)) // one component, min id 0
    // on the clique-shaped graphs dedup produces, both formulations agree
    val cliques = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("a_id", "b_id")
    val minLabel = Dedup.connectedComponents(cliques)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = Dedup.connectedComponentsStar(cliques)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star === minLabel)
  }

  test("dropBoilerplateLines: global hot lines removed, order preserved") {
    val docs = Seq(
      (1L, "keep one\ncookie banner\nkeep two"),
      (2L, "cookie banner\nunique line"),
      (3L, "cookie banner\nanother one"),
      (4L, "cookie banner")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "text", "doc_id", minDocs = 3)
      .orderBy("doc_id")
      .collect()
    // "cookie banner" is in 4 >= 3 distinct docs -> dropped everywhere
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq === Seq(
      (1L, 3L, 2L, 1L), (2L, 2L, 1L, 1L), (3L, 2L, 1L, 1L), (4L, 1L, 0L, 1L)))
    // reassembly keeps original order and returns the cleaned TEXT (the
    // operator's product is a cleaned corpus, not a fingerprint of one)
    val cleaned = out.map(_.getString(4)).toSeq
    assert(cleaned(0) === "keep one\nkeep two")
    assert(cleaned(3) === "")
  }

  test("dropBoilerplateLines: near-threshold lines survive; dup lines in ONE doc count once") {
    // "maybe hot" appears twice in doc 1 but only in 2 distinct docs -> kept
    val docs = Seq(
      (1L, "maybe hot\nmaybe hot"),
      (2L, "maybe hot"),
      (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "text", "doc_id", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(3) == 0L)) // nothing dropped
  }

  test("semdedup (trained): planted within-cluster near-dups dropped, keepers kept") {
    // three orthogonal-ish groups; ids 1/2 near-identical, 3 distinct
    def v(x: Float, y: Float, z: Float, w: Float) = Array(x, y, z, w)
    val emb = Seq(
      (1L, v(1f, 0.01f, 0f, 0f)), (2L, v(1f, 0.02f, 0f, 0f)), (3L, v(0.5f, 0.8f, 0f, 0.3f)),
      (4L, v(0f, 1f, 0.01f, 0f)), (5L, v(0f, 0f, 1f, 0.01f)), (6L, v(0.01f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semdedup(emb, "vec_id", "embedding", k = 3, minCos = 0.95, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L), "min-id keeper rule within the near-dup pair")
    assert(out(5L) && !out(6L))
    assert(out(3L) && out(4L), "sub-threshold cluster-mates both kept")
  }

  test("semdedup: dropped ids are sound vs exact pairs and output is layout-independent") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val out = Dedup.semdedup(emb, "vec_id", "embedding", k = 8, minCos = 0.4, iters = 2)
    val rows = out.orderBy("vec_id").collect()
    assert(rows.length === emb.count())
    // soundness: every dropped id really has a >=minCos partner globally
    val dropped = rows.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    val inExact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(dropped.subsetOf(inExact))
    // determinism: identical decisions under a different partition layout
    val again = Dedup.semdedup(emb.repartition(7), "vec_id", "embedding",
      k = 8, minCos = 0.4, iters = 2).orderBy("vec_id").collect()
    assert(rows.sameElements(again))
  }

  test("duplicatedSpans: shared run across two docs merges into one maximal span each") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"$shared seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "text", "doc_id", k = 5, minOcc = 2)
      .orderBy("doc_id").collect()
    assert(spans.length === 2)
    // doc 1: the shared 6 words sit at positions 3..8 -> dup 5-grams at 3
    // and 4 -> one span [3, 9)
    assert(spans(0).getLong(0) === 1L)
    assert((spans(0).getInt(1), spans(0).getInt(2), spans(0).getInt(3)) === ((3, 9, 6)))
    // doc 2: shared prefix -> span [0, 6)
    assert((spans(1).getInt(1), spans(1).getInt(2), spans(1).getInt(3)) === ((0, 6, 6)))
  }

  test("duplicatedSpans: self-repetition inside one doc counts; touching spans merge") {
    // p..u repeated: dup 5-grams at 0,1 (first copy) and 6,7 (second);
    // hit 1 covers [1,6), hit 6 covers [6,11) — touching, so one span
    val df = Seq((1L, "p q r s t u p q r s t u")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "text", "doc_id", k = 5, minOcc = 2).collect()
    assert(spans.length === 1)
    assert((spans(0).getInt(1), spans(0).getInt(2), spans(0).getInt(3)) === ((0, 12, 12)))
  }

  test("duplicatedSpans: disjoint duplicated regions stay separate spans") {
    val a = "red orange yellow green blue"          // 5 words, one 5-gram
    val b = "cat dog bird fish mouse"
    val df = Seq(
      (1L, s"$a zz1 zz2 zz3 zz4 zz5 zz6 $b"),
      (2L, s"$a yy1 yy2 yy3 yy4 yy5 yy6 $b")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "text", "doc_id", k = 5, minOcc = 2)
      .where(col("doc_id") === 1L).orderBy("span_start").collect()
    // doc 1: dup 5-gram at 0 (span [0,5)) and at 11 (span [11,16)); the
    // gap of 6 unique words keeps them apart (11 - 0 > 5)
    assert(spans.length === 2)
    assert((spans(0).getInt(1), spans(0).getInt(2)) === ((0, 5)))
    assert((spans(1).getInt(1), spans(1).getInt(2)) === ((11, 16)))
  }

  test("removeDuplicatedSpans: duplicated words dropped, case preserved, counts consistent") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"One Two three $shared Four five six"),
      (2L, s"$shared seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, "text", "doc_id", k = 5, minOcc = 2)
      .orderBy("doc_id").collect()
    // doc 1: span [3, 9) drops the shared run, original case kept elsewhere
    assert(out(0).getLong(1) === 12L && out(0).getLong(2) === 6L)
    assert(out(0).getString(3) === "One Two three Four five six")
    // doc 2: span [0, 6)
    assert(out(1).getString(3) === "seven eight nine ten eleven twelve")
    // a doc with no duplicated spans passes through (normalized spacing)
    val solo = Seq((1L, "only  one doc\there")).toDF("doc_id", "text")
    val keep = Dedup.removeDuplicatedSpans(solo, "text", "doc_id").collect()
    assert(keep(0).getString(3) === "only one doc here")
    assert(keep(0).getLong(1) === 4L && keep(0).getLong(2) === 4L)
  }

  test("decontaminateReport: pairs match decontaminate's drop set; jaccard sane") {
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val report = Dedup.decontaminateReport(corpus, evalSet, "text", "doc_id").collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0)
      assert(r.getLong(0) % 10 !== 0L)
      assert(r.getLong(1) % 10 === 0L)
    }
    // the documents the report names are exactly those decontaminate drops
    val reported = report.map(_.getLong(0)).toSet
    val kept = Dedup.decontaminateBloom(corpus, evalSet, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reported === (all -- kept))
  }

  test("decontaminateNgram: catches containment the Jaccard threshold misses") {
    val evalSentence = "what is the capital of france the answer is paris"  // 10 words
    val evalSet = Seq((100L, evalSentence)).toDF("doc_id", "text")
    val filler = (1 to 80).map(i => s"filler$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $evalSentence"),              // eval QUOTED inside a long doc
      (2L, s"$filler entirely unrelated tail"),    // clean
      (3L, evalSentence)                            // exact eval copy
    ).toDF("doc_id", "text")

    // Jaccard view: doc 1 shares 8 of ~88 shingles with eval -> J ~ 0.09,
    // far below the 0.5 threshold — the band-join variant KEEPS the leak
    val keptJ = Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptJ === Set(1L, 2L), "Jaccard decontamination keeps the containment leak (by design)")

    // n-gram collision view: doc 1 shares every 8-gram of the eval
    // sentence -> dropped; doc 2 shares none -> kept
    val keptN = Dedup.decontaminateNgram(corpus, evalSet, "text", "doc_id", n = 8, minHits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptN === Set(2L))

    // minHits raises the bar: a 10-word quote has exactly 3 distinct
    // 8-grams, so minHits = 4 keeps every doc here (even the exact copy —
    // its whole content is those same 3 n-grams), and minHits = 3 drops
    // the quoting doc and the copy alike
    val keptHi = Dedup.decontaminateNgram(corpus, evalSet, "text", "doc_id", n = 8, minHits = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptHi === Set(1L, 2L, 3L))
    val keptAt3 = Dedup.decontaminateNgram(corpus, evalSet, "text", "doc_id", n = 8, minHits = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAt3 === Set(2L))
  }

  test("decontaminateBloom: output equals the band-join decontaminate exactly") {
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val banded = Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Dedup.decontaminateBloom(corpus, evalSet, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sound on ANY data: Bloom candidacy has recall exactly 1, so its drop
    // set contains the band variant's (MinHash banding at 32 bands x 4 rows
    // can miss a pair sitting right at J = 0.5) — kept sets go the other way
    assert(bloomed.subsetOf(banded),
      "Bloom (recall 1) must never keep a doc the band join drops")
    // on THIS fixture the contaminated pairs sit well above the threshold
    // (mostly exact/near-exact eval copies), where 32x4 banding recall is
    // ~1 - (1 - J^4)^32 ≈ 1 — so the two variants agree exactly; with
    // near-threshold pairs only the subset relation above is guaranteed
    assert(banded === bloomed)
    assert(bloomed.size < corpus.count(), "the eval slice's near-matches must drop something")
  }

  test("clusterEmbeddings: matches semdedup assignment; sizes partition the corpus") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val cl = Dedup.clusterEmbeddings(emb, "vec_id", "embedding", k = 8)
    val byId = cl.collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val sem = Dedup.semdedup(emb, "vec_id", "embedding", k = 8, minCos = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(byId.view.mapValues(_._1).toMap === sem)
    // cluster_size is consistent per cluster and sums to the corpus size
    val sizes = byId.values.groupBy(_._1).map { case (c, vs) =>
      assert(vs.map(_._2).toSet.size === 1, s"cluster $c has inconsistent sizes")
      (c, vs.head._2)
    }
    assert(sizes.values.sum === byId.size)
    val counted = byId.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(sizes === counted)
  }

  test("clusterEmbeddings: trained path (iters>0) deterministic across partition layouts") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val a = Dedup.clusterEmbeddings(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("vec_id").collect()
    val b = Dedup.clusterEmbeddings(emb.repartition(7), "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("vec_id").collect()
    assert(a.sameElements(b))
  }

  // ----- persistent incremental-dedup index -----

  private def fpSet(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Set[Long])] =
    df.select(col("doc_id").cast("long"),
        graft.ops.TextAnalysis.fingerprint(col("text")),
        gf.shingleFpsSorted(col("text"), 3))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Long](2).toSet))
      .toMap

  test("dedupIndexProbe: verdicts equal the brute-force delta-vs-corpus truth") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val delta = docs.where(col("doc_id") % 10 === 0)
    Dedup.dedupIndexBuild(corpus, "text", "doc_id", "graft_dedup_idx_spec")
    val out = Dedup.dedupIndexProbe(delta, "text", "doc_id", "graft_dedup_idx_spec")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap
    val c = fpSet(corpus)
    val d = fpSet(delta)
    assert(out.keySet === d.keySet)
    d.foreach { case (id, (key, shl)) =>
      val exactIds = c.collect { case (cid, (ck, _)) if ck == key => cid }
      val jac = c.view.mapValues { case (_, cs) =>
        val shared = (shl & cs).size
        if (shl.isEmpty || cs.isEmpty) 0.0
        else shared.toDouble / (shl.size + cs.size - shared)
      }.filter(_._2 >= 0.5)
      val (st, m, j) = out(id)
      if (exactIds.nonEmpty) {
        assert(st === "exact" && m === exactIds.min && j === 1.0, s"doc $id")
      } else if (jac.nonEmpty) {
        val mm = jac.keys.min
        assert(st === "near" && m === mm, s"doc $id")
        assert(math.abs(j - jac(mm)) < 5e-5, s"doc $id jaccard $j vs ${jac(mm)}")
      } else assert(st === "new" && m === -1L, s"doc $id")
    }
  }

  test("dedupIndexProbe: saturated shingle space flips to the broadcast-probe " +
      "kernel path; verdicts still equal brute force") {
    // a 4-word vocabulary saturates the trigram space, so every delta fp
    // collides with most of the corpus — Σ df over the delta prefix blows
    // past 16x corpus size and the adaptive candidacy must take the
    // CSR-kernel scan instead of the inverted-index join
    val vocab = Array("alpha", "beta", "gamma", "delta")
    def txt(seed: Int): String =
      (0 until 12).map { i =>
        vocab(math.floorMod(scala.util.hashing.MurmurHash3.productHash((seed, i)), 4))
      }.mkString(" ")
    val sat = spark.createDataFrame(
      (0L until 400L).map(i => (i, txt(i.toInt))) :+
        // a planted near-dup of corpus doc 1 in the delta slice
        (1000L, txt(1))
    ).toDF("doc_id", "text")
    val corpus = sat.where(col("doc_id") % 10 =!= 0 && col("doc_id") < 1000L)
    val delta = sat.where(col("doc_id") % 10 === 0 || col("doc_id") === 1000L)
    Dedup.dedupIndexBuild(corpus, "text", "doc_id", "graft_dedup_idx_sat")
    val probe = Dedup.dedupIndexProbe(delta, "text", "doc_id", "graft_dedup_idx_sat")
    assert(probe.queryExecution.analyzed.toString.contains("prefix_candidates"),
      "saturated corpus did not take the broadcast-probe kernel path")
    val out = probe.collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap
    val c = fpSet(corpus)
    val d = fpSet(delta)
    assert(out.keySet === d.keySet)
    d.foreach { case (id, (key, shl)) =>
      val exactIds = c.collect { case (cid, (ck, _)) if ck == key => cid }
      val jac = c.view.mapValues { case (_, cs) =>
        val shared = (shl & cs).size
        if (shl.isEmpty || cs.isEmpty) 0.0
        else shared.toDouble / (shl.size + cs.size - shared)
      }.filter(_._2 >= 0.5)
      val (st, m, j) = out(id)
      if (exactIds.nonEmpty) {
        assert(st === "exact" && m === exactIds.min && j === 1.0, s"doc $id")
      } else if (jac.nonEmpty) {
        val mm = jac.keys.min
        assert(st === "near" && m === mm, s"doc $id")
        assert(math.abs(j - jac(mm)) < 5e-5, s"doc $id jaccard $j vs ${jac(mm)}")
      } else assert(st === "new" && m === -1L, s"doc $id")
    }
  }

  test("dedupIndexProbe: deterministic across delta partition layouts") {
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val delta = docs.where(col("doc_id") % 10 === 0)
    Dedup.dedupIndexBuild(corpus, "text", "doc_id", "graft_dedup_idx_det")
    val a = Dedup.dedupIndexProbe(delta, "text", "doc_id", "graft_dedup_idx_det")
      .orderBy("doc_id").collect()
    val b = Dedup.dedupIndexProbe(delta.repartition(7), "text", "doc_id", "graft_dedup_idx_det")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("dedupIndexProbe: exact duplicate of an indexed doc, dup-of-delta stays new") {
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "an unrelated corpus document about database engines")).toDF("doc_id", "text")
    // 10: exact dup (case/whitespace variant) of 2; 20: near dup of 2;
    // 30: brand new; 40: too short for any 3-gram shingle, content unseen
    val delta = Seq(
      (10L, "The  Quick Brown Fox jumps over the lazy dog"),
      (20L, "the quick brown fox jumps over the lazy dog daily"),
      (30L, "completely novel text that matches nothing in the index"),
      (40L, "tiny doc")).toDF("doc_id", "text")
    Dedup.dedupIndexBuild(corpus, "text", "doc_id", "graft_dedup_idx_tiny")
    val out = Dedup.dedupIndexProbe(delta, "text", "doc_id", "graft_dedup_idx_tiny")
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(10L) === ("exact", 2L))
    assert(out(20L)._1 === "near" && out(20L)._2 === 2L)
    assert(out(30L) === ("new", -1L))
    assert(out(40L) === ("new", -1L))
  }
  test("decontaminateEmbeddings drops only near-eval vectors; nulls kept") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),          // cos 1.0 vs eval -> dropped
      (2L, Array(0.0f, 1.0f)),          // orthogonal -> kept
      (3L, null.asInstanceOf[Array[Float]])) // no evidence -> kept
      .toDF("id", "v")
    val evalSet = Seq((100L, Array(1.0f, 0.0f))).toDF("id", "v")
    val got = Dedup.decontaminateEmbeddings(corpus, evalSet, "id", "v", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 1L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("embIndexProbe: exact copies resolve exact, disjoint vectors resolve new") {
    import org.apache.spark.sql.functions._
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val corpus = emb.where(col("vec_id") % 2 === 0)
    Dedup.embIndexBuild(corpus, "embedding", "vec_id", "graft_emb_idx_spec",
      bits = 3, tables = 16)
    // exact copies under shifted ids: every one must match its source
    val copies = corpus.limit(20)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val got = Dedup.embIndexProbe(copies, "embedding", "vec_id", "graft_emb_idx_spec")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got.size === 20)
    got.foreach { case (id, (status, m)) =>
      assert(status === "exact", s"$id not exact")
      assert(m <= id - 5000L, s"$id matched $m, expected <= source id")
    }
    // an orthogonal one-hot vector far from the corpus: status new
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val probe = Seq((9999L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val res = Dedup.embIndexProbe(probe, "embedding", "vec_id", "graft_emb_idx_spec",
        threshold = 0.999).collect()
    assert(res.length === 1 && res(0).getString(1) != "exact")
  }
}
