package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.llm.{EchoModel, Elo, HashEmbedder, Infer, JudgeScorer, KeywordClassifier, Results, Templates}
import graft.ops.{Corpus, Dedup, LangModel, Multimodal, Search, Similarity, Skew, Temporal, TextAnalysis}

/** Driver contract — the operator catalog from SURVEY.md §2.
  *
  * Every `queries` entry is one operator of the engine; `oracleSql` holds
  * the equivalent DuckDB SQL over the same parquet tables. Column names are
  * aligned on both sides (the driver compare sorts columns by name).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q5Multijoin(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- §2.2 relational

  /** TPC-H Q1-style pricing summary. Monetary sums as decimal for exact,
    * order-independent cross-engine aggregation. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: join + agg + top-k; dims broadcast by Catalyst. */
  private def q3JoinTopk(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
  }

  /** TPC-H Q5-style: 6-way join, small dims broadcast, revenue per nation. */
  private def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") && cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style: pushdown-friendly filter + single aggregate. */
  private def q6Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"))

  /** ASOF join: each event matched to the user's most recent purchase
    * at-or-before its timestamp (union + carry-forward window — no
    * inequality join). */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase").select("user_id", "ts")
    Temporal.asofJoin(events, purchases, "user_id", "ts", "ts", Seq("ts"))
      .select(col("event_id"), col("asof_ts"))
      .orderBy("event_id")
  }

  /** Binned range join: clicks within the hour before each purchase,
    * counted per purchase (equi-join on (user, time-bin), exact filter). */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    Temporal.rangeJoinBinned(clicks, purchases, "user_id", "click_ts", "ts",
        windowBeforeSec = 3600, binSec = 3600)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  /** Window functions: per-supplier ordered row_number + running quantity. */
  private def qWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty", sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "rn", "running_qty")
  }

  /** Semi-structured: JSON props extraction + per-type aggregates. */
  private def qEventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** Sessionization: 30-minute-gap sessions per user via lag + conditional sum. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- §2.5 text analysis

  private def textTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("len_chars"))

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityLangStats(col("text")).as("__st"))
      .select(col("doc_id"), TextAnalysis.qualityScoreFrom(col("__st")).as("quality"))

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityLangStats(col("text")).as("__st"))
      .select(col("doc_id"), TextAnalysis.langIdFrom(col("__st")).as("pred_lang"))

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))

  /** Derived multi-line corpus: the flat synthetic text regrouped into
    * 2-word lines (the synthetic docs carry no newlines, so the line-based
    * operators get real line structure this way; short lines from a small
    * vocabulary also recur across documents, which is exactly the
    * boilerplate shape those operators exist for). The DuckDB oracles
    * reconstruct the identical text. */
  private def linedDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      graft.functions.gf.regroupLines(col("text"), 2).as("text"))

  /** Gopher-style repetition filters over the derived multi-line corpus. */
  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    linedDocs(s, dir)
      .select(col("doc_id"), TextAnalysis.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"),
        col("r.n_lines").as("n_lines"),
        col("r.dup_line_frac").as("dup_line_frac"),
        col("r.dup_line_char_frac").as("dup_line_char_frac"),
        col("r.top_bigram_frac").as("top_bigram_frac"))
      .orderBy("doc_id")

  /** C4-style global line dedup: 2-word lines occurring in >= 10 distinct
    * docs are boilerplate and get dropped from every document. */
  private def dedupLines(s: SparkSession, dir: String): DataFrame =
    Dedup.dropBoilerplateLines(linedDocs(s, dir), "text", "doc_id", minDocs = 10)
      // the library operator returns the cleaned TEXT (a cleaned corpus is
      // the product); the catalog hashes it for the driver's value compare
      .withColumn("cleaned_key", md5(col("cleaned"))).drop("cleaned")
      .orderBy("doc_id")

  /** PII redaction: deterministic synthetic contact info (derived from the
    * doc id, mirrored in the oracle) appended to each doc, then scrubbed. */
  private def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").select(
      col("doc_id"),
      // % (sign-preserving remainder), not pmod: DuckDB's % matches it for
      // negative ids, pmod would diverge
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +15551"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")).as("text"))
    withPii
      .select(col("doc_id"),
        TextAnalysis.piiCounts(col("text")).as("p"),
        md5(TextAnalysis.scrubPii(col("text"))).as("scrubbed_key"))
      .select(col("doc_id"),
        col("p.n_email").cast("long").as("n_email"),
        col("p.n_ip").cast("long").as("n_ip"),
        col("p.n_phone").cast("long").as("n_phone"),
        col("scrubbed_key"))
      .orderBy("doc_id")
  }

  /** Corpus-trained char-bigram LM score — the CCNet-style perplexity
    * quality signal (train pass: bounded 16k-row agg; score pass: narrow
    * codegen map over the plan-embedded table). */
  private def textPerplexity(s: SparkSession, dir: String): DataFrame =
    LangModel.perplexityScore(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Composite quality filter: keep/drop + first-failing-rule reason over
    * length, language, repetition, and quality rules. */
  private def corpusFilter(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.filterCorpus(
        t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            graft.functions.gf.regroupLines(col("text"), 2).as("lined")),
        "text", "lined")
      .select(col("doc_id"), col("keep"), col("reason"))
      .orderBy("doc_id")

  /** Mixture rebalancing to en:de:es:fr = 5:2:2:1 (zh dropped): the
    * largest downsample-only corpus hitting those proportions exactly
    * (all-integer cap arithmetic, md5-hash-order survival). */
  private def corpusMix(s: SparkSession, dir: String): DataFrame =
    Corpus.mixToTarget(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 5L, "de" -> 2L, "es" -> 2L, "fr" -> 1L))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Fixed-size overlapping word chunks (32-word windows, stride 24). */
  private def corpusChunk(s: SparkSession, dir: String): DataFrame =
    Corpus.chunk(t(s, dir, "documents"), "doc_id", "text", chunkWords = 32, strideWords = 24)
      // ops layer returns chunk TEXT; hash it here for the value compare
      .withColumn("chunk_key", md5(col("chunk_text"))).drop("chunk_text")
      .orderBy("doc_id", "chunk_idx")

  /** Composed end-to-end cleaning pipeline: quality filter → exact dedup
    * → MinHash near-dedup → decontamination, each stage on the previous
    * stage's survivors. Every 10th doc plays the held-out eval set (same
    * convention as dedup_decontaminate); output is (doc_id, stage) with
    * stage = first dropping stage's reason, or 'kept'. */
  private def corpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    Corpus.cleanPipeline(corpus, evalSet, "text", "doc_id",
        graft.functions.gf.regroupLines(col("text"), 2))
      .orderBy("doc_id")
  }

  /** Rollup stats per (lang, source) + subtotals + grand total. */
  private def corpusStats(s: SparkSession, dir: String): DataFrame =
    Corpus.stats(t(s, dir, "documents"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** Engine-reproducible 20% sample by md5 bucket of the doc id. */
  private def corpusSample(s: SparkSession, dir: String): DataFrame =
    Corpus.deterministicSample(t(s, dir, "documents"), "doc_id", pct = 20)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Token-budget sequence packing per source (2048-token sequences). */
  private def corpusPack(s: SparkSession, dir: String): DataFrame =
    Corpus.packSequences(t(s, dir, "documents"), "doc_id", "text", "source", 2048)
      .orderBy("source", "doc_id")

  /** Deterministic per-language cap at 75 docs: downsamples the
    * overrepresented language (en) while smaller ones pass through. */
  private def corpusCap(s: SparkSession, dir: String): DataFrame =
    Corpus.capPerStratum(t(s, dir, "documents"), "lang", "doc_id", maxRows = 75)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Corpus-wide top-50 word trigrams by true occurrence count
    * (TakeOrderedAndProject top-k — no global sort shuffle). */
  private def corpusNgrams(s: SparkSession, dir: String): DataFrame =
    Corpus.topNgrams(t(s, dir, "documents"), "text", n = 3, k = 50)
      .orderBy(col("cnt").desc, col("ngram").asc)

  /** Exact per-language quantiles of document length (linear
    * interpolation; the approx_percentile twin is the sketch scale path,
    * spec-verified against this exact formulation). */
  private def corpusQuantiles(s: SparkSession, dir: String): DataFrame =
    Corpus.quantiles(t(s, dir, "documents"), "n_chars", "lang",
        Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy(col("lang").asc_nulls_first)

  /** Per-source exact duplication-rate profile (the HLL
    * approx_count_distinct twin is the single-pass scale path,
    * spec-verified within its rsd against this exact formulation). */
  private def corpusDupeProfile(s: SparkSession, dir: String): DataFrame =
    Corpus.dupeProfile(t(s, dir, "documents"), "text", "source")
      .orderBy(col("source").asc_nulls_first)

  // ---------------------------------------------------------------- §2.3 dedup

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("content_key")

  /** maxDf=10 is the scale valve: shingles present in more than 10 docs are
    * dropped from candidate generation (cost is sum df(shingle)^2, so hot
    * shingles dominate at scale). The oracle mirrors the cap exactly; at
    * the driver's verify scale (sf0.01, max df 7) it is a no-op, so the
    * result also equals the uncapped one there. */
  private def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id", n = 3, threshold = 0.5,
        maxDf = Some(10L))
      .orderBy("a_id", "b_id")

  /** LSH candidates + exact-Jaccard verify: every emitted pair is a true
    * J>=0.5 pair, so the DuckDB exact-Jaccard oracle checks both precision
    * (definitionally 1) and banding recall (1 on this corpus — the planted
    * near-dups sit far above the ~0.42 banding midpoint). */
  private def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairsVerified(t(s, dir, "documents"), "text", "doc_id",
        n = 3, numHashes = 128, bands = 32, threshold = 0.5)
      .orderBy("a_id", "b_id")

  /** Canonical (distinct-fingerprint) banding with the maxBucket=500
    * hot-bucket valve: candidate cost per bucket is occupancy², counted
    * over distinct fingerprints (a 10x template-heavy rehearsal measured
    * 52M candidate rows with naive banding). At the driver's verify scale
    * max occupancy is 26, so the cap is a no-op there and the all-pairs
    * oracle applies unchanged. */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsCanonical(t(s, dir, "documents"), "text", "doc_id", maxHamming = 3,
        maxBucket = Some(500L))
      .orderBy("a_id", "b_id")

  /** Duplicate clusters over the (capped) exact-Jaccard pair graph:
    * min-label connected components, component id = canonical keeper. */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
      n = 3, threshold = 0.5, maxDf = Some(10L))
    Dedup.connectedComponents(pairs).orderBy("id")
  }

  /** End-to-end dedup application: corpus minus non-keeper cluster
    * members (pairs → components → anti-join). */
  private def dedupApply(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5, maxDf = Some(10L))
    Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Decontamination demo: every 10th doc plays the held-out eval set; the
    * rest is the training corpus, cleaned of near-matches against it. */
  private def dedupDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    Dedup.decontaminate(corpus, evalSet, "text", "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Bloom-prefilter decontamination at the same operating point as
    * dedup_decontaminate. Candidate recall is 1 by Bloom construction
    * (no false negatives + J>=0.5 implies a shared shingle) and the
    * verify stage is the same exact Jaccard, so the OUTPUT is identical
    * and the twin shares the exact-Jaccard oracle verbatim. */
  private def dedupDecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    Dedup.decontaminateBloom(corpus, evalSet, "text", "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Exact-substring duplicated spans (Lee-2022 shape): word-5-gram
    * fingerprints recurring anywhere in the corpus (>=2 occurrences,
    * self-repetition included) merged into maximal per-document spans. */
  private def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(t(s, dir, "documents"), "text", "doc_id", k = 5, minOcc = 2)
      .select(col("doc_id"), col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        col("span_words").cast("long").as("span_words"))
      .orderBy("doc_id", "span_start")

  /** Top 30% by quality score per language — the classifier-filtered-web
    * curation cut, with the md5-hash tie-break making the selection
    * deterministic under heavy score ties. */
  private def corpusTopFrac(s: SparkSession, dir: String): DataFrame =
    Corpus.topFractionPerStratum(
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).cast("long").as("q")),
      "lang", "doc_id", "q", fracPct = 30)
      .orderBy("doc_id")

  /** Salted join equals the plain join: per-segment order rollup through
    * an 8-way salted orders-customer join (the skew-mitigation utility;
    * correctness gate is equality with the unsalted SQL). */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame =
    Skew.saltedJoin(
      t(s, dir, "orders").select("o_custkey", "o_totalprice"),
      t(s, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      Seq("o_custkey"), salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy("c_mktsegment")

  /** Compression-ratio quality signal (DEFLATE). JVM-zlib sizes are not
    * SQL-reproducible -> rows-only driver check; TextAnalysisSpec pins
    * the semantics (repetitive < prose < random, determinism). */
  private def textCompression(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.compressionStats(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")

  /** Substring-dedup application: every duplicated span dropped in place
    * (drop-all policy); cleaned text compared verbatim vs the oracle. */
  private def dedupSubstringApply(s: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(t(s, dir, "documents"), "text", "doc_id", k = 5, minOcc = 2)
      .orderBy("doc_id")

  /** Contamination audit report at the dedup_decontaminate operating
    * point: (corpus doc, eval doc, rounded exact Jaccard) matches. */
  private def dedupDecontaminateReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    Dedup.decontaminateReport(corpus, evalSet, "text", "doc_id")
      .orderBy("doc_id", "eval_id")
  }

  /** Deterministic 80/10/10 train/val/test split by md5 bucket — the
    * engine-reproducible alternative to randomSplit. */
  private def corpusSplit(s: SparkSession, dir: String): DataFrame =
    Corpus.assignSplits(t(s, dir, "documents"), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "lang", "split")
      .orderBy("doc_id")

  /** BM25 top-20 for a fixed 3-term keyword query; ordering uses the
    * rounded score (+ id tie-break) so the cut is a shared total order. */
  private def textSearch(s: SparkSession, dir: String): DataFrame =
    Search.bm25(t(s, dir, "documents"), "text", "doc_id",
      Seq("spark", "join", "window"), k = 20)

  /** Embedding clustering at the oracle-able iters=0 operating point
    * (md5-hash-order leader seeds, argmax cosine, k=8); the trained
    * iters>0 path is covered by DedupSpec. */
  private def corpusCluster(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterEmbeddings(t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
      .withColumn("cluster", col("cluster").cast("long"))
      .orderBy("vec_id")

  /** SemDeDup at the oracle-able operating point: md5-hash-order leader
    * seeds (iters=0, no float-mean refinement), 8 clusters, within-cluster
    * cos>=0.4 components, min-id keepers. The trained (iters>0) path is
    * covered by DedupSpec recall/determinism tests. */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    Dedup.semdedup(t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, minCos = 0.4)
      .withColumn("cluster", col("cluster").cast("long"))
      .orderBy("vec_id")

  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding", minCos = 0.4)
      .orderBy("a_id", "b_id")

  /** Hyperplane-LSH candidates + exact-cosine verify. (bits=4, tables=48)
    * is the full-recall operating point for cos>=0.4 on this corpus
    * (miss probability per pair ~2.5e-4 with 48 deterministic tables), so
    * the exact all-pairs cosine oracle applies; larger corpora trade
    * recall for bucket size by raising bits, like any LSH deployment. */
  private def dedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairsLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
        minCos = 0.4, bits = 4, tables = 48)
      .orderBy("a_id", "b_id")

  // ---------------------------------------------------------------- §2.4 similarity

  private def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** LSH ANN at its full-recall operating point (bits=3, tables=48
    * recovers the exact top-5 for every query here), so the brute-force
    * ANN oracle applies verbatim; raise bits for bigger corpora. */
  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 3, tables = 48)
      .orderBy("query_id", "rank")
  }

  /** IVF is the one genuinely recall-trading entry left (cell pruning on
    * uniform-random vectors can't reach recall 1 at a sensible nprobe), so
    * it stays ScalaTest-verified (recall vs brute force + determinism)
    * rather than SQL-oracled. */
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** PQ + exact re-rank. Rows-only like ann_ivf: the approximate phase is
    * honestly recall-trading; SimilaritySpec checks recall vs brute force
    * and partition-layout determinism. */
  private def annPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, rerank = 50)
      .orderBy("query_id", "rank")
  }

  /** IVF x PQ composed (IVFADC). Rows-only like ann_ivf/ann_pq: cell
    * pruning + residual-code scoring are honestly recall-trading;
    * SimilaritySpec checks recall vs brute force, partition-layout
    * determinism, and persistent-index/direct equality. */
  private def annIvfpq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfpqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, m = 8, ksub = 16, rerank = 50)
      .orderBy("query_id", "rank")
  }

  private def knnLabel(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.knnLabel(emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", "label", k = 10)
      .orderBy("query_id")
  }

  /** LSH-backed kNN vote at its full-recall operating point (bits=3,
    * tables=48 recovers the exact top-10 for every query on this corpus),
    * so the brute-force kNN oracle applies verbatim. */
  private def knnLabelLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.knnLabelLsh(emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", "label",
        k = 10, bits = 3, tables = 48)
      .orderBy("query_id")
  }

  // ---------------------------------------------------------------- §2.1 LLM surface

  private def inferRender(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "documents")
    df.select(col("doc_id"), Infer.renderPrompt(df, Seq("source", " | ", "lang", " | ", "text")).as("prompt"))
  }

  private def inferEcho(s: SparkSession, dir: String): DataFrame =
    Infer.infer(t(s, dir, "documents"), EchoModel(maxChars = 100), Seq("text"))
      .select("doc_id", "inference_result")

  private def inferStructured(s: SparkSession, dir: String): DataFrame = {
    val inferred = Infer.infer(
      t(s, dir, "documents"), JudgeScorer(0, 10), Seq("text"), truncateRows = false)
    Results.unpackJson(inferred).select("doc_id", "score")
  }

  private def classifyKeyword(s: SparkSession, dir: String): DataFrame =
    Templates.classify(t(s, dir, "documents"), Seq("join", "window", "stream"), Seq("text"),
        outputColumn = "classification_result")
      .select("doc_id", "classification_result")

  private def scoreJudge(s: SparkSession, dir: String): DataFrame =
    Templates.score(t(s, dir, "documents"), Seq("text"), Seq("clarity"), range = (1, 5))
      .select(col("doc_id"), col("score").cast("long").as("score"))

  private def truncateTokensQ(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "documents")
    df.select(col("doc_id"),
      Infer.truncateTokens(col("text"), 20).as("truncated"))
  }

  private def resultsJoin(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val results = Infer.infer(docs, EchoModel(maxChars = 50), Seq("text"))
      .select("doc_id", "inference_result")
    Results.withOriginalDf(docs, results, "doc_id").orderBy("doc_id")
  }

  private def rankOptions(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "documents")
      .select(col("doc_id"), col("text").as("opt_text"), col("source").as("opt_src"))
    Templates.rank(df, Seq("opt_text", "opt_src"))
      .select(col("doc_id"), array_join(col("ranking"), ",").as("ranking_str"), col("winner"))
  }

  /** Feature-hash embedding, projected to scalars: the driver's compare
    * (pandas sort + hash) can't order raw array<float> columns, so the
    * catalog entry emits a scalar fingerprint of the vector — dimension,
    * first component, and the component sum — all reproducible in DuckDB
    * from the same FNV-1a / signed-bucket / L2-normalize semantics. The
    * full array stays available via Templates.embed / Graft.embed. */
  private def embedHash(s: SparkSession, dir: String): DataFrame = {
    val emb = Templates.embed(t(s, dir, "documents"), Seq("text"), outputColumn = "embedding", dim = 64)
    emb.select(
      col("doc_id"),
      size(col("embedding")).cast("long").as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"),
      round(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x.cast("double")), 5).as("e_sum"))
  }

  /** Elo over per-document language-ranking ballots: each doc ranks the
    * five langId marker languages by marker occurrences (desc, lang asc) —
    * a deterministic stand-in for LLM ranking ballots. Ballot explosion and
    * pair counting run distributed; the 5x5 Bradley–Terry solve is driver
    * side (reference: sutro/templates/evals.py:182). */
  private def eloRatings(s: SparkSession, dir: String): DataFrame = {
    // ballots from the one-pass qualityLangStats kernel: elements 4+ are
    // the per-language marker totals — the same non-overlapping occurrence
    // counts over the padded lower-cased text that the 15-regexp_replace
    // formulation computed, in ONE pass per document. Projection barrier so
    // the kernel evaluates once, not once per ballot entry.
    val entries = TextAnalysis.langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(
        (lit(0) - element_at(col("__st"), lit(i + 4))).as("negscore"),
        lit(lang).as("lang"))
    }
    val ballots = t(s, dir, "documents")
      .select(TextAnalysis.qualityLangStats(col("text")).as("__st"))
      .select(transform(array_sort(array(entries: _*)), e => e.getField("lang")).as("ballot"))
    Elo.ratings(ballots, "ballot")
      .select(col("label"), round(col("elo"), 2).as("elo"),
        round(col("wins"), 1).as("wins"), round(col("losses"), 1).as("losses"),
        round(col("matches"), 1).as("matches"))
      .orderBy("label")
  }

  // ---------------------------------------------------------------- §2.6 multimodal + streaming

  private def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Multimodal.withBinaryPayload(t(s, dir, "documents"), "doc_id", "text")
    Multimodal.extractFeatures(withPayload).toDF().orderBy("doc_id")
  }

  private def streamWindowAgg(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.windowAggAvailableNow(s, dir)
      .orderBy("window_start", "event_type")

  /** Append-mode variant — watermark finalizes + evicts every window, so
    * the emitted stream equals the batch answer (the production contract;
    * complete mode above is the test-harness variant). */
  private def streamWindowAggAppend(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.windowAggAppendAvailableNow(s, dir)
      .orderBy("window_start", "event_type")

  /** Streaming exact dedup — per-content-key state; single-batch
    * AvailableNow run equals the batch dedup, so it shares that oracle. */
  private def streamDedupExact(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.dedupExactAvailableNow(s, dir)
      .orderBy("content_key")

  /** Streaming contamination monitor (stateless stream-static verify):
    * same pairs as the batch report, so it shares that oracle. */
  private def streamDecontaminate(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.decontaminateMonitorAvailableNow(s, dir)
      .orderBy("doc_id", "eval_id")

  /** Streaming sessionization (flatMapGroupsWithState) — same semantics as
    * the batch q_sessionize, so it shares that oracle's shape. */
  private def streamSessionize(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.sessionizeAvailableNow(s, dir, gapMinutes = 30)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
      .orderBy("user_id")

  /** Engine-native session_window sessionization — the bounded-memory
    * streaming path (spillable in-operator sort + state-store session
    * merging; a skewed user cannot OOM an executor). Same gap semantics as
    * the batch q_sessionize, so it shares that oracle's shape. */
  private def streamSessionizeSw(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.sessionizeSessionWindowsAvailableNow(s, dir, gapMinutes = 30)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
      .orderBy("user_id")

  /** Stream-stream watermarked inner join: purchases attributed to the
    * same user's clicks in the preceding hour; both buffers
    * watermark-evicted. Single-batch real data under AvailableNow, so the
    * emitted set equals the batch join. */
  private def streamJoin(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.clickAttributionAvailableNow(s, dir)
      .orderBy("click_id", "purchase_id")

  /** Left-outer stream-stream join: every click emitted once, null
    * purchase columns when nothing followed within the hour — the
    * unmatched rows come from real state-watermark eviction (sentinel
    * batches advance the watermark past the join window). */
  private def streamJoinOuter(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.clickAttributionOuterAvailableNow(s, dir)
      .orderBy(col("click_id"), col("purchase_id").asc_nulls_first)

  // ---------------------------------------------------------------- catalog

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_join_topk" -> (q3JoinTopk _),
    "q5_multijoin" -> (q5Multijoin _),
    "q6_filter" -> (q6Filter _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_window" -> (qWindow _),
    "q_events_json" -> (qEventsJson _),
    "q_sessionize" -> (qSessionize _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_repetition" -> (textRepetition _),
    "text_pii_scrub" -> (textPiiScrub _),
    "text_perplexity" -> (textPerplexity _),
    "dedup_lines" -> (dedupLines _),
    "corpus_stats" -> (corpusStats _),
    "corpus_sample" -> (corpusSample _),
    "corpus_pack" -> (corpusPack _),
    "corpus_cap" -> (corpusCap _),
    "corpus_chunk" -> (corpusChunk _),
    "corpus_mix" -> (corpusMix _),
    "corpus_ngrams" -> (corpusNgrams _),
    "corpus_quantiles" -> (corpusQuantiles _),
    "corpus_dupe_profile" -> (corpusDupeProfile _),
    "corpus_filter" -> (corpusFilter _),
    "corpus_clean" -> (corpusClean _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_apply" -> (dedupApply _),
    "dedup_decontaminate" -> (dedupDecontaminate _),
    "dedup_decontaminate_bloom" -> (dedupDecontaminateBloom _),
    "dedup_decontaminate_report" -> (dedupDecontaminateReport _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_apply" -> (dedupSubstringApply _),
    "corpus_split" -> (corpusSplit _),
    "corpus_cluster" -> (corpusCluster _),
    "corpus_top_frac" -> (corpusTopFrac _),
    "text_search" -> (textSearch _),
    "text_compression" -> (textCompression _),
    "q_salted_join" -> (qSaltedJoin _),
    "infer_render" -> (inferRender _),
    "infer_echo" -> (inferEcho _),
    "infer_structured" -> (inferStructured _),
    "classify_keyword" -> (classifyKeyword _),
    "score_judge" -> (scoreJudge _),
    "truncate_tokens" -> (truncateTokensQ _),
    "results_join" -> (resultsJoin _),
    "rank_options" -> (rankOptions _),
    "embed_hash" -> (embedHash _),
    "elo_ratings" -> (eloRatings _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_semantic" -> (dedupSemantic _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _),
    "ann_bruteforce" -> (annBruteforce _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_ivfpq" -> (annIvfpq _),
    "knn_label" -> (knnLabel _),
    "knn_label_lsh" -> (knnLabelLsh _),
    "multimodal_meta" -> (multimodalMeta _),
    "stream_window_agg" -> (streamWindowAgg _),
    "stream_window_agg_append" -> (streamWindowAggAppend _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_sessionize_sw" -> (streamSessionizeSw _),
    "stream_join" -> (streamJoin _),
    "stream_join_outer" -> (streamJoinOuter _),
    "stream_dedup_exact" -> (streamDedupExact _),
    "stream_decontaminate" -> (streamDecontaminate _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, p.ts AS asof_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        |ASOF LEFT JOIN (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id, count(*) AS n_clicks
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |      WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |  AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING) AS running_qty
        |FROM lineitem""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |x AS (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS len_chars
        |FROM documents""".stripMargin,
    // the lined CTE reconstructs linedDocs' 2-word-line text identically;
    // repetition stats then recomputed from first principles over it
    "text_repetition" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |      generate_series(0, greatest(CAST(floor((len(w)-1)/2.0) AS BIGINT), 0)),
        |      i -> array_to_string(list_slice(w, i*2+1, i*2+2), ' ')), chr(10)) AS text
        |  FROM w0),
        |ln AS (
        |  SELECT doc_id, regexp_replace(l, '^[ \t\r\f]+|[ \t\r\f]+$', '', 'g') AS line
        |  FROM lined, unnest(string_split(text, chr(10))) AS u(l)),
        |lc AS (
        |  SELECT doc_id, line, count(*) AS cnt, len(line) AS lln
        |  FROM ln WHERE line <> '' GROUP BY doc_id, line),
        |ls AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
        |    CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_line_frac,
        |    CAST(sum((cnt-1)*lln) AS DOUBLE) / CAST(sum(cnt*lln) AS DOUBLE) AS dup_line_char_frac
        |  FROM lc GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |  FROM w0, unnest(generate_series(1, len(w)-1)) AS g(i)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bs AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
        |  FROM bc GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(ls.n_lines, 0) AS n_lines,
        |  coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
        |  coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
        |  coalesce(bs.top_bigram_frac, 0.0) AS top_bigram_frac
        |FROM documents d
        |LEFT JOIN ls ON d.doc_id = ls.doc_id
        |LEFT JOIN bs ON d.doc_id = bs.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // same lined construction; boilerplate = normalized line in >= 10
    // distinct docs; reassembly preserves original line order
    "dedup_lines" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |      generate_series(0, greatest(CAST(floor((len(w)-1)/2.0) AS BIGINT), 0)),
        |      i -> array_to_string(list_slice(w, i*2+1, i*2+2), ' ')), chr(10)) AS text
        |  FROM w0),
        |lx AS (
        |  SELECT doc_id, ls, i AS idx, ls[i] AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
        |       unnest(generate_series(1, len(ls))) AS g(i)),
        |fp AS (
        |  SELECT doc_id, idx, line,
        |    md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) AS f,
        |    trim(regexp_replace(lower(line), '\s+', ' ', 'g')) AS nrm
        |  FROM lx),
        |hot AS (
        |  SELECT f FROM fp WHERE nrm <> ''
        |  GROUP BY f HAVING count(DISTINCT doc_id) >= 10),
        |kept AS (SELECT doc_id, idx, line FROM fp WHERE f NOT IN (SELECT f FROM hot)),
        |re AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY idx) AS cleaned
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines FROM lined)
        |SELECT t.doc_id, t.n_lines,
        |  coalesce(CAST(re.n_kept AS BIGINT), 0) AS n_kept,
        |  t.n_lines - coalesce(CAST(re.n_kept AS BIGINT), 0) AS n_dropped,
        |  md5(coalesce(re.cleaned, '')) AS cleaned_key
        |FROM tot t LEFT JOIN re ON t.doc_id = re.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // identical synthetic contact-info injection, counts on the raw text,
    // then the same email -> IP -> phone replacement chain
    "text_pii_scrub" ->
      """WITH withpii AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com or +15551' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '\+\d{7,15}')) AS BIGINT) AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{7,15}', '<PHONE>', 'g')) AS scrubbed_key
        |FROM withpii ORDER BY doc_id""".stripMargin,
    // bigram counts recomputed globally in SQL; per-doc score = left-fold
    // of count*ln(smoothed P) over ASCENDING codes (list ORDER BY code +
    // list_reduce), mirroring the kernel's accumulation order exactly;
    // ln()'s last ulp absorbed by round(..., 6)
    "text_perplexity" ->
      """WITH codes AS (
        |  SELECT doc_id, list_transform(range(1, len(text)+1), i -> least(unicode(text[i]), 127)) AS cs
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, cs[i]*128 + cs[i+1] AS code
        |  FROM codes, unnest(generate_series(1, len(cs)-1)) AS g(i)),
        |cnt AS (SELECT code, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY code),
        |rowtot AS (SELECT code // 128 AS a, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
        |docbg AS (SELECT doc_id, code, CAST(count(*) AS BIGINT) AS dc FROM bg GROUP BY doc_id, code),
        |terms AS (
        |  SELECT d.doc_id, d.code, d.dc,
        |    d.dc * ln((CAST(cnt.c AS DOUBLE) + 1) / (CAST(rowtot.tot AS DOUBLE) + 128)) AS term
        |  FROM docbg d JOIN cnt USING (code) JOIN rowtot ON d.code // 128 = rowtot.a),
        |score AS (
        |  SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_bigrams,
        |    list_reduce(list(term ORDER BY code), (x, y) -> x + y) AS s
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, round(s / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob
        |FROM score ORDER BY doc_id""".stripMargin,
    // 32-word windows, stride 24; list_slice clamps at the end like slice
    "corpus_chunk" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    list_slice(w, i*24+1, least(i*24+32, len(w))) AS c
        |  FROM w0, unnest(generate_series(0,
        |    greatest(CAST(floor((len(w) - 32 + 23)/24.0) AS BIGINT), 0))) AS g(i)
        |  WHERE len(w) > 0)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(len(c) AS BIGINT) AS n_words,
        |  md5(array_to_string(c, ' ')) AS chunk_key
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, CAST(
        |  greatest(0, least(100,
        |    least(len(regexp_split_to_array(text, '\s+')), 50)
        |    + floor(len(list_distinct(regexp_split_to_array(text, '\s+'))) * 40.0
        |            / greatest(len(regexp_split_to_array(text, '\s+')), 1))
        |    - least(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')), 10)
        |    + 10)) AS INTEGER) AS quality
        |FROM documents""".stripMargin,
    "text_langid" ->
      """WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pt FROM documents),
        |s AS (SELECT doc_id,
        |  (length(pt)-length(replace(pt,' the ','')))/5 + (length(pt)-length(replace(pt,' a ','')))/3 + (length(pt)-length(replace(pt,' of ','')))/4 AS s_en,
        |  (length(pt)-length(replace(pt,' der ','')))/5 + (length(pt)-length(replace(pt,' und ','')))/5 + (length(pt)-length(replace(pt,' die ','')))/5 AS s_de,
        |  (length(pt)-length(replace(pt,' el ','')))/4 + (length(pt)-length(replace(pt,' la ','')))/4 + (length(pt)-length(replace(pt,' que ','')))/5 AS s_es,
        |  (length(pt)-length(replace(pt,' le ','')))/4 + (length(pt)-length(replace(pt,' et ','')))/4 + (length(pt)-length(replace(pt,' les ','')))/5 AS s_fr,
        |  (length(pt)-length(replace(pt,' zh ','')))/4 + (length(pt)-length(replace(pt,' zhong ','')))/7 + (length(pt)-length(replace(pt,' wen ','')))/5 AS s_zh
        |FROM p)
        |SELECT doc_id, CASE
        |  WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'en'
        |  WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'de'
        |  WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'es'
        |  WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'fr'
        |  WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'zh'
        |  ELSE 'unknown' END AS pred_lang
        |FROM s""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_key,
        |  min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_key""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |exf AS (
        |  SELECT * FROM ex WHERE shingle NOT IN (
        |    SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 10)),
        |pairs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT a_id, b_id FROM pairs
        |WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "infer_render" ->
      """SELECT doc_id,
        |  coalesce(CAST(source AS VARCHAR), '') || ' | ' || coalesce(CAST(lang AS VARCHAR), '') || ' | ' || coalesce(CAST(text AS VARCHAR), '') AS prompt
        |FROM documents""".stripMargin,
    "infer_echo" ->
      """SELECT doc_id, substr(coalesce(text, ''), 1, 100) AS inference_result
        |FROM documents""".stripMargin,
    "infer_structured" ->
      """SELECT doc_id, CAST(length(coalesce(text,'')) % 11 AS BIGINT) AS score
        |FROM documents""".stripMargin,
    "classify_keyword" ->
      """SELECT doc_id, CASE
        |  WHEN contains(lower(coalesce(text,'')), 'join') THEN 'join'
        |  WHEN contains(lower(coalesce(text,'')), 'window') THEN 'window'
        |  WHEN contains(lower(coalesce(text,'')), 'stream') THEN 'stream'
        |  ELSE 'other' END AS classification_result
        |FROM documents""".stripMargin,
    "score_judge" ->
      """SELECT doc_id, 1 + length(coalesce(text,'')) % 5 AS score
        |FROM documents""".stripMargin,
    "truncate_tokens" ->
      """SELECT doc_id, CASE WHEN len(regexp_split_to_array(text, '\s+')) <= 20 THEN text
        |  ELSE array_to_string((regexp_split_to_array(text, '\s+'))[1:20], ' ') END AS truncated
        |FROM documents""".stripMargin,
    "results_join" ->
      """SELECT doc_id, text, lang, source, n_chars,
        |  substr(coalesce(text, ''), 1, 50) AS inference_result
        |FROM documents ORDER BY doc_id""".stripMargin,
    "rank_options" ->
      """SELECT doc_id,
        |  CASE WHEN length(coalesce(text,'')) > length(coalesce(source,''))
        |    THEN 'opt_text,opt_src' ELSE 'opt_src,opt_text' END AS ranking_str,
        |  CASE WHEN length(coalesce(text,'')) > length(coalesce(source,''))
        |    THEN 'opt_text' ELSE 'opt_src' END AS winner
        |FROM documents""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    // SemDeDup from first principles: md5-order leaders, argmax-cosine
    // assignment (ties -> lowest leader index), within-cluster pairs,
    // recursive-CTE components, min-id keepers.
    "dedup_semantic" ->
      """WITH RECURSIVE ld AS (
        |  SELECT embedding,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        |asg AS (
        |  SELECT e.vec_id, e.embedding, ld.idx,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding, ld.embedding) DESC, ld.idx ASC) AS rn
        |  FROM embeddings e CROSS JOIN ld
        |  WHERE e.embedding IS NOT NULL),
        |cl AS (SELECT vec_id, embedding, idx AS cluster FROM asg WHERE rn = 1),
        |prs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM cl a JOIN cl b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |edges AS (SELECT a_id AS u, b_id AS v FROM prs UNION SELECT b_id, a_id FROM prs),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |compn AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u)
        |SELECT cl.vec_id, cl.cluster, (compn.comp IS NULL OR compn.comp = cl.vec_id) AS keep
        |FROM cl LEFT JOIN compn ON cl.vec_id = compn.id
        |ORDER BY cl.vec_id""".stripMargin,
    "ann_bruteforce" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT query_id, neighbor_id, rank FROM scored
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // ann_lsh runs a full-recall operating point on this corpus
    // (deterministic hyperplanes), so the exact brute-force oracle applies.
    "ann_lsh" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT query_id, neighbor_id, rank FROM scored
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "knn_label" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS qid, c.label AS n_label,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rk
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 50),
        |votes AS (
        |  SELECT qid, n_label, count(*) AS votes FROM scored WHERE rk <= 10 GROUP BY qid, n_label),
        |best AS (
        |  SELECT qid, n_label, votes,
        |    row_number() OVER (PARTITION BY qid ORDER BY votes DESC, n_label) AS rk
        |  FROM votes)
        |SELECT qid AS query_id, n_label AS pred_label, votes
        |FROM best WHERE rk = 1 ORDER BY query_id""".stripMargin,
    // LSH-backed kNN runs at full recall here, so the exact brute-force
    // kNN oracle applies verbatim (same SQL as knn_label).
    "knn_label_lsh" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS qid, c.label AS n_label,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rk
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 50),
        |votes AS (
        |  SELECT qid, n_label, count(*) AS votes FROM scored WHERE rk <= 10 GROUP BY qid, n_label),
        |best AS (
        |  SELECT qid, n_label, votes,
        |    row_number() OVER (PARTITION BY qid ORDER BY votes DESC, n_label) AS rk
        |  FROM votes)
        |SELECT qid AS query_id, n_label AS pred_label, votes
        |FROM best WHERE rk = 1 ORDER BY query_id""".stripMargin,
    "stream_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_key,
        |  min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_key""".stripMargin,
    "stream_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |x AS (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    // session_window merge semantics equal the lag formulation (an event
    // joins its predecessor's session iff ts <= prev + gap), so the same
    // oracle applies
    "stream_sessionize_sw" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |x AS (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    // left-outer variant: unmatched clicks surface as null purchase
    // columns once the purchase-side state watermark passes their join
    // window — under AvailableNow single-batch real data that equals the
    // batch left join. NULLS FIRST mirrors Spark's asc_nulls_first.
    "stream_join_outer" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,
    // stream-stream join under AvailableNow single-batch real data = the
    // batch join (watermarks only bound state, never drop in-batch rows)
    "stream_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts
        |FROM e c JOIN e p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '1' HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // append mode emits each window exactly once when the watermark passes
    // it, so the emitted set equals the batch aggregation — same oracle.
    "stream_window_agg_append" ->
      """SELECT time_bucket(INTERVAL '1' HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // kernel tokenization = lower, split \s+, drop empties; ngrams carry
    // multiplicity. (cnt DESC, ngram ASC) is a total order, so the top-50
    // cut is identical on both engines.
    "corpus_ngrams" ->
      """WITH w0 AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
        |  FROM w0, unnest(generate_series(1, greatest(len(w)-2, 0))) AS s(i))
        |SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram
        |ORDER BY cnt DESC, ngram LIMIT 50""".stripMargin,
    // quantile_cont and Spark's exact percentile share the (n-1)*p
    // linear-interpolation definition; round(4) absorbs the last ulp
    "corpus_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 4) AS q25,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.50), 4) AS q50,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 4) AS q75,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4) AS q95
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    // dup_rate from exact integer counts; count(DISTINCT) skips null
    // fingerprints on both engines
    "corpus_dupe_profile" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS BIGINT) AS n_distinct,
        |  round(1.0 - CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS DOUBLE)
        |    / count(*), 4) AS dup_rate
        |FROM documents GROUP BY source ORDER BY source NULLS FIRST""".stripMargin,
    "corpus_stats" ->
      """WITH s AS (
        |  SELECT lang, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS toks,
        |    CAST(greatest(0, least(100,
        |      least(len(regexp_split_to_array(text, '\s+')), 50)
        |      + floor(len(list_distinct(regexp_split_to_array(text, '\s+'))) * 40.0
        |              / greatest(len(regexp_split_to_array(text, '\s+')), 1))
        |      - least(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')), 10)
        |      + 10)) AS BIGINT) AS q
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(q) AS DOUBLE) / count(*), 4) AS avg_quality
        |FROM s GROUP BY ROLLUP (lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    // md5-derived bucket: reproducible in any engine with md5(varchar) —
    // the cross-engine determinism IS the operator's contract.
    "corpus_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    "corpus_pack" ->
      """SELECT source, doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(floor(coalesce(sum(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS seq_id
        |FROM documents ORDER BY source, doc_id""".stripMargin,
    // decontamination = corpus docs with no exact-Jaccard>=0.5 match to
    // any eval-slice doc (banding recall is 1 here, so exact SQL applies)
    "dedup_decontaminate" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |prs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id),
        |jac AS (
        |  SELECT a_id, b_id FROM prs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id % 10 <> 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM jac j
        |    WHERE (j.a_id = d.doc_id AND j.b_id % 10 = 0)
        |       OR (j.b_id = d.doc_id AND j.a_id % 10 = 0))
        |ORDER BY d.doc_id""".stripMargin,
    // the Bloom prefilter has recall 1 (no false negatives + J>=0.5
    // implies a shared shingle), so the twin's output equals the exact
    // Jaccard definition and it shares dedup_decontaminate's oracle
    "dedup_decontaminate_bloom" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |prs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id),
        |jac AS (
        |  SELECT a_id, b_id FROM prs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id % 10 <> 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM jac j
        |    WHERE (j.a_id = d.doc_id AND j.b_id % 10 = 0)
        |       OR (j.b_id = d.doc_id AND j.a_id % 10 = 0))
        |ORDER BY d.doc_id""".stripMargin,
    // exact-substring spans from first principles: positional 5-grams
    // (1-based i converts to the kernel's 0-based word offsets), corpus-
    // wide occurrence count >= 2, gaps-and-islands span merge. A span
    // closes when the next duplicated 5-gram starts more than 5 words
    // after the previous one.
    "dedup_substring" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS ng
        |  FROM w0, unnest(generate_series(1, greatest(len(w)-4, 0))) AS s(i)),
        |dup AS (SELECT ng FROM pos GROUP BY ng HAVING count(*) >= 2),
        |hits AS (SELECT doc_id, i FROM pos JOIN dup USING (ng)),
        |brk AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 5
        |      THEN 0 ELSE 1 END AS b
        |  FROM hits),
        |grp AS (
        |  SELECT doc_id, i, sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
        |  FROM brk)
        |SELECT doc_id, min(i) - 1 AS span_start, max(i) + 4 AS span_end,
        |  max(i) + 4 - (min(i) - 1) AS span_words
        |FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin,
    // contamination report: the same exact-Jaccard pair machinery as
    // dedup_decontaminate, emitting the matches instead of anti-joining
    "dedup_decontaminate_report" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |prs AS (
        |  SELECT a.id AS corpus_id, b.id AS eval_id,
        |    any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle
        |  WHERE a.id % 10 <> 0 AND b.id % 10 = 0
        |  GROUP BY a.id, b.id)
        |SELECT corpus_id AS doc_id, eval_id,
        |  round(CAST(shared AS DOUBLE) / (a_size + b_size - shared), 4) AS jaccard
        |FROM prs
        |WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5
        |ORDER BY doc_id, eval_id""".stripMargin,
    // substring-dedup application: rebuild each document from the raw
    // (case-preserving) tokens whose 1-based position j is covered by no
    // span [min(i), max(i)+4] (the 1-based closed form of the kernel's
    // 0-based [start, end) offsets)
    "dedup_substring_apply" ->
      """WITH w0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS wr
        |  FROM documents WHERE text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS ng
        |  FROM w0, unnest(generate_series(1, greatest(len(w)-4, 0))) AS s(i)),
        |dup AS (SELECT ng FROM pos GROUP BY ng HAVING count(*) >= 2),
        |hits AS (SELECT doc_id, i FROM pos JOIN dup USING (ng)),
        |brk AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 5
        |      THEN 0 ELSE 1 END AS b
        |  FROM hits),
        |grp AS (
        |  SELECT doc_id, i, sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
        |  FROM brk),
        |spans AS (SELECT doc_id, min(i) AS s1, max(i) + 4 AS e1 FROM grp GROUP BY doc_id, g),
        |allpos AS (
        |  SELECT doc_id, j, wr[j] AS word
        |  FROM w0, unnest(generate_series(1, len(wr))) t(j)),
        |dropped AS (
        |  SELECT DISTINCT p.doc_id, p.j FROM allpos p
        |  JOIN spans s ON s.doc_id = p.doc_id AND p.j BETWEEN s.s1 AND s.e1),
        |kept AS (
        |  SELECT a.doc_id, a.j, a.word FROM allpos a
        |  LEFT JOIN dropped d ON a.doc_id = d.doc_id AND a.j = d.j
        |  WHERE d.j IS NULL),
        |agg AS (
        |  SELECT doc_id, count(*) AS cnt, string_agg(word, ' ' ORDER BY j) AS txt
        |  FROM kept GROUP BY doc_id)
        |SELECT w0.doc_id, CAST(len(w0.wr) AS BIGINT) AS n_words,
        |  CAST(coalesce(agg.cnt, 0) AS BIGINT) AS n_kept,
        |  coalesce(agg.txt, '') AS cleaned
        |FROM w0 LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the streaming monitor emits exactly the batch report's pairs under
    // AvailableNow (stateless stream-static join, single input file)
    "stream_decontaminate" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |prs AS (
        |  SELECT a.id AS corpus_id, b.id AS eval_id,
        |    any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle
        |  WHERE a.id % 10 <> 0 AND b.id % 10 = 0
        |  GROUP BY a.id, b.id)
        |SELECT corpus_id AS doc_id, eval_id,
        |  round(CAST(shared AS DOUBLE) / (a_size + b_size - shared), 4) AS jaccard
        |FROM prs
        |WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5
        |ORDER BY doc_id, eval_id""".stripMargin,
    // the salted join must equal the PLAIN join — that equality is the
    // whole correctness contract of the skew utility
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // top-30%-per-stratum: same quality formula as corpus_stats, ceil via
    // integer arithmetic, md5-hash tie-break under heavy score ties
    "corpus_top_frac" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(greatest(0, least(100,
        |      least(len(regexp_split_to_array(text, '\s+')), 50)
        |      + floor(len(list_distinct(regexp_split_to_array(text, '\s+'))) * 40.0
        |              / greatest(len(regexp_split_to_array(text, '\s+')), 1))
        |      - least(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')), 10)
        |      + 10)) AS BIGINT) AS q
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, q,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY q DESC NULLS LAST, md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM s)
        |SELECT doc_id, lang, q FROM r
        |WHERE rk <= (n * 30 + 99) // 100
        |ORDER BY doc_id""".stripMargin,
    // same md5 bucket as corpus_sample; cut points 80/90 give 80/10/10
    "corpus_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 80 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // cluster assignment from first principles: md5-order leader seeds,
    // argmax cosine (ties -> lowest leader index), integer window count
    "corpus_cluster" ->
      """WITH ld AS (
        |  SELECT embedding,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS idx
        |  FROM embeddings WHERE embedding IS NOT NULL
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        |asg AS (
        |  SELECT e.vec_id, ld.idx,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding, ld.embedding) DESC, ld.idx ASC) AS rn
        |  FROM embeddings e CROSS JOIN ld
        |  WHERE e.embedding IS NOT NULL),
        |cl AS (SELECT vec_id, idx AS cluster FROM asg WHERE rn = 1)
        |SELECT vec_id, cluster, count(*) OVER (PARTITION BY cluster) AS cluster_size
        |FROM cl ORDER BY vec_id""".stripMargin,
    // BM25 from first principles with the same fixed term order and the
    // same nominal constants; both engines order by the ROUNDED score
    // (+ doc_id), a shared total order for the top-20 cut
    "text_search" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS dl,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'spark')) AS tf0,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'join')) AS tf1,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'window')) AS tf2
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM s),
        |sc AS (
        |  SELECT doc_id, round(
        |      ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
        |        / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
        |        / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
        |        / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS score
        |  FROM s, g)
        |SELECT doc_id, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // clusters = transitive closure over the same capped-Jaccard pair
    // graph, as a recursive CTE; comp = min reachable id (the keeper).
    "dedup_clusters" ->
      """WITH RECURSIVE norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |exf AS (
        |  SELECT * FROM ex WHERE shingle NOT IN (
        |    SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 10)),
        |prs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id),
        |jac AS (
        |  SELECT a_id, b_id FROM prs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM jac UNION SELECT b_id, a_id FROM jac),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u ORDER BY id""".stripMargin,
    "corpus_cap" ->
      """WITH rk AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
        |  FROM documents)
        |SELECT doc_id, lang FROM rk WHERE r <= 75 ORDER BY doc_id""".stripMargin,
    // every rule recomputed from first principles; reason = first failing
    // rule in the engine's fixed order
    "corpus_filter" ->
      """WITH w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |      generate_series(0, greatest(CAST(floor((len(w)-1)/2.0) AS BIGINT), 0)),
        |      i -> array_to_string(list_slice(w, i*2+1, i*2+2), ' ')), chr(10)) AS text
        |  FROM w0),
        |ln AS (
        |  SELECT doc_id, regexp_replace(l, '^[ \t\r\f]+|[ \t\r\f]+$', '', 'g') AS line
        |  FROM lined, unnest(string_split(text, chr(10))) AS u(l)),
        |lc AS (
        |  SELECT doc_id, line, count(*) AS cnt FROM ln WHERE line <> '' GROUP BY doc_id, line),
        |ls AS (
        |  SELECT doc_id,
        |    CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_line_frac
        |  FROM lc GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |  FROM w0, unnest(generate_series(1, len(w)-1)) AS g(i)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bs AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
        |  FROM bc GROUP BY doc_id),
        |tok AS (SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS n FROM documents),
        |q AS (SELECT doc_id, CAST(
        |  greatest(0, least(100,
        |    least(len(regexp_split_to_array(text, '\s+')), 50)
        |    + floor(len(list_distinct(regexp_split_to_array(text, '\s+'))) * 40.0
        |            / greatest(len(regexp_split_to_array(text, '\s+')), 1))
        |    - least(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')), 10)
        |    + 10)) AS INTEGER) AS quality
        |  FROM documents),
        |p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pt FROM documents),
        |sc AS (SELECT doc_id,
        |  (length(pt)-length(replace(pt,' the ','')))/5 + (length(pt)-length(replace(pt,' a ','')))/3 + (length(pt)-length(replace(pt,' of ','')))/4 AS s_en,
        |  (length(pt)-length(replace(pt,' der ','')))/5 + (length(pt)-length(replace(pt,' und ','')))/5 + (length(pt)-length(replace(pt,' die ','')))/5 AS s_de,
        |  (length(pt)-length(replace(pt,' el ','')))/4 + (length(pt)-length(replace(pt,' la ','')))/4 + (length(pt)-length(replace(pt,' que ','')))/5 AS s_es,
        |  (length(pt)-length(replace(pt,' le ','')))/4 + (length(pt)-length(replace(pt,' et ','')))/4 + (length(pt)-length(replace(pt,' les ','')))/5 AS s_fr,
        |  (length(pt)-length(replace(pt,' zh ','')))/4 + (length(pt)-length(replace(pt,' zhong ','')))/7 + (length(pt)-length(replace(pt,' wen ','')))/5 AS s_zh
        |  FROM p),
        |lang AS (
        |  SELECT doc_id, CASE
        |    WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'en'
        |    WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'de'
        |    WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'es'
        |    WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'fr'
        |    WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'zh'
        |    ELSE 'unknown' END AS pred_lang
        |  FROM sc),
        |dec AS (
        |  SELECT d.doc_id, CASE
        |    WHEN tok.n < 12 THEN 'too_short'
        |    WHEN tok.n > 100000 THEN 'too_long'
        |    WHEN lang.pred_lang = 'unknown' THEN 'lang_unknown'
        |    WHEN coalesce(ls.dup_line_frac, 0) > 0.08 THEN 'dup_lines'
        |    WHEN coalesce(bs.top_bigram_frac, 0) > 0.09 THEN 'repetitive_bigrams'
        |    WHEN q.quality < 50 THEN 'low_quality'
        |    ELSE 'keep' END AS reason
        |  FROM documents d
        |  JOIN tok ON d.doc_id = tok.doc_id
        |  JOIN q ON d.doc_id = q.doc_id
        |  JOIN lang ON d.doc_id = lang.doc_id
        |  LEFT JOIN ls ON d.doc_id = ls.doc_id
        |  LEFT JOIN bs ON d.doc_id = bs.doc_id)
        |SELECT doc_id, reason = 'keep' AS keep, reason FROM dec ORDER BY doc_id""".stripMargin,
    // composed pipeline: the corpus_filter decision CTEs (on the corpus
    // slice), then exact dedup, exact-Jaccard closure (recall-1 stand-in
    // for verified LSH), and decontamination — each on the previous
    // stage's survivors; stage = first dropping stage.
    "corpus_clean" ->
      """WITH RECURSIVE corp AS (
        |  SELECT * FROM documents WHERE doc_id % 10 <> 0),
        |w0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM corp),
        |lined AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |      generate_series(0, greatest(CAST(floor((len(w)-1)/2.0) AS BIGINT), 0)),
        |      i -> array_to_string(list_slice(w, i*2+1, i*2+2), ' ')), chr(10)) AS text
        |  FROM w0),
        |ln AS (
        |  SELECT doc_id, regexp_replace(l, '^[ \t\r\f]+|[ \t\r\f]+$', '', 'g') AS line
        |  FROM lined, unnest(string_split(text, chr(10))) AS u(l)),
        |lc AS (
        |  SELECT doc_id, line, count(*) AS cnt FROM ln WHERE line <> '' GROUP BY doc_id, line),
        |ls AS (
        |  SELECT doc_id,
        |    CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_line_frac
        |  FROM lc GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |  FROM w0, unnest(generate_series(1, len(w)-1)) AS g(i)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bs AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
        |  FROM bc GROUP BY doc_id),
        |tok AS (SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS n FROM corp),
        |q AS (SELECT doc_id, CAST(
        |  greatest(0, least(100,
        |    least(len(regexp_split_to_array(text, '\s+')), 50)
        |    + floor(len(list_distinct(regexp_split_to_array(text, '\s+'))) * 40.0
        |            / greatest(len(regexp_split_to_array(text, '\s+')), 1))
        |    - least(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')), 10)
        |    + 10)) AS INTEGER) AS quality
        |  FROM corp),
        |p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pt FROM corp),
        |sc AS (SELECT doc_id,
        |  (length(pt)-length(replace(pt,' the ','')))/5 + (length(pt)-length(replace(pt,' a ','')))/3 + (length(pt)-length(replace(pt,' of ','')))/4 AS s_en,
        |  (length(pt)-length(replace(pt,' der ','')))/5 + (length(pt)-length(replace(pt,' und ','')))/5 + (length(pt)-length(replace(pt,' die ','')))/5 AS s_de,
        |  (length(pt)-length(replace(pt,' el ','')))/4 + (length(pt)-length(replace(pt,' la ','')))/4 + (length(pt)-length(replace(pt,' que ','')))/5 AS s_es,
        |  (length(pt)-length(replace(pt,' le ','')))/4 + (length(pt)-length(replace(pt,' et ','')))/4 + (length(pt)-length(replace(pt,' les ','')))/5 AS s_fr,
        |  (length(pt)-length(replace(pt,' zh ','')))/4 + (length(pt)-length(replace(pt,' zhong ','')))/7 + (length(pt)-length(replace(pt,' wen ','')))/5 AS s_zh
        |  FROM p),
        |lang AS (
        |  SELECT doc_id, CASE
        |    WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'en'
        |    WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'de'
        |    WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'es'
        |    WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'fr'
        |    WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) AND greatest(s_en,s_de,s_es,s_fr,s_zh) > 0 THEN 'zh'
        |    ELSE 'unknown' END AS pred_lang
        |  FROM sc),
        |dec AS (
        |  SELECT d.doc_id, CASE
        |    WHEN tok.n < 12 THEN 'too_short'
        |    WHEN tok.n > 100000 THEN 'too_long'
        |    WHEN lang.pred_lang = 'unknown' THEN 'lang_unknown'
        |    WHEN coalesce(ls.dup_line_frac, 0) > 0.08 THEN 'dup_lines'
        |    WHEN coalesce(bs.top_bigram_frac, 0) > 0.09 THEN 'repetitive_bigrams'
        |    WHEN q.quality < 50 THEN 'low_quality'
        |    ELSE 'keep' END AS reason
        |  FROM corp d
        |  JOIN tok ON d.doc_id = tok.doc_id
        |  JOIN q ON d.doc_id = q.doc_id
        |  JOIN lang ON d.doc_id = lang.doc_id
        |  LEFT JOIN ls ON d.doc_id = ls.doc_id
        |  LEFT JOIN bs ON d.doc_id = bs.doc_id),
        |surv1 AS (SELECT doc_id FROM dec WHERE reason = 'keep'),
        |ck AS (
        |  SELECT c.doc_id,
        |    coalesce(md5(trim(regexp_replace(lower(c.text), '\s+', ' ', 'g'))),
        |             'null:' || c.doc_id) AS k
        |  FROM corp c JOIN surv1 USING (doc_id)),
        |k2 AS (SELECT k, min(doc_id) AS keeper FROM ck GROUP BY k),
        |exdrop AS (SELECT ck.doc_id FROM ck JOIN k2 USING (k) WHERE ck.doc_id <> k2.keeper),
        |surv2 AS (SELECT ck.doc_id FROM ck JOIN k2 USING (k) WHERE ck.doc_id = k2.keeper),
        |norm AS (
        |  SELECT c.doc_id AS id, string_split(trim(regexp_replace(lower(c.text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM corp c JOIN surv2 USING (doc_id)),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |prs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id),
        |jac AS (
        |  SELECT a_id, b_id FROM prs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM jac UNION SELECT b_id, a_id FROM jac),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |compn AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u),
        |nddrop AS (SELECT id AS doc_id FROM compn WHERE id <> comp),
        |surv3 AS (
        |  SELECT doc_id FROM surv2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nddrop)),
        |enorm AS (
        |  SELECT d.doc_id AS id, string_split(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents d WHERE d.doc_id % 10 = 0),
        |esh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM enorm),
        |eex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM esh),
        |cex AS (SELECT ex.* FROM ex JOIN surv3 ON ex.id = surv3.doc_id),
        |cprs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM cex a JOIN eex b ON a.shingle = b.shingle
        |  GROUP BY a.id, b.id),
        |contam AS (
        |  SELECT DISTINCT a_id AS doc_id FROM cprs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5),
        |kept AS (
        |  SELECT doc_id FROM surv3
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))
        |SELECT doc_id, stage FROM (
        |  SELECT doc_id, reason AS stage FROM dec WHERE reason <> 'keep'
        |  UNION ALL SELECT doc_id, 'exact_dup' FROM exdrop
        |  UNION ALL SELECT doc_id, 'near_dup' FROM nddrop
        |  UNION ALL SELECT doc_id, 'contaminated' FROM contam
        |  UNION ALL SELECT doc_id, 'kept' FROM kept)
        |ORDER BY doc_id""".stripMargin,
    // caps derived with the same all-integer arithmetic the engine uses:
    // N* = min(count_s * W // w_s), cap_s = N* * w_s // W
    "corpus_mix" ->
      """WITH wts AS (SELECT * FROM (VALUES ('en', 5), ('de', 2), ('es', 2), ('fr', 1)) AS t(lang, w)),
        |cnt AS (
        |  SELECT lang, count(*) AS n FROM documents
        |  WHERE lang IN (SELECT lang FROM wts) GROUP BY lang),
        |nstar AS (SELECT min(n * 10 // w) AS v FROM cnt JOIN wts USING (lang)),
        |caps AS (SELECT lang, (SELECT v FROM nstar) * w // 10 AS cap FROM wts),
        |rk AS (
        |  SELECT d.doc_id, d.lang,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS r
        |  FROM documents d)
        |SELECT rk.doc_id, rk.lang FROM rk JOIN caps ON rk.lang = caps.lang
        |WHERE rk.r <= caps.cap ORDER BY rk.doc_id""".stripMargin,
    // dedup applied = corpus minus non-keeper cluster members, same
    // recursive-CTE closure as dedup_clusters.
    "dedup_apply" ->
      """WITH RECURSIVE norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |exf AS (
        |  SELECT * FROM ex WHERE shingle NOT IN (
        |    SELECT shingle FROM ex GROUP BY shingle HAVING count(*) > 10)),
        |prs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id),
        |jac AS (
        |  SELECT a_id, b_id FROM prs
        |  WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM jac UNION SELECT b_id, a_id FROM jac),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cc AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> comp)
        |ORDER BY doc_id""".stripMargin,
    // elo oracle: the ballot construction and the smoothed win/loss/match
    // accounting are recomputed in SQL from the documents table; the five
    // elo values are a literal derived at the driver's verify scale
    // (sf0.01) by an independent replication of the Bradley–Terry MM math
    // (Hunter 2004) in numpy over the same SQL-computed pair counts.
    "elo_ratings" ->
      """WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pt FROM documents),
        |sc AS (
        |  SELECT doc_id, 'en' AS lang, (length(pt)-length(replace(pt,' the ','')))//5 + (length(pt)-length(replace(pt,' a ','')))//3 + (length(pt)-length(replace(pt,' of ','')))//4 AS s FROM p
        |  UNION ALL SELECT doc_id, 'de', (length(pt)-length(replace(pt,' der ','')))//5 + (length(pt)-length(replace(pt,' und ','')))//5 + (length(pt)-length(replace(pt,' die ','')))//5 FROM p
        |  UNION ALL SELECT doc_id, 'es', (length(pt)-length(replace(pt,' el ','')))//4 + (length(pt)-length(replace(pt,' la ','')))//4 + (length(pt)-length(replace(pt,' que ','')))//5 FROM p
        |  UNION ALL SELECT doc_id, 'fr', (length(pt)-length(replace(pt,' le ','')))//4 + (length(pt)-length(replace(pt,' et ','')))//4 + (length(pt)-length(replace(pt,' les ','')))//5 FROM p
        |  UNION ALL SELECT doc_id, 'zh', (length(pt)-length(replace(pt,' zh ','')))//4 + (length(pt)-length(replace(pt,' zhong ','')))//7 + (length(pt)-length(replace(pt,' wen ','')))//5 FROM p),
        |rk AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS pos FROM sc),
        |dir AS (
        |  SELECT a.lang AS winner, b.lang AS loser, count(*) AS n
        |  FROM rk a JOIN rk b ON a.doc_id = b.doc_id AND a.pos < b.pos GROUP BY 1, 2),
        |agg AS (
        |  SELECT l.label,
        |    coalesce((SELECT sum(n) FROM dir WHERE winner = l.label), 0) AS rw,
        |    coalesce((SELECT sum(n) FROM dir WHERE loser = l.label), 0) AS rl
        |  FROM (SELECT unnest(['de','en','es','fr','zh']) AS label) l)
        |SELECT a.label, e.elo,
        |  round(a.rw + 2.0, 1) AS wins, round(a.rl + 2.0, 1) AS losses,
        |  round(a.rw + a.rl + 4.0, 1) AS matches
        |FROM agg a JOIN (VALUES ('de', 2499.86), ('en', 2886.34), ('es', 1611.70),
        |  ('fr', 730.99), ('zh', -228.89)) e(label, elo) ON a.label = e.label
        |ORDER BY a.label""".stripMargin,
    // minhash entry = LSH candidates ∩ exact Jaccard >= 0.5; recall is 1
    // on this corpus, so the oracle is plain exact Jaccard (uncapped — the
    // banding path has no df cap).
    "dedup_minhash_lsh" ->
      """WITH norm AS (
        |  SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shl
        |  FROM norm),
        |ex AS (SELECT id, len(shl) AS sz, unnest(shl) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.id AS a_id, b.id AS b_id, any_value(a.sz) AS a_size, any_value(b.sz) AS b_size, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT a_id, b_id FROM pairs
        |WHERE CAST(shared AS DOUBLE) / (a_size + b_size - shared) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // simhash oracle recomputes the 64-bit fingerprint from first
    // principles: FNV-1a per token (UBIGINT mod-2^64), per-bit vote sums,
    // then all-pairs bit_count(xor) <= 3 — bit-identical to the Scala
    // kernel, so this checks the full pipeline, not a derived decision.
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
        |      list_transform(range(1, length(tok)+1), i -> CAST(unicode(tok[i]) AS UBIGINT))),
        |    (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)) AS hv
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, b.b AS bit, sum(CASE WHEN ((hv >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hashed CROSS JOIN (SELECT unnest(range(0,64)) AS b) b
        |  GROUP BY 1, 2),
        |fp0 AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << bit ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS f
        |  FROM bits GROUP BY 1),
        |fp AS (
        |  SELECT d.doc_id, coalesce(f.f, CAST(0 AS UBIGINT)) AS f
        |  FROM documents d LEFT JOIN fp0 f USING (doc_id))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.f, b.f)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // embedding-LSH entry runs at its full-recall operating point, so the
    // exact all-pairs cosine oracle applies (same SQL as dedup_embedding).
    "dedup_embedding_lsh" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    // embed oracle recomputes the feature-hash embedding from first
    // principles in SQL: FNV-1a 64 per token (UBIGINT mod-2^64 arithmetic),
    // signed bucket accumulate, L2 normalize, float32 rounding via REAL.
    "embed_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
        |      list_transform(range(1, length(tok)+1), i -> CAST(unicode(tok[i]) AS UBIGINT))),
        |    (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)) AS hv
        |  FROM toks),
        |acc AS (
        |  SELECT doc_id, CAST(hv % 64 AS INTEGER) AS bucket,
        |    sum(CASE WHEN ((hv >> 62) & 1) = 1 THEN -1.0 ELSE 1.0 END) AS w
        |  FROM hashed GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, b.bucket FROM documents d
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) b),
        |comp AS (
        |  SELECT g.doc_id, g.bucket, coalesce(a.w, 0.0) AS w
        |  FROM grid g LEFT JOIN acc a ON g.doc_id = a.doc_id AND g.bucket = a.bucket),
        |nrm AS (
        |  SELECT doc_id, CASE WHEN sum(w*w) = 0 THEN 1.0 ELSE sqrt(sum(w*w)) END AS nv
        |  FROM comp GROUP BY 1),
        |fin AS (
        |  SELECT c.doc_id, c.bucket, CAST(CAST(c.w / n.nv AS REAL) AS DOUBLE) AS cv
        |  FROM comp c JOIN nrm n ON c.doc_id = n.doc_id)
        |SELECT doc_id, CAST(64 AS BIGINT) AS dim,
        |  round(max(CASE WHEN bucket = 0 THEN cv END), 6) AS e0,
        |  round(sum(cv), 5) AS e_sum
        |FROM fin GROUP BY doc_id""".stripMargin,
    // multimodal: the Spark side synthesizes a REAL container (PNG / JPEG /
    // WAV / GIF by doc_id % 4) around the utf-8 text bytes and then decodes
    // its header with a real byte parser. The oracle recomputes what the
    // parser must read back: every synthesized header field derives from
    // the body byte sum (all-ASCII corpus: byte == code point) and the
    // container overheads are fixed per format (PNG 57 = signature 8 +
    // IHDR 25 + IDAT framing 12 + IEND 12; JPEG 41 = SOI 2 + APP0 18 +
    // SOF0 19 + EOI 2; WAV 44; GIF 14 = header 13 + trailer 1) — so a
    // decode bug anywhere (endianness, offsets, chunk walk) hash-fails.
    "multimodal_meta" ->
      """WITH chars AS (
        |  SELECT doc_id, unicode(text[i]) AS code
        |  FROM documents, unnest(range(1, length(text)+1)) AS t(i)),
        |f AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 4 AS INTEGER) AS kind,
        |    octet_length(encode(d.text)) AS blen, coalesce(s.bsum, 0) AS bsum
        |  FROM documents d LEFT JOIN (
        |    SELECT doc_id, sum(code) AS bsum FROM chars GROUP BY 1) s
        |    ON d.doc_id = s.doc_id)
        |SELECT doc_id,
        |  CAST(blen + CASE kind WHEN 0 THEN 57 WHEN 1 THEN 41 WHEN 2 THEN 44 ELSE 14 END AS INTEGER) AS n_bytes,
        |  CASE kind WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |    WHEN 2 THEN 'audio/wav' ELSE 'image/gif' END AS mime,
        |  CASE kind WHEN 0 THEN '89504e47' WHEN 1 THEN 'ffd8ffe0'
        |    WHEN 2 THEN '52494646' ELSE '47494638' END AS magic,
        |  CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'wav' ELSE 'gif' END AS format,
        |  CAST(CASE WHEN kind = 2 THEN 0 ELSE 64 + bsum % 512 END AS INTEGER) AS width,
        |  CAST(CASE WHEN kind = 2 THEN 0 ELSE 64 + (bsum // 7) % 512 END AS INTEGER) AS height,
        |  CAST(CASE WHEN kind = 2 THEN 8000 + (bsum % 5) * 8000 ELSE 0 END AS INTEGER) AS sample_rate,
        |  CAST(CASE WHEN kind = 2 THEN 1 + bsum % 2 ELSE 0 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN kind = 2 THEN 16 ELSE 8 END AS INTEGER) AS bit_depth
        |FROM f""".stripMargin
  )
}
