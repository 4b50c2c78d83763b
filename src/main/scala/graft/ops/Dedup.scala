package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.io.Layout
import graft.ops.Checkpointing.PinSyntax

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB): every variant here is a shuffle-on-key groupBy or
  * a bucket join with map-side partial aggregation — never an O(n²)
  * cross-join. Candidate generation (LSH bands, shingle buckets) bounds the
  * pair space; exact verification runs only within buckets.
  */
object Dedup {

  /** The pair kernels (postingPairs, bucketPairsCos, group expansion) read
    * ids as 64-bit longs; a silently-mis-read string id would corrupt
    * output, so integral id columns are enforced (and widened) up front. */
  private[graft] def requireLongId(df: DataFrame, idCol: String): Unit =
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"id column '$idCol' must be an integral type (read as long by the pair kernels), got $other")
    }

  /** Exact dedup by normalized-content hash: one row per distinct content,
    * keeping the minimum id as the canonical representative. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** URL dedup — the crawl-frontier step that runs BEFORE any fetch: group
    * by the canonical form of the URL ([[graft.functions.gf
    * .canonicalizeUrl]] — lowercase scheme/host, default ports and
    * trailing slash stripped, utm_* tracking params dropped, surviving
    * params sorted) so scheme-case/port/slash/param-order/tracking
    * variants of the same resource collapse to one fetch. The canonical
    * key is computed map-side in one codegen pass; only (key, id) pairs
    * shuffle — the URL strings never move twice. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.where(col(urlCol).isNotNull)
      .groupBy(graft.functions.gf.canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ----- shared structure for the canonicalized near-dup paths -----

  /** Group a corpus by a canonical key, one row per group:
    * (rep_id = min member, sorted members, a representative payload). */
  private def canonicalGroups(
      df: DataFrame, idCol: String, keyCol: Column, payload: Column): DataFrame =
    df.select(col(idCol).cast("long").as("id"), payload.as("__payload"), keyCol.as("__ck"))
      // a null canonical key (null text -> null fingerprint) must NOT form
      // a group: the naive paths emit no pairs for null inputs, and
      // grouping nulls would mark unrelated null-text docs as duplicates
      .where(col("__ck").isNotNull)
      .groupBy("__ck")
      .agg(min(col("id")).as("rep_id"),
        sort_array(collect_list(col("id"))).as("members"),
        first(col("__payload")).as("__payload"))
      .pinned() // reused by reps, within, and expansion

  /** [[canonicalGroups]] with a REP-FETCH payload path — the
    * `multimodal_dedup` rule (compute the key map-side; payload bytes
    * never shuffle) applied to text. Variant A (the single-shuffle
    * [[canonicalGroups]]) moves every payload through the
    * canonicalization shuffle — at sf100 that is the dominant cost of the
    * bloom decontaminate (11 GB of text through collect_list, SURVEY
    * §9.8). Variant B shuffles only (16-byte key, 8-byte id) to form the
    * groups, then fetches payloads MAP-SIDE for the reps alone: the
    * rep-id set broadcasts, the payload source is scanned a second time
    * with the semi-join applied before any exchange, and corpus text
    * never enters a shuffle — payload bytes moved drop by the duplication
    * factor, and to ~zero when downstream consumes rep payloads without
    * re-keying (the decontaminate CSR kernel does).
    *
    * Returns (groups: (__ck, rep_id, members) — NO payload column,
    * repPayloads: (rep_id, __payload)). The rep payload is the MIN-id
    * member's (deterministic; variant A's `first` is
    * partition-order-arbitrary — equivalent downstream because grouped
    * payloads share a canonical key). `payloadSource` may be a cheaper
    * superset frame than `keySource` (e.g. the raw corpus instead of the
    * bloom-filtered candidates, so the fetch pass does not recompute the
    * candidacy kernel); it must contain every keySource id.
    *
    * Mode (`spark.graft.dedup.repFetch`): `off` (default) is the
    * single-shuffle path — the round-11 sf100 A/B measured it FASTER at
    * BOTH duplication extremes of the text corpus family (dup 1.002:
    * 336-362 s vs 370-411 s at sf100; dup 4.0: 21.5-34.0 s vs
    * 33.1-40.1 s on a 2M-doc 4x-replicated corpus): the decontaminate
    * operators are kernel/verify-bound, the text shuffle they'd save is
    * seconds, and rep-fetch's second scan + broadcast build + eager
    * materializations cost more than that at ~2 KB/doc payloads. `on`
    * keeps the rep-fetch path available for FAT-payload corpora (the
    * regime where the repo's `multimodal_dedup` applies the same
    * map-side-key rule because payloads are MB-scale and the shuffle
    * genuinely dominates), guarded by the rep-id broadcast budget. */
  private def canonicalGroupsRepFetch(
      keySource: DataFrame,
      payloadSource: DataFrame,
      idCol: String,
      keyCol: Column,
      payload: Column,
      maxRepIdBytes: Long = 256L << 20): (DataFrame, DataFrame) = {
    val mode = keySource.sparkSession.conf.get("spark.graft.dedup.repFetch", "off")
    def variantA: (DataFrame, DataFrame) = {
      val g = canonicalGroups(keySource, idCol, keyCol, payload)
      (g.select("__ck", "rep_id", "members"), g.select("rep_id", "__payload"))
    }
    if (mode != "on") variantA
    else {
      val slim = keySource
        .select(col(idCol).cast("long").as("id"), keyCol.as("__ck"))
        .where(col("__ck").isNotNull)
        .groupBy("__ck")
        .agg(min(col("id")).as("rep_id"),
          sort_array(collect_list(col("id"))).as("members"))
        .pinned() // reused by the fetch guard, expansion, and the count
      val nReps = slim.count()
      val repIds = slim.select(col("rep_id").as("id"))
      val payloads = payloadSource
        .select(col(idCol).cast("long").as("id"), payload.as("__payload"))
      // broadcast budget at the repo's hash-relation accounting (~48 B per
      // long-keyed entry incl. row + map overhead, same as dedupIndexProbe)
      // — 8 B/raw key undercounted the relation ~6x, an executor OOM risk
      // in exactly the fat-payload regime repFetch=on targets. Past the
      // budget the fetch degrades to a SHUFFLED id join reusing the pinned
      // groups (one payload shuffle — variant A's payload cost without
      // redoing the canonicalization shuffle the old fallback paid twice).
      val repPayloads =
        (if (nReps * 48L <= maxRepIdBytes) payloads.join(broadcast(repIds), Seq("id"))
         else payloads.join(repIds, Seq("id")))
          .select(col("id").as("rep_id"), col("__payload"))
      (slim, repPayloads)
    }
  }

  /** All member pairs inside each group (trivial matches by construction),
    * restricted to groups passing `emitWhen`.
    *
    * Relational formulation (explode + self-equi-join on the group key),
    * NOT a per-row pair-array kernel: on a corpus whose duplication factor
    * scales with the corpus (the replicated-crawl shape — GenScale decades
    * have |group| ≈ the copy factor), a postingPairs-style eval
    * materializes |group|²/2 structs as ONE in-memory array per row
    * (~40 MB/row at |group|=1000; executor OOM at sf100), while the join
    * streams the exact same pair set through a spillable shuffle. */
  private def withinGroupPairs(groups: DataFrame, emitWhen: Column): DataFrame = {
    val m = groups
      .where(size(col("members")) >= 2 && emitWhen)
      .select(col("rep_id"), explode(col("members")).as("m"))
    m.select(col("rep_id"), col("m").as("a_id"))
      .join(m.select(col("rep_id"), col("m").as("b_id")), Seq("rep_id"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
  }

  /** Expand representative-level pairs to member-level (a_id, b_id) pairs
    * through group membership, min-id first.
    *
    * One side explodes BEFORE the other side's members attach: the old
    * double-explode carried the full b_members array (8 KB at
    * |group|=1000) inside every intermediate row of the first explode —
    * quadratic bytes materialized per rep pair. Exploding a_members down
    * to scalar (x, b_id) rows first, then joining and exploding
    * b_members, keeps every intermediate row scalar-sized; output rows
    * are exactly the same cross products. */
  private def expandGroupPairs(groups: DataFrame, repPairs: DataFrame): DataFrame =
    repPairs
      .join(groups.select(col("rep_id").as("a_id"), col("members").as("a_members")), "a_id")
      .select(explode(col("a_members")).as("x"), col("b_id"))
      .join(groups.select(col("rep_id").as("b_id"), col("members").as("b_members")), "b_id")
      .select(col("x"), explode(col("b_members")).as("y"))
      .select(least(col("x"), col("y")).as("a_id"), greatest(col("x"), col("y")).as("b_id"))

  /** Drop (block, value) buckets whose occupancy exceeds the cap — the
    * hot-bucket valve shared by the banding paths. */
  private def capHotBuckets(banded: DataFrame, maxBucket: Option[Long]): DataFrame =
    maxBucket match {
      case None => banded
      case Some(cap) =>
        val hot = banded.groupBy("block", "blockval")
          .agg(count(lit(1)).as("__occ"))
          .where(col("__occ") > cap)
          .select("block", "blockval")
        banded.join(broadcast(hot), Seq("block", "blockval"), "left_anti")
    }

  /** Generalized SimHash pigeonhole banding (Manku et al., WWW'07): split
    * the 64-bit fingerprint into `numBlocks` near-equal blocks and emit one
    * (carry, table, key) row per (numBlocks - maxHamming)-subset of blocks,
    * keyed by the subset's block values. Pigeonhole: a pair within hamming
    * distance `maxHamming` differs in at most `maxHamming` blocks, so at
    * least one subset agrees on every block — candidate recall is EXACTLY 1
    * at ANY numBlocks (every emitted pair is hamming-verified downstream).
    *
    * Why generalize past the minimal numBlocks = maxHamming+1: the bucket
    * key there is a single 64/(k+1)-bit block (16 bits at k=3), and random
    * key collisions make the candidate set grow as n²/2^16 — quadratic past
    * ~100k distinct fingerprints. Widening the key to (m-k) blocks pushes
    * the collision knee out by 2^keybits at a C(m,k)-table explosion cost
    * (m=5: 10 tables/24-bit keys; m=6: 20/30; m=8: 56/40). Keys are
    * xxhash64(table, block values...) — a hash collision only adds a
    * verified-away candidate, never loses one.
    *
    * Column contract matches the old single-block layout ((block, blockval)
    * = (table id, bucket key)) so [[capHotBuckets]] and the pair joins
    * apply unchanged. */
  private def simhashBands(
      fp: DataFrame, carryCol: String, maxHamming: Int, numBlocks: Int): DataFrame = {
    require(numBlocks > maxHamming, "numBlocks must exceed maxHamming (pigeonhole)")
    require(numBlocks <= 64, "at most one block per bit")
    val base = 64 / numBlocks
    val rem = 64 % numBlocks
    val widths = (0 until numBlocks).map(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(i: Int): Column = {
      val sh = shiftrightunsigned(col("fp"), offsets(i))
      if (offsets(i) + widths(i) == 64) sh
      else sh.bitwiseAND(lit((1L << widths(i)) - 1))
    }
    val combos = (0 until numBlocks).combinations(numBlocks - maxHamming).toSeq
    fp.select(
      col(carryCol), col("fp"),
      posexplode(array(combos.zipWithIndex.map { case (combo, ti) =>
        xxhash64((lit(ti) +: combo.map(blockVal)): _*)
      }: _*)).as(Seq("block", "blockval")))
  }

  /** Corpus-sized block count for [[simhashBands]]: the smallest m whose
    * expected random-collision candidate volume C(m,k)·n²/2^keybits stays
    * at most n (keybits = (m-k)·⌊64/m⌋, the worst-case subset width) —
    * i.e. n·C(m,k) ≤ 2^keybits. For k=3 the knees are m=4 to ~16k distinct
    * fingerprints, m=5 to ~1.7M, m=6 to ~54M, m=8 to ~2·10^10 — each step
    * trades a bounded table explosion (4→10→20→56 rows/fp) for another
    * decade or two of linear candidate volume. Recall is 1 at every m, so
    * changing m never changes the operator's output, only its cost. */
  def simhashBlocksFor(n: Long, maxHamming: Int = 3): Int = {
    def ok(m: Int): Boolean = {
      val keyBits = (m - maxHamming) * (64 / m)
      val tables = (0 until maxHamming).foldLeft(1L)((a, i) => a * (m - i)) /
        (1L to maxHamming).product
      keyBits >= 62 || math.max(n, 1L) <= (1L << keyBits) / math.max(tables, 1L)
    }
    ((maxHamming + 1) to 16).find(ok).getOrElse(16)
  }

  /** Word n-gram shingles of `text` (distinct, space-joined). One-pass
    * custom expression ([[graft.functions.WordShinglesExpr]]) — the
    * equivalent transform/slice/array_join HOF pipeline evaluates
    * interpreted per element and measured ~10x slower. */
  def shingles(text: Column, n: Int): Column = gf.shingles(text, n)

  /** Exact n-gram Jaccard similar pairs via shingle inverted index:
    * shingle ONCE, build the posting list per shingle in one shuffle, emit
    * each posting list's candidate pairs with a bucket-local kernel, count
    * shared shingles per pair → Jaccard = shared / (|A| + |B| - shared) ≥
    * threshold. Only pairs sharing ≥1 surviving shingle are materialized,
    * and the corpus is shingled exactly once (the join formulation
    * re-shingled it for the df pass and for both join sides).
    *
    * Scale valve: candidate cost is sum(df(shingle)²) — a hot shingle in
    * f docs alone yields f²/2 pairs. maxDf drops shingles with document
    * frequency > maxDf from candidate generation (pairs sharing ONLY
    * ultra-common shingles are missed — the standard web-dedup trade-off;
    * |A|,|B| stay exact so Jaccard of surviving pairs is exact).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      threshold: Double,
      maxDf: Option[Long] = None): DataFrame = {
    requireLongId(df, idCol)
    val sh = df
      .select(col(idCol).cast("long").as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sh_size", size(col("sh")))
    val exploded = sh.select(col("id"), col("sh_size"), explode(col("sh")).as("shingle"))
    // The df valve runs BEFORE the posting lists exist: a count-only
    // aggregate (map-side partial, the shuffle carries one row per
    // DISTINCT shingle) finds the shingles worth collecting, and only
    // their postings enter the collect_list shuffle. On a duplicate-heavy
    // corpus almost every shingle is hot, so collecting first and capping
    // after (the old shape) shuffled the whole corpus's postings to then
    // drop them — 27M struct rows to keep a few hundred pairs at sf10.
    // The corpus is shingled twice (both passes are narrow maps off the
    // scan; recompute beats materializing corpus-sized rows — the
    // duplicatedSpans trade). sh_size stays the FULL set size, so Jaccard
    // semantics are unchanged.
    // No broadcast hint on `eligible`: on a duplicate-heavy corpus it is
    // tiny (hot shingles fall out) and AQE broadcasts it at runtime — the
    // posting explosion then never shuffles at all. On a Zipf corpus most
    // distinct shingles have df in [2, cap], `eligible` is corpus-scale,
    // and the shuffled join IS the right plan (the surviving postings are
    // the real output volume).
    val eligible = exploded.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 2 &&
        maxDf.map(cap => col("__df") <= cap).getOrElse(lit(true)))
      .select("shingle")
    val postings = exploded
      .join(eligible, Seq("shingle"))
      .groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("sh_size"))).as("postings"))
    postings
      .select(explode(gf.postingPairs(col("postings"))).as("p"))
      .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("p.a_size").as("a_size"), col("p.b_size").as("b_size"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") / (col("a_size") + col("b_size") - col("shared")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** MinHash + LSH banding near-dup pairs — the 100 TB dedup path.
    *
    * Each doc gets a k-permutation MinHash signature (custom codegen
    * expression, one pass over the text). The signature is split into
    * `bands` bands of k/bands rows; docs agreeing on ALL rows of any band
    * become candidates (classic LSH banding, Broder 1997 / MMDS ch.3).
    * Candidates are then verified with exact estimated similarity =
    * fraction of matching signature components >= threshold.
    *
    * Scale: candidate generation is a shuffle on (band, band-hash) — pair
    * space is bounded by bucket collisions, never O(n^2); the verify step
    * compares two k-long arrays per candidate pair only.
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rowsPerBand = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      gf.minhashSig(col(textCol), n, numHashes).as("sig"))
    // band key: hash of the band's slice of the signature (bands unrolled
    // at plan build — they're compile-time constants, no HOF needed)
    val banded = sig.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map(bi =>
        hash(slice(col("sig"), bi * rowsPerBand + 1, rowsPerBand), lit(bi))): _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("b_id"), col("sig").as("b_sig"))
    // score each collision immediately (one-pass codegen kernel), so the
    // dedup shuffle moves (id, id, double) rows — not two 128-long arrays
    a.join(b, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        gf.sigAgreement(col("a_sig"), col("b_sig")).as("est_sim"))
      .where(col("est_sim") >= threshold)
      .groupBy("a_id", "b_id").agg(first(col("est_sim")))
      .select(col("a_id"), col("b_id"))
  }

  /** MinHash LSH candidates verified by EXACT Jaccard — the textbook
    * two-stage pipeline (probabilistic candidate generation, exact verify).
    * Output is defined as {LSH banding candidates} ∩ {true Jaccard >=
    * threshold}: band parameters tune recall, but every emitted pair is a
    * true positive. With (numHashes=128, bands=32) the banding S-curve
    * midpoint is ~0.42, so J>=0.5 pairs collide w.p. ~0.87 per independent
    * run — and because the permutations are deterministic, recall at a
    * given dataset is a fixed property, checked by the oracle.
    *
    * Scale: candidates bounded by band-bucket collisions; the verify join
    * ships each doc's shingle set only for its candidate pairs.
    */
  def minhashLshPairsVerified(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // Canonicalize identical normalized contents first — the exact-dedup-
    // before-near-dup pipeline order every web-scale corpus needs (exact
    // duplication runs 30-50% on crawls, and each exact copy multiplies
    // every bucket it lands in). Near-dup work then runs on DISTINCT
    // contents; same-content pairs are Jaccard-1 matches by definition
    // (emitted directly, guarded on a non-empty shingle set to mirror the
    // naive path, where shingle-less docs never become candidates).
    requireLongId(df, idCol)
    val groups = canonicalGroups(df, idCol,
      TextAnalysis.fingerprint(col(textCol)), col(textCol))
    val within = withinGroupPairs(groups, size(shingles(col("__payload"), n)) > 0)
    val reps = groups.select(col("rep_id").as("id"), col("__payload").as("__text"))
    val repPairs = minhashVerifiedRepPairs(reps, n, numHashes, bands, threshold)
    within.unionByName(expandGroupPairs(groups, repPairs))
  }

  /** Banding candidates + exact-Jaccard verify over (id, __text) rows with
    * distinct contents — the representative-level core of
    * [[minhashLshPairsVerified]]. */
  /** (id, band, bucket) banding rows over (id, __text) — the ONE banding
    * scheme every minhash path shares (layout or salt changes here
    * propagate to the self-join dedup AND the corpus-vs-eval
    * decontamination identically). */
  private def bandedSignature(
      reps: DataFrame, n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rowsPerBand = numHashes / bands
    reps
      .select(col("id"), gf.minhashSig(col("__text"), n, numHashes).as("sig"))
      .select(col("id"),
        posexplode(array((0 until bands).map(bi =>
          hash(slice(col("sig"), bi * rowsPerBand + 1, rowsPerBand), lit(bi))): _*))
          .as(Seq("band", "bucket")))
  }

  private def minhashVerifiedRepPairs(
      reps: DataFrame,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val banded = bandedSignature(reps, n, numHashes, bands)
    val candidates = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("b_id")), Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val sh = reps.select(col("id"), shingles(col("__text"), n).as("shl"))
      .withColumn("sz", size(col("shl")))
    val withSets = candidates
      .join(sh.select(col("id").as("a_id"), col("shl").as("a_shl"), col("sz").as("a_sz")), "a_id")
      .join(sh.select(col("id").as("b_id"), col("shl").as("b_shl"), col("sz").as("b_sz")), "b_id")
      .withColumn("shared", size(array_intersect(col("a_shl"), col("b_shl"))))
    withSets
      .where(col("shared") / (col("a_sz") + col("b_sz") - col("shared")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * 64-bit SimHash fingerprint (custom codegen expression), then
    * pigeonhole banding: split the 64 bits into maxHamming+1 blocks — any
    * pair within maxHamming Hamming distance must agree exactly on at
    * least one block (complete, no false negatives). Block-equality join,
    * then exact Hamming verify via bit_count(xor).
    *
    * Scale valve: candidate cost per (block, value) bucket is occupancy²,
    * and template-similar corpora concentrate fingerprints into a few hot
    * block values (measured 50x blowup on a 10x synthetic corpus).
    * `maxBucket` drops buckets with occupancy above the cap — pairs whose
    * ONLY agreeing blocks are ultra-hot are missed, the same bounded
    * trade-off as the n-gram maxDf valve; completeness holds for every
    * pair retaining at least one un-hot agreeing block.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Option[Long] = None,
      numBlocks: Int = 0): DataFrame = {
    requireLongId(df, idCol)
    val m = if (numBlocks > 0) numBlocks else maxHamming + 1
    val fp = df.select(col(idCol).cast("long").as("id"), gf.simhash64(col(textCol)).as("fp"))
    val capped = capHotBuckets(simhashBands(fp, "id", maxHamming, m), maxBucket)
    val a = capped.select(col("block"), col("blockval"), col("id").as("a_id"), col("fp").as("a_fp"))
    val b = capped.select(col("block"), col("blockval"), col("id").as("b_id"), col("fp").as("b_fp"))
    a.join(b, Seq("block", "blockval"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .where(bit_count(col("a_fp").bitwiseXOR(col("b_fp"))) <= maxHamming)
      .select(col("a_id"), col("b_id"))
  }

  /** [[simhashPairs]] with fingerprint canonicalization — the scale shape
    * for duplicate-heavy corpora: documents sharing an identical
    * fingerprint collapse to ONE representative before banding, so bucket
    * occupancy (and the occupancy² candidate cost) is counted over
    * DISTINCT fingerprints; pairs then expand back through group
    * membership. Same-fingerprint pairs are hamming-0 matches by
    * definition and are emitted directly. With maxBucket = None the output
    * is identical to [[simhashPairs]] (measured 10x faster on a 10x
    * duplicate-heavy rehearsal corpus); with a cap the valve semantics
    * intentionally differ — occupancy here counts distinct fingerprints,
    * which is the robust definition (a million exact copies of one
    * document should not evict their bucket).
    *
    * Output-volume note: the pair LIST is quadratic in the duplication
    * factor by definition (every within-group pair is a true hamming-0
    * match — |group|²/2 pairs per fingerprint). On corpora whose
    * duplication scales with corpus size, consume GROUPS downstream
    * (the [[dropNearDuplicates]] / [[connectedComponents]] shape)
    * instead of materializing this list; the expansion itself streams
    * through spillable joins, but ~n·dup²/2 output rows are inherent to
    * asking for pairs. */
  def simhashPairsCanonical(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Option[Long] = None,
      numBlocks: Int = 0): DataFrame = {
    requireLongId(df, idCol)
    val m = if (numBlocks > 0) numBlocks else maxHamming + 1
    val fp = df.select(col(idCol).cast("long").as("id"), gf.simhash64(col(textCol)).as("fp"))
    val groups = canonicalGroups(fp, "id", col("fp"), col("fp"))
      .withColumnRenamed("__payload", "fp")
    // within-group: every member pair is an exact-fingerprint (hamming 0) match
    val within = withinGroupPairs(groups, lit(true))
    // cross-group: band over DISTINCT fingerprints only
    val capped = capHotBuckets(simhashBands(groups, "rep_id", maxHamming, m), maxBucket)
    val fpPairs = capped.select(col("block"), col("blockval"), col("rep_id").as("a_id"), col("fp").as("a_fp"))
      .join(capped.select(col("block"), col("blockval"), col("rep_id").as("b_id"), col("fp").as("b_fp")),
        Seq("block", "blockval"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .where(bit_count(col("a_fp").bitwiseXOR(col("b_fp"))) <= maxHamming)
      .select(col("a_id"), col("b_id"))
    within.unionByName(expandGroupPairs(groups, fpPairs))
  }

  /** Connected components over near-dup pairs — the step that turns a
    * pair list into dedup decisions (one keeper per duplicate cluster).
    *
    * Min-label propagation: every node starts as its own component; each
    * iteration every node adopts the smallest component id among itself
    * and its neighbors, until a fixpoint. Each iteration is one
    * shuffle-on-key join + min-aggregate — the Pregel-lite shape. Near-dup
    * graphs are overwhelmingly small cliques, so convergence is 1–2
    * iterations; for adversarial long-chain graphs swap in large-star /
    * small-star (Kiveris 2014), which this API deliberately matches.
    *
    * Returns (id, component) for every node appearing in `pairs`, where
    * component = min node id reachable — so the component id doubles as
    * the canonical keeper id.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — every iteration (and its
    // convergence check) reuses it instead of recomputing the upstream
    // candidate-generation pipeline per step
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .pinned()
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node adopts min(own comp, neighbors' comps). The old label
      // rides the union as a third column (labels holds exactly one row
      // per id, so max(__own) recovers it), which fuses the convergence
      // check into the SAME aggregation — the former per-iteration
      // node-sized shuffle join of next against labels is gone; the check
      // is now a narrow filter over the pinned result.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("comp", "n_comp"), "v")
        .select(col("u").as("id"), col("n_comp").as("comp"))
      val next = labels.withColumn("__own", col("comp"))
        .unionByName(viaNeighbors.withColumn("__own", lit(null).cast("long")))
        .groupBy("id")
        .agg(min(col("comp")).as("comp"), max(col("__own")).as("__own"))
        .pinned() // truncate the iterative lineage
      val changed = next.where(!(col("comp") <=> col("__own"))).limit(1).count()
      converged = changed == 0
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter iterations " +
        "(graph diameter exceeds the bound) — raise maxIter or use " +
        "connectedComponentsStar, the large-star/small-star formulation " +
        "that converges in O(log^2 n) rounds on long-chain graphs")
    labels
  }

  /** Connected components by alternating large-star / small-star (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") — the
    * escape hatch for adversarial long-chain graphs, where plain min-label
    * propagation needs diameter-many rounds: star operations re-wire whole
    * neighborhoods onto local minima each round, converging in O(log^2 n)
    * rounds regardless of diameter.
    *
    * Each round is two grouped aggregations over the edge list (shuffle on
    * node id, map-side combinable) with hi->lo directed edges as the
    * invariant; at the fixpoint every component is a star centered on its
    * minimum id. Output matches [[connectedComponents]]: (id, comp) for
    * every node in `pairs`, comp = min reachable id. */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 50): DataFrame = {
    val raw = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val nodes = raw.select(col("u").as("id"))
      .unionByName(raw.select(col("v").as("id"))).distinct()
      .pinned()
    var edges = raw
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .pinned()
    var iter = 0
    // edge count carried across rounds: the convergence test needs |edges|
    // and |next|, and |edges| is last round's |next| — recounting the
    // pinned edge list every round was one redundant job per round
    var edgeCount = edges.count()
    var converged = edgeCount == 0
    while (iter < maxIter && !converged) {
      // large-star: every node attaches its strictly-larger neighbors to
      // the minimum of its closed neighborhood
      val nbrs = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMins = nbrs.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val largeStar = nbrs.join(lsMins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: every node folds itself and its smaller neighbors onto
      // their minimum (hi->lo edges already ARE the smaller-neighbor lists)
      val ssMins = largeStar.groupBy("u").agg(min(col("v")).as("m"))
      val next = ssMins.select(col("u"), col("m").as("v"))
        .unionByName(largeStar.join(ssMins, "u")
          .where(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v")))
        .distinct()
        .pinned() // truncate the iterative lineage
      val nextCount = next.count()
      // set equality of two distinct sets: equal cardinality plus empty
      // one-sided difference; the anti-join only runs when the counts
      // already agree (i.e. at most once per convergence)
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").limit(1).count() == 0
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxIter rounds")
    // fixpoint is a star per component: non-roots point at the component
    // min, roots (the mins) have no outgoing hi->lo edge
    nodes.join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("comp"))
  }

  /** Apply dedup decisions: drop every document that belongs to a near-dup
    * cluster but is not its keeper (the min-id member). The complete
    * pipeline is pairs → [[connectedComponents]] → this anti-join — one
    * broadcast-able frame of non-keepers against the corpus. */
  def dropNearDuplicates(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String): DataFrame = {
    // plain anti-join: the non-keeper set is proportional to the duplicate
    // mass (30-50% of a crawl), far past any broadcast limit at scale —
    // AQE still broadcasts it when it is actually small
    val nonKeepers = connectedComponents(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(nonKeepers, Seq(idCol), "left_anti")
  }

  /** Eval-prefix CSR candidacy — the decontaminate family's shared
    * candidacy pass. The eval battery is small by contract (benchmark
    * suites), so its PREFIX postings (rare-first (df, fp) order over
    * eval-side document frequencies; length |B| - ceil(t·|B|) + j per eval
    * rep) are built on the driver and ride the plan as a CSR; one kernel
    * pass over the corpus reps' full fp sets counts hits task-locally
    * (one-sided prefix theorem: the j smallest common elements of a
    * J >= t pair sit inside the EVAL side's prefix, so recall is exactly
    * 1). This replaced two shuffle-based candidacies that went quadratic
    * on saturated shingle spaces at sf100: the MinHash band join (~5·10^8
    * chance band collisions) and the shared-shingle equi-join (Σ
    * df_corpus·df_eval ≈ 9·10^10 rows — filled the disk). Returns
    * (rep_id, eval_rep) candidates for exact-Jaccard verification. */
  /** Plan-embeddable prefix-CSR arrays over an eval battery's
    * (rep, sorted fps) rows — the probe side of [[gf.prefixCandidates]].
    * Shared by the batch decontaminate paths and the streaming
    * contamination monitor (which caches it per battery). */
  private[graft] case class EvalPrefixCsr(
      fps: Array[Long], offsets: Array[Int], reps: Array[Int],
      repIds: Array[Long], repNfp: Array[Int])

  private[graft] def evalPrefixCsr(
      evalShRows: Array[(Long, Array[Long])],
      threshold: Double,
      minHits: Int = 3): EvalPrefixCsr = {
    def oMin(sz: Int): Int = math.ceil(sz * threshold - 1e-9).toInt
    val df = new java.util.HashMap[Long, Int]()
    evalShRows.foreach(_._2.foreach(fp => df.merge(fp, 1, Integer.sum _)))
    // postings carry the eval rep's INDEX in the (id-sorted) attrs arrays,
    // not its id — the kernel's run-scan then reads attributes O(1)
    val attrs = evalShRows.map { case (r, fps) => (r, fps.length) }.sortBy(_._1)
    val idxOf = attrs.iterator.map(_._1).zipWithIndex.toMap
    val posts = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)] // (fp, eval idx)
    evalShRows.foreach { case (rep, fps) =>
      val o = oMin(fps.length)
      val l = math.min(fps.length, fps.length - o + math.min(minHits, o))
      val idx = idxOf(rep)
      fps.sortBy(fp => (df.get(fp).intValue, fp)).take(l).foreach(fp => posts += ((fp, idx)))
    }
    val byFp = posts.sortBy(identity).toArray
    val fpsB = Array.newBuilder[Long]
    val offB = Array.newBuilder[Int]
    val reps = new Array[Int](byFp.length)
    var i = 0
    while (i < byFp.length) {
      if (i == 0 || byFp(i)._1 != byFp(i - 1)._1) { fpsB += byFp(i)._1; offB += i }
      reps(i) = byFp(i)._2
      i += 1
    }
    offB += byFp.length
    EvalPrefixCsr(fpsB.result(), offB.result(), reps, attrs.map(_._1), attrs.map(_._2))
  }

  private def evalPrefixCandidates(
      repsSh: DataFrame,
      evalShRows: Array[(Long, Array[Long])],
      threshold: Double,
      minHits: Int = 3): DataFrame = {
    val c = evalPrefixCsr(evalShRows, threshold, minHits)
    repsSh.select(col("rep_id"),
      explode(gf.prefixCandidates(col("a_shl"), threshold, minHits,
        c.fps, c.offsets, c.reps, c.repIds, c.repNfp, probePrefix = false)).as("eval_rep"))
  }

  /** Collect the eval battery's (rep_id, sorted shingle fps) rows under an
    * explicit two-sided size contract. The LIMIT rides the plan so an
    * oversized battery fails BEFORE materializing on the driver — but a
    * row limit alone can TRUNCATE silently: a battery with more rows than
    * the limit yet few shingles per doc (avg < 8) passes the post-collect
    * shingle-sum check while the rows beyond the limit were never
    * collected, so those eval docs are simply never decontaminated
    * against. Contract: collecting EXACTLY the limit means truncation may
    * have occurred → fail loudly; strictly under it, the collect was
    * complete and the shingle total is checked against the cap. */
  private def collectEvalShingles(
      evalGroups: DataFrame,
      n: Int,
      maxEvalShingles: Int): Array[(Long, Array[Long])] = {
    val rowLimit = maxEvalShingles / 8 + 1
    val evalRows = evalGroups
      .select(col("rep_id"), gf.shingleFpsSorted(col("__payload"), n).as("b_shl"))
      .limit(rowLimit)
      .collect()
    require(evalRows.length < rowLimit,
      s"eval battery has >= $rowLimit distinct docs — the collect limit was " +
        "reached, so docs beyond it would be silently skipped; raise " +
        s"maxEvalShingles (= $maxEvalShingles) above 8x the battery's doc count")
    val evalShRows = evalRows.map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(evalShRows.iterator.map(_._2.length.toLong).sum <= maxEvalShingles,
      s"eval battery exceeds $maxEvalShingles shingles; raise maxEvalShingles")
    evalShRows
  }

  /** Decontamination: drop every corpus document that exactly or nearly
    * matches a document in a held-out evaluation set — the step that keeps
    * benchmark answers out of training data.
    *
    * ASYMMETRIC by design: an eval set is thousands of docs next to a
    * 100 TB corpus, so the eval side rides the plan (its prefix postings
    * as a CSR, its shingle arrays as a broadcast local relation) and the
    * corpus side never shuffles — candidacy is one kernel pass over the
    * corpus reps ([[evalPrefixCandidates]], recall exactly 1), the verify
    * is the exact sorted-merge Jaccard on candidates only. The corpus is
    * canonicalized first (near-dup work runs once per distinct content; a
    * contaminated content flags every copy through membership
    * expansion). */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxEvalShingles: Int = 50000000): DataFrame = {
    requireLongId(corpus, idCol)
    requireLongId(evalSet, idCol)

    // rep-fetch canonicalization: corpus text never shuffles — groups form
    // over (key, id) and rep payloads are fetched map-side (variant B of
    // [[canonicalGroupsRepFetch]]; guard-gated, conf-togglable)
    val (groups, repPayloads) = canonicalGroupsRepFetch(corpus, corpus, idCol,
      TextAnalysis.fingerprint(col(textCol)), col(textCol))
    val evalDocs = evalSet
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
      .where(col("__text").isNotNull)
    // eval reps collected under the shared two-sided size contract
    // ([[collectEvalShingles]]): complete-or-fail, never silent truncation
    val evalGroups = canonicalGroups(evalDocs, "id",
      TextAnalysis.fingerprint(col("__text")), col("__text"))
    val evalShRows = collectEvalShingles(evalGroups, n, maxEvalShingles)

    // Spread + pin the shingled reps: under rep-fetch the frame derives
    // from a file-split corpus scan (16-ish partitions), and it feeds the
    // eval-CSR kernel pass — the probe's compute-heavy stage — TWICE
    // (candidacy + verify). Without this the kernel ran at file-split
    // parallelism twice (measured at sf100: 10 of 32 cores, >23 min);
    // spread uses every core and the pin computes the shingling once.
    val repsSh = Layout.spread(repPayloads.select(col("rep_id"),
      gf.shingleFpsSorted(col("__payload"), n).as("a_shl"))).pinned()
    val candidates = evalPrefixCandidates(repsSh, evalShRows, threshold)
    // exact-Jaccard verify, candidates only; eval arrays broadcast (a
    // local relation), corpus arrays joined by candidate rep id
    val evalSh = {
      import corpus.sparkSession.implicits._
      evalShRows.toSeq.toDF("eval_rep", "b_shl")
    }
    val contaminatedReps = candidates
      .join(repsSh, "rep_id")
      .join(broadcast(evalSh), "eval_rep")
      .where(gf.jaccardSortedFps(col("a_shl"), col("b_shl")) >= threshold)
      .select(col("rep_id")).distinct()

    val contaminated = groups
      .join(contaminatedReps, Seq("rep_id"))
      .select(explode(col("members")).as(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** C4-style global line deduplication (boilerplate removal): a line whose
    * normalized form occurs in at least `minDocs` DISTINCT documents is
    * boilerplate (nav bars, cookie banners, license footers) and is removed
    * from every document. Returns one row per input document:
    * (id, n_lines, n_kept, n_dropped, cleaned) with line order preserved.
    *
    * Scale shape: lines are exploded once, frequency is a groupBy on the
    * line's md5 fingerprint (map-side combine; the shuffle carries 16-byte
    * keys, not line text), and the hot set — bounded by the amount of
    * distinct boilerplate, tiny next to the corpus — broadcasts back as an
    * anti-join, so document reassembly shuffles each line exactly once on
    * the document id. */
  def dropBoilerplateLines(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Int,
      maxBoilerplate: Int = 5000000): DataFrame = {
    // pass 1 — line-frequency: per-doc line fingerprints from a one-pass
    // kernel (the shuffle carries (8-byte fp, id), never line text),
    // groupBy fp with two-phase distinct-doc counting
    // limit BEFORE collect: an oversized hot set must fail without first
    // materializing millions of rows on the driver (the guard would
    // otherwise fire only after the OOM risk it exists to prevent)
    val hotRows = docs
      .select(col(idCol).cast("long").as("id"),
        explode(gf.lineFps(col(textCol))).as("fp"))
      .groupBy("fp")
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocs)
      .select("fp")
      .limit(maxBoilerplate + 1)
      .collect()
    require(hotRows.length <= maxBoilerplate,
      s"boilerplate set exceeds $maxBoilerplate distinct lines; " +
        "raise minDocs or maxBoilerplate")
    val hotSorted = hotRows.map(_.getLong(0)).sorted
    // pass 2 — narrow map: one kernel call per document removes hot lines
    // in place; no explode, no reassembly shuffle. The hot set (bounded by
    // the amount of distinct boilerplate) rides the plan like the IVF
    // centroids. Line identity = normalized-text equality, realized as the
    // 64-bit FNV fingerprint of the normalized line (collisions are
    // vanishing at any corpus size a 64-bit space serves; a collision
    // would drop a non-boilerplate line, never corrupt one).
    docs.select(
      col(idCol),
      gf.cleanLines(col(textCol), hotSorted).as("c"))
      .select(
        col(idCol),
        col("c.n_lines").as("n_lines"),
        col("c.n_kept").as("n_kept"),
        (col("c.n_lines") - col("c.n_kept")).as("n_dropped"),
        col("c.cleaned").as("cleaned"))
  }

  /** Exact-substring duplicated spans — the span-level dedup of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better"),
    * re-expressed as a word-k-gram fingerprint inverted index instead of a
    * suffix array over the concatenated corpus (the formulation that
    * distributes): a word position is duplicated when its k-gram
    * fingerprint occurs at least `minOcc` times corpus-wide (any document,
    * including its own — self-repetition is duplication too), and
    * overlapping or adjacent duplicated k-grams merge into maximal spans.
    * Returns one row per maximal span: (idCol, span_start, span_end,
    * span_words) in word offsets, end exclusive.
    *
    * Scale shape: the corpus tokenizes into positional 8-byte fingerprints
    * in a codegen kernel; the frequency pass is a groupBy on the
    * fingerprint with map-side partial counts (the shuffle carries
    * (fp, count), never n-gram text); the hit join restricts the posting
    * explosion to recurring fingerprints; span merging is one window per
    * document over integer positions (gaps-and-islands). Everything after
    * the count is bounded by duplicated-span volume, not corpus volume.
    * The positional explosion is deliberately recomputed for the two
    * passes rather than cached — it is a narrow map off the scan, and at
    * corpus scale recompute beats materializing len(corpus) 16-byte rows. */
  def duplicatedSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      minOcc: Int = 2): DataFrame = {
    requireLongId(docs, idCol)
    require(k >= 2, s"span k-gram width must be >= 2, got $k")
    require(minOcc >= 2, s"minOcc must be >= 2, got $minOcc")
    import org.apache.spark.sql.expressions.Window
    val pos = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        posexplode(gf.ngramFps(col(textCol), k)))
      .toDF("id", "pos", "fp")
    val dupFps = pos.groupBy("fp").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOcc)
      .select("fp")
    val hits = pos.join(dupFps, "fp").select("id", "pos")
    val byDoc = Window.partitionBy("id").orderBy("pos")
    hits
      // a gap opens when the next duplicated k-gram starts more than k
      // words after the previous one (i.e. their covered spans no longer
      // touch); null lag (first hit in a doc) opens the first island
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum("brk").over(byDoc))
      .groupBy(col("id"), col("grp"))
      .agg(min("pos").as("span_start"), (max("pos") + k).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_words"))
  }

  /** Apply [[duplicatedSpans]] to the corpus: remove EVERY duplicated
    * span from every document — the aggressive drop-all policy, which is
    * deterministic and needs no global occurrence order (the keep-first
    * policy of the suffix-array formulation requires ordering occurrences
    * corpus-wide; drop-all is the variant that stays embarrassingly
    * parallel). Null-text documents are excluded. Returns (idCol,
    * n_words, n_kept, cleaned) with the original token case preserved and
    * inter-word whitespace normalized to single spaces (the
    * canonicalization the span offsets are defined over).
    *
    * Scale shape: spans are integer offsets, few per document; they
    * groupBy-collect on the id and join back onto the corpus (broadcast
    * when duplication is sparse — the post-dedup common case; an id-key
    * shuffle otherwise), and a one-pass kernel drops the spans in place —
    * no word-level explode/reassembly of the corpus. */
  def removeDuplicatedSpans(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      minOcc: Int = 2): DataFrame = {
    val spans = duplicatedSpans(docs, textCol, idCol, k, minOcc)
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(flatten(transform(
        sort_array(collect_list(struct(
          col("span_start").cast("long").as("s"),
          col("span_end").cast("long").as("e")))),
        x => array(x.getField("s"), x.getField("e")))).as("__spans"))
    docs
      .where(col(textCol).isNotNull)
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        gf.dropSpans(col(textCol),
          coalesce(col("__spans"), lit(Array.empty[Long]))).as("c"))
      .select(col(idCol),
        col("c.n_words").as("n_words"),
        col("c.n_kept").as("n_kept"),
        col("c.cleaned").as("cleaned"))
  }

  /** Bloom-prefilter decontamination — same contract and same OUTPUT as
    * [[decontaminate]] (drop corpus docs whose shingle Jaccard vs any eval
    * doc reaches the threshold), different candidate generation: the eval
    * set's distinct shingle fingerprints build a driver-side Bloom filter
    * whose bits ride the plan (like the IVF centroids), and a corpus
    * document becomes a candidate iff ANY of its shingles hits the filter
    * — one codegen pass over the corpus with NO explode, NO band join, no
    * shuffle at all before the contamination-bounded exact-verify stage.
    *
    * Candidacy is COUNT-based, not any-hit: J(a,b) >= t implies
    * |a ∩ b| >= t·|a| (from shared >= t(|a|+|b|)/(1+t) and |b| >= shared),
    * and the filter holds the union of eval shingles with no Bloom false
    * negatives, so n_bloom_hits >= |a ∩ b| for every eval doc b. Requiring
    * n_bloom_hits >= t·|shingles(a)| therefore keeps candidate recall
    * EXACTLY 1 while discarding documents that merely share a few common
    * shingles with the eval battery — the failure mode of an any-hit rule
    * on small-vocabulary or boilerplate-heavy corpora, where nearly every
    * document shares something. Bloom false positives only loosen the
    * count, never drop a true candidate, so the output equals the
    * exact-Jaccard definition verbatim (this operator shares
    * [[decontaminate]]'s oracle).
    *
    * The 100 TB posture: filter size is O(bitsPerItem x distinct eval
    * shingles) bits independent of corpus size — a full eval battery of
    * 10 M shingles at 12 bits/item is a 15 MB task constant — while the
    * band-join variant's broadcast table grows with bands x eval docs and
    * still shuffles corpus band keys. Compose after exact dedup for
    * duplicate-heavy corpora (duplicates multiply verify candidates). */
  def decontaminateBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      bitsPerItem: Int = 12,
      maxEvalShingles: Int = 50000000): DataFrame = {
    val (groups, _, pairs) = bloomVerifiedPairs(
      corpus, evalSet, textCol, idCol, n, threshold, bitsPerItem, maxEvalShingles)
    val contaminated = groups
      .join(pairs.select("rep_id").distinct(), Seq("rep_id"))
      .select(explode(col("members")).as(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Contamination REPORT — which corpus documents match which eval docs
    * and how strongly: (idCol, eval_id, jaccard rounded to 4 decimals),
    * the audit artifact a curation review reads BEFORE a decontamination
    * pass mutates the corpus. Same machinery as [[decontaminateBloom]];
    * pairs expand through duplicate-group membership instead of
    * anti-joining, so every affected document is attributed. */
  def decontaminateReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      bitsPerItem: Int = 12,
      maxEvalShingles: Int = 50000000): DataFrame = {
    val (groups, evalGroups, pairs) = bloomVerifiedPairs(
      corpus, evalSet, textCol, idCol, n, threshold, bitsPerItem, maxEvalShingles)
    groups
      .join(pairs, Seq("rep_id"))
      .join(evalGroups.select(col("rep_id").as("eval_rep"),
        col("members").as("__eval_members")), Seq("eval_rep"))
      .select(explode(col("members")).as(idCol), col("__eval_members"), col("jaccard"))
      .select(col(idCol), explode(col("__eval_members")).as("eval_id"), col("jaccard"))
  }

  /** N-gram-collision decontamination (the GPT-3/PaLM recipe): drop every
    * corpus document sharing at least `minHits` distinct word n-grams with
    * the eval set's n-gram union. COMPLEMENTS the Jaccard-threshold
    * variants ([[decontaminate]]/[[decontaminateBloom]]): a short eval
    * answer quoted inside a long document has LOW Jaccard (the document's
    * shingle set dwarfs the eval doc's) yet is exactly the leakage a
    * training corpus must not carry — n-gram collision catches
    * CONTAINMENT, Jaccard catches near-duplication. Long n-grams (13 in
    * GPT-3; ~8 suits short-document corpora) keep natural collisions rare.
    *
    * Scale shape mirrors [[decontaminateBloom]]: the eval n-gram fp union
    * rides the plan as a Bloom filter — one codegen candidacy pass over
    * the corpus, recall exactly 1 (Bloom false positives only over-admit;
    * the candidacy count upper-bounds true hits) — candidates canonicalize
    * to distinct contents, and the verify is an exact fp equi-join +
    * per-content hit count, bounded by candidate volume (AQE broadcasts
    * the eval fp table when it is small). */
  def decontaminateNgram(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      minHits: Int = 1,
      bitsPerItem: Int = 12,
      maxEvalShingles: Int = 50000000): DataFrame = {
    requireLongId(corpus, idCol)
    requireLongId(evalSet, idCol)
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val evalDocs = evalSet
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
      .where(col("__text").isNotNull)
    val eb = evalBloomFor(evalDocs, n, bitsPerItem, maxEvalShingles)
    val bits = eb.bits
    val kProbes = eb.kProbes
    // the verify join's eval side comes from the cached fp array (a local
    // relation AQE broadcasts), NOT a re-computed eval aggregate
    val evalFpDf = {
      import corpus.sparkSession.implicits._
      eb.fps.toSeq.toDF("fp")
    }

    val candidates = corpus
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"),
        gf.bloomShingleHits(col(textCol), n, bits, kProbes).as("__bh"))
      .where(col("__bh").getItem(1) >= minHits)
      .select(col("id"), col("__text"))
    val groups = canonicalGroups(candidates, "id",
      TextAnalysis.fingerprint(col("__text")), col("__text"))
    // exact verify: both sides are distinct fp sets, so count(*) after the
    // equi-join IS the distinct shared-n-gram count
    val contaminatedReps = groups
      .select(col("rep_id"), explode(array_distinct(gf.ngramFps(col("__payload"), n))).as("fp"))
      .join(evalFpDf, "fp")
      .groupBy("rep_id")
      .agg(count(lit(1)).as("__hits"))
      .where(col("__hits") >= minHits)
      .select("rep_id")
    val contaminated = groups
      .join(contaminatedReps, Seq("rep_id"))
      .select(explode(col("members")).as(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Cached eval-side Bloom artifacts: the distinct fp union plus its
    * built filter bits. Keyed by the CANONICALIZED eval plan (same source
    * + same transforms = same key) and the fp/filter parameters, so
    * repeated decontaminate/monitor calls in one session skip the eval
    * aggregate + collect entirely (the battery is a task constant; a
    * mutated-in-place eval file under an unchanged plan is not detected —
    * re-create the session to invalidate, same contract as the minhash
    * coefficient cache). */
  private[graft] case class EvalBloom(fps: Array[Long], bits: Array[Long], kProbes: Int)

  private val evalBloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, EvalBloom]()

  /** Distinct eval n-gram fps + Bloom bits, one compute pass: the size
    * guard (a cheap distributed count) and the driver collect share a
    * persisted aggregate instead of computing it twice, and the result is
    * cached for the JVM (see [[EvalBloom]]). The collect is primitive
    * longs — 8 bytes each, guarded by maxEvalShingles BEFORE
    * materializing on the driver. */
  private[graft] def evalBloomFor(
      evalDocs: DataFrame, n: Int, bitsPerItem: Int, maxEvalShingles: Int): EvalBloom = {
    val evalFpDf = evalDocs
      .select(explode(array_distinct(gf.ngramFps(col("__text"), n))).as("fp"))
      .distinct()
    val key = evalFpDf.queryExecution.logical.canonicalized.toString +
      s"#b=$bitsPerItem#max=$maxEvalShingles"
    evalBloomCache.computeIfAbsent(key, _ => {
      evalFpDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nEvalFps = evalFpDf.count()
        require(nEvalFps <= maxEvalShingles,
          s"eval n-gram set has $nEvalFps distinct n-grams (max $maxEvalShingles); " +
            "raise maxEvalShingles or split the eval battery")
        val fps = {
          import evalFpDf.sparkSession.implicits._
          evalFpDf.as[Long].collect()
        }
        EvalBloom(fps, graft.functions.Kernels.bloomBuild(fps, bitsPerItem),
          graft.functions.Kernels.bloomK(bitsPerItem))
      } finally evalFpDf.unpersist(blocking = false)
    })
  }

  /** Shared Bloom-prefilter verify: (candidate groups, eval groups,
    * exact-verified (rep_id, eval_rep, jaccard) pairs). Candidate
    * generation is one codegen pass over the corpus (no explode, no band
    * join, no shuffle); verification runs once per DISTINCT content on
    * BOTH sides (duplicates multiply candidates on crawl-shaped corpora,
    * and a replicated eval battery would otherwise multiply the verify
    * the same way — the canonicalization lesson, applied symmetrically)
    * and scores with the one-merge-pass sorted-fingerprint Jaccard
    * kernel, an order of magnitude cheaper per pair than string-array
    * intersection. Jaccard depends only on content, so expanding rep
    * pairs through both membership lists reproduces every doc-level
    * pair exactly. */
  private def bloomVerifiedPairs(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      threshold: Double,
      bitsPerItem: Int,
      maxEvalShingles: Int): (DataFrame, DataFrame, DataFrame) = {
    requireLongId(corpus, idCol)
    requireLongId(evalSet, idCol)
    val evalDocs = evalSet
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
      .where(col("__text").isNotNull)
    val eb = evalBloomFor(evalDocs, n, bitsPerItem, maxEvalShingles)
    val bits = eb.bits
    val kProbes = eb.kProbes

    val bloomCands = corpus
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"),
        gf.bloomShingleHits(col(textCol), n, bits, kProbes).as("__bh"))
      .where(col("__bh").getItem(0) > 0 &&
        col("__bh").getItem(1) >= lit(threshold) * col("__bh").getItem(0))
      .select(col("id"), col("__text"))

    // rep-fetch canonicalization: candidate text never re-shuffles — the
    // payload fetch scans the RAW corpus (so the bloom candidacy kernel is
    // not recomputed) map-side-filtered by the broadcast rep-id set
    val corpusPayloads = corpus
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
    val (groups, repPayloads) = canonicalGroupsRepFetch(bloomCands, corpusPayloads,
      "id", TextAnalysis.fingerprint(col("__text")), col("__text"))
    val evalGroups = canonicalGroups(evalDocs, "id",
      TextAnalysis.fingerprint(col("__text")), col("__text"))
    // spread + pin for the same reason as [[decontaminate]]'s repsSh: the
    // rep-fetch frame is scan-derived and feeds the kernel pass twice
    val candSh = Layout.spread(repPayloads.select(col("rep_id"),
      gf.shingleFpsSorted(col("__payload"), n).as("a_shl"))).pinned()
    // Candidacy via the eval-prefix CSR kernel (recall exactly 1 — see
    // [[evalPrefixCandidates]]). The shared-shingle equi-join this
    // replaces had recall 1 too, but its volume is Σ df_cand·df_eval over
    // shared fps — on a saturated shingle space that went quadratic
    // (measured ~9·10^10 join rows at sf100: the shuffle filled the disk).
    val evalShRows = collectEvalShingles(evalGroups, n, maxEvalShingles)
    val candidates = evalPrefixCandidates(candSh, evalShRows, threshold)
    val evalSh = {
      import corpus.sparkSession.implicits._
      evalShRows.toSeq.toDF("eval_rep", "b_shl")
    }
    val pairs = candidates
      .join(candSh, "rep_id")
      .join(broadcast(evalSh), "eval_rep")
      // threshold on the RAW score (rounding first would admit pairs just
      // under it); the reported value rounds for cross-engine stability
      .withColumn("__jraw", gf.jaccardSortedFps(col("a_shl"), col("b_shl")))
      .where(col("__jraw") >= threshold)
      .select(col("rep_id"), col("eval_rep"), round(col("__jraw"), 4).as("jaccard"))
    (groups, evalGroups, pairs)
  }

  /** One-call near-dup pipeline — the composition every training corpus
    * runs, in the order that scales: MinHash-LSH candidates verified by
    * exact Jaccard (exact duplicates are canonicalized inside), connected
    * components over the pair graph, then drop every non-keeper. Returns
    * the deduplicated corpus with original columns intact. */
  def nearDupPipeline(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairsVerified(df, textCol, idCol, n, numHashes, bands, threshold)
    dropNearDuplicates(df, pairs, idCol)
  }

  /** Embedding-cosine near-dup pairs: all (a, b) with cosine >= minCos.
    *
    * Exact all-pairs formulation for oracle checking; at scale, swap the
    * self-join for [[Similarity]] LSH bucketing — same verify step,
    * bounded pair space.
    */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    requireLongId(emb, idCol)
    // The non-equi self-join executes as a nested-loop join whose
    // parallelism is the STREAMED side's partition count — bytes-small
    // vector table, O(n²) probe loop, so spread it over every core
    // ([[Layout.spread]] for the measured rationale: 4 of 32 cores,
    // 76 min at a 200k-vector corpus without it).
    //
    // Norms are computed ONCE per row, outside the pair loop: the
    // threshold test is `dot >= minCos·|a|·|b|` (algebraically identical
    // to cosine >= minCos for nonzero norms), so the O(n²) inner loop does
    // one multiply-add per dimension instead of cosine's three. Zero-norm
    // vectors never pair, matching the cosine path's 0-similarity.
    // b carries an explicit broadcast hint: without it the added norm
    // column pushes the planner's size estimate past the auto-broadcast
    // threshold and the non-equi join degrades to CartesianProductExec
    // (observed at sf10: ~3x slower than the broadcast NLJ on identical
    // work). The build side is the whole corpus — fine for the exact
    // baseline's operating range (128 MB at 500k x dim 64) — but the hint
    // is gated on a measured footprint (the probe-guard pattern): past
    // `maxBroadcastBytes` an unconditional hint would hard-fail in the
    // broadcast build where the unhinted cartesian plan merely runs slow,
    // and at that size the LSH twin is the declared path anyway.
    val a = Layout.spread(
      emb.select(col(idCol).cast("long").as("a_id"), col(vecCol).as("a_vec"),
        gf.l2norm(col(vecCol)).as("a_n")))
    val bRaw = emb.select(col(idCol).cast("long").as("b_id"), col(vecCol).as("b_vec"),
      gf.l2norm(col(vecCol)).as("b_n"))
    val est = emb.agg(count(lit(1)), coalesce(max(size(col(vecCol))), lit(0))).head()
    val estBytes = est.getLong(0) * (math.max(est.getInt(1), 0).toLong * 4L + 48L)
    val b = if (estBytes <= maxBroadcastBytes) broadcast(bRaw) else bRaw
    a.join(b, col("a_id") < col("b_id"))
      .where(col("a_n") > 0.0 && col("b_n") > 0.0 &&
        gf.dot(col("a_vec"), col("b_vec")) >= lit(minCos) * col("a_n") * col("b_n"))
      .select(col("a_id"), col("b_id"))
  }

  /** Embedding-space decontamination: drop corpus vectors whose cosine to
    * ANY eval vector reaches minCos — the semantic complement of the
    * n-gram decontaminate family (catches paraphrased/reworded benchmark
    * leakage that shingle overlap misses; Yang et al. 2023 "Rethinking
    * Benchmark and Contamination" shape).
    *
    * Scale shape: the eval battery is small by nature (benchmarks), so it
    * broadcasts and the check is a pass over the corpus with no shuffle of
    * the corpus DATA volume; per-row cost |eval| x dim fused in the
    * codegen cosine. The corpus side is still a bytes-small vector table
    * (n x dim floats), so file-split sizing would hand the O(corpus x
    * eval x dim) probe loop to a handful of tasks — the same disease
    * [[embeddingPairs]] fixes ([[Layout.spread]]; measured at sf10: 4 of
    * 32 cores busy for hours without it). Rows with null vectors are kept
    * (no evidence).
    * Output: one row per corpus row — (idCol, n_hits, keep). */
  def decontaminateEmbeddings(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double): DataFrame = {
    // norms once per row (both sides), dot-only inner loop — see
    // [[embeddingPairs]] for the algebra
    val e = evalSet.filter(col(vecCol).isNotNull)
      .select(col(vecCol).as("__ev"), gf.l2norm(col(vecCol)).as("__en"))
    val hits = Layout.spread(
        corpus.filter(col(vecCol).isNotNull)
          .select(col(idCol), col(vecCol).as("__v"), gf.l2norm(col(vecCol)).as("__vn")))
      .crossJoin(broadcast(e))
      .where(col("__vn") > 0.0 && col("__en") > 0.0 &&
        gf.dot(col("__v"), col("__ev")) >= lit(minCos) * col("__vn") * col("__en"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) === 0).as("keep"))
  }

  /** LSH-bucketed embedding near-dup pairs — the scale path for
    * [[embeddingPairs]]: candidates meet in a random-hyperplane bucket in
    * any of `tables` hash tables (high-cosine pairs collide with
    * probability (1 - θ/π)^bits per table), then exact cosine verifies.
    * Shuffle is on (table, bucket); pair space bounded by bucket occupancy
    * instead of |n|². */
  def embeddingPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double,
      bits: Int = 8,
      tables: Int = 16,
      maxBucket: Option[Int] = None,
      numParts: Int = 0): DataFrame = {
    requireLongId(emb, idCol)
    val bucketed = emb.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      posexplode(array((0 until tables).map(t =>
        gf.hyperplaneBucket(col(vecCol), bits, seed = 0x9e3779b9L * (t + 1))): _*))
        .as(Seq("table", "bucket")))
    // One shuffle on (table, bucket), then the whole O(b²) score-and-filter
    // runs inside a single kernel call per bucket: candidate pairs that
    // fail minCos are never materialized as rows (the bucket self-join
    // formulation shuffled every candidate — measured ~5x slower at sf0.1).
    // maxBucket is the degenerate-density valve: buckets denser than the
    // cap are skipped in that table (a dense region usually recurs across
    // tables; the principled fix for persistent density is more bits).
    //
    // That shuffle carries each VECTOR once per table (`tables`x data
    // amplification — inherent to multi-table LSH: the computation is
    // bucket-local, so either vectors move to buckets or nothing meets).
    // The per-task collect_list volume is banded-bytes/shuffle-partitions,
    // and the default partition count goes off a cliff at scale (sf100:
    // 61 GB over 32 partitions = 1.9 GB/task of list buffers, measured as
    // a spill storm) — callers at scale pass `numParts` sized from the
    // banded volume (e.g. n·tables·rowBytes / 256 MB; see the catalog's
    // lshPartsFor). The explicit repartition IS the groupBy's shuffle
    // (same keys), so this adds no extra pass.
    val spread = if (numParts > 0) bucketed.repartition(numParts, col("table"), col("bucket"))
      else bucketed
    val grouped = spread
      .groupBy("table", "bucket")
      .agg(collect_list(struct(col("id"), col("vec"))).as("items"))
    val bounded = maxBucket match {
      case None => grouped
      case Some(cap) => grouped.where(size(col("items")) <= cap)
    }
    bounded
      .select(explode(gf.bucketPairsCos(col("items"), minCos)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-dup removal
    * by clustering embeddings and deduplicating WITHIN clusters only —
    * the approximation that turns the all-pairs O(n²) cosine comparison
    * into k independent O((n/k)²) cluster-local ones. Returns one row per
    * embedding: (id, cluster, keep) — keep=false for every member of a
    * within-cluster cosine-≥-minCos component except its min-id keeper.
    *
    * Cluster seeds are the k first vectors in md5-hash id order (the
    * engine's reproducible sampler, SQL-expressible for the oracle);
    * `iters > 0` refines them with driver-side spherical k-means over a
    * deterministic hash sample — the paper's setup — at the cost of
    * SQL-oracle-ability (float means are not reproducible cross-engine).
    * Assignment is a codegen argmax-cosine map with the (k × dim)
    * centroid table riding the plan: no shuffle, no broadcast lifecycle.
    * The pair stage shuffles each vector ONCE on its cluster id and runs
    * the cluster-local scoring in a kernel that never materializes
    * sub-threshold pairs; at 100 TB, k scales with corpus size to hold
    * n/k (cluster occupancy) roughly constant. */
  /** Cluster-count sizing for [[semdedup]]: k = ceil(sqrt(n/8)) (min 8)
    * balances the flat argmax assignment, O(n·k·d), against the
    * within-cluster pair stage, O((n/k)²·k·d) = O(n²·d/k) — both land at
    * O(n^1.5·d), the optimum for this two-stage shape. A fixed k leaves
    * the pair stage quadratic as the corpus grows; k ∝ n pins cluster
    * size but makes the flat assignment quadratic instead (the escape at
    * that scale is a hierarchical / IVF assignment). */
  def semdedupKFor(n: Long): Int = {
    require(n > 0, "need a positive corpus size")
    math.max(8, math.ceil(math.sqrt(n / 8.0)).toInt)
  }

  def semdedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      minCos: Double,
      iters: Int = 0,
      sampleSize: Int = 10000): DataFrame = {
    requireLongId(emb, idCol)
    val vecs = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .where(col("vec").isNotNull)
    val centroids = trainClusterCentroids(vecs, k, iters, sampleSize)

    val assigned = vecs
      .withColumn("cluster", gf.nearestCos(col("vec"), centroids))
      .pinned() // reused by the pair stage AND the output join
    val pairs = assigned
      .groupBy("cluster")
      .agg(collect_list(struct(col("id"), col("vec"))).as("items"))
      .select(explode(gf.bucketPairsCos(col("items"), minCos)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
    // large-star/small-star, not min-label propagation: near-dup chains at
    // a cosine threshold can have graph diameter >> the min-label round
    // budget (observed at 10x with sqrt-scaled k), while star converges in
    // O(log² n) rounds regardless of diameter. Output contract (comp = min
    // reachable id) is identical.
    val comp = connectedComponentsStar(pairs)
    assigned
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        (col("comp").isNull || col("comp") === col("id")).as("keep"))
  }

  /** Centroids for embedding clustering over a (id, vec) frame: seeds are
    * the k first vectors in md5-hash id order (the engine's reproducible
    * sampler — SQL-expressible, which is what makes the iters=0 operating
    * point oracle-able); `iters > 0` refines them with driver-side
    * spherical k-means over a deterministic hash sample, at the cost of
    * cross-engine float-mean reproducibility. */
  private def trainClusterCentroids(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      sampleSize: Int): Array[Array[Double]] = {
    val seeds = vecs
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("vec"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.nonEmpty, "empty embedding corpus")
    if (iters == 0) seeds
    else {
      // deterministic hash sample (same shape as the IVF quantizer's)
      val sample = vecs
        .select(col("vec"), xxhash64(col("id")).as("__h"))
        .orderBy(col("__h")).limit(sampleSize)
        .select(col("vec"))
        .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
      sphericalKmeans(sample, seeds, iters)
    }
  }

  /** First-class embedding clustering — [[semdedup]]'s assignment stage as
    * its own operator (corpus topic/domain structure, cluster-stratified
    * sampling, and the input to cluster-scoped pipelines): spherical
    * k-means assignment against a plan-embedded centroid table, returning
    * (idCol, cluster, cluster_size). Assignment is a codegen argmax-cosine
    * narrow map — the only shuffle is the k-row size aggregate, which
    * broadcasts back onto the assignment. At 100 TB, k grows with the
    * corpus to hold per-cluster occupancy constant; the centroid table
    * stays a task constant (k x dim doubles). */
  def clusterEmbeddings(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 0,
      sampleSize: Int = 10000): DataFrame = {
    requireLongId(emb, idCol)
    val vecs = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .where(col("vec").isNotNull)
    val centroids = trainClusterCentroids(vecs, k, iters, sampleSize)
    val assigned = vecs.withColumn("cluster", gf.nearestCos(col("vec"), centroids))
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    assigned
      .join(broadcast(sizes), Seq("cluster"))
      .select(col("id").as(idCol), col("cluster"), col("cluster_size"))
  }

  // ----- persistent incremental-dedup index (the daily-delta shape) -----

  /** Build the PERSISTENT dedup fingerprint index for a corpus snapshot —
    * the build-once side of incremental ingestion (a 100 TB corpus is not
    * re-deduplicated for every crawl delta; the delta probes an index).
    *
    * Three tables under `tableName`:
    *   - `<t>` (reps): ONE ROW PER DISTINCT CONTENT — (rep_id = min doc id
    *     of that content, content_key, sorted shingle-fp array), partitioned
    *     by `pb = pmod(hash(rep_id), numParts)` so the probe's verify fetch
    *     prunes partitions dynamically (the IVFADC index convention).
    *     Exact-dup canonicalization is IN the index: web crawls run 30-50%
    *     exact duplication, and every exact copy would multiply probe work.
    *   - `<t>_fps` : the shingle-fp INVERTED INDEX (fp, rep_id), partitioned
    *     by `fb = pmod(hash(fp), numParts)`. Shared-shingle candidacy has
    *     recall exactly 1 for any Jaccard threshold > 0 (a qualifying pair
    *     shares a shingle), so the probe's output is EXACT — unlike banding,
    *     whose recall is a tuned property. The index carries 8-byte
    *     fingerprints, never shingle text.
    *   - `<t>_meta`: (n, num_parts).
    *
    * Probe economics ([[dedupIndexProbe]]): the delta side broadcasts, so
    * neither index table is ever shuffled — candidacy is one column-pruned
    * scan of `<t>_fps` (partition-pruned via the delta's fp hash buckets)
    * and verification fetches only candidate rep rows from `<t>` (partition-
    * pruned via the candidates' rep_id hash buckets). Cost scales with the
    * delta and its co-occurrence, not the corpus. */
  def dedupIndexBuild(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      tableName: String,
      n: Int = 3,
      numParts: Int = 16): Unit = {
    requireLongId(corpus, idCol)
    val spark = corpus.sparkSession
    import spark.implicits._
    dropWarehouseTables(spark,
      Seq(tableName, s"${tableName}_fps", s"${tableName}_df", s"${tableName}_meta"))
    val docs = corpus
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
    val groups = canonicalGroups(docs, "id",
      TextAnalysis.fingerprint(col("__text")), col("__text"))
    val repsF = groups.select(
      col("rep_id"),
      col("__ck").as("content_key"),
      gf.shingleFpsSorted(col("__payload"), n).as("shl"))
    // global document frequency per fp — defines the canonical (df, fp)
    // rare-first order every probe-side prefix filter uses. Written first;
    // everything below reads it back instead of recomputing.
    repsF.select(explode(col("shl")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .withColumn("fb", pmod(hash(col("fp")), lit(numParts)))
      .write.mode("overwrite").partitionBy("fb").format("parquet")
      .saveAsTable(s"${tableName}_df")
    // reps carry BOTH orderings of the fp set: `shl` (value-sorted, the
    // exact-Jaccard merge kernel's input) and `shl_rk` ((df, fp)-ordered,
    // rare first — position i IS the fp's prefix rank, so the probe's
    // broadcast-kernel path slices its prefix straight off the array).
    val rkArr = repsF
      .select(col("rep_id"), explode(col("shl")).as("fp"))
      .join(spark.table(s"${tableName}_df").select("fp", "df"), Seq("fp"))
      .groupBy("rep_id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("fp")))),
        s => s.getField("fp")).as("shl_rk"))
    repsF.join(rkArr, Seq("rep_id"))
      .withColumn("pb", pmod(hash(col("rep_id")), lit(numParts)))
      .write.mode("overwrite").partitionBy("pb").format("parquet")
      .saveAsTable(tableName)
    // The inverted postings (the probe's join-path candidacy) denormalize
    // n_fp (Jaccard needs both set sizes) and rk (prefix rank, 0-based —
    // the probe selects rk < n_fp - ceil(t*n_fp) + j for its own t).
    spark.table(tableName)
      .select(col("rep_id"), size(col("shl")).as("n_fp"),
        posexplode(col("shl_rk")).as(Seq("rk", "fp")))
      .withColumn("fb", pmod(hash(col("fp")), lit(numParts)))
      .write.mode("overwrite").partitionBy("fb").format("parquet")
      .saveAsTable(s"${tableName}_fps")
    val nReps = spark.table(tableName).count()
    Seq((n, numParts, nReps)).toDF("n", "num_parts", "n_reps")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${tableName}_meta")
  }

  /** Probe a persistent dedup index with a delta batch: per delta doc,
    * (status, match_id, jaccard) against the INDEXED corpus —
    *   - `exact`: an indexed doc has identical normalized content;
    *     match_id = min such corpus id (the rep_id by construction),
    *     jaccard = 1.0 by definition.
    *   - `near` : else some indexed doc has exact shingle Jaccard >=
    *     threshold; match_id = min such corpus id, jaccard = that pair's
    *     score (rounded for cross-engine stability).
    *   - `new`  : else — the doc is admissible.
    *
    * EXACT output (not approximate): candidacy is prefix-filtered
    * (AllPairs/PPJoin — rare-first (df, fp) order, prefix length
    * |X| - ceil(t·|X|) + j, at least min(j_A, j_B) shared prefix fps),
    * which has recall exactly 1 for J >= t (see the inline proof at the
    * candidacy join); survivors are verified with the exact sorted-merge
    * Jaccard kernel against the stored rep fp arrays. The prefix filter is
    * what keeps candidacy LINEAR when the shingle space saturates — the
    * full-postings count join this replaced measured Σ df_idx·df_delta =
    * 2.23 BILLION join rows at sf10 (vs 22M at sf1) on the ~30k-trigram
    * corpus. Delta reps that match exactly are excluded from near
    * candidacy up front: exact dominates near in the output and a re-crawl
    * delta is mostly exact dups. The delta is canonicalized to distinct
    * contents before probing (verify work per distinct content, not per
    * doc — the §9.3 symmetry rule) and every join against the index
    * broadcasts the delta side: the corpus-sized tables are scanned,
    * never shuffled.
    *
    * SIZE GUARD: broadcasting is only correct while the delta is small.
    * The dominant broadcast is the exploded (fb, fp, d_rep) frame — one
    * hash-relation entry per delta shingle — so after canonicalizing we
    * measure the delta (one cheap aggregate over the checkpointed frame)
    * and estimate that footprint; above `maxBroadcastBytes` every
    * delta-side broadcast hint is dropped and the probe degrades to
    * ordinary shuffled joins. At that size the "delta" is no longer a
    * daily crawl increment but a corpus-scale batch, and shuffling both
    * sides IS the right plan — the guard makes the cutover explicit
    * instead of letting a 10 GB broadcast OOM the executors. */
  def dedupIndexProbe(
      delta: DataFrame,
      textCol: String,
      idCol: String,
      tableName: String,
      threshold: Double = 0.5,
      maxBroadcastBytes: Long = 256L << 20,
      prefixMinHits: Int = 3): DataFrame = {
    requireLongId(delta, idCol)
    require(prefixMinHits >= 1, "prefixMinHits must be at least 1")
    val spark = delta.sparkSession
    val reps = spark.table(tableName)
    val fpsIdx = spark.table(s"${tableName}_fps")
    require(fpsIdx.columns.contains("rk") && reps.columns.contains("shl_rk") &&
      spark.catalog.tableExists(s"${tableName}_df"),
      s"$tableName was built by an older dedupIndexBuild (no rank column / " +
        s"ranked rep arrays / df table) — rebuild the index before probing")
    val meta = spark.table(s"${tableName}_meta").head()
    val n = meta.getInt(0)
    val nReps = meta.getLong(2)
    val dfIdx = spark.table(s"${tableName}_df")

    val docs = delta
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__text"))
    val groups = canonicalGroups(docs, "id",
      TextAnalysis.fingerprint(col("__text")), col("__text"))
    val dSh = groups.select(
      col("rep_id").as("d_rep"),
      col("__ck").as("d_key"),
      gf.shingleFpsSorted(col("__payload"), n).as("d_shl"))
      .pinned() // reused by exact join, candidacy, verify

    // size guard: one cheap aggregate over the checkpointed delta decides
    // broadcast vs shuffle for EVERY delta-derived join side (they scale
    // together — the exploded fp frame dominates at ~48 B/hash-relation
    // entry, the shingle arrays at ~8 B/fp)
    val st = dSh.agg(count(lit(1)).as("c"), sum(size(col("d_shl"))).as("f")).head()
    val dRows = st.getLong(0)
    val dFpsTotal = if (st.isNullAt(1)) 0L else st.getLong(1)
    val bcastDelta = dRows * 64L + dFpsTotal * 48L <= maxBroadcastBytes
    def deltaSide(df: DataFrame): DataFrame = if (bcastDelta) broadcast(df) else df

    // exact: content-key equi-join, delta keys broadcast; the scan reads
    // (rep_id, content_key) only, and rep_id IS min(corpus id | content).
    // Checkpointed (delta-sized) because it is consumed twice: the final
    // status join AND the near-candidacy exclusion below.
    val exactM = reps
      .join(deltaSide(dSh.select(col("d_rep"), col("d_key").as("content_key"))),
        Seq("content_key"))
      .groupBy("d_rep").agg(min(col("rep_id")).as("exact_match"))
      .pinned()

    // Near candidacy is PREFIX-FILTERED (AllPairs/PPJoin, Bayardo 2007):
    // the earlier shape joined the delta's FULL fp lists against the full
    // posting index and counted per-pair hits — exact, but its join volume
    // is Σ_fp df_idx(fp)·df_delta(fp), which grows quadratically whenever
    // the shingle space saturates (measured 22M rows at sf1 → 2.23B at
    // sf10: a ~30k-fp trigram vocabulary makes every delta fp collide with
    // ~1000 corpus reps). Prefix filtering restores a linear candidacy:
    //
    //  - Canonical order: ascending (build-time df, fp) — rare-first, so
    //    hot fps fall OUTSIDE prefixes and never fan out.
    //  - J(A,B) >= t forces |A∩B| >= ceil(t·|A|) and >= ceil(t·|B|); the
    //    j smallest common elements (canonical order) then sit within the
    //    first |X| - ceil(t·|X|) + j elements of BOTH sides (each has
    //    >= ceil(t·|X|) - j commons after it). So joining only those
    //    prefixes and requiring >= min(j_A, j_B) hits — j_X = min(j,
    //    ceil(t·|X|)), which degrades gracefully for tiny fp lists — has
    //    recall EXACTLY 1, while j kills the pairs that share only a few
    //    noise shingles. On the saturated synthetic corpus the expected
    //    chance intersection between two random docs is ~0.05 fps, so the
    //    candidate count falls ~400x per unit of j (Poisson tail); j = 2
    //    still left ~28M chance pairs at sf10 (a broadcast OOM), j = 3
    //    leaves thousands. True matches need >= ceil(t·n) >> 3 shared fps.
    //  - Size filter: |B| must lie in [t·|A|, |A|/t] (else J < t) — applied
    //    as a post-join predicate before the hit count.
    //  - ceil(t·x) is computed as ceil(t·x − 1e-9): a float rounding UP to
    //    the next integer would silently shorten prefixes and raise hit
    //    requirements (a recall bug); rounding DOWN only admits candidates.
    //
    // Delta fps absent from the index (df join misses) generate no
    // candidates and are dropped before ranking; removing them only moves
    // common fps EARLIER in the delta's order, so the prefix bound (which
    // uses the FULL |A|) stays recall-safe. Survivors are verified against
    // the reps' stored fp arrays with the exact sorted-merge Jaccard
    // kernel; every emitted (match, score) is exact, as before.
    //
    // Exact-matched delta reps are still excluded up front — exact
    // dominates near in the output, and a re-crawl delta is MOSTLY exact
    // dups, so their candidacy fan-out is pure waste.
    val j = lit(prefixMinHits)
    def oMin(nCol: Column): Column = ceil(nCol.cast("double") * threshold - 1e-9)
    val dNear = dSh.join(deltaSide(exactM.select(col("d_rep"))), Seq("d_rep"), "left_anti")
    val dFps = dNear
      .select(col("d_rep"), size(col("d_shl")).as("d_nfp"),
        explode(col("d_shl")).as("fp"))
    // delta prefix postings at hit requirement h: prefix length grows with
    // h (the per-doc min(h, ceil(t·n)) cap keeps tiny docs exact-recall)
    def prefFor(h: Int): DataFrame = dfIdx.select(col("fp"), col("df"))
      .join(deltaSide(dFps), Seq("fp"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("d_rep").orderBy("df", "fp")))
      .where(col("rn") <= col("d_nfp") - oMin(col("d_nfp")) +
        least(lit(h), oMin(col("d_nfp"))))
      .select(col("d_rep"), col("d_nfp"), col("fp"), col("df"))
    val dPref = prefFor(prefixMinHits)
      .pinned() // reused: selectivity estimate + one of the two candidacy paths
    // the candidacy join is the probe's compute-heavy broadcast join and
    // its streamed side (the prefix-filtered postings) is bytes-small —
    // without the explicit spread the whole join + hit aggregation runs at
    // file-split parallelism (measured 4 of 32 cores at sf10, the
    // io.Layout rule). Under the tripped guard the joins shuffle anyway.
    val idxPref = fpsIdx
      .where(col("rk") < col("n_fp") - oMin(col("n_fp")) + least(j, oMin(col("n_fp"))))
    // ADAPTIVE CANDIDACY. The inverted-index join's volume is
    // Σ_fp df_idx(fp)·df_delta(fp) over the two prefixes — estimated by
    // Σ df over the delta's prefix rows (one delta-sized aggregate; df is
    // already joined on). On ordinary Zipf-shingled corpora the rare-first
    // prefixes make that sum tiny and the join IS the optimal plan: it
    // touches only the postings the delta's fps select. On a SATURATED
    // shingle space (the adversarial case: ~30k distinct trigrams across
    // 450k reps) every delta fp collides with hundreds of reps and the
    // join goes quadratic — measured 1.09B join rows at sf10 AFTER prefix
    // filtering. Past the cutover (estimated join rows > 16x a full corpus
    // scan) the probe flips to a broadcast-probe scan: the delta's prefix
    // postings ride the plan as a CSR (the IVF-centroid/cleanLines
    // pattern), one kernel pass over the reps table counts hits
    // task-locally, and the billion-row (pair, hit) shuffle never exists.
    // Both paths implement the same exact-recall prefix+hits bound; the
    // output is identical (spec-asserted).
    val pst = dPref.agg(sum(col("df")).as("s"), count(lit(1)).as("c")).head()
    val estJoinRows = if (pst.isNullAt(0)) 0L else pst.getLong(0)
    val prefRows = pst.getLong(1)
    // SATURATION-SIZED HIT REQUIREMENT (a rule, not a constant — the
    // lshBitsFor pattern). The kernel path never materializes the est
    // join rows, but its OUTPUT — pairs with >= h prefix hits — still
    // feeds the array-carrying verify join, and on a saturated space the
    // chance-pair count at the default h is itself a scale disease:
    // measured at sf100 (λ = est/(nD·nR) = 0.053, nD·nR = 2.2·10^12),
    // h = 3 admits ~5·10^7 chance pairs whose verify join shipped ~1 KB
    // of shingle arrays each and FILLED THE DISK, while at sf10 the same
    // λ yields ~10^5 pairs — invisible. So h is sized from the measured
    // saturation: the smallest h whose expected chance-candidate count
    // (Poisson first term nD·nR·λ^h/h!, λ doubled as a safety factor for
    // prefix growth and model thinness, e^{-λ} dropped) fits a verify
    // budget of max(2M, 4·nD) pairs. Recall stays EXACTLY 1 at every h:
    // the prefix lengthens with h and the per-side min(h, ceil(t·n))
    // caps keep the one-sided theorem intact — a larger h only tightens
    // a chance-pair filter whose survivors are exact-verified anyway
    // (path-equality spec unchanged).
    val jEff =
      if (estJoinRows == 0L) prefixMinHits
      else {
        val lambda = 2.0 * estJoinRows.toDouble /
          (math.max(dRows, 1L).toDouble * math.max(nReps, 1L).toDouble)
        val candCap = math.max(2e6, 4.0 * dRows.toDouble)
        def chance(k: Int): Double = {
          var t = dRows.toDouble * nReps.toDouble
          var i = 1
          while (i <= k) { t = t * lambda / i; i += 1 }
          t
        }
        var h = prefixMinHits
        while (h < 16 && chance(h) > candCap) h += 1
        h
      }
    // The kernel path is gated on ITS OWN footprint — the collected prefix
    // CSR (~12 B/posting + attrs, with the prefix growth jEff adds
    // bounded by (jEff - minHits)·nD postings) — NOT on the join guard:
    // at sf100 the delta's exploded-fp hash relation (870 MB) trips
    // `bcastDelta` while the CSR is only ~180 MB, and falling back to the
    // shuffled join on a saturated space meant a ~10^11-row candidacy
    // shuffle that filled the disk. Only a delta that defeats BOTH
    // (a corpus-scale batch on a saturated space) takes the shuffled
    // join — at that point re-running dedup, not probing, is the right
    // operation anyway.
    val kernelPath = estJoinRows > 16L * math.max(nReps, 1L) &&
      (prefRows + (jEff - prefixMinHits).toLong * dRows) * 12L +
        dRows * 16L <= maxBroadcastBytes
    if (sys.env.contains("GRAFT_DEBUG_PROBE"))
      println(s"[probe-debug] bcast=$bcastDelta est=$estJoinRows prefRows=$prefRows " +
        s"nReps=$nReps jEff=$jEff kernel=$kernelPath")
    val cand =
      if (kernelPath) {
        val kPref = if (jEff == prefixMinHits) dPref else prefFor(jEff)
        val rows = kPref.select(col("fp"), col("d_rep"), col("d_nfp")).collect()
        val byFp = rows.sortBy(r => (r.getLong(0), r.getLong(1)))
        // postings carry delta-rep INDEXES into the id-sorted attrs arrays
        // (O(1) attribute lookup in the kernel's run-scan)
        val attrs = rows.map(r => (r.getLong(1), r.getInt(2))).distinct.sortBy(_._1)
        val idxOf = attrs.iterator.map(_._1).zipWithIndex.toMap
        val fpsB = Array.newBuilder[Long]
        val offB = Array.newBuilder[Int]
        val drB = new Array[Int](byFp.length)
        var i = 0
        while (i < byFp.length) {
          if (i == 0 || byFp(i).getLong(0) != byFp(i - 1).getLong(0)) {
            fpsB += byFp(i).getLong(0); offB += i
          }
          drB(i) = idxOf(byFp(i).getLong(1))
          i += 1
        }
        offB += byFp.length
        Layout.spread(reps.select(col("rep_id"), col("shl_rk")))
          .select(col("rep_id"),
            explode(gf.prefixCandidates(col("shl_rk"), threshold, jEff,
              fpsB.result(), offB.result(), drB,
              attrs.map(_._1), attrs.map(_._2))).as("d_rep"))
      } else {
        // Hit counting is a WINDOW over the pair, not a groupBy: the join
        // output's (d_rep, rep_id) keys are mostly unique (noise pairs
        // share exactly one fp), so a hash aggregate degenerates — every
        // partial map overflows and re-sorts per spill (measured: 32
        // cores pinned in TimSort for minutes at sf10). The window shape
        // is one exchange and ONE external sort per partition, then a
        // streaming count per frame.
        val pairW = Window.partitionBy("d_rep", "rep_id")
        (if (bcastDelta) Layout.spread(idxPref) else idxPref)
          .join(deltaSide(dPref.drop("df")), Seq("fp"))
          .where(col("n_fp") >= oMin(col("d_nfp")) &&
            col("n_fp") <= floor(col("d_nfp").cast("double") / threshold + 1e-9))
          .select(col("d_rep"), col("rep_id"), col("d_nfp"), col("n_fp"))
          .withColumn("__hits", count(lit(1)).over(pairW))
          .withColumn("__rn", row_number().over(pairW.orderBy("d_nfp")))
          .where(col("__rn") === 1 &&
            col("__hits") >= least(least(j, oMin(col("d_nfp"))), least(j, oMin(col("n_fp")))))
          .select(col("d_rep"), col("rep_id"))
      }
    // verify joins keep the index on the streamed side too: the candidate
    // set is delta-bounded after the hit filter, the reps table is
    // corpus-sized
    val nearM = reps.select(col("rep_id"), col("shl"))
      .join(deltaSide(cand), Seq("rep_id"))
      .join(deltaSide(dSh.select(col("d_rep"), col("d_shl"))), Seq("d_rep"))
      .withColumn("__jraw", gf.jaccardSortedFps(col("d_shl"), col("shl")))
      .where(col("__jraw") >= threshold)
      .groupBy("d_rep")
      // min over (rep_id, score) structs = the min-id match AND its score
      .agg(min(struct(col("rep_id"), col("__jraw"))).as("m"))
      .select(col("d_rep"), col("m.rep_id").as("near_match"),
        round(col("m.__jraw"), 4).as("near_j"))

    groups.select(col("rep_id").as("d_rep"), col("members"))
      .join(deltaSide(exactM), Seq("d_rep"), "left")
      .join(deltaSide(nearM), Seq("d_rep"), "left")
      .select(
        explode(col("members")).as(idCol),
        when(col("exact_match").isNotNull, lit("exact"))
          .when(col("near_match").isNotNull, lit("near"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_match"), col("near_match")).as("match_id"),
        when(col("exact_match").isNotNull, lit(1.0))
          .otherwise(col("near_j")).as("jaccard"))
  }

  /** Drop an index table + orphan warehouse dir — see [[Warehouse.dropTables]]. */
  private def dropWarehouseTables(
      spark: org.apache.spark.sql.SparkSession, names: Seq[String]): Unit =
    Warehouse.dropTables(spark, names)

  /** Persistent EMBEDDING near-dup index — the embedding-space twin of
    * [[dedupIndexBuild]] (4th member of the persistent-index family):
    * index the corpus vectors once, probe each arriving delta for exact
    * and cosine-near duplicates without ever re-scanning vector pairs.
    *
    * Two tables: the payload (vec per row, hash-partitioned by id for
    * append routing) and the LSH postings (one row per (table, bucket)
    * assignment under `tables` hyperplane tables of `bits` bits — the
    * same generator as the in-memory LSH family, so the full-recall
    * sizing rule carries over). Postings carry only (bucket, id): the
    * corpus vectors are stored ONCE and fetched only for
    * candidate-verified ids. */
  def embIndexBuild(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      tableName: String,
      bits: Int = 3,
      tables: Int = 48,
      numParts: Int = 16): Unit = {
    requireLongId(corpus, idCol)
    val spark = corpus.sparkSession
    import spark.implicits._
    dropWarehouseTables(spark, Seq(tableName, s"${tableName}_lsh", s"${tableName}_meta"))
    val vecs = corpus
      .where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
    vecs
      .withColumn("ib", pmod(hash(col("vec_id")), lit(numParts)))
      .write.mode("overwrite").partitionBy("ib").format("parquet")
      .saveAsTable(tableName)
    val buckets = array((0 until tables).map(t =>
      struct(lit(t).as("tb"),
        gf.hyperplaneBucket(col("embedding"), bits, seed = 0x9e3779b9L * (t + 1)).as("bucket"))): _*)
    vecs
      .select(col("vec_id"), explode(buckets).as("b"))
      .select(col("vec_id"), col("b.tb").as("tb"), col("b.bucket").as("bucket"))
      .withColumn("bb", pmod(hash(col("tb"), col("bucket")), lit(numParts)))
      .write.mode("overwrite").partitionBy("bb").format("parquet")
      .saveAsTable(s"${tableName}_lsh")
    Seq((bits, tables, numParts)).toDF("bits", "tables", "num_parts")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${tableName}_meta")
  }

  /** Probe the persistent embedding index with a delta: per delta vector,
    * status exact (bit-identical corpus vector exists) / near (some corpus
    * vector with cosine >= threshold meets it in an LSH bucket) / new,
    * plus the min-id matching corpus vector.
    *
    * Scale shape, mirroring [[dedupIndexProbe]]'s lessons: delta-derived
    * join sides broadcast so the corpus-sized tables are scanned ONCE
    * each, column-pruned, and never shuffled; exact matches are
    * anti-joined out of candidacy up front (a re-crawl delta is mostly
    * exact); candidate (delta, corpus) pairs are deduped by aggregation
    * before the single payload fetch that feeds the cosine verify, so the
    * fetch is bounded by distinct candidates, not bucket co-occurrence.
    *
    * SIZE GUARDS are per frame, because the broadcast sides do NOT scale
    * together: the exploded bucket frame is `tables`× the delta, and the
    * candidate set is bucket-occupancy-bounded (≈ delta × tables ×
    * corpus/2^bits rows), not delta-bounded. r9's single raw-delta-bytes
    * guard broadcast a ~40M-row candidate set at the 100× bench and died
    * with "Not enough memory to build and broadcast" — the candidate→
    * payload join therefore carries no static hint at all and lets AQE
    * pick broadcast-vs-shuffle from the candidate set's MEASURED size
    * (tiny re-crawl deltas still get the broadcast + partition-pruned
    * fetch; corpus-scale deltas degrade to an ordinary shuffled join,
    * which at that size is the right plan). */
  def embIndexProbe(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      tableName: String,
      threshold: Double = 0.4,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    requireLongId(delta, idCol)
    val spark = delta.sparkSession
    val meta = spark.table(s"${tableName}_meta").head()
    val (bits, tables, numParts) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val payload = spark.table(tableName)
    val lsh = spark.table(s"${tableName}_lsh")

    val d = delta
      .where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("d_id"), col(vecCol).as("d_vec"))
      .pinned()
    val st = d.agg(count(lit(1)).as("c"), sum(size(col("d_vec"))).as("f")).head()
    val dRows = st.getLong(0)
    val dFloats = if (st.isNullAt(1)) 0L else st.getLong(1)
    // per-frame footprint estimates (~72 B/hash-relation entry + payload)
    val vecBytes = dRows * 72L + dFloats * 8L // (id, vector) rows
    val idBytes = dRows * 88L // (id, match) rows
    val bucketBytes = dRows * tables.toLong * 96L // exploded (tb, bucket) rows
    def side(df: DataFrame, estBytes: Long): DataFrame =
      if (estBytes <= maxBroadcastBytes) broadcast(df) else df

    // exact: one column-pruned corpus scan, array-equality hash join
    // against the broadcast delta — no shuffle of the corpus side
    val exactM = payload
      .join(side(d.select(col("d_id"), col("d_vec").as("embedding")), vecBytes),
        Seq("embedding"))
      .groupBy("d_id").agg(min(col("vec_id")).as("exact_match"))
      .pinned()

    // near candidacy: delta bucket assignments (same generator as the
    // build) meet the postings on (bb, tb, bucket); candidates dedup by
    // aggregation — they exist only inside the groupBy, never re-joined
    val dNear = d.join(side(exactM.select(col("d_id")), idBytes), Seq("d_id"), "left_anti")
    val dBuckets = dNear
      .select(col("d_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("tb"),
          gf.hyperplaneBucket(col("d_vec"), bits, seed = 0x9e3779b9L * (t + 1)).as("bucket"))): _*)).as("b"))
      .select(col("d_id"), col("b.tb").as("tb"), col("b.bucket").as("bucket"))
      .withColumn("bb", pmod(hash(col("tb"), col("bucket")), lit(numParts)))
    val cand = lsh
      .join(side(dBuckets, bucketBytes), Seq("bb", "tb", "bucket"))
      .groupBy(col("d_id"), col("vec_id")).agg(count(lit(1)).as("__t"))
      .select(col("d_id"), col("vec_id"))
      .withColumn("ib", pmod(hash(col("vec_id")), lit(numParts)))
    // verify: ONE payload fetch bounded by distinct candidates, cosine
    // threshold fused. The candidate side is deliberately UN-hinted (see
    // scaladoc): its size is occupancy-bounded, not delta-bounded, so AQE
    // decides broadcast-vs-shuffle from its measured size at runtime.
    val nearM = payload
      .join(cand, Seq("ib", "vec_id"))
      .join(side(d, vecBytes), Seq("d_id"))
      .where(gf.cosine(col("embedding"), col("d_vec")) >= threshold)
      .groupBy("d_id").agg(min(col("vec_id")).as("near_match"))

    d.select(col("d_id"))
      .join(side(exactM, idBytes), Seq("d_id"), "left")
      .join(side(nearM, idBytes), Seq("d_id"), "left")
      .select(
        col("d_id").as(idCol),
        when(col("exact_match").isNotNull, lit("exact"))
          .when(col("near_match").isNotNull, lit("near"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_match"), col("near_match")).as("match_id"))
  }

  /** Driver-side spherical k-means: assign by max cosine, update by
    * (unnormalized) mean — empty clusters retain their centroid. */
  private def sphericalKmeans(
      sample: Array[Array[Double]],
      seeds: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val dim = seeds.head.length
    var centroids = seeds.map(_.clone)
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestC = Double.NegativeInfinity
        var c = 0
        while (c < centroids.length) {
          val s = cos(v, centroids(c))
          if (s > bestC) { bestC = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      iter += 1
    }
    centroids
  }
}
