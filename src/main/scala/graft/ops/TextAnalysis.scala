package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure columnar
  * expressions (whole-stage codegen; no UDFs), so they hold up on 100 TB:
  * each is a narrow map over the scan with pushdown-friendly projections.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * individual punctuation marks each count as one token (the GPT-2
    * pre-tokenizer split, minus lookaheads so the pattern runs identically
    * under Java regex and RE2). */
  val bpePattern = "'(?:[sdmt]|ll|ve|re)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpePattern))

  /** Occurrences of literal `word` in `text` via replace-length arithmetic —
    * identical semantics in any ANSI SQL engine (oracle-friendly). */
  def occurrences(text: Column, word: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(word), ""))) / word.length).cast("long")

  /** Normalized content key: lowercase, collapse whitespace, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized content. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** One-pass quality + language-ID inputs (array<long>): project this
    * once per row and derive with [[qualityScoreFrom]]/[[langIdFrom]] —
    * the regex formulations these kernels replace cost ~18 passes over
    * each document. */
  def qualityLangStats(text: Column): Column = graft.functions.gf.qualityLangStats(text)

  /** Heuristic quality score in [0,100]: rewards moderate length, word
    * diversity, and low punctuation density. Integer-valued for exact
    * cross-engine comparison. */
  def qualityScore(text: Column): Column = qualityScoreFrom(qualityLangStats(text))

  /** [[qualityScore]] from an already-projected [[qualityLangStats]]. */
  def qualityScoreFrom(st: Column): Column = {
    val nTok = element_at(st, 1)
    val nUniq = element_at(st, 2)
    val nPunct = element_at(st, 3)
    val lenScore = least(nTok, lit(50L)) // up to 50 points for length
    // floor() so the value is integral before the int cast: Spark casts
    // double→int by truncation while other engines round — floor is portable
    val divScore = floor(nUniq * lit(40) / greatest(nTok, lit(1L))) // up to 40
    val punctPenalty = least(nPunct, lit(10L)) // up to -10
    greatest(lit(0L), least(lit(100L), lenScore + divScore - punctPenalty + lit(10L)))
      .cast("int")
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic (single source: [[graft.functions.Kernels.langMarkers]]).
    * Deterministic argmax with tie-break by list order. */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.Kernels.langMarkers.toSeq.map { case (l, ws) => l -> ws.toSeq }

  /** Gopher-style repetition signals as a named struct: line-level
    * duplication and top-bigram dominance — the classic boilerplate/spam
    * filters a crawl corpus runs before training. One custom-expression
    * pass per document ([[graft.functions.gf.repetitionStats]]); all four
    * values are ratios of exact integer counts, so they compare
    * bit-identically across engines with no rounding. */
  def repetitionStats(text: Column): Column = {
    val a = graft.functions.gf.repetitionStats(text)
    struct(
      element_at(a, 1).cast("long").as("n_lines"),
      element_at(a, 2).as("dup_line_frac"),
      element_at(a, 3).as("dup_line_char_frac"),
      element_at(a, 4).as("top_bigram_frac"))
  }

  /** Composite C4/Gopher-style keep/drop decision with a reason code —
    * the single filter pass a training pipeline runs after stats are
    * known. Lexical rules (length, language, quality) evaluate on
    * `rawText`; structural rules (line duplication, bigram dominance) on
    * `linedText` (pass the same column twice when documents already carry
    * line structure). Rules fire in fixed order; reason is the FIRST
    * failing rule, or 'keep'. All thresholds compare exact integer counts
    * or exact ratios, so decisions replicate on any engine. */
  def filterDecision(rawText: Column, linedText: Column): Column = {
    val nTok = tokenCount(rawText)
    val lang = langId(rawText)
    val q = qualityScore(rawText)
    val rep = repetitionStats(linedText)
    struct(
      (decideReason(nTok, lang, q, rep) === "keep").as("keep"),
      decideReason(nTok, lang, q, rep).as("reason"))
  }

  private def decideReason(nTok: Column, lang: Column, q: Column, rep: Column): Column =
    when(nTok < 12, "too_short")
      .when(nTok > 100000, "too_long")
      .when(lang === "unknown", "lang_unknown")
      .when(rep.getField("dup_line_frac") > 0.08, "dup_lines")
      .when(rep.getField("top_bigram_frac") > 0.09, "repetitive_bigrams")
      .when(q < 50, "low_quality")
      .otherwise("keep")

  /** [[filterDecision]] over a whole frame, stats evaluated ONCE per row:
    * a Column-only formulation re-evaluates each stat subexpression at
    * every reference in the when-chain (the repetition kernel ran 4x per
    * row, the 15 language-marker regex passes 2x — measured ~6x slower),
    * so the stats materialize in their own projection and the decision
    * reads plain columns. Appends `keep` and `reason`. */
  def filterCorpus(df: DataFrame, rawCol: String, linedCol: String): DataFrame = {
    // CollapseProject will not re-inline these into the decision's
    // multiple references: an alias referenced more than once only
    // collapses when its expression is cheap, and the stat kernels are not
    val stats = df.select(col("*"),
      qualityLangStats(col(rawCol)).as("__qls"),
      repetitionStats(col(linedCol)).as("__rep"))
    stats
      .withColumn("reason",
        decideReason(element_at(col("__qls"), 1), langIdFrom(col("__qls")),
          qualityScoreFrom(col("__qls")), col("__rep")))
      .withColumn("keep", col("reason") === "keep")
      .drop("__qls", "__rep")
  }

  // PII patterns: RE2-compatible (no lookarounds/backrefs) so the same
  // pattern runs identically under Java regex (Spark) and RE2 (DuckDB,
  // Go-based engines). Order of application: email, then IP, then phone —
  // the replacement tokens contain no digits, so later patterns can never
  // match inside an earlier replacement.
  val emailPattern = graft.functions.Kernels.piiEmailPattern
  val ipv4Pattern = graft.functions.Kernels.piiIpv4Pattern
  val phonePattern = graft.functions.Kernels.piiPhonePattern

  /** Redact emails, IPv4 addresses, and international phone numbers.
    * Pure columnar regexp_replace chain — a narrow codegen map. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Match counts for each PII class on the raw text (pre-redaction). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailPattern)).as("n_email"),
    regexp_count(text, lit(ipv4Pattern)).as("n_ip"),
    regexp_count(text, lit(phonePattern)).as("n_phone"))

  /** Predict language by total marker-word occurrences; ties broken by
    * language code order as listed (first wins), unknown when zero hits. */
  def langId(text: Column): Column = langIdFrom(qualityLangStats(text))

  /** [[langId]] from an already-projected [[qualityLangStats]] column. */
  def langIdFrom(st: Column): Column = {
    val scores = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(st, lit(i + 4))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Compression-ratio quality signal: (idCol, n_bytes, n_deflated,
    * deflate_ratio) from one DEFLATE pass per document. Near-random text
    * ratios toward 1.0, natural prose ~0.4, templated boilerplate toward
    * 0 — the cheap repetition/entropy proxy corpus curation thresholds
    * on. Ratio is null for empty text. One codegen kernel pass; values
    * are JVM-zlib-deterministic (executors agree), not SQL-reproducible —
    * the one signal column here checked by spec rather than oracle. */
  /** Strip HTML/XML markup from a crawled page — the first step of every
    * C4/CCNet-style web pipeline (boilerplate extraction): script and
    * style blocks removed WITH their contents, remaining tags removed,
    * common entities decoded (ampersand LAST, so '&amp;lt;' cannot
    * double-decode), whitespace collapsed. A pure chain of codegen'd
    * regexp_replace — RE2-compatible patterns (no lookarounds or
    * backrefs), so the identical regexes run in any engine and the
    * transform is SQL-oracle-able. Narrow map: no shuffle, no UDF. */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (p, r)) => regexp_replace(c, p, r) }
    trim(regexp_replace(regexp_replace(ent, "&amp;", "&"), "\\s+", " "))
  }

  /** The page's <title> text (first match, empty when absent). */
  def markupTitle(html: Column): Column =
    regexp_extract(html, "(?s)<title>(.*?)</title>", 1)

  def compressionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.functions.gf
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), gf.deflateStats(col(textCol)).as("__d"))
      .select(col(idCol),
        col("__d").getItem(0).as("n_bytes"),
        col("__d").getItem(1).as("n_deflated"),
        when(col("__d").getItem(0) > 0,
          round(col("__d").getItem(1) * lit(1.0) / col("__d").getItem(0), 4))
          .as("deflate_ratio"))
  }

  /** Model-based quality filter — the fastText-linear-classifier curation
    * recipe (CCNet's LM filter, DCLM / FineWeb-Edu's quality classifiers,
    * reduced to its deployment shape): score = <hash-features, w> with a
    * keep/drop threshold.
    *
    * Features are the FNV-1a signed-bucket hash embedding (the same
    * codegen kernel as the embed template), weights a fixed deterministic
    * vector baked into the plan as a literal (the codebook-load pattern —
    * a trained classifier would bake its fitted weights identically), and
    * the dot product a LEFT bucket-ascending fold — so the whole pass is
    * ONE narrow codegen map over the corpus: no join, no shuffle, no UDF.
    * That plan shape is the entire point at 100 TB: a model-based filter
    * costs one scan, exactly like a regex filter. Every arithmetic step
    * is IEEE add/mul/sqrt on identical inputs (no libm transcendentals),
    * so scores and keep decisions are bit-reproducible cross-engine. */
  def classifierScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64,
      threshold: Double = 0.0): DataFrame = {
    import graft.functions.gf
    require(dim > 0, "need dim > 0")
    val weights = (0 until dim).map(j => ((j * 2654435761L) % 1000L) / 1000.0 - 0.5)
    val wlit = array(weights.map(lit): _*)
    docs
      .select(col(idCol).cast("long").as(idCol),
        aggregate(
          zip_with(gf.hashEmbed(coalesce(col(textCol), lit("")), dim), wlit,
            (x, w) => x.cast("double") * w),
          lit(0.0), (a, v) => a + v).as("__s"))
      .select(col(idCol),
        round(col("__s"), 6).as("score_r"),
        (col("__s") > threshold).as("keep"))
  }
}
