package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook: registers graft's custom expressions in the
  * SQL function registry, so SQL users get them alongside the DataFrame
  * API:
  *
  *   SELECT minhash_sig(text, 3, 128), simhash64(text) FROM documents
  *
  * Activate with
  *   SparkSession.builder.withExtensions(new GraftExtensions) or
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(fn: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")
    args
  }

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fns: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => { val a = arity("word_shingles", 2)(args); WordShinglesExpr(a(0), intArg(a(1), "word_shingles", 2)) }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, n, k) - k-permutation MinHash signature over word n-grams"),
      (args: Seq[Expression]) => { val a = arity("minhash_sig", 3)(args); MinHashSigExpr(a(0), intArg(a(1), "minhash_sig", 2), intArg(a(2), "minhash_sig", 3)) }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHash64Expr(arity("simhash64", 1)(args)(0))),
    (FunctionIdentifier("hash_embed"),
      info("hash_embed", "hash_embed(text, dim) - L2-normalized feature-hash embedding"),
      (args: Seq[Expression]) => { val a = arity("hash_embed", 2)(args); HashEmbedExpr(a(0), intArg(a(1), "hash_embed", 2)) }),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => { val a = arity("cosine_sim", 2)(args); CosineSimExpr(a(0), a(1)) }),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (args: Seq[Expression]) => { val a = arity("dot_product", 2)(args); DotProductExpr(a(0), a(1)) }),
    (FunctionIdentifier("sig_agreement"),
      info("sig_agreement", "sig_agreement(a, b) - fraction of agreeing signature positions"),
      (args: Seq[Expression]) => { val a = arity("sig_agreement", 2)(args); SigAgreementExpr(a(0), a(1)) }),
    (FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket", "hyperplane_bucket(vec, bits, seed) - random-hyperplane LSH bucket id"),
      (args: Seq[Expression]) => { val a = arity("hyperplane_bucket", 3)(args); HyperplaneBucketExpr(a(0),
        intArg(a(1), "hyperplane_bucket", 2),
        a(2) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"hyperplane_bucket: argument 3 must be an integer literal, got $other")
        }) }),
    (FunctionIdentifier("bucket_pairs_cos"),
      info("bucket_pairs_cos", "bucket_pairs_cos(items, minCos) - id pairs in a bucket with cosine >= minCos"),
      (args: Seq[Expression]) => { val a = arity("bucket_pairs_cos", 2)(args); BucketPairsCosExpr(a(0),
        a(1) match {
          case Literal(v: Double, _) => v
          case Literal(v: Int, _) => v.toDouble
          case Literal(v: Long, _) => v.toDouble
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"bucket_pairs_cos: argument 2 must be a numeric literal, got $other")
        }) }),
    (FunctionIdentifier("posting_pairs"),
      info("posting_pairs", "posting_pairs(items) - candidate pairs from a shingle posting list"),
      (args: Seq[Expression]) => PostingPairsExpr(arity("posting_pairs", 1)(args)(0))),
    (FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(text) - [n_lines, dup_line_frac, dup_line_char_frac, top_bigram_frac]"),
      (args: Seq[Expression]) => RepetitionStatsExpr(arity("repetition_stats", 1)(args)(0))),
    (FunctionIdentifier("char_bigram_counts"),
      info("char_bigram_counts", "char_bigram_counts(text) - packed (code << 32 | count) char-bigram counts"),
      (args: Seq[Expression]) => CharBigramCountsExpr(arity("char_bigram_counts", 1)(args)(0))),
    (FunctionIdentifier("canonicalize_url"),
      info("canonicalize_url", "canonicalize_url(url) - canonical crawl-frontier form of a URL"),
      (args: Seq[Expression]) => CanonicalizeUrlExpr(arity("canonicalize_url", 1)(args)(0))),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => NfcNormalizeExpr(arity("nfc_normalize", 1)(args)(0))),
    (FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(text) - NFD decompose + drop combining marks"),
      (args: Seq[Expression]) => StripAccentsExpr(arity("strip_accents", 1)(args)(0))),
    (FunctionIdentifier("media_header"),
      info("media_header", "media_header(bytes) - decoded PNG/JPEG/WAV/GIF header struct"),
      (args: Seq[Expression]) => MediaHeaderExpr(arity("media_header", 1)(args)(0))),
    (FunctionIdentifier("audio_stats"),
      info("audio_stats", "audio_stats(bytes) - [sample_rate, channels, n_samples, peak, sum_sq] of a WAV payload"),
      (args: Seq[Expression]) => AudioStatsExpr(arity("audio_stats", 1)(args)(0))),
    (FunctionIdentifier("video_frames"),
      info("video_frames", "video_frames(bytes, stride) - [w, h, checksum per sampled frame] of a video payload"),
      (args: Seq[Expression]) => { val a = arity("video_frames", 2)(args); VideoFramesExpr(a(0), intArg(a(1), "video_frames", 2)) }))

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (id, inf, builder) => ext.injectFunction((id, inf, builder)) }
}
