package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount + normalize + fingerprint") {
    val df = Seq("  Hello   World ", "hello world").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fps(0) === fps(1)) // same normalized content -> same fingerprint
    val n = df.select(TextAnalysis.tokenCount(col("t")).as("n")).as[Int].collect()
    assert(n(1) === 2)
  }

  test("qualityScore: bounded in [0,100], penalizes punctuation") {
    val clean = Seq("a clean readable sentence with diverse words").toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Int].head()
    val punct = Seq("a!!! clean??? readable;;; sentence::: ###").toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Int].head()
    assert(clean >= 0 && clean <= 100 && punct >= 0 && punct <= 100)
    assert(clean > punct)
  }

  test("repetitionStats: hand-computed line and bigram fractions") {
    val df = Seq("a b\na b\nc d").toDF("t")
    val r = df.select(TextAnalysis.repetitionStats(col("t")).as("r"))
      .select("r.n_lines", "r.dup_line_frac", "r.dup_line_char_frac", "r.top_bigram_frac")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 3L)
    assert(r._2 === 1.0 / 3) // one of three line instances is a repeat
    assert(r._3 === 3.0 / 9) // 3 duplicated chars of 9 line chars
    // bigrams of [a b a b c d]: "a b" x2 of 5 adjacent pairs
    assert(r._4 === 2.0 / 5)
  }

  test("repetitionStats: degenerate inputs yield zeros") {
    val df = Seq("", "single", "  \n  \n").toDF("t")
    val rows = df.select(TextAnalysis.repetitionStats(col("t")).as("r"))
      .select("r.n_lines", "r.dup_line_frac", "r.top_bigram_frac")
      .as[(Long, Double, Double)].collect()
    assert(rows(0) === ((0L, 0.0, 0.0)))
    assert(rows(1) === ((1L, 0.0, 0.0))) // one line, one word: no pairs
    assert(rows(2) === ((0L, 0.0, 0.0))) // whitespace-only lines dropped
  }

  test("scrubPii: redacts emails, IPs, phones; counts match") {
    val df = Seq("mail jo.e+x@ex.co or +123456789 from 1.2.3.4 twice j@a.io").toDF("t")
    val scrubbed = df.select(TextAnalysis.scrubPii(col("t"))).as[String].head()
    assert(scrubbed === "mail <EMAIL> or <PHONE> from <IP> twice <EMAIL>")
    val c = df.select(TextAnalysis.piiCounts(col("t")).as("p"))
      .select("p.n_email", "p.n_ip", "p.n_phone").as[(Int, Int, Int)].head()
    assert(c === ((2, 1, 1)))
  }

  test("langId: marker-word argmax with unknown fallback") {
    val df = Seq(
      "the cat sat on a mat of wool",
      "der hund und die katze",
      "el perro y la casa que",
      "xyzzy plugh").toDF("t")
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "es", "unknown"))
  }

  test("filterDecision: first failing rule wins; clean text keeps") {
    val rows = Seq(
      ("short", "short"),                                  // too_short
      ("the quick brown fox of the meadow jumps over a lazy dog of note today", 
       "the quick\nbrown fox\nof the\nmeadow jumps\nover a\nlazy dog\nof note\ntoday"),  // keep
      ("xq zz " * 10 + "xq zz", "xq zz\n" * 10 + "xq zz") // unknown lang fires before dup_lines
    ).toDF("raw", "lined")
    val out = rows.select(TextAnalysis.filterDecision(col("raw"), col("lined")).as("d"))
      .select("d.keep", "d.reason").as[(Boolean, String)].collect()
    assert(out(0) === ((false, "too_short")))
    assert(out(1) === ((true, "keep")))
    assert(out(2) === ((false, "lang_unknown")))
  }

  test("compressionStats: repetition compresses below varied text; deterministic; edge cases") {
    val rnd = new scala.util.Random(11)
    val varied = Array.fill(400)(rnd.alphanumeric.take(6).mkString).mkString(" ")
    val df = Seq(
      (1L, ("spam ham " * 300).trim), // highly repetitive
      (2L, varied),                   // high-entropy
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.compressionStats(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val ratioRep = out(0).getDouble(3)
    val ratioVar = out(1).getDouble(3)
    assert(ratioRep < 0.1, s"repetitive ratio $ratioRep")
    assert(ratioVar > ratioRep * 5, s"varied $ratioVar vs repetitive $ratioRep")
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(3))
    // byte accounting: n_bytes is the UTF-8 length
    assert(out(1).getLong(1) === varied.getBytes("UTF-8").length.toLong)
    // deterministic across partition layouts
    val again = TextAnalysis.compressionStats(df.repartition(3), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.sameElements(again))
  }

  test("stripMarkup: tags stripped, script/style contents removed, entities decoded once") {
    val cases = Seq(
      // script body with angle brackets must vanish entirely
      ("<p>a</p><script>if (1 < 2) { x(); }</script><p>b</p>", "a b"),
      ("<style>.x { a: 1; }</style>ok", "ok"),
      // entity decode happens AFTER tag strip, so encoded tags survive as text
      ("&lt;b&gt;not bold&lt;/b&gt;", "<b>not bold</b>"),
      // ampersand decodes LAST: &amp;lt; is the literal text '&lt;', not '<'
      ("x &amp;lt; y", "x &lt; y"),
      ("a &nbsp; b &quot;c&quot; &#39;d&#39;", "a b \"c\" 'd'"),
      ("<div class=\"z\">  spaced   out  </div>", "spaced out"))
    val df = cases.map(_._1).toDF("h")
    val out = df.select(TextAnalysis.stripMarkup(col("h"))).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) => assert(got === want) }
  }

  test("markupTitle: first title extracted, empty when absent") {
    val df = Seq(
      "<html><title>A Title</title><title>B</title></html>",
      "<html><body>no title</body></html>").toDF("h")
    val out = df.select(TextAnalysis.markupTitle(col("h"))).as[String].collect()
    assert(out(0) === "A Title")
    assert(out(1) === "")
  }

  test("classifierScore is one narrow map: no shuffle, no join in the plan") {
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"model filter must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"model filter must not join:\n$plan")
  }

  test("classifierScore: empty/null text scores exactly 0 and is dropped; layout-independent") {
    val docs = Seq((0L, "spark window join"), (1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(1).getDouble(1) === 0.0 && !got(1).getBoolean(2))
    assert(got(2).getDouble(1) === 0.0 && !got(2).getBoolean(2))
    val big = graft.io.Tables.table(spark, sfDir, "documents")
    val a = TextAnalysis.classifierScore(big, "doc_id", "text").orderBy("doc_id").collect()
    val b = TextAnalysis.classifierScore(big.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // the threshold actually splits the corpus (not all-keep / all-drop)
    assert(a.exists(_.getBoolean(2)) && a.exists(!_.getBoolean(2)))
  }

  test("fused piiScrubStats equals the 6-pass regexp chain on real docs") {
    // the fused kernel replaced 3x regexp_count + 3x regexp_replace in
    // text_pii_scrub; equality must hold verbatim, edge cases included
    // (an email whose domain contains an IPv4 — counted on raw text but
    // absorbed by the earlier email redaction)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(col("text"),
        lit(" a@mail.example.com +15551234 10.1.0.2 u@1.2.3.4.com x@y")).as("t"))
      .unionAll(Seq("no pii here", "", "v4 inside mail: z@9.8.7.6.org only")
        .toDF("t"))
    val both = docs.select(
      graft.functions.gf.piiScrubStats(col("t")).as("f"),
      TextAnalysis.piiCounts(col("t")).as("p"),
      TextAnalysis.scrubPii(col("t")).as("scr"))
    val bad = both.where(
      col("f.n_email") =!= col("p.n_email").cast("long") ||
        col("f.n_ip") =!= col("p.n_ip").cast("long") ||
        col("f.n_phone") =!= col("p.n_phone").cast("long") ||
        col("f.scrubbed") =!= col("scr")).count()
    assert(bad === 0L)
  }
}
