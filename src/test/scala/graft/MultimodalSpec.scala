package graft

import graft.ops.Multimodal
import graft.functions.gf
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("binary payload column + typed metadata schema") {
    val df = Seq((0L, "hello"), (1L, "world!")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    assert(wp.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    val meta = wp.select("media_meta.n_bytes", "media_meta.mime").orderBy("media_meta.mime").collect()
    assert(meta.map(_.getString(1)).toSet.subsetOf(
      Set("image/png", "image/jpeg", "audio/wav", "image/gif")))
    // PNG container around 5 body bytes: 8 signature + 25 IHDR + 12 IDAT
    // framing + 12 IEND = 57 overhead
    assert(meta.find(_.getString(1) == "image/png").get.getInt(0) === 57 + 5)
  }

  test("synthesized containers decode back to the derived header fields") {
    val texts = Seq((0L, "png body"), (1L, "jpeg body"), (2L, "wav body"), (3L, "gif body"))
    val wp = Multimodal.withBinaryPayload(texts.toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.extractFeatures(wp).collect().sortBy(_.doc_id)
    def bsum(s: String): Long = s.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum
    // images carry width/height from the byte-sum arithmetic; audio carries
    // sample rate/channels; each from a REAL parse of real header bytes
    val Seq(png, jpeg, wav, gif) = out.toSeq
    assert(png.format === "png" && png.magic === "89504e47")
    assert(png.width === 64 + (bsum("png body") % 512).toInt)
    assert(png.height === 64 + ((bsum("png body") / 7) % 512).toInt)
    assert(png.bit_depth === 8 && png.sample_rate === 0 && png.channels === 0)
    assert(jpeg.format === "jpeg" && jpeg.magic === "ffd8ffe0")
    assert(jpeg.width === 64 + (bsum("jpeg body") % 512).toInt)
    assert(wav.format === "wav" && wav.magic === "52494646")
    assert(wav.sample_rate === 8000 + ((bsum("wav body") % 5) * 8000).toInt)
    assert(wav.channels === 1 + (bsum("wav body") % 2).toInt)
    assert(wav.bit_depth === 16 && wav.width === 0 && wav.height === 0)
    assert(gif.format === "gif" && gif.magic === "47494638")
    assert(gif.width === 64 + (bsum("gif body") % 512).toInt)
    // n_bytes = body + fixed per-format container overhead
    assert(png.n_bytes === "png body".length + 57)
    assert(jpeg.n_bytes === "jpeg body".length + 41)
    assert(wav.n_bytes === "wav body".length + 44)
    assert(gif.n_bytes === "gif body".length + 14)
  }

  test("decoder parses foreign crafted headers, not just its own synthesis") {
    // PNG, 640x480, bit depth 16, grayscale — CRC deliberately wrong
    // (header readers don't validate CRCs)
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 16, 0, 0, 0, 0, 0xde, 0xad, 0xbe, 0xef)
    // JPEG with APP1 and DQT segments BEFORE a progressive SOF2: the
    // parser must walk segments by declared length, and precision is 10
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xe1, 0, 8, 1, 2, 3, 4, 5, 6, // APP1, len 8 (6 payload)
      0xff, 0xdb, 0, 4, 9, 9, // DQT, len 4
      0xff, 0xc2, 0, 11, 10, 1, 0, 0, 0x80, 1, 1, 0x11, 0) // SOF2 256x128
    // WAV with an odd-sized JUNK chunk before fmt (chunks pad to even)
    val wav = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ bytes(3, 0, 0, 0, 7, 7, 7, 0) ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0, 1, 0, 2, 0,
        0x22, 0x56, 0, 0, // 22050 LE
        0, 0, 0, 0, 0, 0, 24, 0)
    // GIF87a, 320x200, color resolution bits -> depth 2
    val gif = "GIF87a".getBytes ++ bytes(0x40, 0x01, 0xc8, 0x00, 0x91, 0, 0)
    val junk = "not a media file at all".getBytes
    val truncated = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)

    val rows = Seq((1L, png), (2L, jpeg), (3L, wav), (4L, gif), (5L, junk), (6L, truncated))
      .toDF("id", "payload")
      .select(col("id"), gf.mediaHeader(col("payload")).as("hd"))
      .select("id", "hd.format", "hd.width", "hd.height", "hd.sample_rate", "hd.channels", "hd.bit_depth")
      .orderBy("id")
      .collect()
    assert(rows(0).toSeq === Seq(1L, "png", 640, 480, 0, 0, 16))
    assert(rows(1).toSeq === Seq(2L, "jpeg", 128, 256, 0, 0, 10))
    assert(rows(2).toSeq === Seq(3L, "wav", 0, 0, 22050, 2, 24))
    assert(rows(3).toSeq === Seq(4L, "gif", 320, 200, 0, 0, 2))
    assert(rows(4).getString(1) === "unknown")
    assert(rows(5).getString(1) === "unknown")
  }

  test("feature extraction is deterministic and preserves rows") {
    val df = Seq((0L, "hello"), (1L, "world!"), (2L, "again again")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(wp).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(wp).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 3)
    assert(f1.forall(r => r.format != "unknown"))
  }

  test("sampleFrames: n rows per payload, deterministic, offsets in bounds") {
    val df = Seq((0L, "a longer payload with enough bytes to slice"), (1L, "tiny")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val f1 = Multimodal.sampleFrames(wp, 4).collect().sortBy(r => (r.doc_id, r.frame_idx))
    val f2 = Multimodal.sampleFrames(wp, 4).collect().sortBy(r => (r.doc_id, r.frame_idx))
    assert(f1.length === 8)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(f => f.byte_offset >= 0))
    assert(f1.map(_.frame_idx).toSet === Set(0, 1, 2, 3))
  }

  test("resizeMeta: aspect preserved, never upscales, audio passes through") {
    val df = Seq((0L, "hello world again and again"), (2L, "wav doc")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val resized = Multimodal.resizeMeta(Multimodal.extractFeatures(wp), 64, 64)
      .orderBy("doc_id").collect()
    val (w, h) = (resized(0).getAs[Int]("resized_width"), resized(0).getAs[Int]("resized_height"))
    assert(w <= 64 && h <= 64)
    assert(w <= resized(0).getAs[Int]("width") && h <= resized(0).getAs[Int]("height"))
    // the WAV row has no dimensions and is passed through unscaled
    assert(resized(1).getAs[Int]("resized_width") === 0)
  }

  test("partitioning preserved through the columnar decode") {
    val df = spark.range(100).toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
      .repartition(7)
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val out = Multimodal.extractFeatures(wp)
    assert(out.rdd.getNumPartitions === 7)
    assert(out.count() === 100)
  }
  test("rasterPool2x2: hand-computed pool, odd-edge truncation, malformed -> null") {
    import graft.functions.Kernels
    // doc_id 0: w=8, h=6 -> out 4x3; pixel p(x,y) = (x*31 + y*17) % 256
    val payload = Kernels.rasterContainer(0L)
    assert(payload(0) === 'G'.toByte && payload(2) === 8.toByte && payload(3) === 6.toByte)
    val pooled = Kernels.rasterPool2x2(payload).toLongArray()
    assert(pooled(0) === 4L && pooled(1) === 3L)
    def p(x: Int, y: Int): Long = (x * 31 + y * 17) % 256
    var want = 0L
    for (y <- 0 until 3; x <- 0 until 4) {
      val s = p(2 * x, 2 * y) + p(2 * x + 1, 2 * y) + p(2 * x, 2 * y + 1) + p(2 * x + 1, 2 * y + 1)
      want += (s / 4) * (1L + x + y * 4)
    }
    assert(pooled(2) === want)
    // odd width (doc_id 1 -> w=9, h=7): floor-truncated to 4x3
    val odd = Kernels.rasterPool2x2(Kernels.rasterContainer(1L)).toLongArray()
    assert(odd(0) === 4L && odd(1) === 3L)
    // malformed headers decode as null, not garbage
    assert(Kernels.rasterPool2x2(Array[Byte]('X', '8', 2, 2)) === null)
    assert(Kernels.rasterPool2x2(Array[Byte]('G', '8', 100, 100, 0)) === null)
    assert(Kernels.rasterPool2x2(Array[Byte]('G')) === null)
  }

  test("exactDedup groups identical payloads only (same format AND same body)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ids 0 and 4 share format (id % 4 = 0) and text -> one group of 2;
    // ids 1 and 2 share text but differ in format -> separate groups
    val docs = Seq((0L, "same"), (4L, "same"), (1L, "also"), (2L, "also"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.ops.Multimodal.exactDedup(
        graft.ops.Multimodal.withBinaryPayload(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 2L), (1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("sampleVideoFrames: stride sampling, plan stays narrow, malformed payloads dropped") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val out = graft.ops.Multimodal.sampleVideoFrames(docs, "doc_id", stride = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one row per sampled frame: frames 0, 3, 6, ... below nf = 8 + id % 5
    (0L until 20L).foreach { id =>
      val nf = 8 + id % 5
      val want = (0L until nf by 3L).toSeq
      assert(rows.filter(_._1 == id).map(_._2).toSeq.sorted === want, s"doc $id")
    }
    // checksum of doc 0, frame 0 recomputed from the pixel formula
    val w = 6; val h = 4
    val expect = (for { y <- 0 until h; x <- 0 until w }
      yield ((x * 31 + y * 17) % 256).toLong * (1 + x + y * w)).sum
    assert(rows.find(r => r._1 == 0L && r._2 == 0L).get._3 === expect)
    // a malformed payload (not a video container) yields no frame rows
    val bad = spark.sql("SELECT 1L AS doc_id, CAST('nope' AS BINARY) AS v")
      .select(col("doc_id"), graft.functions.gf.videoFrames(col("v"), 3).as("v"))
    assert(bad.where(col("v").isNotNull).count() === 0)
  }

  test("audioEnergyStats: RIFF parse round-trips the synthesis; hand-checked sample stats") {
    import spark.implicits._
    // "AB" -> bytes 65, 66: bsum 131, samples -63/-62, peak 63,
    // sumsq 63^2 + 62^2 = 7813, rms = sqrt(7813/2)
    val docs = Seq((0L, "AB"), (1L, "")).toDF("doc_id", "text")
    val got = graft.ops.Multimodal.audioEnergyStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 8000 + (131 % 5) * 8000)
    assert(got(0).getLong(2) === 1 + 131 % 2)
    assert(got(0).getLong(3) === 2L)
    assert(got(0).getLong(4) === 63L)
    val rms = BigDecimal(math.sqrt(7813.0 / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(5) === rms)
    // empty body: zero samples, null rms, header still parsed (bsum 0)
    assert(got(1).getLong(3) === 0L && got(1).isNullAt(5))
    assert(got(1).getLong(1) === 8000L)
    // non-WAV bytes -> null stats (real-decoder contract)
    val bad = spark.sql("SELECT CAST('GIF89a...' AS BINARY) AS p")
      .select(graft.functions.gf.audioStats(col("p")).as("a"))
    assert(bad.where(col("a").isNotNull).count() === 0)
  }
}
