package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** Multimodal plumbing: opaque binary payload columns with typed metadata
  * and REAL header decoding.
  *
  * No codec libraries exist in this build, but none are needed for the
  * metadata tier: PNG/JPEG/GIF/WAV header layouts are public byte formats,
  * so [[extractFeatures]] decodes dimensions / sample rate / bit depth from
  * the payload bytes with a codegen expression ([[graft.functions.gf
  * .mediaHeader]]) — a narrow whole-stage-codegen map, no UDF, no shuffle.
  * Pixel/sample DECODE (the step that does need libjpeg/ffmpeg) is shaped
  * by [[sampleFrames]]: per-partition batched mapPartitions, the Scala
  * analog of a vectorized mapInPandas decode where per-partition codec
  * setup amortizes across rows.
  */
object Multimodal {

  /** Typed per-payload features from the real header decode. Fields that
    * don't apply to a format are 0 (images: sample_rate/channels; audio:
    * width/height); unparseable payloads decode as format "unknown". */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      mime: String,
      magic: String,
      format: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      channels: Int,
      bit_depth: Int)

  /** Attach a binary media payload + metadata struct to each doc: the
    * utf-8 text bytes (stand-in for real media content) wrapped in a
    * structurally valid container — PNG, JPEG, WAV, or GIF by doc_id % 4 —
    * whose header fields derive from the body's byte sum (see
    * [[graft.functions.Kernels.mediaContainer]]). Real pipelines read real
    * files here; everything downstream is format-faithful either way. */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = gf.mediaContainer(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
    val mime = element_at(
      array(lit("image/png"), lit("image/jpeg"), lit("audio/wav"), lit("image/gif")),
      (pmod(col(idCol), lit(4)) + 1).cast("int"))
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        length(payload).as("n_bytes"),
        mime.as("mime")).as("media_meta"))
  }

  /** Real header decode over binary payloads — pure columnar: one codegen
    * expression per row parses the container bytes (PNG chunk walk to
    * IHDR, JPEG segment walk to SOF, RIFF chunk walk to `fmt `, GIF
    * logical screen descriptor) into typed fields. Narrow map; partitioning
    * and pushdown are untouched. */
  def extractFeatures(withPayload: DataFrame): Dataset[MediaFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.mime").as("mime"),
        lower(hex(substring(col("payload"), 1, 4))).as("magic"),
        gf.mediaHeader(col("payload")).as("hd"))
      .select(
        col("doc_id"), col("n_bytes"), col("mime"), col("magic"),
        col("hd.format").as("format"),
        col("hd.width").as("width"),
        col("hd.height").as("height"),
        col("hd.sample_rate").as("sample_rate"),
        col("hd.channels").as("channels"),
        col("hd.bit_depth").as("bit_depth"))
      .as[MediaFeatures]
  }

  /** One sampled "frame" of a binary payload. */
  case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      byte_offset: Int,
      frame_checksum: Long)

  /** Frame sampling over binary payloads: emit `nFrames` evenly-spaced
    * frames per payload (a frame here is a byte slice + checksum; a real
    * sampler seeks keyframes via the codec). The Spark shape is the real
    * part and is exactly what a codec-backed version keeps: per-partition
    * batching so codec setup amortizes, one row in -> nFrames rows out, no
    * driver involvement. */
  def sampleFrames(withPayload: DataFrame, nFrames: Int): Dataset[FrameFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec context setup would go here (once, amortized)
        rows.flatMap { case (id, payload) =>
          val step = math.max(payload.length / math.max(nFrames, 1), 1)
          (0 until nFrames).iterator.map { f =>
            val off = math.min(f * step, math.max(payload.length - 1, 0))
            val end = math.min(off + step, payload.length)
            var sum = 0L
            var i = off
            while (i < end) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
            FrameFeatures(id, f, off, sum)
          }
        }
      }
  }

  /** Resize metadata for a target box keeping aspect ratio (images only;
    * zero-dimension rows pass through unscaled). A codec-backed resize
    * swaps in the pixel work; the columnar shape (narrow map, no shuffle)
    * stays. */
  def resizeMeta(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val df = features.toDF()
    val scale = when(col("width") > 0 && col("height") > 0,
      least(
        lit(maxW).cast("double") / col("width"),
        lit(maxH).cast("double") / col("height"),
        lit(1.0))).otherwise(lit(1.0))
    df.withColumn("resized_width", floor(col("width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("height") * scale).cast("int"))
  }

  /** Pixel-tier 2x2 average-pool resize over raster payloads — the
    * integer core of an image-downsample stage, run for real: the payload
    * is a synthetic grayscale plane (formulaic pixels, [[graft.functions
    * .Kernels.rasterContainer]]), the pool kernel parses dims from the
    * header BYTES and floor-pools 2x2 blocks ([[graft.functions.Kernels
    * .rasterPool2x2]]). One narrow codegen map — the plan shape a
    * codec-backed decode+resize keeps unchanged. The position-weighted
    * checksum pins every pooled value to its coordinate, so the SQL
    * oracle (recomputing from the pixel formula, never seeing bytes)
    * verifies parse + pooling arithmetic end-to-end. */
  def poolRasters(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
        gf.rasterPool2x2(gf.rasterContainer(col(idCol).cast("long"))).as("p"))
      .select(col(idCol),
        element_at(col("p"), 1).as("out_w"),
        element_at(col("p"), 2).as("out_h"),
        element_at(col("p"), 3).as("pool_checksum"))

  /** Video-tier strided frame sampling run FOR REAL: the payload is a
    * synthetic multi-frame grayscale sequence (formulaic pixels,
    * [[graft.functions.Kernels.videoContainer]]), the sampling kernel
    * parses (w, h, n_frames) from the header BYTES and checksums every
    * `stride`-th frame plane position-weighted
    * ([[graft.functions.Kernels.videoFrameChecksums]]) — the integer core
    * of a "sample every Nth frame" video ingestion stage. One narrow
    * codegen map then a posexplode: one row in → one row per SAMPLED
    * frame out, no shuffle, no driver involvement — exactly the plan a
    * codec-backed keyframe sampler keeps. The SQL oracle recomputes every
    * checksum from the pixel formula without seeing bytes, so the header
    * parse, frame addressing, and stride arithmetic are verified
    * end-to-end (a transposed plane or off-by-one frame base cannot
    * collide with the position weights). */
  def sampleVideoFrames(df: DataFrame, idCol: String, stride: Int = 3): DataFrame = {
    require(stride > 0, "need stride > 0")
    df.select(col(idCol).cast("long").as("doc_id"),
        gf.videoFrames(gf.videoContainer(col(idCol).cast("long")), stride).as("v"))
      .select(col("doc_id"),
        posexplode(slice(col("v"), lit(3), size(col("v")))).as(Seq("pos", "frame_checksum")))
      .select(col("doc_id"),
        (col("pos") * stride).cast("long").as("frame_idx"),
        col("frame_checksum"))
  }

  /** Audio-tier PCM energy statistics run FOR REAL: every doc is wrapped
    * in a structurally valid WAV container (the [[withBinaryPayload]]
    * synthesis with the format selector pinned to the WAV branch), then
    * [[graft.functions.Kernels.audioStats]] walks the RIFF chunks to
    * `fmt ` and `data` and one-passes the data chunk as centered 8-bit
    * samples — sample rate, channels, sample count, peak amplitude, and
    * RMS, the silence-/clipping-detection triage an audio ingestion
    * pipeline runs before any transcription model. One narrow codegen
    * map, no shuffle; all stats are integers (RMS is one sqrt at the
    * end), so the SQL oracle reproduces every field including the RIFF
    * header fields the kernel must parse back from bytes. */
  def audioEnergyStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = gf.mediaContainer(col(idCol).cast("long") * 4 + 2,
      encode(coalesce(col(textCol), lit("")), "UTF-8"))
    df.select(col(idCol).cast("long").as("doc_id"), gf.audioStats(payload).as("a"))
      .select(col("doc_id"),
        element_at(col("a"), 1).as("sample_rate"),
        element_at(col("a"), 2).as("channels"),
        element_at(col("a"), 3).as("n_samples"),
        element_at(col("a"), 4).as("peak"),
        when(element_at(col("a"), 3) > 0,
          round(sqrt(element_at(col("a"), 5).cast("double") / element_at(col("a"), 3)), 6))
          .as("rms_r"))
  }

  /** Exact media dedup: group binary payloads by content hash (the
    * "same file re-uploaded" shape — dedup before any decode work), one
    * row per distinct payload with the min-id keeper. Identical to
    * [[graft.ops.Dedup.exact]] but keyed on the raw BYTES of an opaque
    * binary column: one map-combined groupBy on a 16-byte key — the
    * payloads themselves never shuffle. */
  def exactDedup(withPayload: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame =
    withPayload
      .where(col(payloadCol).isNotNull)
      .groupBy(md5(col(payloadCol)).as("payload_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
}
