package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque binary payload columns with typed metadata.
  *
  * In this container there are no image/audio decode libraries, so the
  * decode step is a clearly-marked deterministic STUB — but everything
  * Spark-side is real and tested: the binary column representation, the
  * metadata schema, the per-partition batched transform shape (the same
  * shape a vectorized decode UDF has: iterate batches, amortize model /
  * codec setup per partition, emit rows), and the partitioning behavior.
  */
object Multimodal {

  /** Typed per-payload features. `decoded_*` fields come from the stub. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      mime: String,
      magic: String,
      decoded_width: Int,
      decoded_height: Int,
      entropy_m: Long)

  /** Attach an opaque binary payload + metadata struct to each doc.
    * Payload is the utf-8 text bytes (stand-in for real media bytes). */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val mime = element_at(
      array(lit("image/png"), lit("image/jpeg"), lit("audio/wav"), lit("video/mp4")),
      (pmod(col(idCol), lit(4)) + 1).cast("int"))
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        mime.as("mime")).as("media_meta"))
  }

  /** STUB decode: deterministic pseudo-decode of a payload. A real decoder
    * (libjpeg / ffmpeg / PIL via a vectorized UDF) replaces exactly this
    * function; the batching around it stays unchanged. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    // "width/height" derived from byte stats; entropy proxy = distinct bytes
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    val distinct = payload.distinct.length.toLong
    val w = 64 + (sum % 512).toInt
    val h = 64 + ((sum / 7) % 512).toInt
    (w, h, distinct)
  }

  /** One sampled "frame" of a (stub-decoded) video payload. */
  case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      byte_offset: Int,
      frame_checksum: Long)

  /** Frame sampling over binary payloads: emit `nFrames` evenly-spaced
    * frames per payload (STUB decode: a frame is a byte slice + checksum;
    * a real sampler seeks keyframes via the codec). The Spark shape is the
    * real part: per-partition batching, one row in -> nFrames rows out,
    * no driver involvement. */
  def sampleFrames(withPayload: DataFrame, nFrames: Int): Dataset[FrameFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
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

  /** STUB resize: recompute "decoded" dimensions for a target box keeping
    * aspect; real implementation swaps in a codec call, the columnar shape
    * (narrow map, no shuffle) stays. */
  def resizeMeta(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val df = features.toDF()
    val scale = least(
      lit(maxW).cast("double") / col("decoded_width"),
      lit(maxH).cast("double") / col("decoded_height"),
      lit(1.0))
    df.withColumn("resized_width", floor(col("decoded_width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("decoded_height") * scale).cast("int"))
  }

  /** Batched per-partition feature extraction over binary payloads.
    *
    * mapPartitions so per-partition setup (a real codec context) happens
    * once per partition, not per row — the Scala analog of mapInPandas
    * batch processing.
    */
  def extractFeatures(withPayload: DataFrame): Dataset[MediaFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(
        col("doc_id"), col("payload"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.mime").as("mime"))
      .as[(Long, Array[Byte], Int, String)]
      .mapPartitions { rows =>
        // per-partition "codec" setup would go here (once, amortized)
        rows.map { case (id, payload, nBytes, mime) =>
          val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
          val (w, h, ent) = decodeStub(payload)
          MediaFeatures(id, nBytes, mime, magic, w, h, ent)
        }
      }
  }
}
