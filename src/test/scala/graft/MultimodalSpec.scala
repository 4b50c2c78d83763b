package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload column + typed metadata schema") {
    val df = Seq((0L, "hello"), (1L, "world!")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    assert(wp.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    val meta = wp.select("media_meta.n_bytes", "media_meta.mime").orderBy("n_bytes").collect()
    assert(meta(0).getInt(0) === 5)
    assert(meta.map(_.getString(1)).toSet.subsetOf(
      Set("image/png", "image/jpeg", "audio/wav", "video/mp4")))
  }

  test("batched feature extraction is deterministic and preserves rows") {
    val df = Seq((0L, "hello"), (1L, "world!"), (2L, "again again")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(wp).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(wp).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 3)
    assert(f1(0).magic === "68656c6c") // "hell"
    assert(f1.forall(r => r.decoded_width >= 64 && r.decoded_height >= 64))
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

  test("resizeMeta: aspect preserved, never upscales") {
    val df = Seq((0L, "hello world again and again")).toDF("doc_id", "text")
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val resized = Multimodal.resizeMeta(Multimodal.extractFeatures(wp), 64, 64).collect()(0)
    val (w, h) = (resized.getAs[Int]("resized_width"), resized.getAs[Int]("resized_height"))
    assert(w <= 64 && h <= 64)
    val (ow, oh) = (resized.getAs[Int]("decoded_width"), resized.getAs[Int]("decoded_height"))
    assert(w <= ow && h <= oh)
  }

  test("partitioning preserved through the mapPartitions transform") {
    val df = spark.range(100).toDF("doc_id").withColumn("text", concat(lit("doc "), col("doc_id")))
      .repartition(7)
    val wp = Multimodal.withBinaryPayload(df, "doc_id", "text")
    val out = Multimodal.extractFeatures(wp)
    assert(out.rdd.getNumPartitions === 7)
    assert(out.count() === 100)
  }
}
