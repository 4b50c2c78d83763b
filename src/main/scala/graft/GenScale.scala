package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for scale rehearsals (SURVEY §9).
  *
  * Reads the driver testdata at one scale factor and writes a C×
  * replica-with-disjoint-keys corpus, so the full catalog can be benched at
  * 10× (or 100×) the largest driver-provided sf. The replication is designed
  * so per-copy workload STRUCTURE matches the original — the scaled bench
  * measures the engine, not an artifact of naive duplication:
  *
  *  - Keyed tables shift every key column by `copy * stride` (strides far
  *    above the source key range), so FK joins stay consistent per copy and
  *    copies never collide. Dimension tables (region, nation) are shared.
  *  - Events keep their real timestamps (same 30-day window, C× the rows and
  *    C× the users) — the honest shape for streaming-state rehearsals: state
  *    cardinality scales with users, watermark timeline does not stretch.
  *  - Document texts in copy 0 are verbatim; copies > 0 permute each text's
  *    words by sorting on xxhash64(word, position, copy). The permutation
  *    key deliberately EXCLUDES doc_id: two near-duplicate texts inside one
  *    copy permute the same way (shared (word, pos) pairs sort identically),
  *    so intra-copy near-dup structure — what the dedup family measures — is
  *    preserved, while cross-copy shingle overlap collapses to noise. A
  *    naive C× text copy would instead add C-cliques of exact dups and make
  *    every pair-generation bench quadratic in C.
  *  - Embeddings in copy c rotate coordinates by 7c (mod dim). A coordinate
  *    permutation is orthogonal: all intra-copy cosines — and therefore
  *    cluster structure, kNN ranks, IVF recall — are EXACTLY preserved,
  *    while cross-copy cosine decorrelates.
  *
  * Usage: GRAFT_SCALE_SRC=/root/testdata/sf0.1 GRAFT_SCALE_DST=data/sf1
  * GRAFT_SCALE_COPIES=10 runMain graft.GenScale */
object GenScale {

  private val strides: Map[String, Long] = Map(
    "c_custkey" -> 10000000L, "o_custkey" -> 10000000L,
    "o_orderkey" -> 100000000L, "l_orderkey" -> 100000000L,
    "p_partkey" -> 10000000L, "l_partkey" -> 10000000L,
    "s_suppkey" -> 1000000L, "l_suppkey" -> 1000000L,
    "event_id" -> 100000000L, "user_id" -> 1000000L,
    "doc_id" -> 10000000L, "vec_id" -> 10000000L)

  /** Shift every known key column by copy*stride; leave the rest alone. */
  private def shiftKeys(df: DataFrame, copy: Int): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      strides.get(c) match {
        case Some(s) => d.withColumn(c, col(c) + lit(copy * s))
        case None => d
      }
    }

  /** Deterministic per-copy word permutation (see scaladoc). */
  private def permuteText(text: Column, copy: Int): Column = {
    val words = split(text, " ")
    val tagged = zip_with(words, sequence(lit(0), size(words) - 1),
      (w, p) => struct(xxhash64(w, p, lit(copy)).as("h"), w.as("w")))
    array_join(transform(array_sort(tagged), s => s.getField("w")), " ")
  }

  /** Rotate coordinates by `shift` — an orthogonal transform. */
  private def rotateVec(vec: Column, shift: Int): Column =
    if (shift == 0) vec
    else concat(slice(vec, lit(shift + 1), size(vec) - shift), slice(vec, 1, shift))

  private def scaled(spark: SparkSession, src: String, table: String,
      copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$src/$table.parquet")
    val parts = (0 until copies).map { c =>
      val keyed = shiftKeys(base, c)
      table match {
        case "documents" if c > 0 =>
          keyed.withColumn("text", permuteText(col("text"), c))
            .withColumn("n_chars", length(col("text")).cast("long"))
        case "embeddings" =>
          keyed.withColumn("embedding", rotateVec(col("embedding"), (7 * c) % 64))
        case _ => keyed
      }
    }
    parts.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("GRAFT_SCALE_DST", "data/sf1")
    val copies = sys.env.getOrElse("GRAFT_SCALE_COPIES", "10").toInt
    val spark = GraftSession.getOrCreate()
    val shared = Set("region", "nation")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df =
        if (shared(t)) spark.read.parquet(s"$src/$t.parquet")
        else scaled(spark, src, t, copies)
      val files = math.max(1, math.min(16, copies))
      df.repartition(files).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
