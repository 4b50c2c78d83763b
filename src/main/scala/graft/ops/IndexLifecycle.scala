package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The ONE lifecycle all five persistent-index families implement.
  *
  * The families grew the same conventions independently — name-derived
  * companion tables, partition layouts chosen so probes prune at the
  * scan, position-based `insertInto` appends, tombstone-table removes
  * folded by a staged compaction, and [[Warehouse.dynOverwrite]] for
  * idempotent batch writes. This trait names those conventions in one
  * place and exposes each family through one shape:
  *
  *  - `build(source, name)`   — create the index tables from scratch
  *  - `append(delta, name)`   — grow by a delta at O(delta) cost
  *    (None for the probe-only dedup families: their incremental use IS
  *    the probe — classify a delta against the frozen corpus)
  *  - `remove(rows, name)`    — O(removed) tombstones; queries correct
  *    lazily (None where removal is not part of the family's contract)
  *  - `compact(spark, name)`  — fold tombstones physically, staged
  *    through a durable table, O(affected partitions)
  *  - `query(spark, name, probe)` — the read path; cost scales with the
  *    probe side, partition-pruned at the scan, never an index rescan
  *
  * Each object is a thin adapter over the family's real functions (the
  * full-parameter API remains the primary surface); adapters fix the
  * catalog-standard column conventions noted per family. The README's
  * lifecycle table is generated from [[IndexLifecycle.markdownTable]]
  * and spec-asserted to stay in sync.
  */
sealed trait IndexLifecycle {
  /** family key, stable (used in docs and the README table) */
  def family: String

  /** one-line description of what the index stores / answers */
  def summary: String

  /** source/probe column conventions the adapter fixes */
  def columns: String

  /** all tables derived from an index name, the name-derivation
    * convention every family shares */
  def tables(name: String): Seq[String]

  def build(source: DataFrame, name: String): Unit

  def append: Option[(DataFrame, String) => Unit]

  def remove: Option[(DataFrame, String) => Unit]

  def compact: Option[(SparkSession, String) => Unit]

  def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame

  /** capability string for the generated table, e.g. "build/append/query" */
  final def capabilities: String =
    (Seq("build") ++
      append.map(_ => "append") ++
      remove.map(_ => "remove") ++
      compact.map(_ => "compact") ++
      Seq("query")).mkString("/")
}

object IndexLifecycle {

  /** Exact + shingle-Jaccard near-dup index over documents
    * ([[Dedup.dedupIndexBuild]]/[[Dedup.dedupIndexProbe]]): probe-only
    * incrementality — the daily delta is CLASSIFIED (exact/near/new)
    * against the frozen corpus, which is the intake-pipeline contract. */
  case object DedupShingle extends IndexLifecycle {
    val family = "dedup-shingle"
    val summary = "exact + n-gram-Jaccard near-dup intake filter"
    val columns = "source/probe: (doc_id, text)"
    def tables(name: String) = Seq(name, s"${name}_fps", s"${name}_meta")
    def build(source: DataFrame, name: String): Unit =
      Dedup.dedupIndexBuild(source, "text", "doc_id", name)
    val append = None
    val remove = None
    val compact = None
    def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame =
      Dedup.dedupIndexProbe(
        probe.getOrElse(sys.error(s"$family query needs a probe delta")),
        "text", "doc_id", name)
  }

  /** Embedding near-dup index ([[Dedup.embIndexBuild]]/
    * [[Dedup.embIndexProbe]]): LSH-bucketed cosine candidacy, exact
    * verify; probe-only incrementality like [[DedupShingle]]. */
  case object DedupEmbedding extends IndexLifecycle {
    val family = "dedup-embedding"
    val summary = "LSH-bucketed embedding near-dup intake filter"
    val columns = "source/probe: (vec_id, embedding)"
    def tables(name: String) = Seq(name, s"${name}_lsh", s"${name}_meta")
    def build(source: DataFrame, name: String): Unit =
      Dedup.embIndexBuild(source, "embedding", "vec_id", name)
    val append = None
    val remove = None
    val compact = None
    def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame =
      Dedup.embIndexProbe(
        probe.getOrElse(sys.error(s"$family query needs a probe delta")),
        "embedding", "vec_id", name)
  }

  /** IVFADC ANN index ([[Similarity.ivfpqBuildIndex]] family): frozen
    * quantizers on append, tombstoned remove, cell-partitioned compact. */
  case object Ivfadc extends IndexLifecycle {
    val family = "ivfadc"
    val summary = "cell-partitioned PQ vector index, top-k by ADC + rerank"
    val columns = "source/probe: (vec_id, embedding); remove: (vec_id)"
    def tables(name: String) =
      Seq(name, s"${name}_centroids", s"${name}_pq", s"${name}_tombstones")
    def build(source: DataFrame, name: String): Unit =
      Similarity.ivfpqBuildIndex(source, "vec_id", "embedding", name)
    val append = Some((delta: DataFrame, name: String) =>
      Similarity.ivfpqAppendIndex(delta, "vec_id", "embedding", name))
    val remove = Some((rows: DataFrame, name: String) =>
      Similarity.ivfpqRemoveIndex(rows, "vec_id", name))
    val compact = Some((spark: SparkSession, name: String) =>
      Similarity.ivfpqCompactIndex(spark, name))
    def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame =
      Similarity.ivfpqQueryIndex(
        probe.getOrElse(sys.error(s"$family query needs query vectors")),
        "vec_id", "embedding", name, k = 10)
  }

  /** BM25 inverted index ([[Search.bm25IndexBuild]] family): term-bucket
    * + batch partitioning, idempotent batch appends, tombstoned remove
    * with exact lazy correction, staged compact. */
  case object Bm25 extends IndexLifecycle {
    val family = "bm25"
    val summary = "term-bucketed inverted index, BM25 top-k retrieval"
    val columns = "source/remove: (doc_id, text); probe: (term) rows"
    def tables(name: String) =
      Seq(name, s"${name}_terms", s"${name}_meta", s"${name}_tombstones")
    def build(source: DataFrame, name: String): Unit =
      Search.bm25IndexBuild(source, "text", "doc_id", name)
    val append = Some((delta: DataFrame, name: String) =>
      Search.bm25IndexAppend(delta, "text", "doc_id", name))
    val remove = Some((rows: DataFrame, name: String) =>
      Search.bm25IndexRemove(rows, "text", "doc_id", name))
    val compact = Some((spark: SparkSession, name: String) =>
      Search.bm25IndexCompact(spark, name))
    def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame = {
      // a BM25 probe is a literal term list by contract (query-sized,
      // never a corpus) — accept it as one `term` column
      val terms = probe.getOrElse(sys.error(s"$family query needs terms"))
        .select(col("term")).collect().map(_.getString(0)).toSeq
      Search.bm25IndexQuery(spark, name, terms)
    }
  }

  /** Persistent incremental aggregate ([[AggIndex]]): day-partitioned
    * integer partials, exactly-once batch appends, queries merge. */
  case object Aggregate extends IndexLifecycle {
    val family = "aggregate"
    val summary = "day-partitioned integer rollup, exactly-once ETL"
    val columns = "source/append: events (event_type, value, ts)"
    def tables(name: String) = Seq(name)
    def build(source: DataFrame, name: String): Unit =
      AggIndex.build(source, name)
    val append = Some((delta: DataFrame, name: String) =>
      AggIndex.append(delta, name))
    val remove = None
    val compact = None
    def query(spark: SparkSession, name: String, probe: Option[DataFrame]): DataFrame =
      AggIndex.query(spark, name)
  }

  val all: Seq[IndexLifecycle] =
    Seq(DedupShingle, DedupEmbedding, Ivfadc, Bm25, Aggregate)

  /** The README's persistent-index table — generated, never hand-edited
    * (a spec asserts the README embeds exactly this). */
  def markdownTable: String = {
    val header =
      "| family | lifecycle | summary | columns |\n|---|---|---|---|"
    val rows = all.map { ix =>
      s"| ${ix.family} | ${ix.capabilities} | ${ix.summary} | ${ix.columns} |"
    }
    (header +: rows).mkString("\n")
  }
}
