package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation.
  *
  * PageRank is the classic crawl-prioritization / page-authority signal
  * (Page et al. 1999): a quality prior over a link graph that a web-scale
  * training-data pipeline uses to decide what to fetch, keep, or upweight
  * long before any content-level quality model runs.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic — deterministic and
    * bit-exact across engines, partition layouts, and retries.
    *
    * Float PageRank sums contributions in shuffle order, so two runs (or
    * two engines) disagree in the last ulps and no exact oracle can
    * exist. Here ranks are integers in units of 1/`scale` (default 1e-12):
    *
    *   r0          = scale div |V|
    *   contrib(i)  = r(i) div outdeg(i)
    *   r'(j)       = base + (sum_incoming(j) * dampNum) div 100
    *   base        = (scale * (100 - dampNum)) div (100 * |V|)
    *
    * Every operation is integer (div = floor for the non-negative values
    * here), and integer sums are order-independent, so the result is a
    * pure function of the graph. Truncation loses < 1e-12 of mass per
    * term — invisible next to float noise, and exactly reproducible.
    * Dangling-vertex mass (vertices with no out-edges) is dropped, not
    * redistributed; the synthesized catalog graph has none.
    *
    * Scale: `edges` is materialized once and reused by every iteration;
    * each iteration is one join on `src` (ranks are vertex-sized, edges
    * dominate) and one partially-aggregated groupBy on `dst` — hub pages
    * with huge in-degree are combined map-side, so in-degree skew never
    * concentrates on one reducer. On a cluster, bucket both vertices and
    * edges by id/src to make the per-iteration join co-partitioned. Each
    * iteration's ranks are pinned via `ckpt` so the plan does not grow
    * with the iteration count — pass
    * [[CheckpointStrategy.Reliable]] on a cluster so an executor loss
    * mid-run cannot lose the materialized iteration state.
    *
    * @param vertices one `id` (long) row per vertex (isolated vertices kept)
    * @param edges    (`src`, `dst`) long pairs, self-loop-free, distinct
    * @param ckpt     lineage-pinning strategy between iterations
    * @return (id, rank_e12) — rank in units of 1/scale
    */
  def pageRank(
      vertices: DataFrame,
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L,
      ckpt: CheckpointStrategy = CheckpointStrategy.Auto): DataFrame = {
    require(iters >= 0, "need iters >= 0")
    require(dampNum >= 0 && dampNum <= 100, "dampNum is a percentage")
    val ids = ckpt.pin(vertices.select(col("id").cast("long").as("id")))
    val nV = ids.count()
    require(nV > 0, "empty vertex set")
    val e = ckpt.pin(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    // out-degree attached to the edge list ONCE, outside the loop: the old
    // shape joined ranks with outdeg (vertex-sized shuffle join) and then
    // with the edges EVERY iteration; pre-joining moves that join out of
    // the loop, so each iteration is one edge join + one aggregation. The
    // per-edge `pr DIV outdeg` is the same integer either way — computed
    // per edge instead of per vertex, a free trade (one integer division
    // vs a whole shuffle join per iteration).
    val eDeg = ckpt.pin(e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))
    val base = (scale * (100L - dampNum)) / (100L * nV)
    var ranks = ids.select(col("id"), lit(scale / nV).as("pr"))
    for (_ <- 1 to iters) {
      val incoming = ranks
        .join(eDeg, col("id") === col("src"))
        .groupBy("dst").agg(sum(expr("pr DIV outdeg")).as("incoming"))
      ranks = ckpt.pin(ids
        .join(incoming, ids("id") === incoming("dst"), "left")
        .select(ids("id"),
          (lit(base) + expr(s"coalesce(incoming, CAST(0 AS BIGINT)) * $dampNum DIV 100"))
            .as("pr")))
    }
    ranks.select(col("id"), col("pr").cast("long").as("rank_e12"))
  }
}
