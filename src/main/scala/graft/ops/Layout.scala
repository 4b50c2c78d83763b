package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers shared by the vector operators.
  *
  * The one rule encoded here: a broadcast nested-loop join's parallelism
  * is the STREAMED side's partition count, and Spark sizes scan partitions
  * by BYTES (`spark.sql.files.maxPartitionBytes`). An embedding table is
  * bytes-small (n x dim floats compress to a few hundred MB even at 100 M
  * rows) while the fused probe work is compute-huge (O(rows x broadcast
  * rows x dim)), so file-split sizing hands the whole scan to a handful of
  * tasks. Measured twice at sf10 before this rule existed: 4 of 32 cores
  * busy for 76 min (embeddingPairs) and for hours
  * (decontaminateEmbeddings). One explicit repartition-by-num costs a tiny
  * shuffle (the table is bytes-small by premise), spreads the probe loop
  * over every core, and — unlike heuristic shuffles — survives AQE
  * coalescing, which would merge bytes-small partitions right back
  * together.
  *
  * Broadcast-scalar crossJoins (a row of totals/bounds fused into a narrow
  * pass) do NOT need this: per-row cost there is a few arithmetic ops, so
  * file-split parallelism is proportional to the actual work.
  */
object Layout {

  /** Spread a bytes-small, compute-heavy DataFrame over every core before
    * it becomes the streamed side of a broadcast nested-loop join. */
  private[graft] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
