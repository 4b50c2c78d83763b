package graft.ops

import org.apache.spark.sql.DataFrame

/** How iterative operators pin lineage between rounds.
  *
  * [[CheckpointStrategy.Local]] stores blocks on executors
  * (`localCheckpoint`) — fast and zero-config, right for local mode and
  * tests, but an executor loss mid-job loses blocks and kills the
  * computation. [[CheckpointStrategy.Reliable]] writes to a
  * fault-tolerant checkpoint directory (HDFS / object store on a real
  * cluster): iterations survive executor loss at the cost of one durable
  * write per pin. Iterative ops default to Local and take the strategy
  * as a parameter so a cluster deployment can opt into durability
  * without touching the algorithm.
  */
sealed trait CheckpointStrategy {
  def pin(df: DataFrame): DataFrame
}

object CheckpointStrategy {
  case object Local extends CheckpointStrategy {
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
  }

  /** Reliable checkpoints under `dir` (sets the context checkpoint dir
    * on first use; a cluster passes an HDFS/object-store path). */
  final case class Reliable(dir: String) extends CheckpointStrategy {
    def pin(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint(eager = true)
    }
  }
}
