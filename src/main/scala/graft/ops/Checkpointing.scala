package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** How operators pin lineage — between iterations, or wherever an
  * intermediate frame is consumed by more than one downstream stage.
  *
  * [[CheckpointStrategy.Local]] stores blocks on executors
  * (`localCheckpoint`) — fast and zero-config, right for local mode and
  * tests, but an executor loss mid-job loses blocks and kills the
  * computation. [[CheckpointStrategy.Reliable]] writes to a
  * fault-tolerant checkpoint directory (HDFS / object store on a real
  * cluster): iterations survive executor loss at the cost of one durable
  * write per pin. [[CheckpointStrategy.Auto]] (the library-wide default)
  * resolves per session: Reliable when `spark.graft.checkpoint.dir` is
  * set, Local otherwise — so a cluster deployment opts the WHOLE library
  * into durable pins with one conf key, without touching any algorithm.
  */
sealed trait CheckpointStrategy {
  def pin(df: DataFrame): DataFrame
}

object CheckpointStrategy {
  case object Local extends CheckpointStrategy {
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
  }

  /** Reliable checkpoints under `dir` (sets the context checkpoint dir
    * on first use; a cluster passes an HDFS/object-store path).
    *
    * The set-once check compares the PARENT of the stored path against
    * the qualified `dir`: `setCheckpointDir` stores `dir/<random-UUID>`
    * (fully qualified), so a whole-path equality check would never match
    * and every pin would mkdir a fresh UUID subdir — while a substring
    * test would false-positive when `dir` happens to be a substring of an
    * unrelated configured path and silently pin into the stale dir. */
  final case class Reliable(dir: String) extends CheckpointStrategy {
    def pin(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      val wanted = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
      }
      val alreadySet = sc.getCheckpointDir.exists { stored =>
        new org.apache.hadoop.fs.Path(stored).getParent == wanted
      }
      if (!alreadySet) sc.setCheckpointDir(dir)
      df.checkpoint(eager = true)
    }
  }

  /** Session-conf-driven: [[Checkpointing.resolve]] per pinned frame. */
  case object Auto extends CheckpointStrategy {
    def pin(df: DataFrame): DataFrame =
      Checkpointing.resolve(df.sparkSession).pin(df)
  }
}

/** Library-wide entry point: every operator that needs a lineage pin
  * calls [[Checkpointing.pin]] (or the [[Checkpointing.PinSyntax]]
  * enrichment `.pinned()`) instead of a bare `localCheckpoint`, so the
  * executor-loss posture of all ~30 pin sites is governed by ONE conf
  * key rather than thirty hard-coded choices. */
object Checkpointing {
  /** When set (to an HDFS/object-store path on a cluster), every pin in
    * the library becomes a reliable checkpoint; unset = localCheckpoint. */
  val ConfKey = "spark.graft.checkpoint.dir"

  def resolve(spark: SparkSession): CheckpointStrategy =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty)
      .map(CheckpointStrategy.Reliable.apply)
      .getOrElse(CheckpointStrategy.Local)

  def pin(df: DataFrame): DataFrame = resolve(df.sparkSession).pin(df)

  implicit final class PinSyntax(private val df: DataFrame) extends AnyVal {
    /** Conf-driven lineage pin — the drop-in replacement for
      * `localCheckpoint(eager = true)`. */
    def pinned(): DataFrame = Checkpointing.pin(df)
  }
}
