package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Spark-native analog of the reference's batch-run tracing
  * (sutro/observability.py: per-job traces with timings and outcomes sent
  * to an external tracer): a QueryExecutionListener records every action's
  * duration, outcome, and output row estimate into an in-process trace
  * log. A real deployment would forward these to its metrics backend; the
  * capture point and record shape are the stable part.
  */
object Observability {

  /** One completed Spark action. rowsOut is the optimizer's estimate when
    * stats are available (-1 otherwise) — cheap, no extra job. jobId links
    * the trace to the [[graft.llm.Jobs]] run that produced it (the
    * reference's batch traces carry a sutro_job_id for exactly this
    * filtering, observability.py:48) — None for ad-hoc actions. */
  case class Trace(
      action: String,
      durationMs: Long,
      success: Boolean,
      error: Option[String],
      rowsOut: Long,
      atMillis: Long,
      jobId: Option[String] = None)

  private val traces = new ConcurrentLinkedQueue[Trace]()

  /** Record a trace directly (the Jobs registry stamps its job id here —
    * a listener cannot attribute an action to a job race-free). */
  def record(trace: Trace): Unit = traces.add(trace): Unit

  /** Traces belonging to one job, oldest first. */
  def forJob(jobId: String): Seq[Trace] =
    traces.asScala.toSeq.filter(_.jobId.contains(jobId))
  private val attached = java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = try qe.optimizedPlan.stats.rowCount.map(_.toLong).getOrElse(-1L)
      catch { case _: Throwable => -1L }
      traces.add(Trace(funcName, durationNs / 1000000L, success = true, None, rows,
        System.currentTimeMillis()))
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      traces.add(Trace(funcName, 0L, success = false, Some(exception.getMessage), -1L,
        System.currentTimeMillis()))
  }

  /** Idempotent per-session attach. */
  def attach(spark: SparkSession): Unit = synchronized {
    val id = System.identityHashCode(spark).toString
    if (attached.add(id)) spark.listenerManager.register(new Listener)
  }

  def recent(n: Int = 100): Seq[Trace] = traces.asScala.toSeq.takeRight(n)
  def clear(): Unit = traces.clear()
}
