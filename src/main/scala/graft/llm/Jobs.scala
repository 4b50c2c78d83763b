package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Local job registry mirroring the reference's job lifecycle
  * (sutro/sdk.py: create/status/await/cancel/results + parquet result
  * cache at ~/.sutro/job-results). Jobs here are Spark actions; results
  * are materialized to a repo-local parquet cache keyed by job id.
  */
object Jobs {
  sealed trait Status { def isTerminal: Boolean }
  case object Queued extends Status { val isTerminal = false }
  case object Running extends Status { val isTerminal = false }
  case object Succeeded extends Status { val isTerminal = true }
  case object Failed extends Status { val isTerminal = true }
  case object Cancelled extends Status { val isTerminal = true }

  /** priority mirrors the reference's job_priority (0 = prototyping). */
  case class Job(id: String, name: Option[String], resultPath: String,
      var status: Status, priority: Int = 0)

  private val counter = new AtomicLong(0)
  private val jobs = new ConcurrentHashMap[String, Job]()

  /** Resolved job-results cache directory — the single source of truth
    * (the CLI cache commands operate on the same location). */
  def cacheDir: String =
    sys.props.getOrElse("graft.jobs.dir", "target/graft/job-results")

  /** Submit: materialize `df` to the job cache. Synchronous (local mode);
    * the lifecycle states still transition so callers can poll uniformly. */
  def submit(df: DataFrame, name: Option[String] = None, priority: Int = 0): String = {
    val id = s"job-${counter.incrementAndGet()}"
    val path = s"$cacheDir/$id.parquet"
    val job = Job(id, name, path, Queued, priority)
    jobs.put(id, job)
    job.status = Running
    try {
      df.write.mode("overwrite").parquet(path)
      job.status = Succeeded
    } catch {
      case e: Throwable =>
        job.status = Failed
        throw e
    }
    id
  }

  def status(id: String): Status =
    Option(jobs.get(id)).map(_.status).getOrElse(Failed)

  def results(spark: SparkSession, id: String): DataFrame = {
    val job = Option(jobs.get(id)).getOrElse(throw new NoSuchElementException(s"unknown job $id"))
    require(job.status == Succeeded, s"job $id is ${job.status}")
    spark.read.parquet(job.resultPath)
  }

  /** Await a terminal status (reference await_job_completion; local jobs
    * are synchronous, so this returns immediately but keeps the polling
    * contract for callers written against an async backend). */
  def await(id: String, pollMillis: Long = 100, timeoutMillis: Long = 60000): Status = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    var s = status(id)
    while (!s.isTerminal && System.currentTimeMillis() < deadline) {
      Thread.sleep(pollMillis)
      s = status(id)
    }
    s
  }

  def cancel(id: String): Status = {
    Option(jobs.get(id)).foreach { j => if (!j.status.isTerminal) j.status = Cancelled }
    status(id)
  }

  def list(): Seq[Job] = {
    import scala.jdk.CollectionConverters._
    jobs.values().asScala.toSeq.sortBy(_.id)
  }
}
