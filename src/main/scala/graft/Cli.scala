package graft

import graft.llm.{EchoModel, Jobs}

/** CLI mirroring the reference's command surface (sutro/cli.py): jobs
  * list/status/results/cancel, datasets create/list/files, and a one-shot
  * infer over a file input. Local-engine semantics: jobs run synchronously
  * on the embedded SparkSession and cache results as parquet.
  *
  * Usage:
  *   runMain graft.Cli jobs list
  *   runMain graft.Cli jobs status <job-id>
  *   runMain graft.Cli jobs results <job-id>
  *   runMain graft.Cli jobs cancel <job-id>
  *   runMain graft.Cli datasets create <name>
  *   runMain graft.Cli datasets list
  *   runMain graft.Cli datasets files <id>
  *   runMain graft.Cli infer <path> <column> [maxChars]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val g = Graft(spark)
    try run(g, args.toList)
    finally spark.stop()
  }

  private[graft] def run(g: Graft, args: List[String]): Unit = args match {
    case "jobs" :: "list" :: rest =>
      // reference cli.py:143: newest first, first 25 unless --all
      val all = rest.contains("--all")
      val jobs = g.listJobs()
        .sortBy(j => -j.id.stripPrefix("job-").toLongOption.getOrElse(0L))
      if (jobs.isEmpty) println("No jobs found.")
      else {
        val shown = if (all) jobs else jobs.take(25)
        shown.foreach(j => println(s"${j.id}\t${j.status}\tpriority=${j.priority}\t${j.name.getOrElse("-")}"))
        if (!all && jobs.size > 25)
          println(s"... ${jobs.size - 25} more (use --all to see all jobs)")
      }
    case "jobs" :: "status" :: id :: Nil =>
      println(s"$id\t${Jobs.status(id)}")
    case "jobs" :: "results" :: id :: rest =>
      // reference cli.py:237: --include-inputs, --include-cumulative-logprobs,
      // --save, --save-format parquet|csv, plus --output-path for the dir
      val save = rest.contains("--save")
      val fmt = optValue(rest, "--save-format").getOrElse("parquet")
      require(fmt == "parquet" || fmt == "csv", s"unsupported save format: $fmt")
      val outDir = optValue(rest, "--output-path").getOrElse(".")
      val df = g.jobResults(id,
        includeInputs = rest.contains("--include-inputs"),
        includeCumulativeLogprobs = rest.contains("--include-cumulative-logprobs"))
      if (!save) df.show(20, truncate = 60)
      else {
        val dest = s"$outDir/$id.$fmt"
        if (fmt == "parquet") df.coalesce(1).write.mode("overwrite").parquet(dest)
        else df.coalesce(1).write.mode("overwrite").option("header", "true").csv(dest)
        println(s"Results saved to $dest")
      }
    case "jobs" :: "cancel" :: id :: Nil =>
      println(s"$id\t${g.cancelJob(id)}")
    case "jobs" :: "attach" :: rest =>
      // reference cli.py:422: attach [job_id] [--latest] — stream status
      // transitions until a terminal state (local jobs are synchronous, so
      // an attach observes at least the terminal status, exactly the
      // sdk.attach contract for an already-finished job)
      val latest = rest.contains("--latest")
      val idArg = rest.filterNot(_.startsWith("--")).headOption
      val target =
        if (latest) {
          val jobs = g.listJobs()
            .sortBy(j => -j.id.stripPrefix("job-").toLongOption.getOrElse(0L))
          jobs.headOption match {
            case Some(j) => println(s"Attaching to latest job: ${j.id}"); Some(j.id)
            case None => println("No jobs found."); None
          }
        } else idArg.orElse { println("No job ID provided."); None }
      target.foreach { jid =>
        val fin = g.attachJob(jid, s => println(s"$jid\t$s"))
        if (fin == Jobs.Failed)
          Jobs.failureReason(jid).foreach(r => println(s"failure reason: $r"))
      }
    case "jobs" :: "trace" :: id :: Nil =>
      // per-job trace export (reference observability.py: batch traces
      // filterable by sutro_job_id)
      val ts = Observability.forJob(id)
      if (ts.isEmpty) println(s"No traces recorded for job $id.")
      else ts.foreach { t =>
        val outcome = if (t.success) "ok" else s"FAILED ${t.error.getOrElse("")}"
        println(s"${t.atMillis}\t${t.action}\t${t.durationMs}ms\t$outcome")
      }
    case "datasets" :: "create" :: name :: Nil =>
      println(g.datasets.create(Some(name)))
    case "datasets" :: "list" :: Nil =>
      g.datasets.list().foreach(println)
    case "datasets" :: "files" :: id :: Nil =>
      g.datasets.listFiles(id).foreach(println)
    case "datasets" :: "download" :: datasetId :: rest =>
      // reference cli.py:348: download <dataset_id> [file_name]
      // [output_path] — all files when no name, cwd when no output path
      val (fileName, outputPath) = rest match {
        case Nil => (None, ".")
        case f :: Nil => (Some(f), ".")
        case f :: out :: Nil => (Some(f), out)
        case _ => sys.error("usage: datasets download <dataset_id> [file_name] [output_path]")
      }
      val written = g.datasets.exportFiles(datasetId, outputPath, fileName.map(Seq(_)))
      println(s"Downloaded ${written.size} file(s) from dataset $datasetId:")
      written.foreach(println)
    case "datasets" :: "upload" :: first :: rest =>
      // reference semantics: with a single argument it is the file path and
      // a fresh dataset is created; otherwise the first arg is the dataset
      val (dsId, paths) =
        if (rest.isEmpty) (None, List(first))
        else (Some(first), rest)
      val (id, names) = g.datasets.uploadFiles(paths, dsId)
      println(s"Uploaded ${names.size} file(s) to dataset: $id")
      names.foreach(println)
    case "cache" :: "show" :: Nil =>
      // reference cli.py:379: contents + size of the job results cache
      val dir = new java.io.File(graft.llm.Jobs.cacheDir)
      val entries = Option(dir.listFiles()).getOrElse(Array.empty)
      if (entries.isEmpty) println("Job results cache is empty.")
      else {
        var total = 0L
        entries.sortBy(_.getName).foreach { f =>
          val sz = dirSize(f)
          total += sz
          println(f"${f.getName}%-40s ${sz}%10d bytes")
        }
        println(f"total: ${entries.length} entries, $total bytes")
      }
    case "cache" :: "clear" :: Nil =>
      val dir = new java.io.File(graft.llm.Jobs.cacheDir)
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      println("Job results cache cleared.")
    case "function" :: "run" :: name :: rest if rest.nonEmpty =>
      // key=value pairs -> input_data map; prints the standardized shape
      val input = rest.map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case _ => sys.error(s"expected key=value, got: $kv")
        }
      }.toMap
      val r = g.runFunction(name, input)
      println(s"response: ${r.response}")
      println(s"confidence: ${r.confidence}")
      println(s"predictions: ${r.predictions.map(p => s"${p.label}=${p.confidence}").mkString(", ")}")
      println(s"run_id: ${r.run_id}")
    case "multimodal" :: path :: column :: rest =>
      val nFrames = rest.headOption.map(_.toInt).getOrElse(4)
      val df = g.load(path)
      val idCol = df.columns.headOption.getOrElse("doc_id")
      val wp = graft.ops.Multimodal.withBinaryPayload(df, idCol, column)
      val features = graft.ops.Multimodal.extractFeatures(wp)
      val resized = graft.ops.Multimodal.resizeMeta(features, 128, 128)
      println(s"payloads: ${wp.count()}")
      resized.select("doc_id", "format", "n_bytes", "width", "height",
        "resized_width", "resized_height").show(5)
      val frames = graft.ops.Multimodal.sampleFrames(wp, nFrames)
      println(s"frames sampled: ${frames.count()} ($nFrames per payload)")
      frames.toDF().show(5)
    case "infer" :: path :: column :: rest =>
      val maxChars = rest.headOption.map(_.toInt).getOrElse(100)
      val df = g.load(path)
      val out = g.infer(df, EchoModel(maxChars), Seq(column))
      val id = g.submitJob(out, Some(s"cli-infer-$column"))
      println(s"Job created with ID: $id")
      g.jobResults(id).show(5, truncate = 60)
      println(s"You can re-obtain the results with `jobs results $id`")
    case other =>
      System.err.println(
        s"""Unknown command: ${other.mkString(" ")}
           |Commands:
           |  jobs list [--all] | jobs status <id> | jobs cancel <id> | jobs trace <id>
           |  jobs attach [<id>] [--latest]
           |  jobs results <id> [--save] [--save-format parquet|csv] [--output-path dir]
           |                    [--include-inputs] [--include-cumulative-logprobs]
           |  cache show | cache clear
           |  function run <name> key=value [key=value ...]
           |  datasets create <name> | datasets list | datasets files <id>
           |  datasets upload [<id>] <path> | datasets download <id> [file] [outDir]
           |  multimodal <path> <column> [nFrames]
           |  infer <path> <column> [maxChars]""".stripMargin)
      sys.exit(2)
  }

  /** Value of `--flag v` in an argument list, if present. */
  private def optValue(args: List[String], flag: String): Option[String] =
    args.dropWhile(_ != flag) match {
      case `flag` :: v :: _ => Some(v)
      case _ => None
    }

  private def dirSize(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(dirSize).sum

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
