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

  private def run(g: Graft, args: List[String]): Unit = args match {
    case "jobs" :: "list" :: Nil =>
      val jobs = g.listJobs()
      if (jobs.isEmpty) println("No jobs found.")
      else jobs.foreach(j => println(s"${j.id}\t${j.status}\tpriority=${j.priority}\t${j.name.getOrElse("-")}"))
    case "jobs" :: "status" :: id :: Nil =>
      println(s"$id\t${Jobs.status(id)}")
    case "jobs" :: "results" :: id :: Nil =>
      g.jobResults(id).show(20, truncate = 60)
    case "jobs" :: "cancel" :: id :: Nil =>
      println(s"$id\t${g.cancelJob(id)}")
    case "datasets" :: "create" :: name :: Nil =>
      println(g.datasets.create(Some(name)))
    case "datasets" :: "list" :: Nil =>
      g.datasets.list().foreach(println)
    case "datasets" :: "files" :: id :: Nil =>
      g.datasets.listFiles(id).foreach(println)
    case "multimodal" :: path :: column :: rest =>
      val nFrames = rest.headOption.map(_.toInt).getOrElse(4)
      val df = g.load(path)
      val idCol = df.columns.headOption.getOrElse("doc_id")
      val wp = graft.ops.Multimodal.withBinaryPayload(df, idCol, column)
      val features = graft.ops.Multimodal.extractFeatures(wp)
      val resized = graft.ops.Multimodal.resizeMeta(features, 128, 128)
      println(s"payloads: ${wp.count()}")
      resized.select("doc_id", "mime", "n_bytes", "decoded_width", "decoded_height",
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
           |  jobs list | jobs status <id> | jobs results <id> | jobs cancel <id>
           |  datasets create <name> | datasets list | datasets files <id>
           |  infer <path> <column> [maxChars]""".stripMargin)
      sys.exit(2)
  }
}
