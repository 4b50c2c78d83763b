package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Local dataset registry mirroring the reference's dataset lifecycle
  * (sutro/sdk.py: create_dataset / upload to dataset / list_datasets /
  * download): datasets are directories of parquet/csv/jsonl/txt files under
  * a registry root, addressed by dataset id.
  */
class Datasets(root: String) {
  private def rootPath: Path = {
    val p = Paths.get(root)
    Files.createDirectories(p)
    p
  }

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Create an empty dataset, returning its id. */
  def create(name: Option[String] = None): String = {
    val id = name.getOrElse(f"dataset-${System.currentTimeMillis()}%d-${counter.incrementAndGet()}%d")
    Files.createDirectories(rootPath.resolve(id))
    id
  }

  /** Upload (materialize) a DataFrame into a dataset as the given format. */
  def upload(df: DataFrame, datasetId: String, format: String = "parquet", name: String = "part"): String = {
    val dir = rootPath.resolve(datasetId)
    require(Files.isDirectory(dir), s"unknown dataset $datasetId")
    val target = dir.resolve(s"$name.$format").toString
    format match {
      case "parquet" => df.write.mode("overwrite").parquet(target)
      case "orc"     => df.write.mode("overwrite").orc(target)
      case "csv"     => df.write.mode("overwrite").option("header", "true").csv(target)
      case "json" | "jsonl" => df.write.mode("overwrite").json(target)
      case other     => throw new IllegalArgumentException(s"Unsupported dataset format: $other")
    }
    target
  }

  /** Supported raw-file formats — the set [[Tables.load]] can read back. */
  val supportedExtensions: Set[String] = Set("parquet", "orc", "csv", "txt", "jsonl", "json")

  /** Upload raw files by path (reference upload_to_dataset,
    * sutro/sdk.py:1400): accepts file paths or a directory (expanded,
    * error when empty), validates each extension against the loadable
    * formats, creates the dataset when none is given. Returns the dataset
    * id and the uploaded file names. */
  def uploadFiles(
      filePaths: Seq[String],
      datasetId: Option[String] = None): (String, Seq[String]) = {
    require(filePaths.nonEmpty, "File paths must be provided")
    val expanded = filePaths.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory) {
        val children = Option(f.listFiles()).getOrElse(Array.empty).filter(_.isFile)
        if (children.isEmpty) throw new IllegalArgumentException("No files found in the directory")
        children.map(_.getPath).sorted.toSeq
      } else Seq(p)
    }
    expanded.foreach { p =>
      require(new java.io.File(p).isFile, s"no such file: $p")
      val ext = p.substring(p.lastIndexOf('.') + 1).toLowerCase
      if (!supportedExtensions.contains(ext))
        throw new IllegalArgumentException(
          s"Unsupported file type: .$ext (supported: ${supportedExtensions.toSeq.sorted.mkString(", ")})")
    }
    val id = datasetId.getOrElse(create())
    val dir = rootPath.resolve(id)
    require(Files.isDirectory(dir), s"unknown dataset $id")
    val names = expanded.map { p =>
      val name = new java.io.File(p).getName
      Files.copy(Paths.get(p), dir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      name
    }
    (id, names)
  }

  def list(): Seq[String] =
    Files.list(rootPath).iterator().asScala.filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  def listFiles(datasetId: String): Seq[String] = {
    val dir = rootPath.resolve(datasetId)
    require(Files.isDirectory(dir), s"unknown dataset $datasetId")
    Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
  }

  /** Download = load a dataset file back as a DataFrame. */
  def download(spark: SparkSession, datasetId: String, file: String): DataFrame =
    Tables.load(spark, rootPath.resolve(datasetId).resolve(file).toString)

  /** Download raw dataset files to a local directory (reference
    * download_from_dataset, sutro/sdk.py:1535): all files by default, or
    * the named subset. Returns the written paths. */
  def exportFiles(
      datasetId: String,
      outputDir: String,
      files: Option[Seq[String]] = None): Seq[String] = {
    val names = files.getOrElse(listFiles(datasetId))
    val out = Paths.get(outputDir)
    Files.createDirectories(out)
    names.map { name =>
      val src = rootPath.resolve(datasetId).resolve(name)
      require(Files.exists(src), s"no such file in dataset $datasetId: $name")
      val dest = out.resolve(name)
      copyRecursively(src, dest)
      dest.toString
    }
  }

  /** Copy a file or a directory tree (df-materialized entries are dirs). */
  private def copyRecursively(src: Path, dest: Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dest)
      Files.list(src).iterator().asScala.foreach(c => copyRecursively(c, dest.resolve(c.getFileName)))
    } else
      Files.copy(src, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }
}
