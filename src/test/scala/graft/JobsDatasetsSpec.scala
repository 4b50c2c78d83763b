package graft

import graft.llm.Jobs
import graft.io.Datasets
import org.apache.spark.sql.functions._

/** Job lifecycle + dataset registry round trips (reference: sutro/sdk.py
  * jobs and datasets APIs, ~/.sutro parquet result cache). */
class JobsDatasetsSpec extends SparkSpec {
  import spark.implicits._

  test("jobs: submit -> succeeded -> results round trip via parquet cache") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val id = Jobs.submit(df, Some("test-job"))
    assert(Jobs.status(id) === Jobs.Succeeded)
    val back = Jobs.results(spark, id).orderBy("id").as[(Long, String)].collect()
    assert(back.toSeq === Seq((1L, "a"), (2L, "b")))
    assert(Jobs.list().exists(_.id === id))
  }

  test("jobs: unknown id -> Failed status; cancel on terminal job is a no-op") {
    assert(Jobs.status("job-nope") === Jobs.Failed)
    val df = Seq(1).toDF("x")
    val id = Jobs.submit(df)
    assert(Jobs.cancel(id) === Jobs.Succeeded)
  }

  test("datasets: create/upload/list/download parquet and csv") {
    val root = java.nio.file.Files.createTempDirectory("graft-ds").toString
    val ds = new Datasets(root)
    val id = ds.create(Some("my-data"))
    assert(ds.list().contains("my-data"))
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    ds.upload(df, id, "parquet")
    ds.upload(df, id, "csv")
    assert(ds.listFiles(id).toSet === Set("part.parquet", "part.csv"))
    val pq = ds.download(spark, id, "part.parquet").orderBy("id").as[(Long, String)].collect()
    assert(pq.toSeq === Seq((1L, "x"), (2L, "y")))
    val csv = ds.download(spark, id, "part.csv").count()
    assert(csv === 2)
  }

  test("datasets: unknown dataset rejected") {
    val ds = new Datasets(java.nio.file.Files.createTempDirectory("graft-ds2").toString)
    intercept[IllegalArgumentException](ds.listFiles("missing"))
  }
}
