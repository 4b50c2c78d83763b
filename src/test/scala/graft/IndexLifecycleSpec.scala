package graft

import org.apache.spark.sql.functions._
import graft.ops.IndexLifecycle

/** The unified persistent-index lifecycle: every family drivable through
  * the one trait, derived-table convention honored, README table in sync. */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def dropAll(ix: IndexLifecycle, name: String): Unit =
    ix.tables(name).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("every family builds and queries through the trait; derived tables exist") {
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    val emb = graft.io.Tables.table(spark, sfDir, "embeddings")
    val events = graft.io.Tables.table(spark, sfDir, "events")
    val probes: Map[String, (org.apache.spark.sql.DataFrame, Option[org.apache.spark.sql.DataFrame])] = Map(
      "dedup-shingle" -> (docs, Some(docs.where(col("doc_id") % 10 === 0))),
      "dedup-embedding" -> (emb, Some(emb.where(col("vec_id") % 10 === 0))),
      "ivfadc" -> (emb, Some(emb.where(col("vec_id") < 5))),
      "bm25" -> (docs, Some(Seq("spark", "join").toDF("term"))),
      "aggregate" -> (events, None))
    IndexLifecycle.all.foreach { ix =>
      val name = s"graft_lc_${ix.family.replace('-', '_')}"
      val (source, probe) = probes(ix.family)
      dropAll(ix, name)
      ix.build(source, name)
      // the name-derivation convention: every derived table exists
      ix.tables(name).foreach { t =>
        assert(spark.catalog.tableExists(t), s"${ix.family}: missing table $t")
      }
      assert(ix.query(spark, name, probe).count() > 0, s"${ix.family}: empty query")
      dropAll(ix, name)
    }
  }

  test("append-capable families grow through the trait and still answer") {
    val emb = graft.io.Tables.table(spark, sfDir, "embeddings")
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    val events = graft.io.Tables.table(spark, sfDir, "events")
    val half: Map[String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Option[org.apache.spark.sql.DataFrame])] = Map(
      "ivfadc" -> (emb.where(col("vec_id") % 2 === 0),
        emb.where(col("vec_id") % 2 === 1), Some(emb.where(col("vec_id") < 5))),
      "bm25" -> (docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), Some(Seq("spark", "join").toDF("term"))),
      "aggregate" -> (events.where(dayofmonth(col("ts")) <= 15),
        events.where(dayofmonth(col("ts")) > 15), None))
    IndexLifecycle.all.filter(_.append.isDefined).foreach { ix =>
      val name = s"graft_lc_app_${ix.family.replace('-', '_')}"
      val (base, delta, probe) = half(ix.family)
      dropAll(ix, name)
      ix.build(base, name)
      ix.append.get(delta, name)
      assert(ix.query(spark, name, probe).count() > 0, s"${ix.family}: empty after append")
      dropAll(ix, name)
    }
    // capability flags match the declared contract
    assert(IndexLifecycle.all.map(ix => ix.family -> ix.capabilities).toMap ===
      Map("dedup-shingle" -> "build/query",
        "dedup-embedding" -> "build/query",
        "ivfadc" -> "build/append/remove/compact/query",
        "bm25" -> "build/append/remove/compact/query",
        "aggregate" -> "build/append/query"))
  }

  test("README lifecycle table is exactly the generated one") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val start = readme.indexOf("<!-- lifecycle-table-start -->")
    val end = readme.indexOf("<!-- lifecycle-table-end -->")
    assert(start >= 0 && end > start, "README lifecycle-table markers missing")
    val embedded = readme.substring(start + "<!-- lifecycle-table-start -->".length, end).trim
    assert(embedded === IndexLifecycle.markdownTable.trim,
      "README table drifted from IndexLifecycle.markdownTable — regenerate it")
  }
}
