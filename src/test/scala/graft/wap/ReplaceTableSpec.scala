package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** REPLACE TABLE AS SELECT (W85 — Iceberg RTAS): one atomic commit swaps
  * schema, layout and content while SNAPSHOT LINEAGE survives, so time
  * travel and rollback reach pre-replace history (vs DROP+CREATE, which
  * severs it). SQL surface: `[CREATE OR] REPLACE TABLE ... AS SELECT`
  * through the staging catalog. */
class ReplaceTableSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"rtas$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  test("replaceTable swaps schema+content atomically; lineage survives for time travel and rollback") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    val preId = cat.snapshotIdOf("t").get

    // entirely different schema AND layout
    val replacement = docs(0, 50)
      .select(col("doc_id").as("id"), (col("n_chars") * 2).as("score"), col("lang"))
    val snap = cat.replaceTable("t", replacement,
      specs = Seq(IdentityPartition("lang")))
    assert(snap.op == "replace" && snap.parentId.contains(preId))
    assert(cat.scan("t").schema.fieldNames.toSeq == Seq("id", "score", "lang"))
    assert(cat.scan("t").count() == 50L)
    // the new layout routes writes and prunes
    assert(cat.dataFiles("t").forall(_.partition.contains("pv")))
    cat.append("t", replacement.limit(0)) // schema-aligned append still works

    // pre-replace history is REACHABLE: time travel + rollback
    assert(cat.scanSnapshot("t", preId).count() == 100L)
    assert(cat.scanSnapshot("t", preId).schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "n_chars"))
    cat.rollbackTo("t", preId)
    assert(cat.scan("t").count() == 100L)
    assert(cat.scan("t").schema.fieldNames.toSeq == Seq("doc_id", "lang", "n_chars"))
  }

  test("replace refuses on a missing table; constraints guard the new shape") {
    val cat = freshCat()
    intercept[RuntimeException](cat.replaceTable("ghost", docs(0, 5)))

    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    cat.setTableProperties("t", Map(
      BranchCatalog.ConstraintPrefix + "chars_pos" -> "n_chars >= 0"))
    // a replacement whose schema drops the constrained column refuses
    val e = intercept[IllegalArgumentException](
      cat.replaceTable("t", docs(0, 5).select("doc_id", "lang")))
    assert(e.getMessage.contains("chars_pos"))
    // a replacement VIOLATING the surviving constraint fails the write
    intercept[Exception](
      cat.replaceTable("t", docs(0, 5).withColumn("n_chars", lit(-1L))))
    assert(cat.scan("t").count() == 10L, "failed replace commits nothing")
    // a clean replacement passes the constraint gate
    cat.replaceTable("t", docs(10, 30))
    assert(cat.scan("t").count() == 20L)
  }

  test("SQL: REPLACE TABLE AS SELECT and CREATE OR REPLACE through the staging catalog") {
    n += 1
    val name = s"rtaslake$n"
    val root = Files.createTempDirectory("rtas-sql").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.write.main", "true")
    val cat = new BranchCatalog(spark, root)
    docs(0, 100).createOrReplaceTempView("rtas_src")

    // CREATE OR REPLACE on a missing table creates
    spark.sql(s"CREATE OR REPLACE TABLE $name.main.t AS SELECT * FROM rtas_src WHERE doc_id < 40")
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t").head.getLong(0) == 40L)
    val preId = cat.snapshotIdOf("t").get

    // bare REPLACE swaps content + schema, keeps lineage
    spark.sql(s"REPLACE TABLE $name.main.t AS " +
      "SELECT doc_id AS id, n_chars * 10 AS score FROM rtas_src WHERE doc_id < 15")
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t").head.getLong(0) == 15L)
    assert(spark.sql(s"SELECT * FROM $name.main.t").schema.fieldNames.toSeq ==
      Seq("id", "score"))
    assert(cat.scanSnapshot("t", preId).count() == 40L, "history reachable")
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.op == "replace" && head.parentId.contains(preId))

    // bare REPLACE on a missing table refuses
    intercept[Exception](spark.sql(
      s"REPLACE TABLE $name.main.ghost AS SELECT * FROM rtas_src"))

    // partitioned RTAS routes the partitioned writer
    spark.sql(s"CREATE OR REPLACE TABLE $name.main.t PARTITIONED BY (lang) AS " +
      "SELECT * FROM rtas_src WHERE doc_id < 30")
    assert(cat.dataFiles("t").forall(_.partition.contains("pv")))
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t").head.getLong(0) == 30L)
  }
}
