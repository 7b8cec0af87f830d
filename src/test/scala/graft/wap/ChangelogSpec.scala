package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** [[BranchCatalog.scanChangelog]] — the NET row-level changelog of a
  * snapshot window (Iceberg create_changelog_view, net form): inserts
  * and deletes as full rows with `_change_type`, carried CoW survivors
  * cancelling out of the file-level diff, multiplicities netted by
  * count. */
class ChangelogSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"changelog$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def changes(cat: BranchCatalog, from: String,
      to: String): (Seq[Long], Seq[Long]) = {
    val rows = cat.scanChangelog("t", from, to)
      .select("doc_id", "_change_type").collect()
    (rows.filter(_.getString(1) == "insert").map(_.getLong(0)).sorted.toSeq,
      rows.filter(_.getString(1) == "delete").map(_.getLong(0)).sorted.toSeq)
  }

  test("append-only window: inserts only, exactly the delta") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 50))
    val s2 = cat.append("t", docs(50, 80))
    val (ins, del) = changes(cat, s1.id, s2.id)
    assert(del.isEmpty)
    assert(ins == docs(50, 80).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("CoW delete: carried survivors cancel, only deleted rows surface") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 100))
    cat.deleteWhere("t", col("doc_id") % 7 === 0) // rewrites boundary files
    val head = cat.snapshotIdOf("t").get
    val (ins, del) = changes(cat, s1.id, head)
    assert(ins.isEmpty, s"carried survivors must cancel, got inserts $ins")
    assert(del == docs(0, 100).filter(col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("compaction is changelog-silent; updates emit delete+insert pairs") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    val s1 = cat.snapshotIdOf("t").get
    cat.compactDataFiles("t")
    val afterCompact = cat.snapshotIdOf("t").get
    assert(cat.scanChangelog("t", s1, afterCompact).count() == 0L,
      "a content-preserving rewrite must produce an EMPTY changelog")

    cat.updateWhere("t", col("doc_id") === 3L, Map("n_chars" -> lit(9999L)))
    val head = cat.snapshotIdOf("t").get
    val rows = cat.scanChangelog("t", afterCompact, head)
      .select("doc_id", "n_chars", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._3).toSeq
    val old = docs(3, 4).select("n_chars").head.getLong(0)
    assert(rows == Seq((3L, old, "delete"), (3L, 9999L, "insert")))
  }

  test("duplicate rows net by multiplicity") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    val s1 = cat.append("t", docs(0, 10)) // every row now twice
    cat.deleteWhere("t", col("doc_id") === 4L) // removes BOTH copies
    val head = cat.snapshotIdOf("t").get
    val (ins, del) = changes(cat, s1.id, head)
    assert(ins.isEmpty)
    assert(del == Seq(4L, 4L), s"both copies must report, got $del")
  }

  test("changelog across a rename compares by field id") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 40))
    cat.renameColumn("t", "n_chars", "chars")
    cat.deleteWhere("t", col("chars") < 300)
    val head = cat.snapshotIdOf("t").get
    val out = cat.scanChangelog("t", s1.id, head)
    assert(out.schema.fieldNames.contains("chars"))
    val del = out.filter(col("_change_type") === "delete")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(del == docs(0, 40).filter(col("n_chars") < 300)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(out.filter(col("_change_type") === "insert").count() == 0L)
  }

  test("pending tombstones refuse; SQL procedure registers the view") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 30))
    cat.deleteKeysMOR("t", docs(0, 3).select("doc_id"))
    val e = intercept[IllegalArgumentException](
      cat.scanChangelog("t", s1.id, cat.snapshotIdOf("t").get))
    assert(e.getMessage.contains("tombstone"))
    cat.compactDataFiles("t")

    val root = cat.root
    val lake = "cl_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    spark.sql(s"CALL $lake.system.create_changelog_view('cl_view', 't', '${s1.id}')")
    // MOR delete of 3 keys then compaction: net = 3 deletes
    assert(spark.sql("SELECT count(*) FROM cl_view WHERE _change_type = 'delete'")
      .head.getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM cl_view WHERE _change_type = 'insert'")
      .head.getLong(0) == 0L)
  }

  test("with_row_ids => true registers the row-identified (CDF) view") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 30))
    cat.enableRowLineage("t")
    val s1 = cat.snapshotIdOf("t").get
    cat.updateWhere("t", col("doc_id") < 5, Map("lang" -> lit("xx")))

    val root = cat.root
    val lake = "clr_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    spark.sql(s"CALL $lake.system.create_changelog_view('cdf_view', 't', '$s1', " +
      "with_row_ids => true)")
    assert(spark.sql("SELECT count(*) FROM cdf_view WHERE _change_type = 'update_preimage'")
      .head.getLong(0) == 5L)
    // pre and post of one update share the row's id
    assert(spark.sql(
      """SELECT count(*) FROM cdf_view a JOIN cdf_view b
        |ON a._row_id = b._row_id AND a._change_type = 'update_preimage'
        |AND b._change_type = 'update_postimage'
        |WHERE a.doc_id = b.doc_id AND b.lang = 'xx'""".stripMargin)
      .head.getLong(0) == 5L)
  }
}
