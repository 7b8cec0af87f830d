package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** Table CHECK constraints (`graft.constraint.<name>` TBLPROPERTIES —
  * Delta table-constraint semantics): every row WRITTEN by an insert or
  * update path must not evaluate a constraint to FALSE (NULL passes, SQL
  * CHECK); violations fail the write job before any metadata commits.
  * Rewrite-carried rows are exempt, so pre-constraint history stays
  * deletable and compactable. */
class ConstraintsSpec extends SparkSpecBase {
  import MergeClause._

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"constr$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  test("violating appends fail before commit; passing and NULL-valued rows land") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.setTableProperties("t", Map("graft.constraint.chars_pos" -> "n_chars >= 0"))
    cat.append("t", docs(0, 50))
    assert(cat.scan("t").count() == 50L)

    val headBefore = cat.snapshotIdOf("t")
    val bad = docs(50, 60).withColumn("n_chars",
      when(col("doc_id") === 55, lit(-1L)).otherwise(col("n_chars")))
    val err = intercept[Exception](cat.append("t", bad))
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append(" | "); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(err).contains("chars_pos"), s"got: ${rootMsg(err)}")
    assert(cat.snapshotIdOf("t") == headBefore, "failed write must not commit")
    assert(cat.scan("t").count() == 50L)

    // NULL constraint results PASS (SQL CHECK semantics)
    val nullRows = docs(60, 65).withColumn("n_chars", lit(null).cast("long"))
    cat.append("t", nullRows)
    assert(cat.scan("t").count() == 55L)
  }

  test("UPDATE validates post-SET rows; carried pre-constraint history stays rewritable") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    // bad history lands BEFORE the constraint exists
    cat.append("t", docs(0, 40).withColumn("n_chars",
      when(col("doc_id") < 5, lit(-7L)).otherwise(col("n_chars"))))
    cat.setTableProperties("t", Map("graft.constraint.chars_pos" -> "n_chars >= 0"))

    // an update that only touches clean rows succeeds even though the
    // rewritten files CARRY the five bad rows (subject-gated check)
    cat.updateWhere("t", col("doc_id") >= 20 && col("doc_id") < 30,
      Map("n_chars" -> (col("n_chars") + lit(1L))))
    assert(cat.scan("t").filter(col("n_chars") < 0).count() == 5L)

    // an update whose OUTCOME violates fails
    val err = intercept[Exception](cat.updateWhere("t",
      col("doc_id") === 35, Map("n_chars" -> lit(-1L))))
    assert(err.getMessage != null)
    assert(cat.scan("t").filter(col("doc_id") === 35 && col("n_chars") < 0).count() == 0L)
  }

  test("MERGE validates written outcomes only — matched-only source rows never check") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.setTableProperties("t", Map("graft.constraint.chars_pos" -> "n_chars >= 0"))

    // a source full of VIOLATING rows used only to select deletions:
    // nothing is written from it, so nothing checks
    val badSource = docs(10, 20).withColumn("n_chars", lit(-5L))
    val r = cat.mergeInto("t", badSource, Seq("doc_id"), Seq(MatchedDelete(None)))
    assert(r.rowsDeleted == 10L)
    assert(cat.scan("t").count() == 40L)

    // the same source as INSERTs violates
    val badInserts = docs(100, 105).withColumn("n_chars", lit(-5L))
    intercept[Exception] {
      cat.mergeInto("t", badInserts, Seq("doc_id"), Seq(NotMatchedInsert(None)))
    }
    assert(cat.scan("t").count() == 40L)

    // a matched UPDATE whose outcome violates fails too
    intercept[Exception] {
      cat.mergeInto("t", docs(0, 5), Seq("doc_id"), Seq(
        MatchedUpdate(None, Map("n_chars" -> lit(-9L)))))
    }
    // and a by-source UPDATE outcome violates through the join-free tier
    intercept[Exception] {
      cat.mergeInto("t", docs(0, 5), Seq("doc_id"), Seq(
        NotMatchedBySourceUpdate(Some(col("t.doc_id") >= 30),
          Map("n_chars" -> lit(-3L)))))
    }
    assert(cat.scan("t").filter(col("n_chars") < 0).count() == 0L)
  }

  test("constraints validate at SET time: parse errors and unknown columns refuse") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val e1 = intercept[IllegalArgumentException](cat.setTableProperties("t",
      Map("graft.constraint.broken" -> "n_chars >= (")))
    assert(e1.getMessage.contains("does not parse"))
    val e2 = intercept[IllegalArgumentException](cat.setTableProperties("t",
      Map("graft.constraint.ghost" -> "no_such_col > 0")))
    assert(e2.getMessage.contains("unknown column"))
    // UNSET lifts enforcement
    cat.setTableProperties("t", Map("graft.constraint.chars_pos" -> "n_chars >= 0"))
    cat.setTableProperties("t", Map("graft.constraint.chars_pos" -> ""))
    cat.append("t", docs(0, 5).withColumn("n_chars", lit(-1L)))
    assert(cat.scan("t").count() == 5L)
  }

  test("SQL surface: ALTER TABLE sets a constraint; INSERT INTO enforces it") {
    n += 1
    val name = s"constrlake$n"
    val root = Files.createTempDirectory("constr-sql").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.write.main", "true")
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    spark.sql(s"ALTER TABLE $name.main.t SET TBLPROPERTIES(" +
      "'graft.constraint.chars_pos'='n_chars >= 0 AND lang IS NOT NULL')")
    docs(0, 30).createOrReplaceTempView("constr_src")
    spark.sql(s"INSERT INTO $name.main.t SELECT * FROM constr_src")
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t").head.getLong(0) == 30L)

    intercept[Exception](spark.sql(
      s"INSERT INTO $name.main.t SELECT doc_id, lang, -n_chars AS n_chars FROM constr_src WHERE doc_id < 5"))
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t").head.getLong(0) == 30L)
  }

  test("ANSI DDL: ADD CONSTRAINT validates existing rows then enforces; DROP CONSTRAINT lifts it") {
    n += 1
    val name = s"constrddl$n"
    val root = Files.createTempDirectory("constr-ddl").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.write.main", "true")
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 30))

    // existing rows violate -> the ADD refuses, nothing is recorded
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE $name.main.t ADD CONSTRAINT big_docs CHECK (n_chars > 100000)"))
    assert(e1.getMessage.contains("violated by existing data"),
      s"Spark's own validation scan must refuse the ADD: ${e1.getMessage}")
    assert(!cat.tableProperties("t").contains("graft.constraint.big_docs"))

    // clean ADD: recorded under the W70 property, enforced on writes,
    // visible through DESCRIBE and refused as a duplicate name
    spark.sql(s"ALTER TABLE $name.main.t ADD CONSTRAINT chars_pos CHECK (n_chars >= 0)")
    assert(cat.tableProperties("t").get("graft.constraint.chars_pos")
      .contains("n_chars >= 0"))
    val bad = docs(30, 40).withColumn("n_chars", lit(-1L))
    val e2 = intercept[Exception](cat.append("t", bad))
    def msgs(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('|'); c = c.getCause }
      sb.toString
    }
    assert(msgs(e2).contains("chars_pos"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $name.main.t ADD CONSTRAINT chars_pos CHECK (n_chars >= 1)"))
    // unknown column refuses with the constraint's name
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE $name.main.t ADD CONSTRAINT ghost CHECK (no_such > 0)"))
    assert(msgs(e3).contains("ghost") || msgs(e3).contains("no_such"))

    // DROP lifts enforcement; IF EXISTS tolerates absence, bare DROP refuses
    spark.sql(s"ALTER TABLE $name.main.t DROP CONSTRAINT chars_pos")
    assert(!cat.tableProperties("t").contains("graft.constraint.chars_pos"))
    cat.append("t", bad) // no longer enforced
    assert(cat.scan("t").count() == 40L)
    spark.sql(s"ALTER TABLE $name.main.t DROP CONSTRAINT IF EXISTS chars_pos")
    val e4 = intercept[Exception](spark.sql(
      s"ALTER TABLE $name.main.t DROP CONSTRAINT chars_pos"))
    assert(msgs(e4).contains("chars_pos"))
  }
}
