package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.wap.BranchCatalog

/** W56 — materialized views with incremental refresh: a branch table
  * carrying its definition + source watermarks in table properties.
  * Refresh classifies the analyzed plan and runs the cheapest sound mode
  * (fresh / incremental append / incremental agg-fold / full recompute). */
class MviewSpec extends SparkSpecBase {

  private var n = 0
  private def register(): (String, BranchCatalog) = {
    n += 1
    val name = s"mview$n"
    val root = Files.createTempDirectory("mview").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, new BranchCatalog(spark, root))
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def mk(lake: String, cat: BranchCatalog): Unit = {
    cat.createTableIfNotExists("src", docs(0, 1).schema)
    cat.append("src", docs(0, 100))
  }

  test("create materializes; unchanged sources refresh as 'fresh'") {
    val (lake, cat) = register()
    mk(lake, cat)
    val q = s"SELECT doc_id, n_chars FROM $lake.main.src WHERE n_chars > 300"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
    assert(cat.tableProperties("mv").contains(GraftMaterializedViews.SqlKey))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "fresh")
  }

  test("select/filter view refreshes incrementally: delta appended, old files kept") {
    val (lake, cat) = register()
    mk(lake, cat)
    val q = s"SELECT doc_id, n_chars FROM $lake.main.src WHERE n_chars > 300"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    val filesBefore = cat.dataFiles("mv").map(_.path).toSet

    cat.append("src", docs(100, 160))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "incremental")
    // nothing rewritten: the old view files are all still there
    assert(filesBefore.subsetOf(cat.dataFiles("mv").map(_.path).toSet))
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
    // and a second refresh with no new commits is free
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "fresh")
  }

  test("group-by view folds the delta: incremental_agg, content exact") {
    val (lake, cat) = register()
    mk(lake, cat)
    val q = s"SELECT lang, count(*) AS n, sum(n_chars) AS chars, " +
      s"min(doc_id) AS lo, max(doc_id) AS hi FROM $lake.main.src GROUP BY lang"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    cat.append("src", docs(100, 200))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "incremental_agg")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
  }

  test("global aggregate (no GROUP BY) folds too") {
    val (lake, cat) = register()
    mk(lake, cat)
    val q = s"SELECT count(*) AS n, sum(n_chars) AS chars FROM $lake.main.src"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    cat.append("src", docs(100, 140))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "incremental_agg")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
  }

  test("non-append window (CoW delete) and non-foldable shapes fall back to full") {
    val (lake, cat) = register()
    mk(lake, cat)
    val q = s"SELECT doc_id, n_chars FROM $lake.main.src WHERE n_chars > 300"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    cat.deleteWhere("src", col("doc_id") < 20)
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "full")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))

    // avg is not foldable from outputs -> full even on an append window
    val qa = s"SELECT lang, avg(n_chars) AS a FROM $lake.main.src GROUP BY lang"
    GraftMaterializedViews.create(spark, cat, "mva", qa, "main")
    cat.append("src", docs(100, 130))
    assert(GraftMaterializedViews.refresh(spark, cat, "mva", "main") == "full")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mva")) ==
      sortedRows(spark.sql(qa)))
  }

  test("GROUP BY with an unprojected key never folds (would collapse groups)") {
    val (lake, cat) = register()
    mk(lake, cat)
    // grouping key `lang` is NOT in the output: incremental_agg would
    // re-aggregate the delta∪view union keyless and collapse every group
    val q = s"SELECT count(*) AS n FROM $lake.main.src GROUP BY lang"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    // partial key projection (one of two keys) must fall back too
    val q2 = s"SELECT lang, count(*) AS n FROM $lake.main.src " +
      s"GROUP BY lang, n_chars % 2"
    GraftMaterializedViews.create(spark, cat, "mv2", q2, "main")
    cat.append("src", docs(100, 160))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "full")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv2", "main") == "full")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv2")) ==
      sortedRows(spark.sql(q2)))
  }

  test("join views track both sources and recompute fully") {
    val (lake, cat) = register()
    mk(lake, cat)
    cat.createTableIfNotExists("dim", docs(0, 1).select(col("lang")).distinct().schema)
    cat.append("dim", docs(0, 100).select("lang").distinct())
    val q = s"SELECT s.lang, count(*) AS n FROM $lake.main.src s " +
      s"JOIN $lake.main.dim d ON s.lang = d.lang GROUP BY s.lang"
    GraftMaterializedViews.create(spark, cat, "mv", q, "main")
    cat.append("src", docs(100, 150))
    assert(GraftMaterializedViews.refresh(spark, cat, "mv", "main") == "full")
    assert(sortedRows(spark.sql(s"SELECT * FROM $lake.main.mv")) ==
      sortedRows(spark.sql(q)))
  }

  test("SQL procedure surface: create/refresh/drop_mview; non-mview drop refused") {
    val (lake, cat) = register()
    mk(lake, cat)
    spark.sql(s"CALL $lake.system.create_mview('mv', " +
      s"'SELECT lang, count(*) AS n FROM $lake.main.src GROUP BY lang')")
    assert(spark.sql(s"SELECT sum(n) FROM $lake.main.mv").head.getLong(0) == 100L)
    cat.append("src", docs(100, 150))
    spark.sql(s"CALL $lake.system.refresh_mview('mv')")
    assert(spark.sql(s"SELECT sum(n) FROM $lake.main.mv").head.getLong(0) == 150L)
    spark.sql(s"CALL $lake.system.drop_mview('mv')")
    assert(!cat.tableExists("mv"))
    val err = intercept[Exception](spark.sql(s"CALL $lake.system.drop_mview('src')"))
    assert(err.getMessage.contains("not a materialized view"))
  }

  test("create refuses sources it cannot track (foreign files)") {
    val (lake, cat) = register()
    mk(lake, cat)
    val err = intercept[Exception](GraftMaterializedViews.create(spark, cat, "mv",
      s"SELECT count(*) AS n FROM parquet.`$sfDir/documents.parquet`", "main"))
    assert(err.getMessage.contains("reads no table") ||
      err.getMessage.contains("not a graft table"))
  }
}
