package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.wap.BranchCatalog

/** Metadata-only global aggregates (W44): `SELECT count(*), count(c),
  * min(c), max(c) FROM t` answered from per-manifest stats with ZERO
  * data-file IO, on BOTH read paths — the extension-session optimizer
  * rule ([[GraftAggLowering]]) and the vanilla-session DSv2
  * `SupportsPushDownAggregates` route ([[GraftMetaAggScan]]) — with
  * every non-exact shape refused onto the ordinary scan. */
class MetaAggSpec extends SparkSpecBase {

  private var n = 0
  private def register(): (String, String, BranchCatalog) = {
    n += 1
    val name = s"metaagg$n"
    val root = Files.createTempDirectory("meta-agg").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (name, root, new BranchCatalog(spark, root))
  }

  /** documents slice with a controlled null pattern and a date column. */
  private def docs(limit: Long): DataFrame =
    Tables.documents(spark, sfDir).filter(col("doc_id") < limit)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("source")).as("src"),
        date_add(lit("2020-01-01").cast("date"),
          (col("doc_id") % 100).cast("int")).as("d"),
        lit(null).cast("string").as("all_null"))

  /** Scan nodes of the physical plan, looking THROUGH the AQE wrapper
    * (aggregates carry exchanges, so Spark wraps them in
    * AdaptiveSparkPlanExec, which `collect` treats as a leaf). */
  private def scansOf(df: DataFrame): Seq[Any] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec => s
      case b: BatchScanExec => b
    }
  }

  private def assertMetaOnly(df: DataFrame): Unit =
    assert(scansOf(df).isEmpty,
      s"expected a metadata-only plan, got:\n${df.queryExecution.executedPlan}")

  test("extension path: count/min/max answered from metadata, zero scans") {
    val (lake, root, cat) = register()
    val d = docs(200)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d.filter(col("doc_id") < 90))
    cat.append("docs", d.filter(col("doc_id") >= 90))

    val q = spark.sql(
      s"""SELECT count(*) AS n, count(src) AS n_src, count(all_null) AS n_an,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id,
         |  min(lang) AS min_lang, max(lang) AS max_lang,
         |  min(d) AS min_d, max(d) AS max_d,
         |  min(all_null) AS min_an, count(*) + 1 AS n1
         |FROM $lake.main.docs""".stripMargin)
    assertMetaOnly(q)
    val exp = d.agg(count(lit(1)), count(col("src")), count(col("all_null")),
      min(col("doc_id")), max(col("doc_id")), min(col("lang")), max(col("lang")),
      min(col("d")), max(col("d")), min(col("all_null")),
      count(lit(1)) + 1).collect().head
    assert(q.collect().head == exp)

    // ...and it truly reads nothing: data files gone, answers remain
    val dataDir = new java.io.File(s"$root/tables/docs/data")
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
    }
    wipe(dataDir)
    val q2 = spark.sql(s"SELECT count(*), min(doc_id), max(lang) FROM $lake.main.docs")
    assertMetaOnly(q2)
    val r2 = q2.collect().head
    assert(r2.getLong(0) == exp.getLong(0))
    assert(r2.getLong(1) == exp.getLong(3) && r2.getString(2) == exp.getString(6))
  }

  test("bounds and null sums survive manifest folding and schema-typed string order") {
    val (lake, _, cat) = register()
    // lang is a STRING column: folding its bounds numerically would
    // corrupt them; multiple appends then a fold exercise the path
    val d = docs(150)
    cat.createTableIfNotExists("docs", d.schema)
    for (r <- 0 until 3) cat.append("docs", d.filter(col("doc_id") % 3 === r))
    cat.compactManifests("docs")
    assert(cat.snapshotMeta("docs",
      cat.snapshotIdOf("docs").get).manifests.size == 1)
    val q = spark.sql(
      s"SELECT count(*) AS n, count(src) AS s, min(lang) AS a, max(lang) AS b, " +
        s"min(doc_id) AS c, max(doc_id) AS e FROM $lake.main.docs")
    assertMetaOnly(q)
    val exp = d.agg(count(lit(1)), count(col("src")), min(col("lang")),
      max(col("lang")), min(col("doc_id")), max(col("doc_id"))).collect().head
    assert(q.collect().head == exp)
  }

  test("empty table answers count 0 / NULL extrema without a scan") {
    val (lake, _, cat) = register()
    cat.createTableIfNotExists("docs", docs(10).schema)
    val q = spark.sql(
      s"SELECT count(*) AS n, count(lang) AS nl, min(doc_id) AS a FROM $lake.main.docs")
    assertMetaOnly(q)
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("vanilla connector path: complete aggregate pushdown onto the one-row scan") {
    val (lake, _, cat) = register()
    val d = docs(120)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d)
    spark.conf.set("spark.graft.sql.lowering", "false")
    try {
      val q = spark.sql(
        s"SELECT count(*) AS n, count(src) AS s, min(lang) AS a, max(doc_id) AS b " +
          s"FROM $lake.main.docs")
      val batch = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(batch.nonEmpty && batch.head.scan.isInstanceOf[GraftMetaAggScan],
        s"expected the metadata-aggregate scan, got:\n${q.queryExecution.executedPlan}")
      val exp = d.agg(count(lit(1)), count(col("src")), min(col("lang")),
        max(col("doc_id"))).collect().head
      assert(q.collect().head == exp)

      // a filtered aggregate must NOT reach the metadata path
      val qf = spark.sql(
        s"SELECT count(*) FROM $lake.main.docs WHERE doc_id < 50")
      val fb = qf.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(fb.forall(!_.scan.isInstanceOf[GraftMetaAggScan]))
      assert(qf.collect().head.getLong(0) == d.filter(col("doc_id") < 50).count())
    } finally spark.conf.set("spark.graft.sql.lowering", "true")
  }

  test("non-exact shapes refuse onto the real scan and stay correct") {
    val (lake, _, cat) = register()
    val d = docs(100)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d)

    // WHERE below the aggregate
    val qw = spark.sql(s"SELECT count(*) FROM $lake.main.docs WHERE doc_id >= 40")
    assert(scansOf(qw).nonEmpty)
    assert(qw.collect().head.getLong(0) == d.filter(col("doc_id") >= 40).count())

    // DISTINCT, AVG, GROUP BY: not metadata-answerable
    for (sql <- Seq(
        s"SELECT count(DISTINCT lang) FROM $lake.main.docs",
        s"SELECT avg(n_chars) FROM $lake.main.docs",
        s"SELECT lang, count(*) FROM $lake.main.docs GROUP BY lang")) {
      assert(scansOf(spark.sql(sql)).nonEmpty, s"expected a real scan for: $sql")
    }
    assert(spark.sql(s"SELECT count(DISTINCT lang) FROM $lake.main.docs")
      .collect().head.getLong(0) == d.select("lang").distinct().count())

    // double extrema are refused (NaN makes footer bounds inexact);
    // count over the double column is still metadata-only
    val dd = d.withColumn("v", col("n_chars").cast("double"))
    cat.createTableIfNotExists("docs2", dd.schema)
    cat.append("docs2", dd)
    val qv = spark.sql(s"SELECT min(v) FROM $lake.main.docs2")
    assert(scansOf(qv).nonEmpty)
    assert(qv.collect().head.getDouble(0) == dd.agg(min("v")).collect().head.getDouble(0))
    assertMetaOnly(spark.sql(s"SELECT count(v) FROM $lake.main.docs2"))
  }

  test("W79: GROUP BY the identity-partition column is metadata-only on both paths") {
    val (lake, _, cat) = register()
    val d = docs(150)
    cat.createTableIfNotExists("docs", d.schema, "main",
      Seq(graft.wap.IdentityPartition("lang")))
    cat.append("docs", d) // auto-routed through the committed spec
    cat.append("docs", Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 150 && col("doc_id") < 260)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("source")).as("src"),
        date_add(lit("2020-01-01").cast("date"),
          (col("doc_id") % 100).cast("int")).as("d"),
        lit(null).cast("string").as("all_null")))
    val all = cat.scan("docs")
    val sql = s"SELECT lang, count(*) AS n, count(src) AS ns, " +
      s"min(doc_id) AS a, max(n_chars) AS b FROM $lake.main.docs GROUP BY lang"
    val exp = all.groupBy("lang").agg(count(lit(1)), count(col("src")),
      min(col("doc_id")), max(col("n_chars"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq

    // extension path: the whole aggregate folds to a LocalRelation
    val q = spark.sql(sql)
    assertMetaOnly(q)
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == exp)

    // vanilla connector path: complete GROUP BY pushdown onto the
    // multi-row metadata scan
    spark.conf.set("spark.graft.sql.lowering", "false")
    try {
      val qv = spark.sql(sql)
      val batch = qv.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(batch.nonEmpty && batch.head.scan.isInstanceOf[GraftMetaAggScan],
        s"expected the metadata-aggregate scan, got:\n${qv.queryExecution.executedPlan}")
      val gotV = qv.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(gotV == exp)
    } finally spark.conf.set("spark.graft.sql.lowering", "true")
  }

  test("W79: clustered appends prove homogeneity without a spec; null groups roll up") {
    val (lake, _, cat) = register()
    val base = docs(90).drop("lang")
    val d1 = base.filter(col("doc_id") < 30).withColumn("lang", lit("en"))
    val d2 = base.filter(col("doc_id") >= 30 && col("doc_id") < 60)
      .withColumn("lang", lit(null).cast("string"))
    val d3 = base.filter(col("doc_id") >= 60).withColumn("lang", lit("fr"))
    // lang must be NULLABLE in the table schema (lit("en") declares it
    // NOT NULL, and an all-null group cannot ride that — the rule then
    // correctly refuses instead of writing a null into a non-null row)
    cat.createTableIfNotExists("t", org.apache.spark.sql.types.StructType(
      base.schema.fields :+ org.apache.spark.sql.types.StructField(
        "lang", org.apache.spark.sql.types.StringType, nullable = true)))
    Seq(d1, d2, d3).foreach(cat.append("t", _))
    val q = spark.sql(
      s"SELECT lang, count(*) AS n, min(doc_id) AS a FROM $lake.main.t GROUP BY lang")
    assertMetaOnly(q)
    val got = q.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq(
      (None, 30L, 30L), (Some("en"), 30L, 0L), (Some("fr"), 30L, 60L)))
  }

  test("W79: grouped refusals — heterogeneous files, tombstones, filters — fall back correct") {
    val (lake, _, cat) = register()
    val d = docs(120)
    cat.createTableIfNotExists("docs", d.schema, "main",
      Seq(graft.wap.IdentityPartition("lang")))
    cat.append("docs", d)
    // a filter below the grouped aggregate keeps the real scan
    val qf = spark.sql(s"SELECT lang, count(*) AS n FROM $lake.main.docs " +
      "WHERE doc_id < 50 GROUP BY lang")
    assert(scansOf(qf).nonEmpty)
    assert(qf.collect().map(_.getLong(1)).sum == 50L)
    // grouping by a NON-homogeneous column refuses
    val qh = spark.sql(s"SELECT src, count(*) AS n FROM $lake.main.docs GROUP BY src")
    assert(scansOf(qh).nonEmpty)
    assert(qh.collect().map(_.getLong(1)).sum == 120L)
    // a HAVING over the grouped result still folds (it sits above the agg)
    val qhav = spark.sql(s"SELECT lang, count(*) AS n FROM $lake.main.docs " +
      "GROUP BY lang HAVING count(*) > 0")
    assert(qhav.collect().map(_.getLong(1)).sum == 120L)
    // pending MOR tombstones refuse the grouped path too
    cat.deleteWherePositional("docs", col("doc_id") % 7 === 0)
    val qt = spark.sql(s"SELECT lang, count(*) AS n FROM $lake.main.docs GROUP BY lang")
    assert(scansOf(qt).nonEmpty)
    assert(qt.collect().map(_.getLong(1)).sum ==
      d.filter(col("doc_id") % 7 =!= 0).count())
  }

  test("W80: SUM/AVG from per-file sum sidecars, global and grouped, both paths") {
    val (lake, _, cat) = register()
    val d = docs(140)
    cat.createTableIfNotExists("docs", d.schema, "main",
      Seq(graft.wap.IdentityPartition("lang")))
    cat.append("docs", d.filter(col("doc_id") < 70))
    cat.append("docs", d.filter(col("doc_id") >= 70))
    assert(cat.ensureSumStats("docs") > 0)
    assert(cat.ensureSumStats("docs") == 0, "re-ensure must be a metadata no-op")

    val expSum = d.agg(sum(col("n_chars"))).head.getLong(0)
    val expCnt = d.count()
    val g = spark.sql(s"SELECT sum(n_chars) AS s, avg(n_chars) AS a, " +
      s"sum(doc_id) AS si FROM $lake.main.docs")
    assertMetaOnly(g)
    val gr = g.collect().head
    assert(gr.getLong(0) == expSum)
    assert(gr.getDouble(1) == expSum.toDouble / expCnt)
    assert(gr.getLong(2) == d.agg(sum(col("doc_id"))).head.getLong(0))

    val byLang = spark.sql(s"SELECT lang, sum(n_chars) AS s, avg(n_chars) AS a " +
      s"FROM $lake.main.docs GROUP BY lang")
    assertMetaOnly(byLang)
    val expBy = d.groupBy("lang")
      .agg(sum(col("n_chars")), count(col("n_chars"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(1).toDouble / r.getLong(2)))
      .toMap
    val gotBy = byLang.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(gotBy == expBy)

    // vanilla connector: complete Sum/Avg pushdown onto the metadata scan
    spark.conf.set("spark.graft.sql.lowering", "false")
    try {
      val qv = spark.sql(s"SELECT lang, sum(n_chars) AS s, avg(n_chars) AS a " +
        s"FROM $lake.main.docs GROUP BY lang")
      val batch = qv.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(batch.nonEmpty && batch.head.scan.isInstanceOf[GraftMetaAggScan],
        s"expected the metadata-aggregate scan, got:\n${qv.queryExecution.executedPlan}")
      assert(qv.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap == expBy)
    } finally spark.conf.set("spark.graft.sql.lowering", "true")
  }

  test("W80: freshness gate — unsummed appends refuse; maintain re-sums; NULL and double shapes") {
    val (lake, _, cat) = register()
    val d = docs(80)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d.filter(col("doc_id") < 40))
    cat.ensureSumStats("docs")
    assertMetaOnly(spark.sql(s"SELECT sum(n_chars) FROM $lake.main.docs"))
    // an append the sidecars haven't seen refuses onto the real scan
    cat.append("docs", d.filter(col("doc_id") >= 40))
    val q = spark.sql(s"SELECT sum(n_chars) AS s FROM $lake.main.docs")
    assert(scansOf(q).nonEmpty, "stale sum sidecars must not serve")
    assert(q.collect().head.getLong(0) == d.agg(sum(col("n_chars"))).head.getLong(0))
    // policy-driven maintenance re-sums only the new manifest
    cat.setTableProperties("docs", Map("graft.maintain.sum-stats" -> "true"))
    val acts = GraftMaintenance.run(spark, cat, "docs")
    assert(acts.exists(_._1 == "sum-stats"), acts.toString)
    val q2 = spark.sql(s"SELECT sum(n_chars) AS s FROM $lake.main.docs")
    assertMetaOnly(q2)
    assert(q2.collect().head.getLong(0) == d.agg(sum(col("n_chars"))).head.getLong(0))

    // SQL NULL sum: an all-null integral column answers NULL metadata-only
    val dn = d.filter(col("doc_id") < 20)
      .withColumn("v", lit(null).cast("long"))
    cat.createTableIfNotExists("t2", org.apache.spark.sql.types.StructType(
      d.schema.fields :+ org.apache.spark.sql.types.StructField(
        "v", org.apache.spark.sql.types.LongType)))
    cat.append("t2", dn)
    cat.ensureSumStats("t2")
    val qn = spark.sql(s"SELECT sum(v) AS s, avg(v) AS a FROM $lake.main.t2")
    assertMetaOnly(qn)
    val rn = qn.collect().head
    assert(rn.isNullAt(0) && rn.isNullAt(1))

    // double sums are order-dependent — never metadata-served
    val dd = d.filter(col("doc_id") < 20).withColumn("w", col("n_chars").cast("double"))
    cat.createTableIfNotExists("t3", dd.schema)
    cat.append("t3", dd)
    cat.ensureSumStats("t3") // n_chars/doc_id only; w is not summable
    val qd = spark.sql(s"SELECT sum(w) FROM $lake.main.t3")
    assert(scansOf(qd).nonEmpty)
  }

  test("W81: filtered metadata aggregates on homogeneous predicates, global and grouped") {
    val (lake, _, cat) = register()
    val d = docs(160)
    cat.createTableIfNotExists("docs", d.schema, "main",
      Seq(graft.wap.IdentityPartition("lang")))
    cat.append("docs", d.filter(col("doc_id") < 80))
    cat.append("docs", d.filter(col("doc_id") >= 80))
    cat.ensureSumStats("docs")

    // global aggregate under a partition predicate: zero data IO
    val en = d.filter(col("lang") === "en")
    val q1 = spark.sql(s"SELECT count(*) AS n, sum(n_chars) AS s, " +
      s"min(doc_id) AS a, avg(n_chars) AS av FROM $lake.main.docs WHERE lang = 'en'")
    assertMetaOnly(q1)
    val r1 = q1.collect().head
    val enSum = en.agg(sum(col("n_chars"))).head.getLong(0)
    assert(r1.getLong(0) == en.count())
    assert(r1.getLong(1) == enSum)
    assert(r1.getLong(2) == en.agg(min(col("doc_id"))).head.getLong(0))
    assert(r1.getDouble(3) == enSum.toDouble / en.count())

    // an empty selection still yields the one SQL row (count 0, NULL sum)
    val q2 = spark.sql(
      s"SELECT count(*) AS n, sum(n_chars) AS s FROM $lake.main.docs WHERE lang = 'zz'")
    assertMetaOnly(q2)
    val r2 = q2.collect().head
    assert(r2.getLong(0) == 0L && r2.isNullAt(1))

    // grouped + filtered (negation and IN), still metadata-only
    val q3 = spark.sql(s"SELECT lang, count(*) AS n FROM $lake.main.docs " +
      "WHERE lang <> 'en' GROUP BY lang")
    assertMetaOnly(q3)
    val expBy = d.filter(col("lang") =!= "en").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expBy)

    // a predicate on a NON-homogeneous column refuses onto the real scan
    val q4 = spark.sql(
      s"SELECT count(*) AS n FROM $lake.main.docs WHERE doc_id < 50")
    assert(scansOf(q4).nonEmpty)
    assert(q4.collect().head.getLong(0) == 50L)
  }

  test("pending MOR tombstones refuse metadata aggregates; compaction restores them") {
    val (lake, _, cat) = register()
    val d = docs(100)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d)
    cat.deleteKeysMOR("docs", d.filter(col("doc_id") % 5 === 0).select("doc_id"))
    val expected = d.filter(col("doc_id") % 5 =!= 0).count()
    val q = spark.sql(s"SELECT count(*) FROM $lake.main.docs")
    assert(scansOf(q).nonEmpty, "tombstoned counts must come from the real scan")
    assert(q.collect().head.getLong(0) == expected)
    cat.compactDataFiles("docs", targetFiles = 2)
    val q2 = spark.sql(s"SELECT count(*) FROM $lake.main.docs")
    assertMetaOnly(q2)
    assert(q2.collect().head.getLong(0) == expected)
  }

  test("a column added by evolution refuses min/max until files carry it") {
    val (lake, _, cat) = register()
    val d = docs(60).select("doc_id", "lang", "n_chars")
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d)
    cat.evolveSchema("docs", org.apache.spark.sql.types.StructType(
      d.schema.fields :+ org.apache.spark.sql.types.StructField(
        "extra", org.apache.spark.sql.types.LongType)))
    // old files have no stats for `extra`; min(extra) must not claim one
    val q = spark.sql(s"SELECT min(extra) FROM $lake.main.docs")
    assert(scansOf(q).nonEmpty)
    assert(q.collect().head.isNullAt(0))
    // count(*) stays metadata-only through the evolution
    assertMetaOnly(spark.sql(s"SELECT count(*) FROM $lake.main.docs"))
  }

  test("wap_agg_pushdown lifecycle query passes all four plan gates") {
    val row = graft.operators.WapQueries.wapAggPushdown(spark, sfDir).collect().head
    for (c <- Seq("ext_meta_only", "v2_pushed", "paths_agree", "zero_data_io"))
      assert(row.getAs[Boolean](c), c)
    assert(row.getAs[Long]("n_rows") ==
      Tables.documents(spark, sfDir).filter(col("doc_id") < 200).count())
  }

  test("planner null counts skip columns not covered by every manifest") {
    val (_, root, cat) = register()
    val d = docs(40).select("doc_id", "lang")
    cat.createTableIfNotExists("t", d.schema)
    cat.append("t", d) // M1: no `extra` column at all
    cat.evolveSchema("t", org.apache.spark.sql.types.StructType(
      d.schema.fields :+ org.apache.spark.sql.types.StructField(
        "extra", org.apache.spark.sql.types.LongType)))
    cat.append("t", d.withColumn("extra",
      when(col("doc_id") % 2 === 0, col("doc_id")))) // M2 covers `extra`
    val id = cat.snapshotIdOf("t").get
    val stats = GraftStats.of(spark, GraftTable(root, "main", "t", id,
      cat.schemaOfSnapshot("t", id)))
    val nulls = stats.columnStats()
    val keys = nulls.keySet().toArray.map(_.toString).toSet
    // doc_id/lang covered by both manifests; `extra` only by M2 — a
    // partial sum would claim 20 nulls where the scan sees 60
    assert(keys.exists(_.contains("doc_id")))
    assert(!keys.exists(_.contains("extra")),
      s"partially-covered column must not report a null count, got $keys")
  }

  test("metaAggregate values match the scan across DML rewrites") {
    val (_, _, cat) = register()
    val d = docs(100)
    cat.createTableIfNotExists("docs", d.schema)
    cat.append("docs", d)
    cat.deleteWhere("docs", col("doc_id") >= 80)
    cat.updateWhere("docs", col("doc_id") < 10,
      Map("n_chars" -> (col("n_chars") + 1)))
    val id = cat.snapshotIdOf("docs").get
    import graft.wap.MetaAgg._
    val got = cat.metaAggregate("docs", id,
      Seq(CountStar, CountCol("src"), MinCol("doc_id"), MaxCol("doc_id"),
        MinCol("lang"), MaxCol("lang")))
    assert(got.isDefined, "post-DML snapshots must stay metadata-answerable")
    val s = cat.scan("docs")
    val exp = s.agg(count(lit(1)), count(col("src")), min(col("doc_id")),
      max(col("doc_id")), min(col("lang")), max(col("lang"))).collect().head
    val vals = got.get
    assert(vals(0) == exp.getLong(0) && vals(1) == exp.getLong(1))
    assert(vals(2) == exp.getLong(2) && vals(3) == exp.getLong(3))
    assert(vals(4).toString == exp.getString(4) && vals(5).toString == exp.getString(5))
  }
}
