package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W65 — size-tiered small-file compaction (the Iceberg BIN_PACK
  * strategy) and the policy-driven `maintain` loop. */
class MaintenanceSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"maint$n").toString)
  }

  private def docs(lo: Long, hi: Long) =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "n_chars")

  test("compactSmallFiles folds only under-target files; big files survive untouched") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 200).coalesce(1)) // the one BIG file
    for (r <- 0 until 4) // four tiny commits
      cat.append("t", docs(200 + r * 5, 205 + r * 5).coalesce(1))
    val before = cat.dataFiles("t")
    assert(before.size == 5)
    val bigPath = before.maxBy(_.bytes).path
    val threshold = before.map(_.bytes).max // big file is AT, not under

    val smallSum = before.filter(_.path != bigPath).map(_.bytes).sum
    val expectedOuts = math.max(1, math.ceil(smallSum.toDouble / threshold).toInt)
    val snap = cat.compactSmallFiles("t", targetBytes = threshold)
    assert(snap.isDefined && snap.get.op == "compact")
    val after = cat.dataFiles("t")
    assert(after.size == 1 + expectedOuts,
      s"4 small files pack into $expectedOuts, got ${after.size - 1}")
    assert(after.exists(_.path == bigPath), "the big file is carried, not rewritten")
    // content identical
    assert(cat.scan("t").agg(sum(col("n_chars"))).head.getLong(0) ==
      docs(0, 220).agg(sum(col("n_chars"))).head.getLong(0))
    assert(cat.scan("t").count() == 220)
    // convergent: each pass strictly reduces the file count (two
    // half-size outputs may pack once more), then a fixpoint
    val second = cat.compactSmallFiles("t", targetBytes = threshold)
    second.foreach(_ => assert(cat.dataFiles("t").size == 2))
    assert(cat.compactSmallFiles("t", targetBytes = threshold).isEmpty)
    assert(cat.scan("t").count() == 220)
  }

  test("compactSmallFiles preserves hidden partition layouts") {
    val cat = freshCat()
    val d = docs(0, 64).withColumn("b", col("doc_id") % 2)
    cat.createTableIfNotExists("t", d.schema, "main", Seq(IdentityPartition("b")))
    for (r <- 0 until 3)
      cat.append("t", d.filter(col("doc_id") >= r * 20 && col("doc_id") < r * 20 + 20))
    val snap = cat.compactSmallFiles("t", targetBytes = Long.MaxValue / 2)
    assert(snap.isDefined)
    val files = cat.dataFiles("t")
    assert(files.forall(_.partition.contains("pv")), "pv values survive the fold")
    assert(cat.scan("t", filter = Some(col("b") === 0L)).count() ==
      d.filter(col("doc_id") < 60 && col("doc_id") % 2 === 0).count())
  }

  test("maintain: healthy table -> no actions; each policy fires on its trigger") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100).coalesce(1))
    assert(cat.maintain("t").isEmpty, "a healthy table needs nothing")

    // tombstone policy: bound 2, two MOR deletes -> materialize
    import spark.implicits._
    cat.setTableProperties("t", Map(
      "graft.maintain.tombstones.max" -> "2",
      "graft.maintain.small-files.min" -> "3"))
    cat.deleteKeysMOR("t", Seq(1L).toDF("doc_id"))
    cat.deleteKeysMOR("t", Seq(2L).toDF("doc_id"))
    val acts1 = cat.maintain("t")
    assert(acts1.map(_._1).contains("materialize"), s"got $acts1")
    assert(cat.snapshotMeta("t", cat.snapshotIdOf("t").get).deleteManifests.isEmpty)
    assert(cat.scan("t").count() == 98)

    // small-file policy: min 3 tiny commits -> BIN_PACK fires
    for (r <- 0 until 3)
      cat.append("t", docs(100 + r * 5, 105 + r * 5).coalesce(1))
    val acts2 = cat.maintain("t")
    assert(acts2.map(_._1) == Seq("compact-small-files"), s"got $acts2")
    assert(cat.scan("t").count() == 113)

    // manifest policy fires on ref count (small-file policy parked so
    // the fold does not collapse the refs first)
    cat.setTableProperties("t", Map("graft.maintain.manifests.max" -> "3",
      "graft.maintain.small-files.min" -> "99"))
    for (r <- 0 until 3) cat.append("t", docs(120 + r, 121 + r).coalesce(1))
    val acts3 = cat.maintain("t")
    assert(acts3.map(_._1).contains("compact-manifests"), s"got $acts3")

    // expiry policy: keep 0 ms -> history trims to retain-last
    cat.setTableProperties("t", Map(
      "graft.maintain.expire.keep-ms" -> "0",
      "graft.maintain.expire.retain-last" -> "1"))
    val acts4 = cat.maintain("t")
    assert(acts4.map(_._1).contains("expire-snapshots"), s"got $acts4")
    assert(cat.maintain("t").isEmpty, "maintenance is idempotent")
    assert(cat.scan("t").count() == 116)
  }

  test("pending tombstones below the bound park BIN_PACK instead of crashing it") {
    val cat = freshCat()
    import spark.implicits._
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    for (r <- 0 until 3) cat.append("t", docs(r * 10, r * 10 + 10).coalesce(1))
    cat.setTableProperties("t", Map("graft.maintain.small-files.min" -> "2"))
    cat.deleteKeysMOR("t", Seq(5L).toDF("doc_id")) // 1 generation, bound 8
    assert(cat.maintain("t").isEmpty,
      "neither policy fires: tombstones under bound, BIN_PACK parked")
    assert(cat.scan("t").count() == 29)
    // once the tombstone bound breaches, materialize unblocks BIN_PACK
    cat.setTableProperties("t", Map("graft.maintain.tombstones.max" -> "1"))
    val acts = cat.maintain("t")
    assert(acts.map(_._1) == Seq("materialize"), s"got $acts")
    assert(cat.maintain("t").isEmpty, "materialization left one file")
  }

  test("maintainAll sweeps the branch; un-policied healthy tables contribute nothing") {
    val cat = freshCat()
    cat.createTableIfNotExists("a", docs(0, 1).schema)
    cat.append("a", docs(0, 50).coalesce(1))
    cat.createTableIfNotExists("b", docs(0, 1).schema)
    cat.setTableProperties("b", Map("graft.maintain.small-files.min" -> "2"))
    for (r <- 0 until 2) cat.append("b", docs(r * 5, r * 5 + 5).coalesce(1))
    val acts = cat.maintainAll()
    assert(acts.map(t => (t._1, t._2)) == Seq("b" -> "compact-small-files"), s"got $acts")
    assert(cat.scan("b").count() == 10 && cat.scan("a").count() == 50)
  }

  test("maintain refreshes opted-in derived artifacts (mview freshness sweep)") {
    val root = Files.createTempDirectory("maint-mv").toString
    val cat = new BranchCatalog(spark, root)
    val lake = "mv_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    cat.createTableIfNotExists("src", docs(0, 1).schema)
    cat.append("src", docs(0, 50))
    graft.sql.GraftMaterializedViews.create(spark, cat, "v",
      s"SELECT count(*) AS n FROM $lake.main.src", "main")
    cat.setTableProperties("v", Map("graft.maintain.refresh-mview" -> "true"))

    assert(graft.sql.GraftMaintenance.run(spark, cat, "v").isEmpty,
      "a fresh view needs nothing")
    cat.append("src", docs(50, 80))
    val acts = graft.sql.GraftMaintenance.runAll(spark, cat)
    assert(acts.exists(a => a._1 == "v" && a._2 == "refresh-mview"), s"got $acts")
    assert(cat.scan("v").head.getLong(0) == 80L)
  }

  test("SQL: CALL maintain and rewrite_small_files") {
    val root = Files.createTempDirectory("maint-sql").toString
    val cat = new BranchCatalog(spark, root)
    val lake = "mt_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    for (r <- 0 until 4) cat.append("t", docs(r * 10, r * 10 + 10).coalesce(1))
    assert(cat.dataFiles("t").size == 4)
    spark.sql(s"CALL $lake.system.rewrite_small_files('t', 'main', ${Long.MaxValue / 2}, 2)")
    assert(cat.dataFiles("t").size == 1)

    spark.sql(s"ALTER TABLE $lake.main.t SET TBLPROPERTIES(" +
      "'graft.maintain.small-files.min'='2')")
    for (r <- 0 until 2) cat.append("t", docs(50 + r * 5, 55 + r * 5).coalesce(1))
    spark.sql(s"CALL $lake.system.maintain('t')")
    assert(cat.dataFiles("t").size == 1,
      "policy folded everything under the default 128 MiB target")
    assert(cat.scan("t").count() == 50)
  }

  test("tombstones.mode=convert folds equality generations sidecar-only on breach") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.setTableProperties("t", Map(
      "graft.maintain.tombstones.max" -> "2",
      "graft.maintain.tombstones.mode" -> "convert"))
    import spark.implicits._
    cat.deleteKeysMOR("t", Seq(1L).toDF("doc_id"))
    cat.deleteKeysMOR("t", Seq(2L, 3L).toDF("doc_id"))
    val filesBefore = cat.dataFiles("t").map(_.path).toSet
    val log = cat.maintain("t")
    assert(log.exists(_._1 == "convert-tombstones"), s"got $log")
    assert(!log.exists(_._1 == "materialize"), s"conversion cleared the bound: $log")
    assert(cat.dataFiles("t").map(_.path).toSet == filesBefore,
      "convert mode must not rewrite data")
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.deleteManifests.size == 1 && head.deleteManifests.forall(_.posDelete))
    assert(cat.scan("t").count() == 97)
  }

  test("tombstones.mode=fold stays merge-on-read forever: generations collapse to one epoch, zero rewrites") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.setTableProperties("t", Map(
      "graft.maintain.tombstones.max" -> "3",
      "graft.maintain.tombstones.mode" -> "fold"))
    import spark.implicits._
    cat.deleteWherePositional("t", col("doc_id") < 3)
    cat.deleteWherePositional("t", col("doc_id") >= 3 && col("doc_id") < 5)
    cat.deleteKeysMOR("t", Seq(7L).toDF("doc_id")) // mixed stack
    val filesBefore = cat.dataFiles("t").map(_.path).toSet
    val log = cat.maintain("t")
    assert(log.exists(_._1 == "fold-pos-deletes"), s"got $log")
    assert(!log.exists(_._1 == "materialize"), s"fold must not rewrite: $log")
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.deleteManifests.size == 1 && head.deleteManifests.forall(_.posDelete))
    assert(cat.dataFiles("t").map(_.path).toSet == filesBefore,
      "fold mode must not rewrite data")
    assert(cat.scan("t").count() == 94)
    // a repeat sweep on the folded table is a no-op
    assert(!cat.maintain("t").exists(_._1 == "fold-pos-deletes"))
  }

  test("maintain.analyze keeps NDV sketches fresh incrementally; a quiet table sweeps for free") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.setTableProperties("t", Map("graft.maintain.analyze" -> "n_chars"))
    def sweep(): Seq[(String, String)] =
      graft.sql.GraftMaintenance.run(spark, cat, "t")
    val log1 = sweep()
    assert(log1.exists(_._1 == "analyze"), s"first sweep sketches: $log1")
    val ndv = cat.columnStatsOf("t", cat.snapshotIdOf("t").get).getOrElse(Map.empty)
    assert(ndv.contains("n_chars") && ndv("n_chars") > 0)
    // quiet table: no new manifests, no work
    assert(!sweep().exists(_._1 == "analyze"))
    // a new commit re-sketches only ITS manifest
    cat.append("t", docs(100, 150))
    val log3 = sweep()
    assert(log3.exists { case (a, d) => a == "analyze" && d.startsWith("1 manifest") },
      s"incremental sweep sketches the one new manifest: $log3")
  }

  test("declared write sort-order: appends sort within tasks so each file is ordered; unknown column refuses") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.setTableProperties("t", Map("graft.write.sort-order" -> "n_chars"))
    // deliberately unsorted input
    cat.append("t", docs(0, 200).orderBy(rand(7)))
    val files = cat.dataFiles("t")
    assert(files.nonEmpty)
    files.foreach { f =>
      val vals = spark.read.parquet(f.path)
        .select("n_chars").collect().map(_.getLong(0)).toSeq
      assert(vals == vals.sorted, s"file ${f.path} must be internally ordered")
    }
    assert(cat.scan("t").count() == 200L, "content unchanged by the local sort")

    // hidden-partitioned table: order applies inside each value group,
    // and plain appends keep the rebalance (no one-file-per-value claim)
    val cat2 = freshCat()
    cat2.createTableIfNotExists("p", docs(0, 1).schema, "main",
      Some(BucketPartition(4, "doc_id"): PartitionSpec))
    cat2.setTableProperties("p", Map("graft.write.sort-order" -> "n_chars"))
    cat2.append("p", docs(0, 200).orderBy(rand(7)))
    cat2.dataFiles("p").foreach { f =>
      val vals = spark.read.parquet(f.path)
        .select("n_chars").collect().map(_.getLong(0)).toSeq
      assert(vals == vals.sorted)
    }
    assert(cat2.scan("p").count() == 200L)

    val e = intercept[IllegalArgumentException] {
      cat.setTableProperties("t", Map("graft.write.sort-order" -> "nope"))
      cat.append("t", docs(200, 210))
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("ALTER TABLE ... WRITE ORDERED BY / WRITE UNORDERED (injected DDL)") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val lake = "wolake_" + cat.root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", cat.root)

    spark.sql(s"ALTER TABLE $lake.main.t WRITE ORDERED BY n_chars")
    assert(cat.tableProperties("t").get("graft.write.sort-order").contains("n_chars"))
    cat.append("t", docs(0, 100).orderBy(rand(7)))
    cat.dataFiles("t").foreach { f =>
      val vals = spark.read.parquet(f.path)
        .select("n_chars").collect().map(_.getLong(0)).toSeq
      assert(vals == vals.sorted)
    }
    // typo'd column refuses AT ALTER time, not at the first append
    val bad = intercept[Exception](
      spark.sql(s"ALTER TABLE $lake.main.t WRITE ORDERED BY nope"))
    assert(bad.getMessage.contains("unknown column"))
    // WRITE UNORDERED clears the property
    spark.sql(s"ALTER TABLE $lake.main.t WRITE UNORDERED")
    assert(!cat.tableProperties("t").contains("graft.write.sort-order"))
  }

  test("TTL retention: expired rows delete positionally, sweep is idempotent, ids survive") {
    val cat = freshCat()
    // epoch-millis long column: doc_id stands in as the event time
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t") // retention must not move surviving ids
    val ids = cat.scanLineage("t").select("doc_id", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cat.setTableProperties("t", Map(
      "graft.maintain.ttl.column" -> "doc_id",
      "graft.maintain.ttl.ms" -> "60"))
    val filesBefore = cat.dataFiles("t").map(_.path).toSet

    // now=100 -> cutoff 40: rows 0..39 expire, through sidecars only
    val log1 = cat.maintain("t", nowMillis = 100L)
    assert(log1.exists { case (a, d) => a == "ttl-retention" && d.startsWith("40 rows") },
      s"expected a 40-row retention action, got $log1")
    assert(cat.dataFiles("t").map(_.path).toSet == filesBefore,
      "TTL sweep must not rewrite data files")
    assert(cat.scan("t").count() == 60)
    // same clock again: nothing newly expired -> no action
    assert(!cat.maintain("t", nowMillis = 100L).exists(_._1 == "ttl-retention"))
    // clock advances -> only the newly-expired rows delete
    val log2 = cat.maintain("t", nowMillis = 120L)
    assert(log2.exists { case (a, d) => a == "ttl-retention" && d.startsWith("20 rows") })
    assert(cat.scan("t").count() == 40)
    // survivors keep their row ids through the sweeps
    val after = cat.scanLineage("t").select("doc_id", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == (60L until 100L).toSet)
    assert(after.forall { case (k, v) => ids(k) == v })

    // a timestamp retention column works the same way
    val cat2 = freshCat()
    val ev = docs(0, 100)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_millis(doc_id * 1000)"))
    cat2.createTableIfNotExists("ev", ev.schema)
    cat2.append("ev", ev)
    cat2.setTableProperties("ev", Map(
      "graft.maintain.ttl.column" -> "ts",
      "graft.maintain.ttl.ms" -> "0"))
    val log3 = cat2.maintain("ev", nowMillis = 50_000L) // cutoff: doc_id < 50
    assert(log3.exists { case (a, d) => a == "ttl-retention" && d.startsWith("50 rows") },
      s"expected a 50-row timestamp retention, got $log3")
    assert(cat2.scan("ev").count() == 50)
  }

  test("cluster-by policy re-sorts when interleaved appends degrade pruning; sorted table sweeps free") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    // 8 interleaved appends: every file spans ~the whole doc_id range
    for (r <- 0 until 8)
      cat.append("t", docs(0, 200).filter(col("doc_id") % 8 === r).coalesce(1))
    cat.setTableProperties("t", Map(
      "graft.maintain.cluster-by" -> "doc_id",
      "graft.maintain.small-files.min" -> "64", // park BIN_PACK: isolate the layout pass
      "graft.maintain.cluster.target-files" -> "4"))
    // before: a point predicate admits every file
    assert(cat.prunedDataFiles("t", col("doc_id") === 57L).size == 8)

    val log = cat.maintain("t")
    assert(log.exists { case (a, d) => a == "recluster" && d.contains("sort rewrite") },
      s"expected a recluster action, got $log")
    assert(cat.prunedDataFiles("t", col("doc_id") === 57L).size == 1,
      "sorted rewrite must make point predicates prune to one file")
    assert(cat.scan("t").count() == 200)
    // healthy now: the sweep measures 0 overlap and does nothing
    val log2 = cat.maintain("t")
    assert(!log2.exists(_._1 == "recluster"), s"healthy table re-clustered: $log2")

    // declaring BOTH layouts refuses
    cat.setTableProperties("t", Map("graft.maintain.zorder-by" -> "doc_id,n_chars"))
    intercept[IllegalArgumentException](cat.maintain("t"))
  }

  test("layout sweep above distributedMetaThreshold: distributed statistic, same decision") {
    // two catalogs over IDENTICAL logical content: one sweeps driver-held
    // entries, one runs the range-partitioned two-pass aggregation (only
    // per-partition scalars land on the driver). Decisions must agree.
    def build(cat: BranchCatalog): Unit = {
      cat.createTableIfNotExists("t", docs(0, 1).schema)
      for (r <- 0 until 12) // every file spans ~the whole doc_id range
        cat.append("t", docs(0, 200).filter(col("doc_id") % 12 === r).coalesce(1))
      cat.setTableProperties("t", Map(
        "graft.maintain.cluster-by" -> "doc_id",
        "graft.maintain.small-files.min" -> "64",
        "graft.maintain.cluster.target-files" -> "4"))
    }
    val driverCat = freshCat()
    val distCat = new BranchCatalog(spark,
      Files.createTempDirectory("maint-dist").toString, distributedMetaThreshold = 4)
    build(driverCat); build(distCat)
    val dLog = driverCat.maintain("t")
    val xLog = distCat.maintain("t")
    def reclusterMsg(log: Seq[(String, String)]): Option[String] =
      log.collectFirst { case ("recluster", d) => d.takeWhile(_ != '(') }
    assert(reclusterMsg(dLog).isDefined, s"driver sweep must fire: $dLog")
    // identical statistic (same "over of n" prefix), identical decision
    assert(reclusterMsg(xLog) == reclusterMsg(dLog),
      s"distributed sweep disagreed: $xLog vs $dLog")
    assert(distCat.scan("t").count() == 200)
    assert(distCat.prunedDataFiles("t", col("doc_id") === 57L).size == 1,
      "distributed-path rewrite must restore point pruning")
    // healthy after the rewrite: the distributed sweep measures 0 too
    val again = distCat.maintain("t")
    assert(!again.exists(_._1 == "recluster"), s"healthy table re-clustered: $again")

    // string layout key: the distributed sweep's cast ordering must agree
    // with the UTF8 comparator on a text column as well
    val sCat = new BranchCatalog(spark,
      Files.createTempDirectory("maint-dist-s").toString, distributedMetaThreshold = 4)
    val langs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
      .select("doc_id", "lang")
    sCat.createTableIfNotExists("s", langs.schema)
    for (r <- 0 until 8)
      sCat.append("s", langs.filter(col("doc_id") % 8 === r).coalesce(1))
    sCat.setTableProperties("s", Map(
      "graft.maintain.cluster-by" -> "lang",
      "graft.maintain.small-files.min" -> "64",
      "graft.maintain.cluster.target-files" -> "2"))
    val sLog = sCat.maintain("s")
    assert(sLog.exists(_._1 == "recluster"), s"string-key sweep must fire: $sLog")
    assert(sCat.scan("s").count() == 200)
  }

  test("maintainAll folds lake-level tag retention when asked") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 20))
    cat.createTag("old-release")
    Thread.sleep(10)
    val rows = cat.maintainAll(tagsMaxAgeMs = Some(1L))
    assert(rows.exists { case (t, a, d) =>
      t == "*" && a == "expire-tags" && d.contains("old-release") }, s"got $rows")
    assert(!cat.listTags().contains("old-release"))
    // without the knob: tags untouched
    cat.createTag("keep")
    assert(!cat.maintainAll().exists(_._2 == "expire-tags"))
    assert(cat.listTags().contains("keep"))
  }
}
