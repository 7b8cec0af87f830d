package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W21 extended — MULTI-transform hidden partitioning (the common
  * Iceberg layout `PARTITIONED BY (days(ts), bucket(n, id))`): a table
  * carries an ORDERED list of transforms, files land in nested
  * `__pv<i>=` directories with one manifest partition value per level,
  * and every predicate aligns against EVERY transform it constrains —
  * a day filter AND a key filter each cut the file set independently. */
class MultiPartitionSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"multipart$n").toString)
  }

  private def events(): DataFrame =
    Tables.eventsWithTs(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

  private val specs = Seq(DayPartition("ts"), BucketPartition(4, "user_id"))
  // the positional field registry those specs seed (pruning API shape)
  private val specFields = specs.zipWithIndex.map { case (sp, i) =>
    PartitionSpec.SpecField(sp, i, active = true) }

  private def mk(cat: BranchCatalog): DataFrame = {
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main", specs)
    cat.append("ev", ev) // auto-routes through the partitioned writer
    ev
  }

  test("files carry one partition value per transform; scan is complete") {
    val cat = freshCat()
    val ev = mk(cat)
    assert(cat.scan("ev").count() == ev.count())
    val files = cat.dataFiles("ev")
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.partition.contains("pv"), s"missing day value: ${f.partition}")
      assert(f.partition.contains("pv1"), s"missing bucket value: ${f.partition}")
      assert(f.partition("pv").matches("""\d{4}-\d{2}-\d{2}"""))
    }
    // more day-bucket combinations than either dimension alone
    assert(files.map(_.partition("pv")).distinct.size > 1)
    assert(files.map(_.partition("pv1")).distinct.size > 1)
  }

  test("each transform prunes independently; conjunctions compose") {
    val cat = freshCat()
    val ev = mk(cat)
    val total = cat.dataFiles("ev").size
    val someDay = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .groupBy("d").count().orderBy(desc("count")).head.getString(0)
    val dayCond = col("ts") >= lit(s"$someDay 00:00:00").cast("timestamp") &&
      col("ts") < lit(s"$someDay 23:59:59").cast("timestamp")
    val keyCond = col("user_id") === 3L

    def prunedCount(cond: org.apache.spark.sql.Column): Int =
      cat.plannedFilesOfSnapshot("ev", cat.snapshotIdOf("ev").get, Some(cond)).size
    val dayFiles = prunedCount(dayCond)
    val keyFiles = prunedCount(keyCond)
    val bothFiles = prunedCount(dayCond && keyCond)
    assert(dayFiles < total, s"day filter must prune ($dayFiles/$total)")
    assert(keyFiles < total, s"bucket filter must prune ($keyFiles/$total)")
    assert(bothFiles <= math.min(dayFiles, keyFiles),
      s"conjunction must prune at least as hard ($bothFiles vs $dayFiles/$keyFiles)")

    // and the pruned scans stay exact
    assert(cat.scan("ev", filter = Some(dayCond && keyCond)).count() ==
      ev.filter(dayCond && keyCond).count())
    assert(cat.scan("ev", filter = Some(keyCond)).count() ==
      ev.filter(keyCond).count())
  }

  test("DML preserves the multi-transform layout") {
    val cat = freshCat()
    val ev = mk(cat)
    val r = cat.deleteWhere("ev", col("event_type") === "click")
    assert(r.rowsDeleted == ev.filter(col("event_type") === "click").count())
    cat.dataFiles("ev").foreach(f =>
      assert(f.partition.contains("pv") && f.partition.contains("pv1"),
        s"rewrite dropped partition metadata: ${f.partition}"))
    assert(cat.scan("ev").count() == ev.filter(col("event_type") =!= "click").count())
  }

  test("partition evolution rewrites between single and multi layouts") {
    val cat = freshCat()
    val ev = mk(cat)
    cat.rewritePartitioned("ev", Seq(BucketPartition(2, "event_id")))
    assert(cat.scan("ev").count() == ev.count())
    cat.dataFiles("ev").foreach(f =>
      assert(f.partition.contains("pv") && !f.partition.contains("pv1")))
    cat.rewritePartitioned("ev",
      Seq(MonthPartition("ts"), TruncatePartition(2, "event_type")))
    assert(cat.scan("ev").count() == ev.count())
    cat.dataFiles("ev").foreach(f =>
      assert(f.partition.get("pv").exists(_.matches("""\d{4}-\d{2}""")) &&
        f.partition.contains("pv1")))
  }

  test("SQL: CREATE PARTITIONED BY two transforms, insert, prune, $partitions") {
    val root = Files.createTempDirectory("multipart-sql").toString
    val cat = new BranchCatalog(spark, root)
    val lake = "mp_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    spark.conf.set(s"spark.sql.catalog.$lake.write.main", "true")

    spark.sql(s"CREATE TABLE $lake.main.ev (event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, value DOUBLE) PARTITIONED BY (days(ts), bucket(4, user_id))")
    val snap = cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
    assert(snap.partitionSpec.contains("day(ts);bucket(4,user_id)"))

    events().select("event_id", "ts", "user_id", "value")
      .createOrReplaceTempView("mp_src")
    spark.sql(s"INSERT INTO $lake.main.ev SELECT * FROM mp_src")
    assert(spark.sql(s"SELECT count(*) FROM $lake.main.ev").head.getLong(0) ==
      events().count())
    // both transforms visible through the connector
    assert(spark.table(s"$lake.main.ev").queryExecution.analyzed.toString != null)
    val parts = spark.sql(s"SELECT partition FROM $lake.main.`ev$$partitions`")
      .collect().map(_.getString(0))
    assert(parts.nonEmpty && parts.forall(_.matches("""\d{4}-\d{2}-\d{2}/\d""")),
      s"expected day/bucket tuples, got ${parts.take(3).mkString(", ")}")
    // a filtered SQL read is exact across the pruned layout
    val got = spark.sql(
      s"SELECT count(*) FROM $lake.main.ev WHERE user_id = 3").head.getLong(0)
    assert(got == events().filter(col("user_id") === 3L).count())
  }

  test("manifests record partition-value summaries; ordered transforms prune on them") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main", specs)
    // day-aligned commits: each manifest covers one day's rows
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0)).take(2)
    assert(days.length == 2, "need two distinct days in the testdata")
    def ofDay(d: String) = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === d)
    cat.append("ev", ofDay(days(0)))
    cat.append("ev", ofDay(days(1)))
    val snap = cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
    // the summaries are exact per-manifest day bounds
    assert(snap.manifests.map(m => (m.pvLower("pv"), m.pvUpper("pv"))).sorted ==
      Seq((days(0), days(0)), (days(1), days(1))))
    // and carry the bucket key too (recorded, never range-pruned)
    assert(snap.manifests.forall(m => m.pvLower.contains("pv1")))

    // the pv tier ALONE excludes the day-1 manifest for a day-2 scan —
    // exercised directly so the proof does not lean on column stats
    val schema = ev.schema
    val pred = cat.resolvePredicate(
      col("ts") >= lit(s"${days(1)} 00:00:00").cast("timestamp"), schema).get
    val Seq(m1, m2) = snap.manifests.sortBy(_.pvLower("pv"))
    // strip the COLUMN stats so only the partition summary can answer
    def pvOnly(m: ManifestRef) = m.copy(lower = Map.empty, upper = Map.empty,
      nullCounts = Map.empty)
    assert(!cat.manifestPvMayMatch(pvOnly(m1), pred, specFields, schema),
      "day-1 manifest must be excluded by its partition summary alone")
    assert(cat.manifestPvMayMatch(pvOnly(m2), pred, specFields, schema))
    // bucket transforms never range-prune on summaries
    val keyPred = cat.resolvePredicate(col("user_id") === 3L, schema).get
    assert(cat.manifestPvMayMatch(pvOnly(m1), keyPred, specFields, schema))
    // end-to-end: the day-2 scan stays exact (the table holds only the
    // two appended days)
    assert(cat.scan("ev",
      filter = Some(col("ts") >= lit(s"${days(1)} 00:00:00").cast("timestamp"))).count() ==
      ofDay(days(1)).count())
  }

  test("identity transform: value-per-partition, equality + string ranges prune") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Seq(IdentityPartition("event_type"), BucketPartition(2, "user_id")))
    cat.append("ev", ev)
    val total = cat.dataFiles("ev").size
    val headId = cat.snapshotIdOf("ev").get
    def planned(c: org.apache.spark.sql.Column): Int =
      cat.plannedFilesOfSnapshot("ev", headId, Some(c)).size
    // the partition VALUE is the column value itself
    assert(cat.dataFiles("ev").forall(f =>
      ev.select("event_type").distinct().collect().map(_.getString(0))
        .contains(f.partition("pv"))))
    // equality prunes to one value's files; results exact
    val eq = col("event_type") === "click"
    assert(planned(eq) < total)
    assert(cat.scan("ev", filter = Some(eq)).count() == ev.filter(eq).count())
    // string ranges prune too (rendered order = domain order)
    val rng = col("event_type") >= "purchase"
    assert(planned(rng) < total)
    assert(cat.scan("ev", filter = Some(rng)).count() == ev.filter(rng).count())

    // numeric identity: equality prunes even with a WIDER literal type,
    // ranges conservatively keep
    val cat2 = freshCat()
    cat2.createTableIfNotExists("u", ev.schema, "main",
      Seq(IdentityPartition("user_id")))
    cat2.append("u", ev)
    val head2 = cat2.snapshotIdOf("u").get
    val tot2 = cat2.dataFiles("u").size
    val keyEq = col("user_id") === 3 // int literal against a bigint column
    assert(cat2.plannedFilesOfSnapshot("u", head2, Some(keyEq)).size < tot2)
    assert(cat2.scan("u", filter = Some(keyEq)).count() == ev.filter(keyEq).count())
    assert(cat2.scan("u", filter = Some(col("user_id") > 7)).count() ==
      ev.filter(col("user_id") > 7).count())

    // timestamp identity refuses loudly at the first write
    cat2.createTableIfNotExists("bad", ev.schema, "main",
      Seq(IdentityPartition("ts")))
    val e = intercept[IllegalArgumentException](cat2.append("bad", ev))
    assert(e.getMessage.contains("day/month/hour"))
  }

  test("rebalanced appends split a skewed partition value across files") {
    // the r13 write path REBALANCES on partition values: with a tiny
    // advisory size, AQE must split the hot value into several files
    // (each still routed to its __pv directory and manifest-stamped),
    // while pruning and scan completeness are untouched
    val cat = freshCat()
    import spark.implicits._
    val skewed = ((0L until 5000L).map(i => (i, "hot")) ++
      (0L until 20L).map(i => (i + 10000L, "cold")))
      .toDF("id", "kind")
    cat.createTableIfNotExists("sk", skewed.schema, "main",
      Seq(IdentityPartition("kind")))
    val advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.get(advisory, null)
    spark.conf.set(advisory, "8KB")
    try cat.append("sk", skewed)
    finally if (before == null) spark.conf.unset(advisory)
    else spark.conf.set(advisory, before)
    val files = cat.dataFiles("sk")
    val hot = files.filter(_.partition.get("pv").contains("hot"))
    assert(hot.size > 1, s"hot value should split, got ${hot.size} file(s)")
    assert(files.forall(f => f.partition.get("pv").exists(Set("hot", "cold"))))
    assert(cat.scan("sk").count() == 5020)
    assert(cat.scan("sk", filter = Some(col("kind") === "cold")).count() == 20)
    assert(cat.prunedDataFiles("sk", col("kind") === "cold").size <
      files.size, "identity pruning still cuts the file set")
  }

  test("appends must match the declared multi layout") {
    val cat = freshCat()
    mk(cat)
    // appendPartitioned with a DIFFERENT layout refuses
    val e = intercept[IllegalArgumentException](
      cat.appendPartitioned("ev", events(), Seq(DayPartition("ts"))))
    assert(e.getMessage.contains("evolve the layout first"))
  }
}
