package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** METADATA-ONLY partition-spec evolution ([[BranchCatalog
  * .addPartitionField]]/[[BranchCatalog.dropPartitionField]] — Iceberg's
  * `ADD/DROP PARTITION FIELD`): a layout change is ONE commit, data
  * files are never rewritten, every file prunes under exactly the
  * fields whose (stable-id) keys it carries, and dropped fields keep
  * pruning the files written under them. */
class SpecEvolveSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"specevo$n").toString)
  }

  private def events(): DataFrame =
    Tables.eventsWithTs(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

  private def planned(cat: BranchCatalog, t: String,
      cond: org.apache.spark.sql.Column): Seq[String] =
    cat.plannedFilesOfSnapshot(t, cat.snapshotIdOf(t).get, Some(cond)).map(_._1)

  test("ADD PARTITION FIELD: one metadata commit; old files keep their layout, new files carry both; each prunes under its own fields") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat.append("ev", ev.filter(col("event_id") % 2 === 0))
    val oldFiles = cat.dataFiles("ev").map(_.path).toSet

    val snap = cat.addPartitionField("ev", BucketPartition(4, "user_id"))
    assert(snap.op == "evolve-spec")
    // all-active positional registries render in the legacy form
    assert(snap.partitionSpec.contains("day(ts);bucket(4,user_id)"))
    assert(cat.dataFiles("ev").map(_.path).toSet == oldFiles,
      "evolution must not touch a data file")

    cat.append("ev", ev.filter(col("event_id") % 2 === 1))
    assert(cat.scan("ev").count() == ev.count(), "content complete across layouts")
    val files = cat.dataFiles("ev")
    val (newF, oldF) = files.partition(_.partition.contains("pv1"))
    assert(oldF.nonEmpty && newF.nonEmpty)
    assert(oldF.forall(f => f.partition.contains("pv") && !f.partition.contains("pv1")))
    assert(newF.forall(f => f.partition.contains("pv") && f.partition.contains("pv1")))

    // a user_id filter prunes NEW files by bucket but keeps every OLD one
    val keep = planned(cat, "ev", col("user_id") === 3L).toSet
    assert(oldF.map(_.path).toSet.subsetOf(keep),
      "pre-evolution files must never be pruned by the new field")
    assert(newF.exists(f => !keep.contains(f.path)),
      "post-evolution files must bucket-prune")
    // and the pruned scan stays exact
    assert(cat.scan("ev", filter = Some(col("user_id") === 3L)).count() ==
      ev.filter(col("user_id") === 3L).count())
    // a day filter still prunes BOTH generations
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd")).distinct()
      .orderBy(col(ev.columns.head)).collect().map(_.getString(0)).sorted.head
    val dayCond = col("ts") < lit(s"$day 23:59:59").cast("timestamp")
    assert(planned(cat, "ev", dayCond).size < files.size,
      "day pruning must survive the evolution on both generations")
  }

  test("DROP PARTITION FIELD: retired fields keep pruning their own files; new writes stop carrying them") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Seq(DayPartition("ts"), BucketPartition(4, "user_id")): Seq[PartitionSpec])
    cat.append("ev", ev.filter(col("event_id") % 2 === 0))
    val snap = cat.dropPartitionField("ev", "bucket(4,user_id)")
    assert(snap.partitionSpec.contains("day(ts)@0;-bucket(4,user_id)@1"))
    cat.append("ev", ev.filter(col("event_id") % 2 === 1))

    val files = cat.dataFiles("ev")
    val (oldF, newF) = files.partition(_.partition.contains("pv1"))
    assert(newF.forall(f => f.partition.contains("pv") && !f.partition.contains("pv1")),
      "post-drop files carry only the surviving field")
    // the retired bucket STILL prunes the files written under it
    val keep = planned(cat, "ev", col("user_id") === 3L).toSet
    assert(oldF.exists(f => !keep.contains(f.path)),
      "files written under the dropped field must still bucket-prune")
    assert(newF.map(_.path).toSet.subsetOf(keep))
    assert(cat.scan("ev", filter = Some(col("user_id") === 3L)).count() ==
      ev.filter(col("user_id") === 3L).count())

    // dropping the LAST field sends appends down the plain writer
    cat.dropPartitionField("ev", "day(ts)")
    cat.append("ev", ev.limit(10))
    assert(cat.dataFiles("ev").exists(_.partition.isEmpty))
    assert(cat.scan("ev").count() == ev.count() + 10)
  }

  test("re-adding a transform never reuses a retired id; both generations prune on aligned equality") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(BucketPartition(4, "user_id"): PartitionSpec))
    cat.append("ev", ev.filter(col("event_id") % 2 === 0))
    cat.dropPartitionField("ev", "user_id")
    val snap = cat.addPartitionField("ev", BucketPartition(2, "user_id"))
    assert(snap.partitionSpec.contains("-bucket(4,user_id)@0;bucket(2,user_id)@1"),
      s"retired id must not be reused: ${snap.partitionSpec}")
    cat.append("ev", ev.filter(col("event_id") % 2 === 1))

    // equality on user_id aligns under BOTH transforms: old files prune
    // by bucket4 under key pv, new files by bucket2 under key pv1 —
    // neither value is ever read under the wrong transform
    val total = cat.dataFiles("ev").size
    assert(planned(cat, "ev", col("user_id") === 3L).size < total)
    assert(cat.scan("ev", filter = Some(col("user_id") === 3L)).count() ==
      ev.filter(col("user_id") === 3L).count())
  }

  test("guards: unknown column, duplicate active field, ambiguous drop") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat.append("ev", ev.limit(50))
    intercept[IllegalArgumentException](
      cat.addPartitionField("ev", DayPartition("nope")))
    intercept[IllegalArgumentException](
      cat.addPartitionField("ev", DayPartition("ts")))
    cat.addPartitionField("ev", BucketPartition(4, "ts"))
    // "ts" now names two active fields -> must pass the transform format
    val e = intercept[IllegalArgumentException](cat.dropPartitionField("ev", "ts"))
    assert(e.getMessage.contains("2 active partition fields"))
    cat.dropPartitionField("ev", "bucket(4,ts)")
    intercept[IllegalArgumentException](
      cat.dropPartitionField("ev", "bucket(4,ts)")) // already dropped
  }

  test("publish merges the two sides' registries by field id; a reset registry conflicts") {
    val cat = freshCat()
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat.append("ev", ev.filter(col("event_id") % 3 === 0))

    // clean case: the branch evolves, both sides append, publish unions
    cat.createBranch("evo")
    cat.addPartitionField("ev", BucketPartition(4, "user_id"), branch = "evo")
    cat.append("ev", ev.filter(col("event_id") % 3 === 1), branch = "evo")
    cat.append("ev", ev.filter(col("event_id") % 3 === 2)) // main, old layout
    cat.merge("evo")
    val merged = cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
    assert(merged.partitionSpec.contains("day(ts);bucket(4,user_id)"))
    assert(cat.scan("ev").count() == ev.count())
    assert(cat.scan("ev", filter = Some(col("user_id") === 3L)).count() ==
      ev.filter(col("user_id") === 3L).count())

    // conflict case: a branch-side rewritePartitioned RESET the ids
    val cat2 = freshCat()
    cat2.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat2.append("ev", ev.filter(col("event_id") % 2 === 0))
    cat2.createBranch("re")
    cat2.rewritePartitioned("ev", BucketPartition(4, "user_id"), "re")
    cat2.append("ev", ev.filter(col("event_id") % 2 === 1)) // main advances too
    val e = intercept[IllegalStateException](cat2.merge("re"))
    assert(e.getMessage.contains("partition field id"))
  }

  test("SQL surface: CALL add/drop_partition_field + add_files") {
    val cat = freshCat()
    val root = cat.root
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat.append("ev", ev.limit(100))
    val lake = "lake_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    spark.sql(s"CALL $lake.system.add_partition_field('ev', 'bucket(4,user_id)')")
    assert(cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
      .partitionSpec.contains("day(ts);bucket(4,user_id)"))
    spark.sql(s"CALL $lake.system.drop_partition_field('ev', 'bucket(4,user_id)')")
    assert(cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
      .partitionSpec.contains("day(ts)@0;-bucket(4,user_id)@1"))
    // add_files through SQL: import a foreign slice and read it back
    val ext = Files.createTempDirectory("specevo-sql-ext").toString + "/p"
    Tables.documents(spark, sfDir).filter(col("doc_id") < 10)
      .select("doc_id", "lang").coalesce(1).write.parquet(ext)
    cat.createTableIfNotExists("docs",
      Tables.documents(spark, sfDir).select("doc_id", "lang").schema)
    spark.sql(s"CALL $lake.system.add_files('docs', '$ext')")
    assert(cat.scan("docs").count() == 10L)
  }

  test("DDL surface: ALTER TABLE ... ADD/DROP PARTITION FIELD (injected parser)") {
    val cat = freshCat()
    val root = cat.root
    val ev = events()
    cat.createTableIfNotExists("ev", ev.schema, "main",
      Some(DayPartition("ts"): PartitionSpec))
    cat.append("ev", ev.limit(100))
    val lake = "ddllake_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(16)
    spark.conf.set(s"spark.sql.catalog.$lake", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)

    // Iceberg's exact surface, with whitespace + plural-day tolerance
    spark.sql(s"ALTER TABLE $lake.main.ev ADD PARTITION FIELD bucket(4, user_id)")
    assert(cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
      .partitionSpec.contains("day(ts);bucket(4,user_id)"))
    spark.sql(s"ALTER TABLE $lake.main.ev DROP PARTITION FIELD bucket(4, user_id)")
    assert(cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
      .partitionSpec.contains("day(ts)@0;-bucket(4,user_id)@1"))
    // bare column = identity transform (Iceberg shorthand); days() plural
    spark.sql(s"ALTER TABLE $lake.main.ev ADD PARTITION FIELD event_type")
    assert(cat.snapshotMeta("ev", cat.snapshotIdOf("ev").get)
      .partitionSpec.get.contains("identity(event_type)"))
    spark.sql(s"ALTER TABLE $lake.main.ev DROP PARTITION FIELD identity(event_type)")

    // refusals carry the real message: duplicate active field ...
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $lake.main.ev ADD PARTITION FIELD days(ts)"))
    assert(dup.getMessage.contains("already an active partition field"))
    // ... unknown column ...
    val unk = intercept[Exception](
      spark.sql(s"ALTER TABLE $lake.main.ev ADD PARTITION FIELD bucket(4, nope)"))
    assert(unk.getMessage.contains("no column nope"))
    // ... dropping a non-field, and a TAG namespace
    val miss = intercept[Exception](
      spark.sql(s"ALTER TABLE $lake.main.ev DROP PARTITION FIELD month(ts)"))
    assert(miss.getMessage.contains("no active partition field"))
    cat.createTag("v1")
    val tag = intercept[Exception](
      spark.sql(s"ALTER TABLE $lake.v1.ev ADD PARTITION FIELD month(ts)"))
    assert(tag.getMessage.contains("TAG"))
    // ordinary ALTER statements still parse through the delegate
    spark.sql(s"ALTER TABLE $lake.main.ev SET TBLPROPERTIES('x'='1')")
    assert(cat.tableProperties("ev").get("x").contains("1"))
    // parameterized SQL still binds through the wrapper (the interface
    // DEFAULT would silently drop the arguments)
    assert(spark.sql("SELECT :a + 1 AS v", Map("a" -> 41)).head.getInt(0) == 42)
    // unknown catalogs refuse by name
    val notGraft = intercept[Exception](
      spark.sql("ALTER TABLE spark_catalog.default.t ADD PARTITION FIELD day(ts)"))
    assert(notGraft.getMessage.contains("not a graft catalog"))
  }
}
