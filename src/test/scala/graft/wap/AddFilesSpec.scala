package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpecBase, Tables}

/** Metadata-only parquet import (W82, [[BranchCatalog.addDataFiles]] —
  * Iceberg's `add_files`/`migrate`): foreign parquet becomes table data
  * without copying a byte. Covers the refusal guards (schema mismatch,
  * duplicates, catalog-root, rename interplay, constraints), the
  * stats-proven hidden-partition derivation (incl. the bucket
  * equal-bounds rule), and the statsV demotion that keeps imported
  * (possibly bounds-truncated) footers pruning-eligible but never
  * served as exact MIN/MAX. */
class AddFilesSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"addfiles$n").toString)
  }
  // a not-yet-existing path: Spark's parquet writer refuses existing dirs
  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/p"

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("import registers files in place: rows readable, bytes not copied, one commit") {
    val cat = freshCat()
    val ext = freshDir("ext")
    docs(0, 60).repartition(3).write.mode("overwrite").parquet(ext)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(60, 80))

    val res = cat.addDataFiles("t", ext)
    assert(res.rowsAdded == 60L)
    assert(res.filesAdded >= 1L)
    assert(ids(cat.scan("t")) == (0L until 80L))
    // in place: the imported entries point INTO the external dir
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    val imported = cat.filesOf(snap).filter(_.path.contains(ext))
    assert(imported.size == res.filesAdded)
    assert(imported.forall(_.inexact), "imported entries must carry the inexact flag")
    assert(snap.evo.idlessFiles, "imports switch the table to name resolution")
    // and footer stats landed: pruning metadata exists for doc_id
    assert(imported.forall(m => m.lower.contains("doc_id") && m.upper.contains("doc_id")))
    assert(imported.forall(m => m.nullCounts.get("doc_id").contains(0L)))
  }

  test("re-import of an already-referenced file refuses (duplicate guard)") {
    val cat = freshCat()
    val ext = freshDir("extdup")
    docs(0, 20).coalesce(1).write.mode("overwrite").parquet(ext)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.addDataFiles("t", ext)
    val e = intercept[IllegalArgumentException](cat.addDataFiles("t", ext))
    assert(e.getMessage.contains("already referenced"))
    assert(cat.scan("t").count() == 20L, "failed import must commit nothing")
  }

  test("schema guards: extra column, type mismatch, missing non-nullable all refuse") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType))))

    val extExtra = freshDir("extextra")
    docs(0, 5).coalesce(1).write.parquet(extExtra) // has n_chars too
    val e1 = intercept[IllegalArgumentException](cat.addDataFiles("t", extExtra))
    assert(e1.getMessage.contains("n_chars") &&
      e1.getMessage.contains("not a column"))

    val extType = freshDir("exttype")
    docs(0, 5).select(col("doc_id").cast("int").as("doc_id"), col("lang"))
      .coalesce(1).write.parquet(extType)
    val e2 = intercept[IllegalArgumentException](cat.addDataFiles("t", extType))
    assert(e2.getMessage.contains("doc_id") && e2.getMessage.contains("INT"))

    val extMissing = freshDir("extmissing")
    docs(0, 5).select("lang").coalesce(1).write.parquet(extMissing)
    val e3 = intercept[IllegalArgumentException](cat.addDataFiles("t", extMissing))
    assert(e3.getMessage.contains("doc_id") && e3.getMessage.contains("non-nullable"))

    assert(cat.scan("t").count() == 0L, "no failed import may commit")
  }

  test("a missing NULLABLE table column imports and reads as NULL") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema) // all nullable here
    val ext = freshDir("extnull")
    docs(0, 10).select("doc_id", "lang").coalesce(1).write.parquet(ext)
    cat.addDataFiles("t", ext)
    val out = cat.scan("t")
    assert(out.count() == 10L)
    assert(out.where(col("n_chars").isNull).count() == 10L)
  }

  test("files inside the catalog root refuse") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    val owned = cat.filesOf(cat.snapshotMeta("t", cat.snapshotIdOf("t").get)).head.path
    val e = intercept[IllegalArgumentException](
      cat.addDataFiles("t", new org.apache.hadoop.fs.Path(owned).getParent.toString))
    assert(e.getMessage.contains("catalog root"))
  }

  test("rename interplay: import refuses after rename; rename refuses after import; rewrite clears both") {
    val cat = freshCat()
    val ext = freshDir("extren")
    docs(0, 10).coalesce(1).write.parquet(ext)

    // rename first -> import refuses until a full rewrite
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(10, 20))
    cat.renameColumn("t", "n_chars", "chars")
    val e1 = intercept[IllegalArgumentException](cat.addDataFiles("t", ext))
    assert(e1.getMessage.contains("pre-rename"))
    cat.compactDataFiles("t")
    // rewrite stamped current names everywhere — but file columns must
    // match the TABLE schema, so import the renamed shape
    val extRen = freshDir("extren2")
    docs(0, 10).withColumnRenamed("n_chars", "chars").coalesce(1).write.parquet(extRen)
    cat.addDataFiles("t", extRen)
    assert(ids(cat.scan("t")) == (0L until 20L))

    // import first -> rename refuses until a full rewrite
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.addDataFiles("t", ext)
    val e2 = intercept[IllegalArgumentException](
      cat2.renameColumn("t", "n_chars", "chars"))
    assert(e2.getMessage.contains("no field ids"))
    cat2.compactDataFiles("t")
    cat2.renameColumn("t", "n_chars", "chars")
    assert(cat2.scan("t").where(col("chars").isNotNull).count() == 10L)
  }

  test("CHECK constraints validate imported rows before commit, by name") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.setTableProperties("t", Map(
      BranchCatalog.ConstraintPrefix + "chars_pos" -> "n_chars >= 0"))
    val bad = freshDir("extbad")
    docs(0, 10).withColumn("n_chars",
        when(col("doc_id") === 3L, lit(-5L)).otherwise(col("n_chars")))
      .coalesce(1).write.parquet(bad)
    val e = intercept[Exception](cat.addDataFiles("t", bad))
    assert(e.getMessage.contains("chars_pos"))
    assert(cat.scan("t").count() == 0L, "violating import must commit nothing")
    // clean files pass the same gate
    val good = freshDir("extgood")
    docs(0, 10).coalesce(1).write.parquet(good)
    cat.addDataFiles("t", good)
    assert(cat.scan("t").count() == 10L)
  }

  test("hidden partitioning: homogeneous files get PROVEN transform values and prune; mixed files stay unproven and are always scanned") {
    val cat = freshCat()
    val schema = docs(0, 1).schema
    cat.createTableIfNotExists("tp", schema, "main",
      Seq(IdentityPartition("lang"): PartitionSpec))
    // two single-lang files + one mixed file
    val langs = Tables.documents(spark, sfDir).select("lang").distinct()
      .collect().map(_.getString(0)).sorted.take(2)
    val (la, lb) = (langs(0), langs(1))
    val extA = freshDir("extpvA")
    docs(0, 5000).where(col("lang") === la).coalesce(1).write.parquet(extA)
    val extB = freshDir("extpvB")
    docs(0, 5000).where(col("lang") === lb).coalesce(1).write.parquet(extB)
    val extMix = freshDir("extpvM")
    docs(0, 5000).where(col("lang").isin(la, lb)).coalesce(1).write.parquet(extMix)

    val rA = cat.addDataFiles("tp", extA)
    val rB = cat.addDataFiles("tp", extB)
    val rM = cat.addDataFiles("tp", extMix)
    assert(rA.filesPartitionValued == rA.filesAdded, "single-lang file must prove its pv")
    assert(rB.filesPartitionValued == rB.filesAdded)
    assert(rM.filesPartitionValued == 0L, "mixed file must NOT claim a pv")

    val expect = docs(0, 5000).where(col("lang") === la).count() * 2
    assert(cat.scan("tp", filter = Some(col("lang") === la)).count() == expect)
    // pruning: the la-filter scan must read the la file + the unproven
    // mixed file, but never the lb file
    val planned = cat.plannedFilesOfSnapshot("tp", cat.snapshotIdOf("tp").get,
      Some(col("lang") === la)).map(_._1)
    assert(planned.exists(_.contains(extA)))
    assert(planned.exists(_.contains(extMix)), "unproven file must always be scanned")
    assert(!planned.exists(_.contains(extB)), "proven other-value file must prune")
  }

  test("bucket transform: equal raw bounds prove, a range never does") {
    val cat = freshCat()
    cat.createTableIfNotExists("tb", docs(0, 1).schema, "main",
      Seq(BucketPartition(8, "doc_id"): PartitionSpec))
    val one = freshDir("extbkt1")
    docs(7, 8).coalesce(1).write.parquet(one) // single doc_id value
    val many = freshDir("extbktN")
    docs(0, 7).coalesce(1).write.parquet(many) // a RANGE hashes to many buckets
    assert(cat.addDataFiles("tb", one).filesPartitionValued == 1L)
    assert(cat.addDataFiles("tb", many).filesPartitionValued == 0L,
      "equal-bounds rule: a doc_id range proves nothing about bucket values")
    assert(ids(cat.scan("tb")) == (0L until 8L))
  }

  test("imported manifests demote to statsV=1: pruned but never served as exact aggregates; compaction restores exactness") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    val sid0 = cat.snapshotIdOf("t").get
    assert(cat.metaAggregate("t", sid0,
      Seq(MetaAgg.MinCol("doc_id"), MetaAgg.MaxCol("doc_id"))).isDefined,
      "graft-written manifests serve exact MIN/MAX")

    val ext = freshDir("extstats")
    docs(50, 80).coalesce(1).write.parquet(ext)
    cat.addDataFiles("t", ext)
    val sid1 = cat.snapshotIdOf("t").get
    val snap1 = cat.snapshotMeta("t", sid1)
    assert(snap1.manifests.exists(_.statsV == 1), "imported manifest demoted")
    assert(cat.metaAggregate("t", sid1,
      Seq(MetaAgg.MinCol("doc_id"))).isEmpty,
      "possibly-truncated foreign bounds must never serve exact MIN/MAX")
    assert(cat.metaAggregate("t", sid1, Seq(MetaAgg.CountStar))
      .contains(Seq(80L)), "row counts are exact at any statsV")
    // bounds still PRUNE (conservative direction is sound)
    assert(cat.plannedFilesOfSnapshot("t", sid1, Some(col("doc_id") < lit(10L)))
      .map(_._1).forall(!_.contains(ext)),
      "imported file excluded by its own bounds")

    cat.compactDataFiles("t")
    val sid2 = cat.snapshotIdOf("t").get
    assert(cat.snapshotMeta("t", sid2).manifests.forall(_.statsV == 2))
    assert(cat.metaAggregate("t", sid2,
      Seq(MetaAgg.MinCol("doc_id"), MetaAgg.MaxCol("doc_id")))
      .contains(Seq(0L, 79L)), "rewrite restores exact serving")
  }

  test("snapshotTable adopts an external directory as a new table in one call: schema from one footer, files in place, failure leaves nothing") {
    val cat = freshCat()
    val ext = freshDir("extsnap")
    docs(0, 40).repartition(2).write.parquet(ext)
    val res = cat.snapshotTable("adopted", ext)
    assert(res.rowsAdded == 40L)
    assert(ids(cat.scan("adopted")) == (0L until 40L))
    val snap = cat.snapshotMeta("adopted", cat.snapshotIdOf("adopted").get)
    assert(cat.filesOf(snap).forall(_.path.contains(ext)), "no byte copied")
    // schema inferred from the footer matches what Spark wrote
    assert(cat.scan("adopted").schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "n_chars"))
    // the adopted table is fully governed: branch + DML + time travel
    cat.createBranch("fix", "main")
    cat.deleteWhere("adopted", col("doc_id") < 5, "fix")
    assert(cat.scan("adopted", "fix").count() == 35L)
    assert(cat.scan("adopted").count() == 40L)

    // an existing table refuses; a failing adoption leaves NO table
    intercept[IllegalArgumentException](cat.snapshotTable("adopted", ext))
    val extBad = freshDir("extsnapbad")
    docs(0, 5).coalesce(1).write.parquet(extBad)
    cat.createTableIfNotExists("t2", docs(0, 1).schema)
    cat.append("t2", docs(0, 10))
    val owned = cat.filesOf(cat.snapshotMeta("t2", cat.snapshotIdOf("t2").get)).head.path
    intercept[Exception](cat.snapshotTable("bad",
      new org.apache.hadoop.fs.Path(owned).getParent.toString)) // catalog root
    assert(!cat.tableExists("bad"), "failed adoption must drop the created shell")
  }

  test("publish refuses to merge one side's rename residue with the other side's id-less imports") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    cat.createBranch("imp")
    val ext = freshDir("extpub")
    docs(10, 20).coalesce(1).write.parquet(ext)
    cat.addDataFiles("t", ext, branch = "imp") // imp: id-less files
    cat.renameColumn("t", "n_chars", "chars") // main: pre-rename files
    val e = intercept[IllegalStateException](cat.merge("imp"))
    assert(e.getMessage.contains("compactDataFiles"))
    // rewriting the destination clears its residue; the merge then lands
    cat.compactDataFiles("t")
    // imp still carries the old column name; its import must survive the
    // merge under name resolution against the WINNING (renamed) schema —
    // refusing that combination too is acceptable, but the plain case
    // (no residue on main) must merge:
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 10))
    cat2.createBranch("imp")
    cat2.addDataFiles("t", ext, branch = "imp")
    cat2.merge("imp")
    assert(ids(cat2.scan("t")) == (0L until 20L))
    assert(cat2.snapshotMeta("t", cat2.snapshotIdOf("t").get).evo.idlessFiles)
  }
}
