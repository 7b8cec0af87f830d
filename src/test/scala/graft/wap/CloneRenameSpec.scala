package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** Table RENAME (read path over the [[Refs.tableDirs]] directory alias)
  * and zero-copy CLONE ([[BranchCatalog.cloneTable]], the Delta SHALLOW
  * CLONE analogue). Both ride the same substrate: a table's physical
  * directory is fixed at CREATE (absolute paths are embedded in
  * snapshots/manifests), names alias onto directories, and expiry /
  * orphan GC operate per DIRECTORY with liveness drawn from every
  * sharing name. */
class CloneRenameSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"clonern$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def dataPaths(cat: BranchCatalog, t: String): Set[String] = {
    val id = cat.snapshotIdOf(t).get
    cat.filesOf(cat.snapshotMeta(t, id)).map(_.path).toSet
  }

  test("renamed table stays fully readable and writable; the directory never moves") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    val preId = cat.snapshotIdOf("t").get
    val before = dataPaths(cat, "t")

    cat.renameTable("t", "t2")
    assert(!cat.tableExists("t") && cat.tableExists("t2"))
    // reads resolve through the dir alias — this is the path that was
    // broken when rename was a bare pointer swap
    assert(ids(cat.scan("t2")) == (0L until 100L))
    assert(dataPaths(cat, "t2") == before, "rename must not move or rewrite files")

    // writes land in the original directory; lineage continues
    cat.append("t2", docs(100, 150))
    assert(ids(cat.scan("t2")) == (0L until 150L))
    assert(before.subsetOf(dataPaths(cat, "t2")))
    // time travel through the rename
    assert(cat.scanSnapshot("t2", preId).count() == 100L)
  }

  test("rename survives expiry and orphan removal under the new name") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.append("t", docs(50, 100))
    cat.renameTable("t", "t2")
    cat.deleteWhere("t2", col("doc_id") < 50) // retires the first file
    val r = cat.expireSnapshots("t2")
    assert(r.snapshotsDeleted > 0, "pre-rename history must be expirable under the new name")
    assert(r.dataFilesDeleted > 0, "the rewritten-away file must be reclaimed")
    assert(ids(cat.scan("t2")) == (50L until 100L))
    val orph = cat.removeOrphanFiles("t2", olderThanMillis = System.currentTimeMillis() + 1000)
    assert(orph.filesDeleted == 0, "no live file may be treated as orphan after a rename")
    assert(ids(cat.scan("t2")) == (50L until 100L))
  }

  test("a fresh table under a retired directory name gets its own directory") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.renameTable("t", "t2")
    // "t" the NAME is free, but "t" the DIRECTORY belongs to t2's lineage
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(100, 120))
    assert(ids(cat.scan("t")) == (100L until 120L))
    assert(ids(cat.scan("t2")) == (0L until 50L))
    assert(dataPaths(cat, "t").intersect(dataPaths(cat, "t2")).isEmpty,
      "the recreated table must not share the renamed lineage's directory")
    // t2's expiry can never see (or reclaim) the new t's files
    cat.append("t2", docs(50, 60))
    cat.expireSnapshots("t2")
    assert(ids(cat.scan("t")) == (100L until 120L))
  }

  test("clone is one refs commit: zero file writes, shared head, shared history") {
    val cat = freshCat()
    cat.createTableIfNotExists("src", docs(0, 1).schema)
    cat.append("src", docs(0, 80))
    val preId = cat.snapshotIdOf("src").get
    cat.append("src", docs(80, 120))

    cat.cloneTable("src", "dst")
    assert(cat.snapshotIdOf("dst") == cat.snapshotIdOf("src"),
      "clone shares the head snapshot file itself")
    assert(ids(cat.scan("dst")) == (0L until 120L))
    assert(dataPaths(cat, "dst") == dataPaths(cat, "src"))
    // full pre-clone history is reachable under the clone's name
    assert(cat.scanSnapshot("dst", preId).count() == 80L)

    // as-of clone pins a historical snapshot
    cat.cloneTable("src", "dst2", asOf = Some(preId))
    assert(ids(cat.scan("dst2")) == (0L until 80L))
  }

  test("cloned lineages diverge independently; GC on either side is clone-safe") {
    val cat = freshCat()
    cat.createTableIfNotExists("src", docs(0, 1).schema)
    cat.append("src", docs(0, 50))
    cat.append("src", docs(50, 100))
    cat.cloneTable("src", "dst")

    cat.append("dst", docs(100, 130))
    cat.deleteWhere("src", col("doc_id") < 50)
    assert(ids(cat.scan("src")) == (50L until 100L))
    assert(ids(cat.scan("dst")) == (0L until 130L))

    // src's expiry must keep every file dst still references — including
    // the first file src itself just rewrote away
    val r = cat.expireSnapshots("src")
    assert(r.dataFilesDeleted == 0,
      s"expiry reclaimed ${r.dataFilesDeleted} files a clone still references")
    assert(ids(cat.scan("dst")) == (0L until 130L))
    assert(ids(cat.scan("src")) == (50L until 100L))
    // orphan removal on either name sees the shared directory whole
    val o = cat.removeOrphanFiles("src",
      olderThanMillis = System.currentTimeMillis() + 1000)
    assert(o.filesDeleted == 0)
    assert(ids(cat.scan("dst")) == (0L until 130L))

    // dropping the clone releases its pins: src's expiry now reclaims
    // both the rewritten-away file and the clone's divergent commits
    cat.dropTable("dst")
    val r2 = cat.expireSnapshots("src")
    assert(r2.dataFilesDeleted > 0,
      "dropping the last sharer must make its history reclaimable")
    assert(ids(cat.scan("src")) == (50L until 100L))
  }

  test("clone copies properties except the per-source index artifacts") {
    val cat = freshCat()
    cat.createTableIfNotExists("src", docs(0, 1).schema)
    cat.append("src", docs(0, 20))
    cat.setTableProperties("src", Map(
      "team" -> "pipeline-a", "graft.vecidx.embedding.snapshot" -> "abc",
      "graft.dedupidx.text.snapshot" -> "def"))
    cat.cloneTable("src", "dst")
    // BOTH index families drop: their artifact tables are named after the
    // source, so the clone's watermarks would point at tables it lacks
    assert(cat.tableProperties("dst") == Map("team" -> "pipeline-a"))
    // a name collision refuses (any branch or tag)
    cat.createBranch("b")
    val err = intercept[Exception](cat.cloneTable("src", "dst", branch = "b"))
    assert(err.getMessage.contains("exists"))
  }

  test("SQL: ALTER TABLE RENAME TO and CALL clone_table work end-to-end") {
    n += 1
    val name = s"clonelake$n"
    val root = Files.createTempDirectory("clone-sql").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 60))

    spark.sql(s"ALTER TABLE $name.main.t RENAME TO main.t2")
    assert(spark.sql(s"SELECT count(*) FROM $name.main.t2").head.getLong(0) == 60L)

    spark.sql(s"CALL $name.system.clone_table('t2', 'tcopy')")
    assert(spark.sql(s"SELECT count(*) FROM $name.main.tcopy").head.getLong(0) == 60L)
    assert(ids(cat.scan("tcopy")) == (0L until 60L))
  }
}
