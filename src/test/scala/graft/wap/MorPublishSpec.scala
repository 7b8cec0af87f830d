package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W78 — publishing branches with pending POSITION sidecars through the
  * 3-way merge: the WAP-with-merge-on-read cycle (cheap positional DML
  * on the branch, audit, publish) without a forced materialization.
  * Sound because sidecars name explicit unique file paths and carried
  * manifests keep their sequences; the guards refuse exactly the unsound
  * shapes — a rewrite on either side of files the other side's sidecars
  * reference, and EQUALITY tombstones (whose sequence-based key
  * suppression cannot cross diverged timelines). */
class MorPublishSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"morpub$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  test("positional delete on a branch publishes: main applies the sidecar, zero rewrites") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    val mainFiles = cat.filesOf(cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
      .copy(deleteManifests = Nil)).map(_.path).toSet
    cat.createBranch("wap")
    cat.deleteWherePositional("t", col("doc_id") % 4 === 1, branch = "wap")
    // target moved forward with an APPEND since the fork — still publishable
    cat.append("t", docs(100, 120))
    cat.merge("wap", "main")
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.deleteManifests.nonEmpty && head.deleteManifests.forall(_.posDelete))
    // no pre-existing data file was rewritten by the publish
    val after = cat.filesOf(head.copy(deleteManifests = Nil)).map(_.path).toSet
    assert(mainFiles.subsetOf(after))
    val got = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = docs(0, 120)
      .filter(col("doc_id") >= 100 || col("doc_id") % 4 =!= 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // the branch's audit-then-publish lifecycle ends clean: compaction on
    // main materializes the published sidecar
    cat.compactDataFiles("t")
    assert(cat.snapshotMeta("t", cat.snapshotIdOf("t").get).deleteManifests.isEmpty)
    assert(cat.scan("t").count() == want.size)
  }

  test("positional update on a branch publishes with row identity intact") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 80))
    cat.enableRowLineage("t")
    val idsBefore = cat.scanLineage("t").select("doc_id", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cat.createBranch("fix")
    cat.updateWherePositional("t", col("doc_id") < 10,
      Map("n_chars" -> lit(-1L)), branch = "fix")
    cat.merge("fix", "main")
    val out = cat.scanLineage("t").select("doc_id", "_row_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 80)
    assert(out.count(_._3 == -1L) == 10)
    for ((id, rid, _) <- out) assert(rid == idsBefore(id), "publish moved a row id")
  }

  test("both sides hold position sidecars over disjoint files: both apply after publish") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.createBranch("b")
    cat.deleteWherePositional("t", col("doc_id") === 7, branch = "b")
    // main's own positional delete since the fork (no rewrite on either side)
    cat.deleteWherePositional("t", col("doc_id") === 13)
    cat.merge("b", "main")
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.deleteManifests.size == 2)
    val ids = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(7L) && !ids.contains(13L))
    assert(ids.size == 48)
  }

  test("refusals: equality tombstones, and rewrites crossing pending sidecars") {
    // equality tombstone on the branch still refuses
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 40))
    cat.createBranch("b")
    cat.deleteKeysMOR("t", docs(0, 3).select("doc_id"), branch = "b")
    val e1 = intercept[IllegalStateException](cat.merge("b", "main"))
    assert(e1.getMessage.contains("EQUALITY"))

    // branch sidecars + target rewrote (compacted) since the fork: refuse
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 40))
    cat2.append("t", docs(40, 80))
    cat2.createBranch("b")
    cat2.deleteWherePositional("t", col("doc_id") === 5, branch = "b")
    cat2.compactDataFiles("t") // main rewrites every file
    val e2 = intercept[IllegalStateException](cat2.merge("b", "main"))
    assert(e2.getMessage.contains("rebase"))

    // target sidecars + branch rewrote since the fork: refuse
    val cat3 = freshCat()
    cat3.createTableIfNotExists("t", docs(0, 1).schema)
    cat3.append("t", docs(0, 40))
    cat3.createBranch("b")
    cat3.compactDataFiles("t", branch = "b")
    cat3.deleteWherePositional("t", col("doc_id") === 5) // on main
    val e3 = intercept[IllegalStateException](cat3.merge("b", "main"))
    assert(e3.getMessage.contains("rebase"))
  }
}
