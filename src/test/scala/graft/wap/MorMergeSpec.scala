package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W77 — merge-on-read MERGE ([[BranchCatalog.mergeIntoMOR]]):
  * [[BranchCatalog.mergeInto]]'s semantics with the position-sidecar
  * write shape. Matched updates/deletes suppress old versions via a
  * (file, row-index) sidecar; updated versions and inserts append as new
  * files — one commit, zero data files rewritten, every prior manifest
  * carried by reference. Completes the merge-on-read DML triangle
  * (DELETE = W55, UPDATE = W74, MERGE = this). */
class MorMergeSpec extends SparkSpecBase {
  import MergeClause._

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"mormerge$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def dataPaths(cat: BranchCatalog, t: String): Set[String] = {
    val id = cat.snapshotIdOf(t).get
    cat.filesOf(cat.snapshotMeta(t, id).copy(deleteManifests = Nil)).map(_.path).toSet
  }

  test("MOR merge: update + delete + insert in one commit, zero files rewritten") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 40))
    cat.append("t", docs(40, 80))
    cat.append("t", docs(100, 140)) // outside source keys: never read
    val before = dataPaths(cat, "t")

    // source overlaps 20..59 (matched) and brings 80..89 (not matched)
    val source = docs(20, 60).union(docs(80, 90))
    val res = cat.mergeIntoMOR("t", source, Seq("doc_id"), Seq(
      MatchedUpdate(Some(col("s.doc_id") % 2 === 0),
        Map("n_chars" -> (col("t.n_chars") + lit(1000L)))),
      MatchedDelete(Some(col("s.doc_id") % 3 === 0)),
      NotMatchedInsert(Some(col("s.doc_id") < 85))))

    assert(res.rowsUpdated == 20) // matched evens 20,22,..,58
    assert(res.rowsDeleted == 7)  // matched odd multiples of 3: 21,27,..,57
    assert(res.rowsInserted == 5) // 80..84
    assert(res.filesRewritten == 0L)
    // every pre-merge data file survives verbatim; only NEW files appended
    val after = dataPaths(cat, "t")
    assert(before.subsetOf(after))
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(snap.op == "merge-pos")
    assert(snap.deleteManifests.size == 1 && snap.deleteManifests.head.posDelete)

    val out = cat.scan("t")
    assert(out.count() == 120 - 7 + 5)
    // the winning clause transformed exactly its rows, visible ONCE
    val updated = out.filter(col("doc_id") >= 20 && col("doc_id") < 60 && col("doc_id") % 2 === 0)
    assert(updated.count() == 20)
    val origSum = docs(20, 60).filter(col("doc_id") % 2 === 0)
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(updated.agg(sum(col("n_chars"))).head.getLong(0) == origSum + 20 * 1000L)
    assert(out.filter(col("doc_id") === 21L).count() == 0, "delete clause fired")
    assert(out.filter(col("doc_id") === 23L).count() == 1, "unclaimed matched row survives in place")
    assert(out.filter(col("doc_id") === 87L).count() == 0, "conditional insert filtered")
    assert(out.filter(col("doc_id") === 24L).count() == 1, "first-match-wins: update beat delete")
    // time travel: the parent snapshot still shows pre-merge content
    val parent = snap.parentId.get
    assert(cat.scanSnapshot("t", parent).count() == 120)
  }

  test("stacked MOR DML: versions a prior sidecar suppressed never match again") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    // positionally delete 10..19, then merge a source covering 0..29:
    // 10..19 must be NOT MATCHED (their old versions are suppressed)
    cat.deleteWherePositional("t", col("doc_id") >= 10 && col("doc_id") < 20)
    val res = cat.mergeIntoMOR("t", docs(0, 30), Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("n_chars" -> lit(-5L))),
      NotMatchedInsert(None)))
    assert(res.rowsUpdated == 20)  // 0..9 and 20..29
    assert(res.rowsInserted == 10) // 10..19 re-enter as inserts
    val out = cat.scan("t")
    assert(out.count() == 50)
    assert(out.filter(col("n_chars") === -5L).count() == 20)
    // re-inserted rows carry the SOURCE values, not -5
    assert(out.filter(col("doc_id") >= 10 && col("doc_id") < 20 && col("n_chars") >= 0).count() == 10)
  }

  test("row lineage: updates keep their row ids, inserts mint fresh ones") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 40))
    cat.enableRowLineage("t")
    val idsBefore = cat.scanLineage("t").select("doc_id", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cat.mergeIntoMOR("t", docs(20, 50), Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("n_chars" -> lit(7L))),
      NotMatchedInsert(None)))
    val after = cat.scanLineage("t").select("doc_id", "_row_id", "_last_updated_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.length == 50)
    // an update never moves a row's identity
    for ((id, rid, _) <- after if id < 40) assert(rid == idsBefore(id))
    // inserts allocate above the existing id space, disjointly
    val freshIds = after.collect { case (id, rid, _) if id >= 40 => rid }
    assert(freshIds.toSet.size == 10)
    assert(freshIds.forall(r => !idsBefore.values.toSet.contains(r)))
    // updated rows advanced their last-updated sequence; untouched didn't
    val seqOf = after.map(t => t._1 -> t._3).toMap
    assert(seqOf(25L) > seqOf(5L))
  }

  test("compaction materializes the merge sidecar; content is unchanged") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 60))
    cat.mergeIntoMOR("t", docs(30, 70), Seq("doc_id"), Seq(
      MatchedDelete(Some(col("s.doc_id") % 5 === 0)),
      MatchedUpdate(None, Map("lang" -> lit("xx"))),
      NotMatchedInsert(None)))
    val want = cat.scan("t").orderBy("doc_id").collect().toSeq
    cat.compactDataFiles("t")
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(snap.deleteManifests.isEmpty)
    assert(cat.scan("t").orderBy("doc_id").collect().toSeq == want)
  }

  test("refusals: by-source clauses and pending equality tombstones") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 30))
    val e1 = intercept[IllegalArgumentException] {
      cat.mergeIntoMOR("t", docs(0, 10), Seq("doc_id"),
        Seq(NotMatchedBySourceDelete(None)))
    }
    assert(e1.getMessage.contains("NOT MATCHED BY SOURCE"))
    // an equality tombstone (MOR key delete) blocks positional merges
    cat.deleteKeysMOR("t", docs(0, 5).select("doc_id"))
    val e2 = intercept[IllegalArgumentException] {
      cat.mergeIntoMOR("t", docs(0, 10), Seq("doc_id"),
        Seq(MatchedUpdate(None, Map("n_chars" -> lit(1L)))))
    }
    assert(e2.getMessage.contains("EQUALITY tombstones"))
  }

  test("no-op merges commit nothing") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 20))
    val id0 = cat.snapshotIdOf("t").get
    // empty source
    val r1 = cat.mergeIntoMOR("t", docs(0, 20).limit(0), Seq("doc_id"),
      Seq(MatchedDelete(None)))
    assert(r1.rowsDeleted == 0 && cat.snapshotIdOf("t").get == id0)
    // source with no matches and no insert clause
    val r2 = cat.mergeIntoMOR("t", docs(500, 510), Seq("doc_id"),
      Seq(MatchedDelete(None)))
    assert(r2.rowsDeleted == 0 && cat.snapshotIdOf("t").get == id0)
  }
}
