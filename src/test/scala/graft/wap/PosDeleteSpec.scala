package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W55 — position-delete sidecars ([[BranchCatalog.deleteWherePositional]]):
  * merge-on-read DELETE by (file, row-index), the Iceberg v2 position
  * delete / Delta deletion-vector shape. An arbitrary-predicate delete
  * rewrites NO data files: provably-all-matching files drop metadata-only,
  * boundary files get tiny sidecars every scan suppresses until compaction
  * materializes them. */
class PosDeleteSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"posdel$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def dataPaths(cat: BranchCatalog, t: String): Set[String] = {
    val id = cat.snapshotIdOf(t).get
    cat.filesOf(cat.snapshotMeta(t, id)).map(_.path).toSet
  }

  test("positional delete suppresses matching rows without rewriting any data file") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.append("t", docs(100, 200))
    val before = dataPaths(cat, "t")
    val expectKept = docs(0, 200).filter(col("n_chars") % 7 =!= 0)

    val r = cat.deleteWherePositional("t", col("n_chars") % 7 === 0)
    assert(r.filesRewritten == 0L)
    val expected = docs(0, 200).filter(col("n_chars") % 7 === 0).count()
    assert(r.rowsDeleted == expected)
    // every surviving data file is an ORIGINAL file — nothing rewritten
    assert(dataPaths(cat, "t").subsetOf(before))
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(snap.deleteManifests.size == 1 && snap.deleteManifests.head.posDelete)

    val got = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted
    val want = expectKept.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("metadata tier drops provably-all-matching files without reading them") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))   // whole file: doc_id in [0,100)
    cat.append("t", docs(100, 200))
    // doc_id < 100 provably covers the first append's file(s) entirely
    val r = cat.deleteWherePositional("t", col("doc_id") < 100)
    assert(r.filesDropped >= 1L)
    assert(r.filesRewritten == 0L)
    assert(r.rowsDeleted == docs(0, 100).count())
    // no boundary rows -> no sidecar needed at all
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(snap.deleteManifests.isEmpty)
    assert(cat.scan("t").count() == docs(100, 200).count())
  }

  test("sequence semantics: rows re-appended after the delete stay visible") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.deleteWherePositional("t", col("doc_id") % 10 === 3)
    val readd = docs(0, 100).filter(col("doc_id") % 10 === 3)
    cat.append("t", readd)
    val cnt = cat.scan("t").filter(col("doc_id") % 10 === 3).count()
    assert(cnt == readd.count()) // exactly the re-appended copies
  }

  test("stacked positional deletes count only fresh positions") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 150))
    val r1 = cat.deleteWherePositional("t", col("doc_id") < 40)
    // overlapping predicate: [0,60) — only [40,60) is new
    val r2 = cat.deleteWherePositional("t", col("doc_id") < 60)
    assert(r1.rowsDeleted == docs(0, 40).count())
    assert(r2.rowsDeleted == docs(40, 60).count())
    assert(cat.scan("t").count() == docs(60, 150).count())
    // a fully-covered re-delete is a no-op commit
    val r3 = cat.deleteWherePositional("t", col("doc_id") < 50)
    assert(r3.rowsDeleted == 0L)
  }

  test("metadata drop after a sidecar counts only rows not already suppressed") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100)) // one append -> file(s) covering [0,100)
    val r1 = cat.deleteWherePositional("t", col("doc_id") < 30) // sidecar
    assert(r1.rowsDeleted == docs(0, 30).count())
    // widening predicate now covers the whole file -> metadata drop; the
    // 30 rows the pending sidecar already suppressed must not re-count
    val r2 = cat.deleteWherePositional("t", col("doc_id") < 100)
    assert(r2.filesDropped >= 1L)
    assert(r2.rowsDeleted == docs(30, 100).count())
    assert(cat.scan("t").count() == 0L)
  }

  test("compaction materializes sidecars; scan identical before and after") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.append("t", docs(100, 200))
    cat.deleteWherePositional("t", col("n_chars") % 5 === 1)
    val beforeRows = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    cat.compactDataFiles("t")
    val snap = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(snap.deleteManifests.isEmpty)
    val afterRows = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(afterRows == beforeRows)
  }

  test("one representation at a time: equality tombstones block positional and vice versa") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.deleteKeysMOR("t", docs(0, 5).select("doc_id"))
    val e1 = intercept[IllegalArgumentException](
      cat.deleteWherePositional("t", col("doc_id") === 50))
    assert(e1.getMessage.contains("EQUALITY tombstones"))
    cat.compactDataFiles("t")
    cat.deleteWherePositional("t", col("doc_id") === 50)
    // CoW DML refuses while sidecars pend (existing tombstone guard)
    val e2 = intercept[Exception](cat.deleteWhere("t", col("doc_id") === 60))
    assert(e2.getMessage.contains("pending MOR tombstones"))
  }

  test("time travel reads the pre-delete snapshot") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 100))
    cat.deleteWherePositional("t", col("doc_id") >= 50 && col("doc_id") < 100)
    assert(cat.scanSnapshot("t", s1.id).count() == docs(0, 100).count())
    assert(cat.scan("t").count() == docs(0, 50).count())
  }

  test("positional delete composes with a pushed filter on the scan") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 200))
    cat.deleteWherePositional("t", col("doc_id") % 3 === 0)
    val got = cat.scan("t", filter = Some(col("n_chars") > 400)).count()
    val want = docs(0, 200)
      .filter(col("doc_id") % 3 =!= 0 && col("n_chars") > 400).count()
    assert(got == want)
  }

  test("positional UPDATE appends new versions, suppresses old, rewrites nothing") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.append("t", docs(100, 200))
    val before = dataPaths(cat, "t")
    val r = cat.updateWherePositional("t", col("n_chars") % 7 === 0,
      Map("n_chars" -> (col("n_chars") + lit(10000L))))
    assert(r.filesRewritten == 0L)
    val hit = docs(0, 200).filter(col("n_chars") % 7 === 0).count()
    assert(r.rowsUpdated == hit)
    assert(before.subsetOf(dataPaths(cat, "t"))) // originals untouched, versions appended
    val gotSum = cat.scan("t").agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val wantSum = docs(0, 200).agg(sum(col("n_chars"))).collect()(0).getLong(0) + 10000L * hit
    assert(cat.scan("t").count() == 200)
    assert(gotSum == wantSum)
  }

  test("stacked positional updates: later commits win, compaction materializes") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.updateWherePositional("t", col("doc_id") < 50, Map("lang" -> lit("aa")))
    val r2 = cat.updateWherePositional("t", col("doc_id") < 20, Map("lang" -> lit("bb")))
    assert(r2.rowsUpdated == 20L) // marks the CURRENT versions, not the suppressed ones
    def langs() = cat.scan("t").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val l1 = langs()
    assert(l1.getOrElse("bb", 0L) == 20L && l1.getOrElse("aa", 0L) == 30L)
    assert(cat.scan("t").count() == 100)
    val compacted = cat.compactDataFiles("t")
    assert(compacted.deleteManifests.isEmpty)
    assert(langs() == l1 && cat.scan("t").count() == 100)
  }

  test("equality tombstones convert to position sidecars: zero rewrites, exact visibility") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    import spark.implicits._
    // stacked delete / re-append history: key 5 deleted, re-appended
    // (visible again), key 7 deleted twice across generations
    cat.deleteKeysMOR("t", Seq(5L, 7L, 9L).toDF("doc_id"))
    cat.append("t", docs(5, 6)) // re-appended 5: visible
    cat.deleteKeysMOR("t", Seq(7L, 11L).toDF("doc_id"))
    val before = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted
    val filesBefore = dataPaths(cat, "t")

    val converted = cat.convertTombstonesToPositional("t")
    assert(converted.deleteManifests.nonEmpty &&
      converted.deleteManifests.forall(_.posDelete),
      "conversion must leave only position sidecars")
    assert(dataPaths(cat, "t") == filesBefore, "conversion must not touch data files")
    val after = cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted
    assert(after.toSeq == before.toSeq, "conversion changed visibility")
    assert(after.count(_ == 5L) == 1 && !after.contains(7L) &&
      !after.contains(9L) && !after.contains(11L))

    // the converted table un-gates lineage WITHOUT any rewrite
    cat.enableRowLineage("t")
    val ids = cat.scanLineage("t").select("doc_id", "_row_id").collect()
    assert(ids.length == after.length)
    assert(ids.map(_.getLong(1)).distinct.length == ids.length)

    // a mixed stack (pos sidecar already pending) converts the equality
    // part only and keeps the sidecar pending
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 50))
    cat2.deleteWherePositional("t", col("doc_id") < 5)
    cat2.deleteKeysMOR("t", Seq(10L).toDF("doc_id"))
    val c2 = cat2.convertTombstonesToPositional("t")
    assert(c2.deleteManifests.size == 2 && c2.deleteManifests.forall(_.posDelete))
    assert(cat2.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (5L until 50L).filterNot(_ == 10L))
  }

  test("positional update refuses pending equality tombstones") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    import spark.implicits._
    cat.deleteKeysMOR("t", Seq(1L).toDF("doc_id"))
    val e = intercept[IllegalArgumentException](
      cat.updateWherePositional("t", col("doc_id") < 5, Map("lang" -> lit("xx"))))
    assert(e.getMessage.contains("EQUALITY"))
  }

  test("compactPositionDeletes folds generations to ONE epoch: same scan, deduped positions, dangling dropped, no data rewrite") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.append("t", docs(100, 200))
    // three sidecar generations + one metadata-only full-file drop
    cat.deleteWherePositional("t", col("n_chars") % 7 === 0)
    cat.deleteWherePositional("t", col("n_chars") % 5 === 0)
    cat.deleteWherePositional("t", col("doc_id") >= 100) // drops file 2 meta-only
    val before = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(before.deleteManifests.size >= 2, "need several generations to fold")
    val dataBefore = dataPaths(cat, "t")
    val expect = docs(0, 100)
      .filter(col("n_chars") % 7 =!= 0 && col("n_chars") % 5 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    val snap = cat.compactPositionDeletes("t")
    assert(snap.op == "compact-pos-deletes")
    assert(snap.deleteManifests.size == 1, "ONE coverage epoch after the fold")
    assert(dataPaths(cat, "t") == dataBefore, "no data file rewritten")
    assert(cat.scan("t").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == expect, "scan identical through the fold")
    // folded sidecars hold each surviving position ONCE and no dangling
    // positions for the metadata-dropped file
    val sidecars = cat.filesOf(snap.copy(manifests = snap.deleteManifests))
    val pos = spark.read.schema(BranchCatalog.posDeleteSchema)
      .parquet(sidecars.map(_.path): _*)
    assert(pos.count() == pos.dropDuplicates("__graft_path", "__graft_pos").count())
    val liveBare = dataPaths(cat, "t").map(_.replaceFirst("^file:/{1,2}", "/"))
    assert(pos.select("__graft_path").distinct().collect().map(_.getString(0))
      .forall(p => liveBare.contains(p.replaceFirst("^file:/{1,2}", "/"))),
      "dangling positions must be dropped")
    // sequence soundness: rows appended AFTER the fold stay visible
    cat.append("t", docs(100, 120))
    assert(cat.scan("t").count() == expect.size + 20L)
    // writes keep working on the folded table; a second fold is a no-op
    cat.deleteWherePositional("t", col("doc_id") === expect.head)
    assert(cat.scan("t").count() == expect.size + 19L)
    val again = cat.compactPositionDeletes("t")
    assert(again.deleteManifests.size == 1)
    // equality tombstones refuse
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 50))
    import spark.implicits._
    cat2.deleteKeysMOR("t", Seq(1L).toDF("doc_id"))
    val e2 = intercept[IllegalArgumentException](cat2.compactPositionDeletes("t"))
    assert(e2.getMessage.contains("EQUALITY"))
  }
}
