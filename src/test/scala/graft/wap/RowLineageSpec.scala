package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** W73 — row lineage (Iceberg v3 row tracking): every row of an enabled
  * table has a STABLE `_row_id` and a `_last_updated_seq`, decoded per
  * file as physical-column-wins / NULL-falls-back-to(manifest base +
  * row position, manifest seq). Ids are assigned from a GLOBAL per-table
  * counter in the refs document ([[Refs.rowIds]]), so ranges are unique
  * across branches and publish carries ids verbatim. Rewrites (compaction,
  * CoW DML) MATERIALIZE carried rows' ids into their outputs. */
class RowLineageSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"rowlin$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  /** doc_id -> (_row_id, _last_updated_seq) of the current lineage scan. */
  private def lineageMap(cat: BranchCatalog, t: String,
      branch: String = "main"): Map[Long, (Long, Long)] =
    cat.scanLineage(t, branch).select("doc_id", "_row_id", "_last_updated_seq")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("enable assigns a dense id space over existing rows; appends extend it disjointly") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    // five manifests: decode takes the DISTRIBUTED manifest-entry path
    // (driver loop only below the small-table cutoff)
    (0 until 5).foreach(i => cat.append("t", docs(i * 40L, i * 40L + 40L)))
    cat.enableRowLineage("t")
    val m1 = lineageMap(cat, "t")
    assert(m1.size == 200)
    val ids1 = m1.values.map(_._1).toSeq.sorted
    assert(ids1 == (0L until 200L)) // enable numbers existing rows 0..n-1 in manifest order
    // a later append allocates ABOVE the high-water mark
    cat.append("t", docs(200, 250))
    val m2 = lineageMap(cat, "t")
    assert(m2.size == 250)
    assert(m1.forall { case (k, v) => m2(k) == v }) // old rows untouched
    val fresh = m2.keySet.diff(m1.keySet).map(m2(_)._1)
    assert(fresh.forall(_ >= 200L) && fresh.size == 50)
    // the id space never collides even though ops interleave
    assert(m2.values.map(_._1).toSeq.distinct.size == 250)
  }

  test("ids survive plain, sorted and z-order compaction byte-for-byte") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    (0 until 4).foreach(i => cat.append("t", docs(i * 50L, i * 50L + 50L)))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")
    cat.compactDataFiles("t", targetFiles = 2)
    assert(lineageMap(cat, "t") == before)
    cat.compactDataFilesSorted("t", clusterBy = Seq("doc_id"), targetFiles = 2)
    assert(lineageMap(cat, "t") == before)
    cat.compactDataFilesZOrder("t", zorderBy = Seq("doc_id", "n_chars"), targetFiles = 2)
    assert(lineageMap(cat, "t") == before)
  }

  test("CoW delete keeps survivor ids; CoW update keeps ids and bumps only hit rows' seq") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.append("t", docs(100, 200))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")

    cat.deleteWhere("t", col("n_chars") % 7 === 0)
    val afterDel = lineageMap(cat, "t")
    assert(afterDel.keySet ==
      before.keySet.filterNot(k => docsChars7(k)))
    assert(afterDel.forall { case (k, v) => before(k) == v }) // ids AND seq carried

    val upd = cat.updateWhere("t", col("doc_id") < 20L,
      Map("lang" -> lit("xx")))
    val afterUpd = lineageMap(cat, "t")
    assert(afterUpd.keySet == afterDel.keySet)
    afterUpd.foreach { case (k, (id, seq)) =>
      assert(id == afterDel(k)._1) // UPDATE never moves a row id
      if (k < 20L) assert(seq == upd.snapshot.seq)
      else assert(seq == afterDel(k)._2)
    }
  }

  private lazy val chars7: Set[Long] =
    docs(0, 200).filter(col("n_chars") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  private def docsChars7(k: Long): Boolean = chars7.contains(k)

  test("positional deletes suppress without moving ids; compaction materializes them") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")
    cat.deleteWherePositional("t", col("n_chars") % 5 === 0)
    val marked = docs(0, 100).filter(col("n_chars") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val afterPos = lineageMap(cat, "t")
    assert(afterPos.keySet == before.keySet.diff(marked))
    assert(afterPos.forall { case (k, v) => before(k) == v })
    cat.compactDataFiles("t") // materializes the sidecars
    assert(lineageMap(cat, "t") == afterPos)
  }

  test("branch ids survive publish verbatim even when main advanced concurrently") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    cat.createBranch("audit")
    // RACING allocations: branch and main both append after the fork —
    // the global counter gives them disjoint ranges
    cat.append("t", docs(100, 150), branch = "audit")
    cat.append("t", docs(150, 170))
    val branchIds = lineageMap(cat, "t", "audit")
    val mainIds = lineageMap(cat, "t")
    val branchNew = branchIds.filter(_._1 >= 100L).values.map(_._1).toSet
    val mainNew = mainIds.filter(_._1 >= 150L).values.map(_._1).toSet
    assert(branchNew.intersect(mainNew).isEmpty) // disjoint ranges
    cat.merge("audit")
    val merged = lineageMap(cat, "t")
    assert(merged.size == 170)
    // branch rows keep their EXACT pre-publish ids; main rows keep theirs
    branchIds.foreach { case (k, v) => assert(merged(k) == v) }
    mainIds.foreach { case (k, v) => assert(merged(k) == v) }
  }

  test("publishing a branch-side enablement lands lineage on main") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.createBranch("wap")
    cat.enableRowLineage("t", "wap")
    cat.append("t", docs(100, 130), branch = "wap")
    val branchView = lineageMap(cat, "t", "wap")
    cat.merge("wap")
    val merged = lineageMap(cat, "t") // would throw if lineage didn't publish
    assert(merged == branchView)
  }

  test("equality-tombstone MOR writes refuse on lineage tables; enable refuses on pending tombstones") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.enableRowLineage("t")
    import spark.implicits._
    val keys = Seq(1L, 2L).toDF("doc_id")
    val e1 = intercept[IllegalArgumentException](cat.deleteKeysMOR("t", keys))
    assert(e1.getMessage.contains("row lineage"))
    val e2 = intercept[IllegalArgumentException](
      cat.upsertKeysMOR("t", docs(0, 5), Seq("doc_id")))
    assert(e2.getMessage.contains("row lineage"))

    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 50))
    cat2.deleteKeysMOR("t", keys)
    val e3 = intercept[IllegalArgumentException](cat2.enableRowLineage("t"))
    assert(e3.getMessage.contains("tombstones"))
  }

  test("enable is idempotent and time travel decodes old snapshots' lineage") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    val s1 = cat.enableRowLineage("t")
    val s2 = cat.enableRowLineage("t")
    assert(s1.id == s2.id)
    val atEnable = cat.snapshotIdOf("t").get
    cat.append("t", docs(100, 150))
    cat.deleteWhere("t", col("doc_id") < 10L)
    // the enable-time snapshot still decodes its (pre-mutation) lineage
    val old = cat.scanLineageSnapshot("t", atEnable)
      .select("doc_id", "_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(old.size == 100)
    val now = lineageMap(cat, "t")
    old.filterNot(_._1 < 10L).foreach { case (k, id) => assert(now(k)._1 == id) }
  }

  test("positional UPDATE preserves row ids and bumps only hit rows' seq") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")
    val upd = cat.updateWherePositional("t", col("doc_id") < 30,
      Map("lang" -> lit("xx")))
    assert(upd.filesRewritten == 0L && upd.rowsUpdated == 30L)
    val after = lineageMap(cat, "t")
    assert(after.keySet == before.keySet)
    after.foreach { case (k, (id, seq)) =>
      assert(id == before(k)._1) // identity carried into the new version
      if (k < 30L) assert(seq == upd.snapshot.seq)
      else assert(seq == before(k)._2)
    }
    cat.compactDataFiles("t") // materialize: nothing moves
    assert(lineageMap(cat, "t") == after)
  }

  test("racing committers on different branches allocate disjoint ranges (retry restamps)") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 40))
    cat.enableRowLineage("t")
    (1 to 4).foreach(i => cat.createBranch(s"b$i"))
    // 4 branches × 3 appends racing through the SAME refs store: every
    // lost race must re-allocate from the winner's high-water mark
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = for (i <- 1 to 4) yield Future {
      val own = new BranchCatalog(spark, cat.root) // separate instances, like separate JVMs
      (0 until 3).foreach { j =>
        val lo = 40L + (i - 1) * 30L + j * 10L
        own.append("t", docs(lo, lo + 10L), branch = s"b$i")
      }
    }
    Await.result(Future.sequence(fs), 5.minutes)
    val perBranch = (1 to 4).map { i =>
      cat.scanLineage("t", s"b$i").filter(col("doc_id") >= 40L)
        .select("_row_id").collect().map(_.getLong(0)).toSet
    }
    perBranch.foreach(s => assert(s.size == 30))
    // pairwise disjoint: the refs-global counter never double-allocated
    for (a <- perBranch.indices; b <- perBranch.indices if a < b)
      assert(perBranch(a).intersect(perBranch(b)).isEmpty,
        s"branches b${a + 1} and b${b + 1} share row ids")
    assert(perBranch.flatten.toSet.size == 120)
  }

  test("SQL surface: CALL enable_row_lineage + t$lineage relation + tag time travel") {
    val root = Files.createTempDirectory("rowlinsql").toString
    val lake = "rowlin_" + root.replaceAll("[^a-zA-Z0-9]", "").takeRight(12)
    spark.conf.set(s"spark.sql.catalog.$lake",
      classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lake.root", root)
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    spark.sql(s"CALL $lake.system.enable_row_lineage('t')")
    val viaSql = spark.sql(
      s"SELECT doc_id, _row_id, _last_updated_seq FROM $lake.main.`t$$lineage`")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaSql == lineageMap(cat, "t"))
    // pushdown composes: a filtered projection over the lineage relation
    assert(spark.sql(
      s"SELECT count(*) FROM $lake.main.`t$$lineage` WHERE _row_id < 10").head.getLong(0) == 10L)
    // tags pin the lineage like any read
    cat.createTag("rel1")
    cat.deleteWhere("t", col("doc_id") < 50)
    assert(spark.sql(s"SELECT count(*) FROM $lake.rel1.`t$$lineage`").head.getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $lake.main.`t$$lineage`").head.getLong(0) == 50L)
  }

  test("lineage scan plan: pushed filters, pruned columns, broadcast decode, no shuffle") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    (0 until 5).foreach(i => cat.append("t", docs(i * 40L, i * 40L + 40L)))
    cat.enableRowLineage("t")
    val q = cat.scanLineage("t").filter(col("doc_id") < 100).select("doc_id", "_row_id")
    val fmt = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the predicate reaches the parquet scan
    assert(fmt.contains("LessThan(doc_id,100)"), s"filter not pushed:\n$fmt")
    // projection prunes THROUGH the decode: unreferenced data columns
    // never leave the reader (only the id + physical lineage + position)
    val readSchema = fmt.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("doc_id")).get
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"decode read more than the projection needs: $readSchema")
    assert(!readSchema.contains("__graft_last_seq"),
      s"unprojected lineage column not pruned: $readSchema")
    // decode is broadcast onto the scan — a lineage read never shuffles
    assert(fmt.contains("BroadcastHashJoin"), s"decode join not broadcast:\n$fmt")
    assert(!fmt.contains("ShuffleExchange") && !fmt.contains("Exchange hashpartitioning"),
      s"lineage scan introduced a shuffle:\n$fmt")
  }

  test("lineage composes with column rename and hidden partitioning") {
    // rename: ids decode across the rename (by-id file resolution)
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")
    cat.renameColumn("t", "n_chars", "len")
    val renamed = cat.scanLineage("t")
      .select(col("doc_id"), col("len"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(renamed == before.view.mapValues(_._1).toMap)

    // hidden partitioning: a bucket layout routes appends and rewrites;
    // ids survive the partitioned compaction byte-for-byte
    val cat2 = freshCat()
    cat2.createTableIfNotExists("p", docs(0, 1).schema)
    cat2.appendPartitioned("p", docs(0, 100), BucketPartition(4, "doc_id"))
    cat2.appendPartitioned("p", docs(100, 160), BucketPartition(4, "doc_id"))
    cat2.enableRowLineage("p")
    val pBefore = lineageMap(cat2, "p")
    cat2.compactDataFiles("p", targetFiles = 2)
    assert(lineageMap(cat2, "p") == pBefore)
    cat2.deleteWhere("p", col("doc_id") % 5 === 0)
    val pAfter = lineageMap(cat2, "p")
    assert(pAfter.keySet == pBefore.keySet.filterNot(_ % 5 == 0))
    assert(pAfter.forall { case (k, v) => pBefore(k) == v })
  }

  test("row-identified changelog pairs updates as pre/post images by _row_id") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    val a = cat.snapshotIdOf("t").get
    val ids = lineageMap(cat, "t")
    cat.updateWhere("t", col("doc_id") < 10, Map("lang" -> lit("xx")))
    cat.deleteWhere("t", col("doc_id") >= 10 && col("doc_id") < 20)
    cat.append("t", docs(100, 120))
    val b = cat.snapshotIdOf("t").get

    val cl = cat.scanChangelogLineage("t", a, b)
      .select("doc_id", "lang", "_row_id", "_change_type").collect()
    val byType = cl.groupBy(_.getString(3)).view.mapValues(_.toSeq).toMap
    // updates: one pre + one post per hit row, SAME id, old/new values
    val pres = byType("update_preimage").map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val posts = byType("update_postimage").map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(pres.keySet == (0L until 10L).toSet && posts.keySet == pres.keySet)
    (0L until 10L).foreach { d =>
      assert(pres(d)._2 == ids(d)._1 && posts(d)._2 == ids(d)._1) // identity pairs them
      assert(posts(d)._1 == "xx" && pres(d)._1 != "xx")
    }
    // deletes carry the departed rows' ids; inserts draw fresh ones
    assert(byType("delete").map(_.getLong(0)).toSet == (10L until 20L).toSet)
    assert(byType("delete").forall(r => r.getLong(2) == ids(r.getLong(0))._1))
    assert(byType("insert").map(_.getLong(0)).toSet == (100L until 120L).toSet)
    // rows carried byte-identical through the rewrites cancel entirely
    assert(cl.map(_.getLong(0)).toSet ==
      ((0L until 20L) ++ (100L until 120L)).toSet)
  }

  test("MERGE INTO carries target ids; inserted rows get fresh ones") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.enableRowLineage("t")
    val before = lineageMap(cat, "t")
    val source = docs(50, 150).withColumn("lang", lit("zz"))
    cat.mergeInto("t", source, Seq("doc_id"), Seq(
      MergeClause.MatchedUpdate(None, Map("lang" -> col("s.lang"))),
      MergeClause.NotMatchedInsert()))
    val after = lineageMap(cat, "t")
    assert(after.size == 150)
    // matched rows are UPDATES: id preserved
    (0L until 100L).filter(after.contains).foreach { k =>
      assert(after(k)._1 == before(k)._1)
    }
    // inserted rows get ids above every pre-merge id
    val maxBefore = before.values.map(_._1).max
    after.filter(_._1 >= 100L).values.foreach { case (id, _) =>
      assert(id > maxBefore)
    }
    assert(after.values.map(_._1).toSeq.distinct.size == 150)
  }
}
