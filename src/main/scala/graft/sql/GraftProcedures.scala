package graft.sql

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.wap.BranchCatalog

/** Maintenance as SQL procedures (the Iceberg system-procedure
  * analogue), under the reserved `system` namespace of a
  * [[GraftTableCatalog]]:
  *
  * {{{
  *   CALL lake.system.expire_snapshots('events')
  *   CALL lake.system.rewrite_data_files('events', 'main', 8, 'ts')
  *   CALL lake.system.rewrite_manifests('events', 'main')
  * }}}
  *
  * `rewrite_data_files` with a non-empty `cluster_by` column list runs
  * the sort-clustered rewrite (tight per-file ranges for pruning);
  * empty runs the plain small-file compaction. `analyze_table` computes
  * NDV column stats (its `incremental` variant folds per-manifest HLL
  * sketches, scanning only manifests sketched for the first time);
  * `build_bloom_index` writes per-file bloom sidecars for equality/IN
  * pruning on unclustered columns. The six maintenance procedures are
  * CONTENT-PRESERVING — they commit new metadata but never change what
  * a scan returns — so they run on any branch, main included: the
  * write-audit-publish guard protects content, and maintenance is not a
  * content write (same stance as Iceberg running procedures on main).
  * `publish` is the one content-CHANGING procedure and the SQL face of
  * the reference's whole contract: it merges a branch into main ONLY
  * after the branch delta passes its declared audit.
  */
object GraftProcedures {

  val namespace: Array[String] = Array("system")

  def names: Seq[String] =
    Seq("expire_snapshots", "rewrite_data_files", "rewrite_manifests",
      "rewrite_small_files", "maintain", "maintain_all",
      "analyze_table", "analyze_table_incremental", "ensure_sum_stats",
      "build_bloom_index",
      "publish", "create_tag", "drop_tag", "clone_table",
      "rollback_table", "cherrypick_snapshot", "remove_orphan_files",
      "export_snapshot", "export_changes", "rewrite_partitioned",
      "add_partition_field", "drop_partition_field", "add_files", "snapshot_table", "rewrite_position_deletes", "expire_tags",
      "create_mview", "refresh_mview", "drop_mview",
      "build_vector_index", "refresh_vector_index", "drop_vector_index", "export_vector_index",
      "build_dedup_index", "refresh_dedup_index", "drop_dedup_index", "export_dedup_index",
      "create_changelog_view", "enable_row_lineage", "convert_equality_deletes",
      "begin_transaction", "stage_append", "stage_delete_keys",
      "commit_transaction", "abort_transaction", "expire_branches")

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  def load(root: String, name: String): UnboundProcedure = name match {
    case "expire_snapshots" =>
      // retain_last keeps that many newest ancestors of each branch head
      // for time travel; older_than_ms (epoch millis; 0 = no age gate)
      // exempts everything committed at or after it
      procedure(root, name, Array(
        param("table", StringType),
        param("retain_last", IntegerType, "1"),
        param("older_than_ms", LongType, "0"))) { (cat, args) =>
        val cut = args.getLong(2)
        cat.expireSnapshots(args.getString(0), retainLast = args.getInt(1),
          olderThanMillis = if (cut > 0) Some(cut) else None)
        ()
      }
    case "rewrite_small_files" =>
      // the BIN_PACK strategy: fold ONLY under-target files, leaving
      // well-sized files untouched — O(small files), never O(table)
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"),
        param("target_bytes", LongType, (128L * 1024 * 1024).toString),
        param("min_input_files", IntegerType, "2"))) { (cat, args) =>
        cat.compactSmallFiles(args.getString(0), args.getString(1),
          args.getLong(2), args.getInt(3))
        ()
      }
    case "maintain" =>
      // policy-driven maintenance: run exactly what the table's
      // graft.maintain.* properties and current state warrant
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        GraftMaintenance.run(SparkSession.active, cat,
          args.getString(0), args.getString(1))
        ()
      }
    case "maintain_all" =>
      // tags_max_age_ms > 0 folds lake-level tag retention (expire_tags)
      // into the sweep; 0 (default) skips it
      procedure(root, name, Array(
        param("branch", StringType, "'main'"),
        param("tags_max_age_ms", LongType, "0"))) { (cat, args) =>
        GraftMaintenance.runAll(SparkSession.active, cat, args.getString(0))
        val maxAge = args.getLong(1)
        if (maxAge > 0) { cat.expireTags(maxAge); () }
      }
    case "rewrite_data_files" =>
      // `where` scopes the rewrite to the files the predicate admits
      // (stats/transform/bloom pruning) — compact yesterday's hot
      // partition in O(affected files); empty = whole table
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"),
        param("target_files", IntegerType, "4"),
        param("cluster_by", StringType, "''"),
        param("where", StringType, "''"),
        param("zorder_by", StringType, "''"))) { (cat, args) =>
        val (table, branch) = (args.getString(0), args.getString(1))
        val target = args.getInt(2)
        val cluster = args.getString(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val where = args.getString(4).trim
        val zorder = args.getString(5).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(cluster.isEmpty || zorder.isEmpty,
          "cluster_by (range sort) and zorder_by (Morton interleave) are " +
            "alternative layouts — declare one")
        if (where.nonEmpty) {
          require(cluster.isEmpty && zorder.isEmpty,
            "cluster_by/zorder_by and where do not compose: a scoped rewrite " +
              "keeps the untouched files' layout, so a global order cannot be claimed")
          cat.compactDataFilesWhere(table,
            org.apache.spark.sql.functions.expr(where), branch, target)
        }
        else if (zorder.nonEmpty) cat.compactDataFilesZOrder(table, zorder, branch, target)
        else if (cluster.isEmpty) cat.compactDataFiles(table, branch, target)
        else cat.compactDataFilesSorted(table, cluster, branch, target)
        ()
      }
    case "analyze_table" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"),
        param("columns", StringType, "''"))) { (cat, args) =>
        cat.analyzeTable(args.getString(0), args.getString(1),
          args.getString(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        ()
      }
    case "analyze_table_incremental" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"),
        param("columns", StringType, "''"))) { (cat, args) =>
        cat.analyzeTableIncremental(args.getString(0), args.getString(1),
          args.getString(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        ()
      }
    case "ensure_sum_stats" =>
      // W80: per-file column-sum sidecars, one job per manifest lacking
      // one — what metadata-only SUM/AVG (global and grouped) serve from
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"),
        param("columns", StringType, "''"))) { (cat, args) =>
        cat.ensureSumStats(args.getString(0), args.getString(1),
          args.getString(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        ()
      }
    case "rewrite_manifests" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.compactManifests(args.getString(0), args.getString(1)); ()
      }
    case "build_bloom_index" =>
      // per-file bloom filters for equality/IN pruning on unclustered
      // columns (content-preserving metadata, like the other procedures)
      procedure(root, name, Array(
        param("table", StringType),
        param("column", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.buildBloomIndex(args.getString(0), args.getString(1), args.getString(2)); ()
      }
    case "publish" =>
      // the ONE content-changing procedure, and it keeps the reference's
      // contract: the branch's delta must PASS the declared audit before
      // it merges into main — which closes the SQL-only WAP cycle:
      //   CREATE NAMESPACE lake.wip;
      //   INSERT INTO lake.wip.t SELECT ...;
      //   CALL lake.system.publish('t', 'wip', 'not_null:text');
      // A failed audit THROWS with the violation summary and leaves the
      // branch for inspection (the CALL is the alert); an empty check
      // list is refused — an unaudited merge is what write.main guards
      // against. `full_table` re-audits the whole branch table instead
      // of the fork delta; `drop_branch` defaults FALSE (the namespace
      // may stage other tables).
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType),
        param("checks", StringType),
        param("full_table", org.apache.spark.sql.types.BooleanType, "false"),
        param("drop_branch", org.apache.spark.sql.types.BooleanType, "false"))) { (cat, args) =>
        val checks = GraftStreamingWrite.parseChecks(Some(args.getString(2)))
        require(checks.nonEmpty,
          "publish with no checks is an unaudited merge: declare at least one " +
            "(e.g. 'not_null:<col>'), or use the Scala Wap API for custom suites")
        val scope =
          if (args.getBoolean(3)) graft.wap.AuditScope.FullTable
          else graft.wap.AuditScope.Delta
        val res = graft.wap.Wap.auditAndPublish(
          cat, args.getString(0), args.getString(1), checks, Seq.empty, scope,
          graft.wap.LogAlerter, dropBranchOnPublish = args.getBoolean(4))
        if (!res.published) throw new IllegalStateException(
          s"audit FAILED for ${args.getString(0)}@${args.getString(1)} — " +
            "nothing published, branch left for inspection: " +
            res.report.checks.filterNot(_.passed)
              .map(c => s"${c.name} (${c.violations} violations)").mkString(", "))
      }
    case "create_tag" =>
      // freeze the branch's current table map as an IMMUTABLE named ref
      // (metadata-only): readable as a namespace (`SELECT ... FROM
      // <cat>.<tag>.t`) or by `VERSION AS OF '<tag>'`, pinned against
      // snapshot expiry until dropped
      procedure(root, name, Array(
        param("tag", StringType),
        param("from", StringType, "'main'"))) { (cat, args) =>
        cat.createTag(args.getString(0), args.getString(1))
      }
    case "drop_tag" =>
      procedure(root, name, Array(param("tag", StringType))) { (cat, args) =>
        cat.dropTag(args.getString(0))
      }
    case "clone_table" =>
      // zero-copy SHALLOW CLONE (one refs commit, no file IO): dst points
      // at src's current (or as_of) snapshot and shares its directory;
      // lineages diverge freely and GC is sharer-aware (BranchCatalog
      // .cloneTable)
      procedure(root, name, Array(
        param("src", StringType),
        param("dst", StringType),
        param("branch", StringType, "'main'"),
        param("as_of", StringType, "''"))) { (cat, args) =>
        val asOf = args.getString(3)
        cat.cloneTable(args.getString(0), args.getString(1), args.getString(2),
          if (asOf.isEmpty) None else Some(asOf))
        ()
      }
    case "remove_orphan_files" =>
      // crashed-write residue: files under the table's data dir that NO
      // snapshot references. older_than_ms is the safety fence against
      // deleting a write in flight (0 = the 3-day default)
      procedure(root, name, Array(
        param("table", StringType),
        param("older_than_ms", LongType, "0"))) { (cat, args) =>
        val cut = args.getLong(1)
        if (cut > 0) cat.removeOrphanFiles(args.getString(0), cut)
        else cat.removeOrphanFiles(args.getString(0))
        ()
      }
    case "rewrite_partitioned" =>
      // partition evolution by rewrite (W24 through SQL): relay the
      // table's CURRENT content into a new hidden-partition layout —
      // `days(ts)` -> `bucket(32, id)` as one content-preserving commit
      procedure(root, name, Array(
        param("table", StringType),
        param("spec", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.rewritePartitioned(args.getString(0),
          graft.wap.PartitionSpec.parseMulti(args.getString(1)), args.getString(2))
        ()
      }
    case "add_partition_field" =>
      // METADATA-ONLY partition evolution (Iceberg ADD PARTITION FIELD):
      // one commit, zero data movement — old files keep their written
      // layout and prune under it; new writes carry the new field
      procedure(root, name, Array(
        param("table", StringType),
        param("spec", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.addPartitionField(args.getString(0),
          graft.wap.PartitionSpec.parse(args.getString(1)), args.getString(2))
        ()
      }
    case "drop_partition_field" =>
      // METADATA-ONLY drop: the field stops routing writes but stays in
      // the registry, so files written under it keep pruning
      procedure(root, name, Array(
        param("table", StringType),
        param("field", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.dropPartitionField(args.getString(0), args.getString(1),
          args.getString(2))
        ()
      }
    case "expire_branches" =>
      // fully-merged stale-branch cleanup (identical to main AND older
      // than the fence — provably redundant, never data-bearing)
      procedure(root, name, Array(
        param("older_than_ms", LongType))) { (cat, args) =>
        cat.expireBranches(args.getLong(0))
        ()
      }
    case "begin_transaction" =>
      // multi-table atomic transactions through SQL (W35's handle form —
      // Nessie multi-table commit semantics): begin names a handle,
      // stage_* write against it, commit is ONE refs swap for every
      // staged table; abort publishes nothing
      procedure(root, name, Array(
        param("txn", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.beginTransaction(args.getString(0), args.getString(1))
      }
    case "stage_append" =>
      // `source` is any table/view the session resolves (temp views
      // included) — the staged rows align to the target's schema exactly
      // like a direct append, but stay invisible until commit
      procedure(root, name, Array(
        param("txn", StringType),
        param("table", StringType),
        param("source", StringType))) { (cat, args) =>
        cat.stageAppend(args.getString(0), args.getString(1),
          SparkSession.active.table(args.getString(2)))
      }
    case "stage_delete_keys" =>
      procedure(root, name, Array(
        param("txn", StringType),
        param("table", StringType),
        param("source", StringType))) { (cat, args) =>
        cat.stageDeleteKeys(args.getString(0), args.getString(1),
          SparkSession.active.table(args.getString(2)))
      }
    case "commit_transaction" =>
      procedure(root, name, Array(
        param("txn", StringType))) { (cat, args) =>
        cat.commitTransaction(args.getString(0))
        ()
      }
    case "abort_transaction" =>
      procedure(root, name, Array(
        param("txn", StringType))) { (cat, args) =>
        cat.abortTransaction(args.getString(0))
      }
    case "add_files" =>
      // metadata-only parquet import (W82 — Iceberg add_files): adopt
      // foreign parquet in place; one distributed footer pass, one commit
      procedure(root, name, Array(
        param("table", StringType),
        param("location", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.addDataFiles(args.getString(0), args.getString(1), args.getString(2))
        ()
      }
    case "rewrite_position_deletes" =>
      // fold all pending position sidecars into one generation: dedup
      // re-marked positions, drop dangling ones, one coverage epoch —
      // bounded MoR read amplification without materializing
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.compactPositionDeletes(args.getString(0), args.getString(1))
        ()
      }
    case "expire_tags" =>
      // age-based tag retention (Iceberg max-ref-age-ms): tags older
      // than max_age_ms drop; their pinned snapshots become reclaimable
      // by the next expire_snapshots run
      procedure(root, name, Array(
        param("max_age_ms", LongType))) { (cat, args) =>
        cat.expireTags(args.getLong(0))
        ()
      }
    case "snapshot_table" =>
      // one-call adoption (Iceberg snapshot/migrate): infer the schema
      // from one footer, create the table, register the files in place
      procedure(root, name, Array(
        param("table", StringType),
        param("location", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.snapshotTable(args.getString(0), args.getString(1), args.getString(2))
        ()
      }
    case "export_snapshot" =>
      // the reference's core premise through SQL alone: emit the
      // engine-neutral export (manifest.json with per-file pruning
      // stats, ready-to-run view.sql, files.parquet) a foreign engine
      // reads from metadata — W37's surface, zero Scala
      procedure(root, name, Array(
        param("table", StringType),
        param("dest", StringType),
        param("branch", StringType, "'main'"),
        param("snapshot_id", StringType, "''"))) { (cat, args) =>
        val snap = Option(args.getString(3)).map(_.trim).filter(_.nonEmpty)
        cat.exportSnapshot(args.getString(0), args.getString(1), args.getString(2), snap)
        ()
      }
    case "export_changes" =>
      // W66 — the incremental companion: export a snapshot WINDOW's
      // changes (transaction-form zero-copy file legs, or net=true to
      // materialize the W62 net changelog) for a consumer catching up
      procedure(root, name, Array(
        param("table", StringType),
        param("from_snapshot", StringType),
        param("dest", StringType),
        param("to_snapshot", StringType, "''"),
        param("branch", StringType, "'main'"),
        param("net", org.apache.spark.sql.types.BooleanType, "false"))) { (cat, args) =>
        val to = Option(args.getString(3)).map(_.trim).filter(_.nonEmpty)
          .getOrElse(cat.snapshotIdOf(args.getString(0), args.getString(4))
            .getOrElse(sys.error(s"no table ${args.getString(0)}")))
        cat.exportChanges(args.getString(0), args.getString(1), to,
          args.getString(2), args.getBoolean(5))
        ()
      }
    case "rollback_table" =>
      // move a branch head back to an ANCESTOR snapshot (metadata-only;
      // non-ancestors refuse — history is never grafted)
      procedure(root, name, Array(
        param("table", StringType),
        param("snapshot_id", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.rollbackTo(args.getString(0), args.getString(1), args.getString(2))
      }
    case "cherrypick_snapshot" =>
      // replay one append commit's manifest delta onto another branch
      // (Iceberg's WAP publish primitive) — metadata-only, idempotent;
      // rewrite/compaction snapshots refuse (those need merge()). A
      // cherry-pick INTO MAIN is a publish, so it keeps the WAP
      // contract: the delta must pass a declared audit first (same rule
      // as CALL publish — an empty check list refuses).
      procedure(root, name, Array(
        param("table", StringType),
        param("snapshot_id", StringType),
        param("into", StringType, "'main'"),
        param("checks", StringType, "''"))) { (cat, args) =>
        val (table, snapId, into) = (args.getString(0), args.getString(1), args.getString(2))
        val checks = GraftStreamingWrite.parseChecks(Some(args.getString(3)))
        if (into == "main") {
          require(checks.nonEmpty,
            "cherrypick_snapshot into main is a publish: declare audit checks " +
              "(e.g. 'not_null:<col>'), or cherry-pick onto a branch and CALL publish")
        }
        if (checks.nonEmpty) {
          val parent = cat.snapshotMeta(table, snapId).parentId.getOrElse(
            sys.error(s"$snapId has no parent — cherry-pick replays a commit's delta"))
          val report = graft.quality.Audit.run(
            cat.scanChangesBetween(table, parent, snapId), checks)
          if (!report.passed) throw new IllegalStateException(
            s"audit FAILED for cherry-pick of $snapId — nothing published: " +
              report.checks.filterNot(_.passed)
                .map(c => s"${c.name} (${c.violations} violations)").mkString(", "))
        }
        cat.cherrypickSnapshot(table, snapId, into)
        ()
      }
    case "convert_equality_deletes" =>
      // the Iceberg v2→v3 migration: pending equality tombstones become
      // position sidecars in one commit, zero data files rewritten —
      // un-gates row lineage, CDC feeds and scoped compaction on MOR
      // tables without a forced full rewrite
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.convertTombstonesToPositional(args.getString(0), args.getString(1))
        ()
      }
    case "enable_row_lineage" =>
      // W73: one O(manifests) metadata commit; every later commit
      // allocates `_row_id` ranges from the global refs counter. Read
      // the lineage with `t$lineage` (extension sessions) or the Scala
      // scanLineage. Idempotent.
      procedure(root, name, Array(
        param("table", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        cat.enableRowLineage(args.getString(0), args.getString(1))
        ()
      }
    case "create_mview" =>
      // materialized view = a plain branch table + its definition and
      // source-snapshot watermarks in table properties; refresh_mview
      // advances it, incrementally when the plan shape allows (W56)
      procedure(root, name, Array(
        param("name", StringType),
        param("query", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        GraftMaterializedViews.create(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2))
      }
    case "refresh_mview" =>
      procedure(root, name, Array(
        param("name", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        GraftMaterializedViews.refresh(SparkSession.active, cat,
          args.getString(0), args.getString(1))
        ()
      }
    case "drop_mview" =>
      procedure(root, name, Array(
        param("name", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        GraftMaterializedViews.drop(cat, args.getString(0), args.getString(1))
      }
    case "build_vector_index" =>
      // persisted IVF-PQ index over an embedding column: three lake
      // tables + watermark properties (graft.operators.VectorIndex);
      // refresh_vector_index advances it, encoding only appended
      // vectors on append-only windows
      procedure(root, name, Array(
        param("table", StringType),
        param("id_col", StringType),
        param("vec_col", StringType),
        param("branch", StringType, "'main'"),
        param("centroids", IntegerType, "64"),
        param("m", IntegerType, "8"),
        param("ksub", IntegerType, "16"))) { (cat, args) =>
        graft.operators.VectorIndex.build(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2),
          graft.operators.VectorIndex.Params(
            centroids = args.getInt(4), m = args.getInt(5), ksub = args.getInt(6)),
          args.getString(3))
      }
    case "refresh_vector_index" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("vec_col", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.VectorIndex.refresh(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2))
        ()
      }
    case "drop_vector_index" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("vec_col", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.VectorIndex.drop(cat, args.getString(0), args.getString(1),
          args.getString(2))
      }
    case "export_vector_index" =>
      // foreign-engine export of the persisted index: the three index
      // tables + the covered corpus snapshot each as a snapshot export,
      // plus index-manifest.json and a ready-to-run ann.sql (IVF route +
      // exact cosine re-rank any list-capable SQL engine executes)
      procedure(root, name, Array(
        param("table", StringType),
        param("vec_col", StringType),
        param("dest", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.VectorIndex.exportIndex(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2),
          args.getString(3))
        ()
      }
    case "build_dedup_index" =>
      // persisted MinHash-LSH dedup index over a text column: banded
      // signatures as a lake table + watermark properties
      // (graft.operators.DedupIndex); refresh_dedup_index signs only
      // appended docs on append-only windows
      procedure(root, name, Array(
        param("table", StringType),
        param("id_col", StringType),
        param("text_col", StringType),
        param("branch", StringType, "'main'"),
        param("num_hashes", IntegerType, "128"),
        param("bands", IntegerType, "16"),
        param("threshold", StringType, "'0.8'"))) { (cat, args) =>
        graft.operators.DedupIndex.build(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2),
          graft.operators.DedupIndex.Params(
            numHashes = args.getInt(4), bands = args.getInt(5),
            threshold = args.getString(6).toDouble),
          args.getString(3))
      }
    case "refresh_dedup_index" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("text_col", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.DedupIndex.refresh(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2))
        ()
      }
    case "drop_dedup_index" =>
      procedure(root, name, Array(
        param("table", StringType),
        param("text_col", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.DedupIndex.drop(cat, args.getString(0), args.getString(1),
          args.getString(2))
      }
    case "export_dedup_index" =>
      // foreign-engine export of the persisted dedup index: bands table +
      // covered corpus as snapshot exports, plus index-manifest.json and
      // a ready-to-run candidates.sql (banded-LSH bucket self-join)
      procedure(root, name, Array(
        param("table", StringType),
        param("text_col", StringType),
        param("dest", StringType),
        param("branch", StringType, "'main'"))) { (cat, args) =>
        graft.operators.DedupIndex.exportIndex(SparkSession.active, cat,
          args.getString(0), args.getString(1), args.getString(2),
          args.getString(3))
        ()
      }
    case "create_changelog_view" =>
      // the Iceberg create_changelog_view analogue: registers a session
      // TEMP VIEW over BranchCatalog.scanChangelog's net row-level diff
      // (_change_type insert/delete) of the snapshot window. With
      // `with_row_ids => true` (W75, needs row lineage) the view is the
      // ROW-IDENTIFIED feed instead: update_preimage/update_postimage
      // pairs sharing a `_row_id` — Iceberg's own procedure flag of the
      // same name, served from W73 lineage.
      procedure(root, name, Array(
        param("view", StringType),
        param("table", StringType),
        param("from_snapshot", StringType),
        param("to_snapshot", StringType, "''"),
        param("with_row_ids", org.apache.spark.sql.types.BooleanType, "false"))) { (cat, args) =>
        val toId = args.getString(3) match {
          case "" => cat.snapshotIdOf(args.getString(1)).getOrElse(
            sys.error(s"no table ${args.getString(1)} on main"))
          case id => id
        }
        val df =
          if (args.getBoolean(4))
            cat.scanChangelogLineage(args.getString(1), args.getString(2), toId)
          else cat.scanChangelog(args.getString(1), args.getString(2), toId)
        df.createOrReplaceTempView(args.getString(0))
      }
    case other =>
      throw new UnsupportedOperationException(
        s"no procedure system.$other (have: ${names.mkString(", ")})")
  }

  private def procedure(root: String, procName: String, params: Array[ProcedureParameter])(
      body: (BranchCatalog, InternalRow) => Unit): UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance procedure $procName"
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): util.Iterator[Scan] = {
        body(new BranchCatalog(SparkSession.active, root), input)
        util.Collections.emptyIterator[Scan]()
      }
    }
  }
}
