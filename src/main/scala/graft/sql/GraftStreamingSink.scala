package graft.sql

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.{Bridge, ParquetStageWriterFactory}
import org.apache.spark.sql.types.StructType

import graft.quality.{Expect, NotNull, UniqueKey, ValueRange}
import graft.wap.{BranchCatalog, HttpWebhookAlerter, LogAlerter, Wap}

/** Audited streaming writes — `writeStream.toTable("lake.main.t")` as
  * the STANDARD API for the foreachBatch WAP contract
  * ([[graft.streaming.EventStreams.fileIngest]]'s library-call flow,
  * exposed through the connector):
  *
  * {{{
  *   df.writeStream
  *     .option("graft.wap", true)                     // route through Wap.run
  *     .option("graft.checks", "not_null:text")       // the audit suite
  *     .toTable("lake.main.events_log")
  * }}}
  *
  * Per micro-batch: executors stage rows as parquet (Spark's own writer,
  * so footers carry real stats), and the driver commit routes the staged
  * batch through [[Wap.run]] — fork an audit branch, append, audit,
  * publish to main on pass; on FAIL the batch stays quarantined on its
  * `stream-<table>-<epoch>` branch, the alerter fires, and the stream
  * continues (per-batch quarantine, the fileIngest contract). The RAW
  * sink refusal holds: `toTable` on main WITHOUT `graft.wap` is refused
  * up front — nothing reaches main unaudited. Branch targets stay raw
  * staging appends (audit-then-publish later), mirroring batch INSERT.
  *
  * Delivery is EXACTLY-ONCE into the catalog: the epoch id is recorded
  * in [[graft.wap.Refs.streamEpochs]] INSIDE the very refs swap that
  * publishes the batch (the WAP merge, or the branch-staging append) —
  * there is no window where data landed but the record didn't, or vice
  * versa. A replayed epoch (Spark re-delivers the last batch after any
  * crash) sees its id already recorded and discards its staged files; a
  * crash BEFORE the publishing commit left no data behind, so the replay
  * re-runs cleanly (dropping a half-built audit branch if one survived).
  * The one at-least-once residue is QUARANTINE: a failed audit's batch
  * publishes nothing to main, and its epoch is recorded in a separate
  * stamp-only commit after the alert — a crash between the two re-runs
  * the audit and re-quarantines the same content (main is never touched
  * twice either way). */
class GraftStreamingWrite(t: GraftTable, info: LogicalWriteInfo) extends StreamingWrite {

  private val schema: StructType = info.schema()
  private val options = info.options()
  private val wapMode = options.getBoolean("graft.wap", false)
  private val checks: Seq[Expect] =
    GraftStreamingWrite.parseChecks(Option(options.get("graft.checks")))
  /** `graft.upsert.keys=id[,col2]`: CDC mode — each micro-batch UPSERTS
    * by key through merge-on-read tombstones ([[BranchCatalog
    * .upsertKeysMOR]]: O(batch) per epoch at any table size, zero
    * rewrites) instead of appending. With `graft.wap` the batch is
    * audit-then-applied ([[Wap.runUpsertMOR]]): a failing batch
    * quarantines on its epoch branch and the stream continues, exactly
    * as for appends. Compact periodically to materialize tombstones. */
  private val upsertKeys: Seq[String] =
    Option(options.get("graft.upsert.keys")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  /** `graft.cdc.keys=id[,col2]`: CDC APPLY mode — the stream's rows are
    * a CHANGE FEED (base columns + `_change_type`, the W63 `t$changes`
    * shape) and each micro-batch applies atomically through
    * [[BranchCatalog.applyCdcMOR]] (deletes tombstone by key, inserts
    * append, one commit). This is the write side of lake-to-lake
    * replication: `readStream` a source's `t$changes`, `writeStream`
    * into the replica's `t$changes`. With `graft.wap` the insert rows
    * are audit-then-applied ([[Wap.runApplyCdc]]); a refused batch
    * quarantines whole — deletes included — in
    * `<table>__cdc_quarantine` on the epoch branch. */
  private val cdcKeys: Seq[String] =
    Option(options.get("graft.cdc.keys")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  /** `graft.cdc.evolve=true`: CDC applies follow SOURCE schema changes —
    * new feed columns ADD to the replica, widened types WIDEN (one
    * evolveSchema commit before the apply). A streaming query's own
    * schema is pinned at start, so this takes effect when the pipeline
    * restarts against the widened feed; batch `writeTo` applies it
    * immediately. */
  private val cdcEvolve: Boolean =
    Option(options.get("graft.cdc.evolve")).exists(_.trim.equalsIgnoreCase("true"))
  if (cdcEvolve && cdcKeys.isEmpty)
    throw new IllegalArgumentException(
      "graft.cdc.evolve applies to CDC feeds — set graft.cdc.keys too")
  /** `graft.evolve=true`: append/upsert/WAP batches evolve the table for
    * new/widened batch columns (Delta mergeSchema; through WAP the
    * branch evolves and the publish carries the schema via the 3-way
    * schema merge). Like [[cdcEvolve]], a RUNNING query's schema is
    * pinned — this takes effect when the stream restarts against the
    * widened source. */
  private val evolve: Boolean =
    Option(options.get("graft.evolve")).exists(_.trim.equalsIgnoreCase("true"))
  if (cdcKeys.nonEmpty && upsertKeys.nonEmpty)
    throw new IllegalArgumentException(
      "graft.cdc.keys and graft.upsert.keys are mutually exclusive: a CDC " +
        "feed already distinguishes inserts from deletes")

  if (t.branch == "main" && !wapMode && !t.mainWritesAllowed)
    throw new IllegalArgumentException(
      s"raw streaming writes to ${t.tableName}@main are disabled: main only " +
        "changes through write-audit-publish — set .option(\"graft.wap\", true) " +
        "(with graft.checks) to publish audited batches, or target a branch " +
        "namespace and publish later")
  // graft.wap with ZERO checks would be a vacuous audit — an unaudited
  // path to main that the raw-sink refusal exists to close
  if (wapMode && checks.isEmpty && !t.mainWritesAllowed)
    throw new IllegalArgumentException(
      "graft.wap without graft.checks is an empty audit: declare at least one " +
        "check (e.g. graft.checks=not_null:<col>), or opt the catalog into raw " +
        "main writes with write.main=true")
  if (wapMode && t.branch != "main")
    throw new IllegalArgumentException(
      "graft.wap publishes audited batches to MAIN; target lake.main." +
        s"${t.tableName} (got branch ${t.branch})")

  private def spark = SparkSession.active
  private val stageDir = new Path(t.root, s"tables/${t.tableName}/stage-${info.queryId()}")

  override def createStreamingWriterFactory(p: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(
      Bridge.parquetStageWriterFactory(spark, schema), stageDir.toString)

  /** Delivery record key: queryIds are unique per stream lifetime, so
    * concurrent streams into the same table never share a record. */
  private def epochKey = s"${info.queryId()}/${t.branch}.${t.tableName}"

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = messages.collect { case GraftStagedFiles(fns) => fns }.flatten.toSeq
    val cat = new BranchCatalog(spark, t.root)
    val auditBranch = s"stream-${t.tableName}-$epochId"
    if (cat.streamEpochOf(epochKey).exists(_ >= epochId)) {
      // replayed epoch, already published/recorded atomically; a crash
      // between the stamped merge and dropBranch can leave the (already
      // merged, now empty-delta) audit branch behind — drop it ONLY if
      // its head equals main's (a QUARANTINE branch for this epoch also
      // carries the stamp, but holds unpublished rows the operator must
      // be able to inspect: never drop those)
      if (wapMode) {
        val refs = cat.currentRefs()
        val fullyMerged = (for {
          b <- refs.branches.get(auditBranch); m <- refs.branches.get("main")
        } yield b.tables.get(t.tableName) == m.tables.get(t.tableName)).getOrElse(false)
        if (fullyMerged) cat.dropBranch(auditBranch)
      }
      cleanup(fs, files)
      return
    }
    if (files.nonEmpty) {
      val batch = spark.read.schema(schema).parquet(files: _*)
      if (wapMode) {
        val alerter = Option(options.get("graft.alert.url"))
          .map(u => new HttpWebhookAlerter(Some(u))).getOrElse(LogAlerter)
        // a crash between Wap's branch fork and the publishing (stamped)
        // merge leaves the branch behind; the replay must start clean
        if (cat.listBranches().contains(auditBranch)) cat.dropBranch(auditBranch)
        val result =
          if (cdcKeys.nonEmpty)
            Wap.runApplyCdc(cat, t.tableName, batch, cdcKeys, checks,
              auditBranch, alerter, epochStamp = Some((epochKey, epochId)),
              schemaEvolution = cdcEvolve)
          else if (upsertKeys.nonEmpty)
            Wap.runUpsertMOR(cat, t.tableName, batch, upsertKeys, checks,
              auditBranch, alerter, epochStamp = Some((epochKey, epochId)),
              schemaEvolution = evolve)
          else Wap.run(cat, t.tableName, batch, checks, auditBranch, alerter,
            epochStamp = Some((epochKey, epochId)), schemaEvolution = evolve)
        // failed audit: nothing published — record the epoch in its own
        // commit so the quarantined batch is not re-delivered forever
        if (!result.published) cat.stampStreamEpoch(epochKey, epochId)
      } else if (cdcKeys.nonEmpty) {
        cat.applyCdcMOR(t.tableName, batch, cdcKeys, t.branch,
          Some((epochKey, epochId)), schemaEvolution = cdcEvolve)
        ()
      } else {
        cat.createTableIfNotExists(t.tableName, batch.schema, t.branch)
        if (upsertKeys.nonEmpty)
          cat.upsertKeysMOR(t.tableName, batch, upsertKeys, t.branch,
            Some((epochKey, epochId)), schemaEvolution = evolve)
        else cat.append(t.tableName, batch, t.branch, Some((epochKey, epochId)),
          schemaEvolution = evolve)
      }
    }
    cleanup(fs, files)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    cleanup(fs, messages.collect { case GraftStagedFiles(fns) => fns }.flatten.toSeq)
  }

  private def cleanup(fs: org.apache.hadoop.fs.FileSystem, files: Seq[String]): Unit =
    files.foreach { f =>
      try { fs.delete(new Path(f), false); () } catch { case _: Exception => () }
    }

  override def toString: String = s"GraftStreamingWrite(${t.branch}.${t.tableName})"
}

object GraftStreamingWrite {
  /** `graft.checks` syntax: comma-separated `not_null:<col>`,
    * `unique:<col>`, `value_range:<col>:<lo>:<hi>`. */
  private[sql] def parseChecks(spec: Option[String]): Seq[Expect] =
    spec.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":").map(_.trim) match {
        case Array("not_null", c) => NotNull(c)
        case Array("unique", c) => UniqueKey(c)
        case Array("value_range", c, lo, hi) => ValueRange(c, lo.toDouble, hi.toDouble)
        case _ => throw new IllegalArgumentException(
          s"bad graft.checks entry '$entry' (want not_null:<col>, unique:<col>, " +
            "or value_range:<col>:<lo>:<hi>)")
      }
    }
}

/** Staged file paths one write task produced. */
case class GraftStagedFiles(files: Seq[String]) extends WriterCommitMessage

private class GraftStreamingWriterFactory(
    writers: ParquetStageWriterFactory, stageDir: String)
  extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val path = s"$stageDir/epoch-$epochId-p$partitionId-t$taskId-" +
      s"${UUID.randomUUID().toString.take(8)}.parquet"
    new DataWriter[InternalRow] {
      private var writer: org.apache.spark.sql.graft.ParquetStageWriter = _
      override def write(row: InternalRow): Unit = {
        if (writer == null) writer = writers.create(path) // no empty files
        writer.write(row)
      }
      override def commit(): WriterCommitMessage = {
        if (writer == null) GraftStagedFiles(Nil)
        else { writer.close(); writer = null; GraftStagedFiles(Seq(path)) }
      }
      /** A failed/preempted task's partial file must not wait for a
        * commit message that will never carry it. */
      override def abort(): Unit = {
        close()
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(writers.hadoopConf).delete(p, false)
          ()
        } catch { case _: Exception => () }
      }
      override def close(): Unit =
        if (writer != null) { writer.close(); writer = null }
    }
  }
}
