package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.quality.Expect
import graft.wap.{Alerter, BranchCatalog, LogAlerter, Wap}

/** One event for sessionization: minimal typed shape (callers project
  * their event table into it). */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

private[streaming] case class SessionState(
    startMicros: Long, endMicros: Long, n: Long, sum: Double)

/** An emitted session: closed either by a later event past the gap or by
  * event-time timeout once the watermark passes end + gap. */
case class SessionOut(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, sum_value: Double)

/** Structured Streaming surface (SURVEY §2.8) — the reference's
  * event-driven trigger model re-expressed Spark-first. The reference
  * wires an S3 bucket notification to a lambda that runs the WAP cycle on
  * each arriving file (serverless/app.py:235-257 lambda_handler;
  * serverless.yml s3 event). Here the same contract is a file-source
  * stream: each micro-batch of newly-arrived files runs write->audit->
  * publish through [[graft.wap.Wap]], so a bad batch quarantines on its
  * branch and alerts without ever touching main.
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * (exactly-once per file, like the reference's event-delivery dedupe);
  * each micro-batch is a normal distributed job — no driver-side row
  * handling. Windowed aggregation carries a watermark so state is bounded;
  * sessionization keeps one small state row per active key and expires it
  * by event-time timeout.
  */
object EventStreams {

  /** File-arrival-triggered WAP ingest: watch `dropDir` for new parquet
    * files; every micro-batch is appended to `table` on an isolated
    * branch, audited there, and published to main only when the checks
    * pass (otherwise: branch kept for inspection + alert — the
    * reference's exact failure path). Branch names embed the batch id, so
    * a restart that replays a batch reuses (drops + recreates) its branch
    * rather than colliding. */
  def fileIngest(
      spark: SparkSession,
      dropDir: String,
      schema: StructType,
      catalog: BranchCatalog,
      table: String,
      checks: Seq[Expect],
      checkpointDir: String,
      alerter: Alerter = LogAlerter,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Option[Int] = None,
      /** Cross-table publish gates (drift vs published history, FK
        * integrity vs dimensions) — evaluated per micro-batch through
        * [[graft.wap.Wap.run]] like the expectation suite. */
      crossChecks: Seq[graft.quality.CrossCheck] = Seq.empty,
      /** CDC mode: when set, each micro-batch UPSERTS on these key
        * columns through [[graft.wap.Wap.runUpsert]] — re-delivered or
        * corrected records replace their earlier versions instead of
        * appending duplicates. */
      upsertKeys: Option[Seq[String]] = None,
      /** With `upsertKeys`: apply batches merge-on-read
        * ([[graft.wap.Wap.runUpsertMOR]] — audit-then-apply, one
        * tombstones+append commit, ZERO file rewrites per micro-batch;
        * O(batch) at any table size where copy-on-write pays a rewrite
        * of every file holding a batch key). `compactEvery` maintenance
        * then also MATERIALIZES accumulated tombstones, bounding the
        * scan's epoch count. */
      morUpsert: Boolean = false,
      /** Ingest-time NEAR-DUP gate (r16): the column name of a
        * [[graft.operators.DedupIndex]] built on `table` — each
        * micro-batch is filtered through `dedupNew` BEFORE the WAP run
        * (drops docs near-duplicating the committed corpus or an earlier
        * doc of the same batch; O(batch) via the persisted banded index,
        * never a corpus self-join), and after each publish the index
        * advances incrementally so the batch's survivors gate the NEXT
        * batch. Build the table + index before starting the stream. */
      nearDupText: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dropDir)
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: Dataset[Row], batchId: Long) =>
        // the gated batch pins its survivor set once: the dedup plan is a
        // multi-join the emptiness probe AND the write would otherwise
        // both evaluate, and it must not re-resolve mid-batch against the
        // branch state the WAP run itself is advancing
        val batch = nearDupText.fold(raw: DataFrame)(c =>
          graft.operators.DedupIndex.dedupNew(spark, catalog, table, c, raw)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        try if (!batch.isEmpty) {
          val branch = s"ingest-$table-$batchId"
          if (catalog.listBranches().contains(branch)) catalog.dropBranch(branch)
          upsertKeys match {
            case Some(keys) if morUpsert =>
              Wap.runUpsertMOR(catalog, table, batch, keys, checks, branch, alerter,
                crossChecks = crossChecks)
            case Some(keys) =>
              Wap.runUpsert(catalog, table, batch, keys, checks, branch, alerter,
                crossChecks = crossChecks)
            case None =>
              Wap.run(catalog, table, batch, checks, branch, alerter,
                crossChecks = crossChecks)
          }
          // advance the dedup index over whatever just published — BEFORE
          // maintenance, so the window is still append-only and signs
          // only the survivors (O(batch)); a quarantined batch left main
          // unchanged, so this is `fresh`
          nearDupText.foreach { c =>
            graft.operators.DedupIndex.refresh(spark, catalog, table, c)
            ()
          }
          // self-maintenance: streaming leaves one small file + manifest
          // per micro-batch; every N batches fold them and expire the
          // superseded history (branch heads always survive, so failed
          // quarantine branches keep their data). The dedup watermark
          // snapshot survives expiry — expireSnapshots itself keeps index
          // watermarks live on every path — so the post-compaction window
          // refreshes via the net changelog (a neutral rewrite nets to
          // zero), still O(batch), never a full corpus rebuild.
          compactEvery.foreach { n =>
            if (batchId % n == n - 1 && catalog.tableExists(table)) {
              catalog.compactDataFiles(table)
              catalog.expireSnapshots(table)
              ()
            }
          }
        } finally if (nearDupText.isDefined) { batch.unpersist(); () }
        ()
      }
      .start()
  }

  /** Snapshot-fresh stream enrichment: join every micro-batch against
    * the LATEST PUBLISHED state of a catalog table. A plain stream-static
    * join fixes the static side's file list when the query STARTS, so
    * dimension updates published mid-stream are invisible; resolving
    * `catalog.scan` inside foreachBatch re-reads branch -> snapshot ->
    * manifests per batch, so each micro-batch joins against exactly the
    * snapshot current at batch time — and never sees unpublished branch
    * data (WAP isolation extends to the streaming reader for free).
    * The per-batch cost is one metadata resolution (O(manifests)); the
    * join itself broadcasts when the dimension is small, like any batch
    * join. */
  def enrichLatest(
      stream: DataFrame,
      catalog: BranchCatalog,
      table: String,
      joinKeys: Seq[String],
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(batch.join(catalog.scan(table), joinKeys, "left"), batchId)
        ()
      }
      .start()

  /** Snapshot-fresh AS-OF stream enrichment: every micro-batch attaches,
    * per key, the latest right row at-or-before each event's time from
    * the LATEST PUBLISHED state of a catalog table — the streaming face
    * of [[graft.operators.Temporal.asofJoin]] composed with
    * [[enrichLatest]]'s per-batch metadata re-resolution (a stream-static
    * join would pin the file list at query start AND can't express the
    * as-of inequality without a range join). Per batch: one metadata
    * resolution + one key-shuffled window pass over batch ∪ reference —
    * never a per-key range explosion. Unpublished branch data stays
    * invisible (WAP isolation). */
  def enrichAsof(
      stream: DataFrame,
      catalog: BranchCatalog,
      table: String,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(graft.operators.Temporal.asofJoin(
          batch, catalog.scan(table), keys, leftTime, rightTime, payload), batchId)
        ()
      }
      .start()

  /** Watermarked windowed aggregation over an event stream:
    * (window, event_type) -> count + sum(value). Tumbling by default;
    * pass `slideDuration` < `windowDuration` for sliding windows (each
    * event lands in window/slide overlapping windows). State is bounded
    * by the watermark — closed windows are dropped once event time passes
    * window_end + delay. Batch-equivalent: Relational.q17TimeBucket. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value",
      windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      slideDuration: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        slideDuration.fold(window(col(tsCol), windowDuration))(s =>
          window(col(tsCol), windowDuration, s)),
        col(typeCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(typeCol), col("n"), col("sum_value"))

  /** Streaming exact dedup for document ingest: drop any record whose
    * normalized-text hash was already seen, across micro-batches.
    * `dropDuplicatesWithinWatermark` keeps the seen-hash state bounded —
    * a hash expires once the watermark passes its event time + delay, so
    * state is O(docs-per-watermark-window), not O(corpus). (Corpus-wide
    * exact dedup is the batch operator `Dedup.exact`; this is the
    * at-ingest guard that keeps repeated crawls/retries out of the lake.) */
  def streamingDedup(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("__text_hash", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Stateful sessionization via flatMapGroupsWithState: events for a key
    * belong to one session while gaps stay under `gapMinutes`; a session
    * closes (and is emitted, append-mode) when a later event exceeds the
    * gap or when the watermark passes its end by the gap (event-time
    * timeout). One compact state row per ACTIVE key only. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state) =>
          def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          def ts(m: Long): Timestamp = {
            val t = new Timestamp(m / 1000L)
            t.setNanos(((m % 1000000L) * 1000L).toInt)
            t
          }
          def summary(s: SessionState): SessionOut =
            SessionOut(userId, ts(s.startMicros), ts(s.endMicros), s.n, s.sum)

          if (state.hasTimedOut) {
            val out = state.getOption.map(summary).toSeq
            state.remove()
            out.iterator
          } else {
            val evs = it.toSeq.sortBy(e => micros(e.ts))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            evs.foreach { e =>
              val m = micros(e.ts)
              cur match {
                case Some(s) if m - s.endMicros <= gapMicros =>
                  cur = Some(SessionState(s.startMicros, math.max(s.endMicros, m),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += summary(s)
                  cur = Some(SessionState(m, m, 1L, e.value))
                case None =>
                  cur = Some(SessionState(m, m, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endMicros + gapMicros) / 1000L)
            }
            closed.iterator
          }
      }
  }
}
