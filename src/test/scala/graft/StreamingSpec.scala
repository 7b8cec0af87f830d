package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.quality.NotNull
import graft.streaming.{EventStreams, SessionEvent}
import graft.wap.{BranchCatalog, BufferAlerter}

/** Streaming oracles (SURVEY §2.8): file-arrival WAP ingest through a real
  * drop directory, watermarked windowed aggregation and sessionization
  * through MemoryStream. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("fileIngest: arriving file publishes via WAP; faulty file stays on branch and alerts") {
    val drop = tmp("graft-drop")
    val ckpt = tmp("graft-ckpt")
    val cat = new BranchCatalog(spark, tmp("graft-cat"))
    val alerter = new BufferAlerter
    val checks = Seq(NotNull("name"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")

    def runOnce(): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "people",
        checks, ckpt, alerter, Trigger.AvailableNow())
      q.awaitTermination()
    }

    // clean batch -> published to main
    Seq((1L, "ada"), (2L, "grace")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people", "main").count() == 2)
    assert(alerter.alerts.isEmpty)

    // faulty batch (null name) -> main unchanged, branch kept, alert fired
    Seq((3L, null.asInstanceOf[String])).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people", "main").count() == 2, "faulty batch must not publish")
    assert(alerter.alerts.size == 1)
    val quarantine = cat.listBranches().filter(_.startsWith("ingest-people-"))
    assert(quarantine.size == 1, s"quarantine branch kept: $quarantine")
    assert(cat.scan("people", quarantine.head).count() == 3)

    // recovery: another clean batch still publishes (exactly-once per file)
    Seq((4L, "edsger")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people", "main").count() == 3)
  }

  test("fileIngest cross checks: a drifting file quarantines at ingest") {
    import graft.quality.DriftCheck
    val drop = tmp("graft-drop-drift")
    val ckpt = tmp("graft-ckpt-drift")
    val cat = new BranchCatalog(spark, tmp("graft-cat-drift"))
    val alerter = new BufferAlerter
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v DOUBLE")
    def runOnce(): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "m",
        checks = Seq.empty, ckpt, alerter, Trigger.AvailableNow(),
        crossChecks = Seq(DriftCheck(() => cat.scan("m"), "v", maxPsi = 0.25)))
      q.awaitTermination()
    }
    def file(shift: Double, base: Long): Unit =
      (0 until 400).map(i => (base + i, 50.0 + (i % 20) + shift)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(drop)

    file(0.0, 0L); runOnce()
    assert(cat.scan("m").count() == 400, "first file publishes (empty reference)")
    file(300.0, 1000L); runOnce()
    assert(cat.scan("m").count() == 400, "a drifted file must not publish")
    assert(alerter.alerts.size == 1)
    assert(alerter.alerts.head._3.failed.head.name.startsWith("drift("))
  }

  test("fileIngest self-maintenance: periodic compaction folds micro-batch files") {
    val drop = tmp("graft-drop2")
    val ckpt = tmp("graft-ckpt2")
    val cat = new BranchCatalog(spark, tmp("graft-cat2"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")
    def ingest(): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "people",
        Seq(NotNull("name")), ckpt, new BufferAlerter, Trigger.AvailableNow(),
        maxFilesPerTrigger = Some(1), compactEvery = Some(2))
      q.awaitTermination()
    }
    for (i <- 0 until 4)
      Seq((i.toLong, s"name-$i")).toDF("id", "name").coalesce(1).write.mode("append").parquet(drop)
    ingest()
    assert(cat.scan("people", "main").count() == 4)
    // 4 single-file commits compacted every 2 batches -> far fewer than 4 files
    assert(cat.dataFiles("people").size <= 2,
      s"compaction must fold micro-batch files, have ${cat.dataFiles("people").size}")
    assert(cat.scan("people").select("id").collect().map(_.getLong(0)).sorted.toSeq == (0L until 4L))
  }

  test("fileIngest upsert mode: corrected records replace their earlier versions, no duplicates") {
    val drop = tmp("graft-drop-ups")
    val ckpt = tmp("graft-ckpt-ups")
    val cat = new BranchCatalog(spark, tmp("graft-cat-ups"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")
    def runOnce(): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "people",
        Seq(NotNull("name")), ckpt, new BufferAlerter, Trigger.AvailableNow(),
        upsertKeys = Some(Seq("id")))
      q.awaitTermination()
    }
    Seq((1L, "ada"), (2L, "grase")).toDF("id", "name") // typo in id=2
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people").count() == 2)

    // correction file: id=2 fixed, id=3 new — upsert replaces, not appends
    Seq((2L, "grace"), (3L, "edsger")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    val rows = cat.scan("people").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cat.scan("people").count() == 3, "no duplicate for the corrected id")
    assert(rows == Map(1L -> "ada", 2L -> "grace", 3L -> "edsger"), s"$rows")

    // a faulty correction still quarantines: main keeps the good state
    Seq((1L, null.asInstanceOf[String])).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people", "main").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == rows,
      "faulty upsert batch must not publish")
  }

  test("fileIngest MOR upsert mode: CDC apply with zero rewrites; compaction materializes") {
    val drop = tmp("graft-drop-mor")
    val ckpt = tmp("graft-ckpt-mor")
    val cat = new BranchCatalog(spark, tmp("graft-cat-mor"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")
    def runOnce(compactEvery: Option[Int] = None): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "people",
        Seq(NotNull("name")), ckpt, new BufferAlerter, Trigger.AvailableNow(),
        upsertKeys = Some(Seq("id")), morUpsert = true, compactEvery = compactEvery)
      q.awaitTermination()
    }
    Seq((1L, "ada"), (2L, "grase")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people").count() == 2)
    val filesAfterB0 = cat.dataFiles("people").map(_.path).toSet

    // correction replaces without touching batch-0's files
    Seq((2L, "grace"), (3L, "edsger")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(filesAfterB0.subsetOf(cat.dataFiles("people").map(_.path).toSet),
      "MOR CDC must not rewrite earlier micro-batches")
    val rows = cat.scan("people").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "ada", 2L -> "grace", 3L -> "edsger"), s"$rows")

    // faulty batch quarantines BEFORE touching the table (audit-then-apply)
    Seq((1L, null.asInstanceOf[String])).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    assert(cat.scan("people", "main").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == rows,
      "faulty MOR batch must not apply")

    // maintenance materializes the accumulated tombstones
    Seq((4L, "barbara")).toDF("id", "name").coalesce(1).write.mode("append").parquet(drop)
    runOnce(compactEvery = Some(1))
    val headId = cat.snapshotIdOf("people").get
    assert(cat.scanSnapshot("people", headId).count() == 4)
    assert(cat.scan("people").collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      rows + (4L -> "barbara"))
  }

  test("fileIngest near-dup gate: batches dedup against the indexed corpus AND earlier batches") {
    import graft.operators.DedupIndex
    val drop = tmp("graft-dd-drop")
    val ckpt = tmp("graft-dd-ckpt")
    val cat = new BranchCatalog(spark, tmp("graft-dd-cat"))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val schema = docs.schema
    // committed corpus + its index, BEFORE the stream starts
    cat.createTableIfNotExists("docs", schema)
    cat.append("docs", docs.filter($"doc_id" < 100))
    DedupIndex.build(spark, cat, "docs", "doc_id", "text")

    def runOnce(): Unit = {
      val q = EventStreams.fileIngest(spark, drop, schema, cat, "docs",
        Seq(NotNull("text")), ckpt, trigger = Trigger.AvailableNow(),
        compactEvery = Some(1), // maintenance every batch: the index
        // watermark must survive expiry or refresh degrades to full
        nearDupText = Some("text"))
      q.awaitTermination()
    }

    // batch 1: 20 fresh docs + 10 exact copies of committed ones (shifted
    // ids) + an intra-batch copy pair -> only the fresh docs + the
    // smaller-id intra twin survive
    val fresh = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
    val corpusCopies = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 9000).as("doc_id"), $"text")
    val intra = docs.filter($"doc_id" === 150L)
      .select(($"doc_id" + 8000).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" === 150L)
        .select(($"doc_id" + 8001).as("doc_id"), $"text"))
    val batch1 = fresh.unionByName(corpusCopies).unionByName(intra)
    batch1.coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    val afterB1 = cat.scan("docs").select("doc_id").collect().map(_.getLong(0)).toSet
    assert((9000L until 9010L).forall(!afterB1.contains(_)), "corpus copies must drop")
    assert(afterB1.contains(8150L) && !afterB1.contains(8151L),
      "intra-batch: smaller id wins")
    // fresh docs survive UNLESS they near-duplicate the corpus per the
    // independent batch operator (the testdata plants real near-dups, so
    // the expectation is data-driven, not a hard count)
    val freshDupIds = graft.operators.Dedup.minhashPairs(
      docs.filter($"doc_id" < 120), "doc_id", "text")
      .select("id_b").collect().map(_.getLong(0))
      .filter(i => i >= 100 && i < 120).toSet
    assert((100L until 120L).forall(i =>
      afterB1.contains(i) != freshDupIds.contains(i)),
      s"fresh survivors must be exactly the non-dups; dups=$freshDupIds")

    // the index advanced over the survivors: batch 2 re-delivering one of
    // BATCH 1's fresh SURVIVORS (under a new id) must now drop it too
    val survivor = (100L until 120L).find(afterB1.contains).get
    docs.filter($"doc_id" === survivor)
      .select(($"doc_id" + 7000).as("doc_id"), $"text")
      .coalesce(1).write.mode("append").parquet(drop)
    runOnce()
    val afterB2 = cat.scan("docs").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!afterB2.contains(survivor + 7000), "batch-1 survivor must gate batch 2")
    assert(afterB2 == afterB1, "nothing else changed")

    // the per-batch maintenance (compact + expire) must have kept the
    // index watermark snapshot LIVE: the post-compaction window refreshes
    // via the net changelog (a neutral rewrite nets to zero), NEVER by a
    // full corpus rebuild — FileNotFound on an expired watermark would
    // surface here as "full"
    val mode = DedupIndex.refresh(spark, cat, "docs", "text")
    assert(mode == "net" || mode == "fresh", s"expected cheap refresh, got $mode")
  }

  test("enrichLatest: each micro-batch joins the latest PUBLISHED snapshot only") {
    val cat = new BranchCatalog(spark, Files.createTempDirectory("wap-enrich").toString)
    val dimV1 = Seq((1L, "alpha"), (2L, "bravo")).toDF("id", "name")
    cat.createTableIfNotExists("dim", dimV1.schema)
    cat.append("dim", dimV1)

    val mem = MemoryStream[Long](spark, 1)
    val facts = mem.toDF().toDF("id")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[String])]
    val q = EventStreams.enrichLatest(
      facts, cat, "dim", Seq("id"),
      Files.createTempDirectory("enrich-ckpt").toString,
      (df, batchId) => seen.synchronized {
        seen ++= df.collect().map(r =>
          (batchId, r.getLong(0), if (r.isNullAt(1)) None else Some(r.getString(1))))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(1L, 3L)
      q.processAllAvailable()
      // mid-stream: id=3 publishes via a full WAP cycle; id=4 stays on an
      // UNPUBLISHED branch
      cat.createBranch("staging")
      cat.append("dim", Seq((4L, "delta")).toDF("id", "name"), "staging")
      cat.append("dim", Seq((3L, "charlie")).toDF("id", "name"))
      mem.addData(1L, 3L, 4L)
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = seen.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val batches = byBatch.keys.toSeq.sorted
    assert(batches.size == 2, s"expected 2 batches, saw $byBatch")
    val (b1, b2) = (byBatch(batches(0)), byBatch(batches(1)))
    assert(b1 == Map(1L -> Some("alpha"), 3L -> None), s"batch1 $b1")
    assert(b2(3L).contains("charlie"), "batch 2 must see the snapshot published mid-stream")
    assert(b2(4L).isEmpty, "unpublished branch data must stay invisible to the stream")
    assert(b2(1L).contains("alpha"))
  }

  test("enrichAsof: micro-batches asof-join the latest published reference state") {
    val cat = new BranchCatalog(spark, Files.createTempDirectory("wap-asof").toString)
    // reference quotes: (key, time, px)
    val quotesV1 = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (2L, 5L, 50.0))
      .toDF("k", "qt", "px")
    cat.createTableIfNotExists("quotes", quotesV1.schema)
    cat.append("quotes", quotesV1)

    val mem = MemoryStream[(Long, Long)](spark, 1)
    val trades = mem.toDF().toDF("k", "t")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Option[Double])]
    val q = EventStreams.enrichAsof(
      trades, cat, "quotes", Seq("k"), "t", "qt", Seq("px"),
      Files.createTempDirectory("asof-ckpt").toString,
      (df, batchId) => seen.synchronized {
        seen ++= df.collect().map(r =>
          (batchId, r.getLong(0), r.getLong(1),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData((1L, 15L), (1L, 25L), (2L, 3L))
      q.processAllAvailable()
      // mid-stream publish: a newer quote for key 1 at t=22
      cat.append("quotes", Seq((1L, 22L, 120.0)).toDF("k", "qt", "px"))
      mem.addData((1L, 25L))
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = seen.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3) -> t._4).toMap).toMap
    val batches = byBatch.keys.toSeq.sorted
    assert(batches.size == 2, s"expected 2 batches, saw $byBatch")
    val (b1, b2) = (byBatch(batches(0)), byBatch(batches(1)))
    assert(b1 == Map((1L, 15L) -> Some(100.0), (1L, 25L) -> Some(110.0),
      (2L, 3L) -> None), s"batch1 $b1")
    assert(b2((1L, 25L)).contains(120.0),
      "batch 2 must asof-join the quote published mid-stream")
  }

  test("windowedCounts: tumbling window totals with watermark") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark, 1)
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val out = EventStreams.windowedCounts(df,
      windowDuration = "1 hour", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc").outputMode("complete").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    mem.addData((t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0),
      (t(10, 50), "view", 5.0), (t(11, 10), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("wc").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    q.stop()
    assert(rows == Set(
      ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2026-01-01 10:00:00.0", "view", 1L, 5.0),
      ("2026-01-01 11:00:00.0", "click", 1L, 4.0)))
  }

  test("windowedCounts sliding mode: events land in every overlapping window") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark, 1)
    val out = EventStreams.windowedCounts(mem.toDF().toDF("ts", "event_type", "value"),
      windowDuration = "1 hour", watermarkDelay = "5 minutes",
      slideDuration = Some("30 minutes"))
    val q = out.writeStream.format("memory").queryName("wcs").outputMode("complete").start()
    mem.addData((Timestamp.valueOf("2026-01-01 10:40:00"), "click", 1.0))
    q.processAllAvailable()
    val starts = spark.table("wcs").collect().map(_.getTimestamp(0).toString).sorted
    q.stop()
    assert(starts.toSeq == Seq("2026-01-01 10:00:00.0", "2026-01-01 10:30:00.0"),
      s"one event -> two overlapping hourly windows, got ${starts.toSeq}")
  }

  test("streamingDedup: repeated texts across micro-batches are dropped, distinct texts pass") {
    val mem = MemoryStream[(Timestamp, Long, String)](spark, 1)
    val out = EventStreams.streamingDedup(
      mem.toDF().toDF("ts", "doc_id", "text"), watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    mem.addData((t(0), 1L, "alpha"), (t(1), 2L, "beta"), (t(1), 3L, "alpha"))
    q.processAllAvailable()
    mem.addData((t(2), 4L, "alpha"), (t(3), 5L, "gamma")) // alpha again, next batch
    q.processAllAvailable()
    val ids = spark.table("sdedup").collect().map(_.getLong(1)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 5L), s"got ${ids.toSeq}")
  }

  test("sessionize: gap splits sessions; event-time timeout closes them") {
    val mem = MemoryStream[SessionEvent](spark, 2)
    val out = EventStreams.sessionize(mem.toDS(), gapMinutes = 30,
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess").outputMode("append").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    // user 1: two bursts separated by > gap (split on arrival);
    // user 2: one burst, closed later by watermark timeout
    mem.addData(
      SessionEvent(1L, t(9, 0), 1.0), SessionEvent(1L, t(9, 10), 2.0),
      SessionEvent(2L, t(9, 5), 7.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(1L, t(10, 0), 3.0)) // 50 min gap -> splits user 1
    q.processAllAvailable()
    // advance watermark far past every session end + gap
    mem.addData(SessionEvent(99L, t(14, 0), 0.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(99L, t(15, 0), 0.0)) // extra batch: timeouts fire after watermark moves
    q.processAllAvailable()

    val sessions = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      .toSet
    q.stop()
    assert(sessions.contains((1L, "2026-01-01 09:00:00.0", "2026-01-01 09:10:00.0", 2L, 3.0)),
      s"user1 first session split on arrival; got $sessions")
    assert(sessions.contains((1L, "2026-01-01 10:00:00.0", "2026-01-01 10:00:00.0", 1L, 3.0)),
      s"user1 second session closed by timeout; got $sessions")
    assert(sessions.contains((2L, "2026-01-01 09:05:00.0", "2026-01-01 09:05:00.0", 1L, 7.0)),
      s"user2 session closed by timeout; got $sessions")
  }
}
