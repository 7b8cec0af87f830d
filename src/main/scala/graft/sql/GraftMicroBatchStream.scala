package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType

import graft.wap.BranchCatalog

/** Streaming offset: a committed snapshot of the table, plus an optional
  * position WITHIN the stream-start snapshot's file list while the
  * initial load is being delivered in chunks.
  *
  *  - `seq = -1` (sentinel): before anything — the next batch starts the
  *    initial load.
  *  - `idx >= 0`: the initial load over snapshot `snapshotId` has
  *    delivered its first `idx` files (path-sorted order) and is not
  *    done; the anchor snapshot stays FIXED until the load completes,
  *    however far the branch head advances meanwhile.
  *  - `idx = -1`: snapshot `snapshotId` fully delivered; later batches
  *    are per-commit file deltas.
  *
  * The sequence number orders offsets; the id resolves the snapshot. */
case class GraftStreamOffset(snapshotId: String, seq: Long, idx: Long = -1L) extends Offset {
  override def json(): String =
    s"""{"snapshotId":"$snapshotId","seq":$seq,"idx":$idx}"""
}

object GraftStreamOffset {
  val start: GraftStreamOffset = GraftStreamOffset("", -1L)
  def fromJson(json: String): GraftStreamOffset = {
    def field(name: String): Option[String] =
      (""""""" + name + """"\s*:\s*("([^"]*)"|-?\d+)""").r
        .findFirstMatchIn(json).map(m => Option(m.group(2)).getOrElse(m.group(1)))
    GraftStreamOffset(
      field("snapshotId").getOrElse(sys.error(s"bad graft offset: $json")),
      field("seq").map(_.toLong).getOrElse(sys.error(s"bad graft offset: $json")),
      field("idx").map(_.toLong).getOrElse(-1L))
  }
}

/** One micro-batch partition: a slice of the files one offset window
  * added. Plain paths+lengths — executors never touch catalog metadata. */
case class GraftFilesPartition(files: Seq[(String, Long)]) extends InputPartition

/** A bucket-keyed read partition for storage-partitioned joins (W45):
  * every file in it shares one bucket-transform value, exposed through
  * [[partitionKey]] so Spark's KeyGroupedPartitioning can co-locate
  * joins and aggregations on the bucket column without a shuffle. */
case class GraftKeyedFilesPartition(files: Seq[(String, Long)], bucket: Int)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket))
}

/** One equality-delete group a MOR partition must anti-probe: key column
  * names plus the tombstone parquet files holding the deleted keys. `id`
  * keys the per-executor key-set cache AND the factory's delete read
  * funcs. */
case class GraftDeleteGroupSpec(
    id: String, keyCols: Seq[String], files: Seq[(String, Long)],
    /** Position-delete sidecar group: `files` hold `(__graft_path,
      * __graft_pos)` pairs and the reader suppresses rows by physical
      * (file, row-index) instead of key anti-probing. */
    positional: Boolean = false) extends Serializable

/** A batch-scan partition of a MOR coverage epoch: data files plus the
  * delete groups covering exactly THIS epoch (sequence semantics — a key
  * re-appended after its delete sits in a later epoch with fewer
  * covering groups, so it stays visible). */
case class GraftMorFilesPartition(
    files: Seq[(String, Long)], groups: Seq[GraftDeleteGroupSpec]) extends InputPartition

/** Structured Streaming source over a catalog table ("stream FROM the
  * lake" — the Delta/Iceberg streaming-read analogue, and the streaming
  * mirror of [[graft.wap.BranchCatalog.consumeIncremental]]):
  *
  * {{{
  *   spark.readStream
  *     .option("maxFilesPerTrigger", 64)       // optional admission control
  *     .table("lake.main.events_log")
  * }}}
  *
  * Per trigger the driver resolves the branch head (one refs + snapshot
  * read), plans the FILE diff against the last committed offset
  * (append-granular — exactly [[BranchCatalog.changedFilesBetween]]'s
  * semantics, including the MOR-tombstone refusal and the expired-start
  * error), and hands executors plain parquet file splits read through
  * Spark's own vectorized reader. Nothing unpublished is ever visible:
  * offsets are committed snapshots of ONE branch, so WAP isolation
  * extends to streaming readers for free. Exactly-once comes from the
  * deterministic offset -> file-set mapping (snapshots and manifests are
  * immutable).
  *
  * Admission control (`maxFilesPerTrigger`) is what makes a 100 TB
  * restart survivable: the INITIAL LOAD chunks through the stream-start
  * snapshot's path-sorted file list at most N files per batch (the
  * anchor stays fixed while the head advances), and steady-state
  * triggers deliver whole commits, stopping before the commit that would
  * exceed the budget (always at least one — a single oversized commit
  * still goes through, like the file-stream source). Estimation is
  * manifest-metadata only: no manifest JSON is read to pick an offset.
  * `Trigger.AvailableNow` pins the head at prepare time and drains up to
  * it in budgeted batches. */
class GraftMicroBatchStream(
    spark: SparkSession, root: String, branch: String, tableName: String,
    tableSchema: StructType, requiredSchema: StructType,
    maxFilesPerTrigger: Option[Int],
    /** Pushed INTO the per-file parquet readers (row-group/page
      * skipping) — a filtered stream reads only the row groups its
      * predicate admits. File sets per micro-batch stay commit-exact
      * (delta semantics); rows are re-checked by the residual filter. */
    pushed: Seq[org.apache.spark.sql.sources.Filter] = Nil)
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  protected def cat = new BranchCatalog(spark, root)

  /** Head pinned by Trigger.AvailableNow, else resolved per trigger. */
  @volatile protected var availableNowHead: Option[GraftStreamOffset] = None

  /** The initial-load anchor's path-sorted file list, resolved once per
    * stream lifetime (manifests are immutable, so this never goes
    * stale). */
  protected val anchorFiles =
    scala.collection.concurrent.TrieMap.empty[String, IndexedSeq[(String, Long)]]

  protected def resolveHead(): GraftStreamOffset = {
    val id = cat.snapshotIdOf(tableName, branch)
      .getOrElse(sys.error(s"no table $tableName on $branch"))
    GraftStreamOffset(id, cat.seqOfSnapshot(tableName, id))
  }

  protected def initialFiles(snapshotId: String): IndexedSeq[(String, Long)] =
    anchorFiles.getOrElseUpdate(snapshotId,
      cat.changedFilesBetween(tableName, None, snapshotId)
        .map(f => f.path -> f.bytes).sortBy(_._1).toIndexedSeq)

  override def initialOffset(): Offset = GraftStreamOffset.start

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(resolveHead())

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    sys.error("latestOffset(start, limit) should be called (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = resolveHead()

  protected def fileBudget(limit: ReadLimit): Option[Int] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles())
    case _: ReadAllAvailable => None
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case f: ReadMaxFiles => f.maxFiles() }
    case _ => None
  }

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[GraftStreamOffset]
    val head = availableNowHead.getOrElse(resolveHead())
    val budget = fileBudget(limit)
    start match {
      case s if s.seq < 0 => // begin the initial load over the current head
        budget match {
          case Some(n) if initialFiles(head.snapshotId).length > n =>
            head.copy(idx = n.toLong)
          case _ => head
        }
      case s if s.idx >= 0 => // continue the initial load over its anchor
        val total = initialFiles(s.snapshotId).length.toLong
        val next = budget.map(n => s.idx + n).getOrElse(total)
        if (next >= total) s.copy(idx = -1L) else s.copy(idx = next)
      case s if s.snapshotId == head.snapshotId => s // nothing new
      case s => // steady state: whole commits up to the file budget
        requireInAncestry(s, head)
        budget match {
          case None => head
          case Some(n) =>
            // parent-chain walk head -> s (newest first, excluding s);
            // per-commit file counts come from manifest REFS — no
            // manifest JSON is read to pick an offset
            val chain = Iterator.iterate(cat.snapshotMetaOpt(tableName, head.snapshotId)) {
              case Some(snap) => snap.parentId.flatMap(cat.snapshotMetaOpt(tableName, _))
              case None => None
            }.takeWhile(_.isDefined).flatten
              .takeWhile(_.id != s.snapshotId).toVector.reverse // oldest first
            var prevManifests = cat.snapshotMetaOpt(tableName, s.snapshotId)
              .map(_.manifests.map(m => m.path -> m.fileCount).toMap)
              .getOrElse(Map.empty[String, Long])
            var cum = 0L
            var chosen = s
            var stop = false
            for (snap <- chain if !stop) {
              val cur = snap.manifests.map(m => m.path -> m.fileCount).toMap
              cum += cur.collect { case (p, c) if !prevManifests.contains(p) => c }.sum
              prevManifests = cur
              if (chosen == s || cum <= n) // always deliver at least one commit
                chosen = GraftStreamOffset(snap.id, snap.seq)
              else stop = true
            }
            chosen
        }
    }
  }

  /** A committed offset must sit in the head's ancestry: after a
    * `rollbackTo` (or any branch rewrite) under a live checkpoint the
    * manifest set-diff would silently deliver a partial — or even
    * regressed — window, so fail LOUDLY instead. The walk is bounded by
    * the monotone snapshot sequence (ancestors older than the offset
    * cannot contain it). */
  protected def requireInAncestry(s: GraftStreamOffset, head: GraftStreamOffset): Unit = {
    val found = Iterator.iterate(cat.snapshotMetaOpt(tableName, head.snapshotId)) {
      case Some(snap) => snap.parentId.flatMap(cat.snapshotMetaOpt(tableName, _))
      case None => None
    }.takeWhile(_.isDefined).flatten
      .takeWhile(_.seq >= s.seq)
      .exists(_.id == s.snapshotId)
    if (!found)
      sys.error(s"stream offset ${s.snapshotId} is no longer in the ancestry " +
        s"of $branch.$tableName's head ${head.snapshotId}: the branch was " +
        "rewritten or rolled back — restart the stream from a fresh checkpoint")
  }

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (s == e) return Array.empty
    val files: Seq[(String, Long)] =
      if (e.idx >= 0 || (s.idx >= 0 && s.snapshotId == e.snapshotId)) {
        // a slice of the initial-load anchor's ordered file list
        val all = initialFiles(e.snapshotId)
        val from = if (s.seq < 0 || s.idx < 0) 0 else s.idx.toInt
        val until = if (e.idx < 0) all.length else e.idx.toInt
        all.slice(from, until)
      } else {
        cat.changedFilesBetween(tableName,
          if (s.seq < 0) None else Some(s.snapshotId), e.snapshotId)
          .map(f => f.path -> f.bytes)
      }
    GraftPartitions.binPack(spark, files)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val readFunc = Bridge.parquetReadFunc(spark, tableSchema, requiredSchema, pushed)
    new GraftReaderFactory(readFunc,
      Bridge.parquetBatchReadFunc(spark, tableSchema, requiredSchema, pushed))
  }

  /** Checkpoint state lives with Spark; the only driver state to drop is
    * the initial-load anchor's cached file list — once the batch ending
    * at `idx = -1` is COMMITTED the load never replays, so the entry
    * (O(table files) of paths on exactly the 100 TB workload this source
    * targets) must not stay pinned for the stream's lifetime. A
    * steady-state offset's id is never a cache key — the remove is a
    * no-op there. */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[GraftStreamOffset]
    if (e.idx < 0) { anchorFiles.remove(e.snapshotId); () }
  }
  override def stop(): Unit = ()
  override def toString: String = s"GraftMicroBatchStream($branch.$tableName @ $root)"
}

/** Bin-packing of catalog files into read partitions, shared by the
  * micro-batch stream and the native batch scan. */
private[sql] object GraftPartitions {

  /** Pack `files` into partitions by byte size (maxPartitionBytes budget
    * + per-file open cost, FileSourceScanExec's sizing): one task per
    * FILE would launch millions of tiny tasks on a 100 TB table. Order
    * is preserved. A recorded size of 0 (pre-r8 metadata) falls back to
    * one getFileStatus call. */
  def binPack(spark: SparkSession, files: Seq[(String, Long)]): Array[InputPartition] =
    packs(spark, files).map(GraftFilesPartition(_): InputPartition).toArray

  /** The raw size-packed file groups, for callers wrapping them in a
    * different partition shape (the CDC stream's typed partitions). */
  def packs(spark: SparkSession, files: Seq[(String, Long)]): Seq[Seq[(String, Long)]] = {
    val conf = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf
    val maxBytes = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val bins = Vector.newBuilder[Seq[(String, Long)]]
    var bin = Vector.newBuilder[(String, Long)]
    var binBytes = 0L
    var binEmpty = true
    for ((path, bytes) <- files) {
      val len = if (bytes > 0) bytes else fileLength(spark, path)
      val cost = len + openCost
      if (!binEmpty && binBytes + cost > maxBytes) {
        bins += bin.result()
        bin = Vector.newBuilder[(String, Long)]; binBytes = 0L; binEmpty = true
      }
      bin += (path -> len); binBytes += cost; binEmpty = false
    }
    if (!binEmpty) bins += bin.result()
    bins.result()
  }

  private def fileLength(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p).getLen
  }
}

private[sql] class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    /** When present, partitions are read COLUMNAR: whole vectorized
      * batches cross the DSv2 boundary and Spark's codegen'd
      * ColumnarToRow takes over — no per-row iteration on this side.
      * None when the read schema cannot batch (nested types). */
    batchFunc: Option[PartitionedFile => Iterator[
      org.apache.spark.sql.vectorized.ColumnarBatch]] = None)
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    batchFunc.isDefined

  private def filesOf(partition: InputPartition): Seq[(String, Long)] =
    partition match {
      case GraftFilesPartition(fs) => fs
      case GraftKeyedFilesPartition(fs, _) => fs
      case other => sys.error(s"unexpected partition shape $other")
    }

  override def createColumnarReader(partition: InputPartition): PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val f = batchFunc.get
    GraftReaderFactory.reader(filesOf(partition).iterator.flatMap { case (path, len) =>
      f(Bridge.partitionedFile(path, len))
    })
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    GraftReaderFactory.reader(filesOf(partition).iterator.flatMap { case (path, len) =>
      Bridge.flattenBatches(readFunc(Bridge.partitionedFile(path, len)))
    })
  }
}

private[sql] object GraftReaderFactory {
  def reader[T](it: Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private var current: T = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): T = current
      override def close(): Unit = ()
    }
}

/** The MOR batch-scan reader: vectorized parquet read of the data files
  * (same executor-side reader as [[GraftReaderFactory]] — no V1 RDD[Row]
  * boundary), then a hash anti-probe of each covering delete group, then
  * a projection from the widened read schema down to Spark's required
  * columns. The per-group key sets are built ONCE PER EXECUTOR from the
  * tombstone parquet files ([[GraftDeleteSets]] — the broadcast-hash-join
  * shape without a driver collect; [[graft.wap.BranchCatalog
  * .maxPendingTombstones]] + compaction cadence bound their size). */
private[sql] class GraftMorReaderFactory(
    /** reads `readAll` (required + any missing delete-key columns). */
    morReadFunc: PartitionedFile => Iterator[InternalRow],
    /** reads `required` directly — tombstone-free epochs pay nothing. */
    plainReadFunc: PartitionedFile => Iterator[InternalRow],
    readAll: StructType, required: StructType,
    /** per [[GraftDeleteGroupSpec.id]]: reads THE KEY COLUMNS (in
      * keyCols order) from that group's tombstone files. For a
      * POSITIONAL group that is `(__graft_path, __graft_pos)` — the
      * sidecar's own schema. */
    delReadFuncs: Map[String, PartitionedFile => Iterator[InternalRow]],
    /** reads `readAll` with NO reader-level filters: a file covered by
      * position deletes must deliver EVERY row so the sequential row
      * counter equals the recorded `_metadata.row_index` (row-group/
      * page skipping would shift it). Spark re-applies all filters
      * above the scan, so this is a per-file efficiency trade, not a
      * correctness one — and compaction materializes the sidecars,
      * restoring reader pushdown. */
    morReadFuncUnfiltered: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (files, groups) = partition match {
      case GraftMorFilesPartition(fs, gs) => (fs, gs)
      case GraftFilesPartition(fs) => (fs, Nil)
    }
    if (groups.isEmpty)
      return GraftReaderFactory.reader(files.iterator.flatMap { case (p, l) =>
        Bridge.flattenBatches(plainReadFunc(Bridge.partitionedFile(p, l)))
      })

    val (posGroups, eqGroups) = groups.partition(_.positional)
    val probes: Seq[(Array[Int], Array[org.apache.spark.sql.types.DataType], Set[Seq[Any]])] =
      eqGroups.map { g =>
        val ords = g.keyCols.map(c => readAll.fieldIndex(c)).toArray
        val types = ords.map(readAll(_).dataType)
        val keySet = GraftDeleteSets.get(g, delReadFuncs(g.id), types)
        (ords, types, keySet)
      }
    // one per positional group: normalized data-file path -> deleted
    // row indexes (built once per executor, shared across tasks)
    val posMaps: Seq[Map[String, java.util.HashSet[java.lang.Long]]] =
      posGroups.map(g => GraftDeleteSets.positions(g, delReadFuncs(g.id)))
    val project = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      required.fieldNames.map { c =>
        val i = readAll.fieldIndex(c)
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i, readAll(i).dataType, nullable = true)
      }.toIndexedSeq)
    val rows = files.iterator.flatMap { case (p, l) =>
      val dels = posMaps.flatMap(_.get(GraftDeleteSets.normPath(p)))
      if (dels.isEmpty) {
        // no positions recorded against THIS file: the filtered reader
        // (row-group skipping intact) + key probes suffice
        Bridge.flattenBatches(morReadFunc(Bridge.partitionedFile(p, l))).filter { row =>
          probes.forall { case (ords, types, keys) =>
            !keys.contains(GraftDeleteSets.keyOf(row, ords, types))
          }
        }
      } else {
        var idx = -1L
        Bridge.flattenBatches(morReadFuncUnfiltered(Bridge.partitionedFile(p, l)))
          .filter { row =>
            idx += 1
            !dels.exists(_.contains(idx)) &&
              probes.forall { case (ords, types, keys) =>
                !keys.contains(GraftDeleteSets.keyOf(row, ords, types))
              }
          }
      }
    }.map(project)
    GraftReaderFactory.reader(rows)
  }
}

/** Executor-global cache of MOR delete-key sets, keyed by group id (the
  * tombstone file list): every task in a JVM shares one hash build per
  * group. No eviction — tombstone generations die at compaction, and the
  * bounded pending count keeps live sets small; a restarted executor
  * starts empty. */
private[sql] object GraftDeleteSets {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Set[Seq[Any]]]()
  private val posCache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, java.util.HashSet[java.lang.Long]]]()

  /** Scheme-insensitive path identity: manifests record "file:/x" style
    * qualified paths while Spark's `_metadata.file_path` renders
    * "file:///x" — both normalize to the bare URI path, which is unique
    * within one table's filesystem. */
  def normPath(s: String): String = new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** Position-delete sidecar build: normalized data-file path -> deleted
    * row indexes, once per executor per group (same lifecycle as the
    * key-set cache — groups die at compaction). `readFunc` reads the
    * sidecar schema in keyCols order: (__graft_path, __graft_pos). */
  def positions(g: GraftDeleteGroupSpec,
      readFunc: PartitionedFile => Iterator[InternalRow])
      : Map[String, java.util.HashSet[java.lang.Long]] =
    posCache.computeIfAbsent(g.id, _ => {
      val m = scala.collection.mutable.HashMap
        .empty[String, java.util.HashSet[java.lang.Long]]
      g.files.foreach { case (p, l) =>
        Bridge.flattenBatches(readFunc(Bridge.partitionedFile(p, l))).foreach { row =>
          m.getOrElseUpdate(normPath(row.getUTF8String(0).toString),
            new java.util.HashSet[java.lang.Long]).add(row.getLong(1))
        }
      }
      m.toMap
    })

  def get(g: GraftDeleteGroupSpec,
      readFunc: PartitionedFile => Iterator[InternalRow],
      keyTypes: Array[org.apache.spark.sql.types.DataType]): Set[Seq[Any]] =
    cache.computeIfAbsent(g.id, _ => {
      val ords = Array.range(0, keyTypes.length) // delete read = key schema
      val b = Set.newBuilder[Seq[Any]]
      g.files.foreach { case (p, l) =>
        Bridge.flattenBatches(readFunc(Bridge.partitionedFile(p, l)))
          .foreach(row => b += keyOf(row, ords, keyTypes))
      }
      b.result()
    })

  /** One probe/build key: values normalized to immutable JVM objects
    * (the vectorized reader REUSES its row and UTF8String buffers — a
    * stored reference would mutate under the iterator). Null-safe by
    * construction: null elements compare equal inside Seq, matching the
    * `<=>` anti-join of the DataFrame MOR scan. */
  def keyOf(row: InternalRow, ords: Array[Int],
      types: Array[org.apache.spark.sql.types.DataType]): Seq[Any] = {
    val out = new Array[Any](ords.length)
    var i = 0
    while (i < ords.length) {
      out(i) = if (row.isNullAt(ords(i))) null else normalize(row.get(ords(i), types(i)))
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Immutable + width-normalized: integrals to Long, floats to Double
    * (a delete key written as INT before a widening evolution must still
    * match a LONG probe), UTF8String copied out of the reused buffer. */
  private def normalize(v: Any): Any = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case f: java.lang.Float => f.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case b: Array[Byte] => b.toSeq
    case other => other
  }
}
