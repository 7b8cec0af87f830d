package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType

import graft.wap.BranchCatalog

/** Streaming offset = a committed snapshot of the table (the sequence
  * number orders offsets; the id resolves the snapshot). The sentinel
  * `seq = -1` means "before the table's first commit" — the first batch
  * is the full table (initial load), like Delta/Iceberg streaming
  * sources. */
case class GraftStreamOffset(snapshotId: String, seq: Long) extends Offset {
  override def json(): String =
    s"""{"snapshotId":"$snapshotId","seq":$seq}"""
}

object GraftStreamOffset {
  val start: GraftStreamOffset = GraftStreamOffset("", -1L)
  def fromJson(json: String): GraftStreamOffset = {
    // two scalar fields, fixed writer — a regex keeps this dependency-free
    val id = """"snapshotId"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse(sys.error(s"bad graft offset: $json"))
    val seq = """"seq"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(sys.error(s"bad graft offset: $json"))
    GraftStreamOffset(id, seq)
  }
}

/** One micro-batch partition: a slice of the files one snapshot window
  * added. Plain paths+lengths — executors never touch catalog metadata. */
case class GraftFilesPartition(files: Seq[(String, Long)]) extends InputPartition

/** Structured Streaming source over a catalog table ("stream FROM the
  * lake" — the Delta/Iceberg streaming-read analogue, and the streaming
  * mirror of [[graft.wap.BranchCatalog.consumeIncremental]]):
  *
  * {{{
  *   spark.readStream.table("lake.main.events_log")
  *     .writeStream...   // first batch = full table, then append deltas
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
  * immutable). */
class GraftMicroBatchStream(
    spark: SparkSession, root: String, branch: String, tableName: String,
    tableSchema: StructType, requiredSchema: StructType)
  extends MicroBatchStream {

  private def cat = new BranchCatalog(spark, root)

  override def initialOffset(): Offset = GraftStreamOffset.start

  override def latestOffset(): Offset = {
    val id = cat.snapshotIdOf(tableName, branch)
      .getOrElse(sys.error(s"no table $tableName on $branch"))
    GraftStreamOffset(id, cat.seqOfSnapshot(tableName, id))
  }

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (s == e) return Array.empty
    val files = cat.changedFilesBetween(tableName,
      if (s.seq < 0) None else Some(s.snapshotId), e.snapshotId)
    // one partition per file: a commit's files were sized by the writer,
    // and per-batch parallelism tracks per-commit file count
    files.map { f =>
      val len = if (f.bytes > 0) f.bytes else fileLength(f.path)
      GraftFilesPartition(Seq(f.path -> len)): InputPartition
    }.toArray
  }

  private def fileLength(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p).getLen
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val readFunc = Bridge.parquetReadFunc(spark, tableSchema, requiredSchema)
    new GraftReaderFactory(readFunc)
  }

  override def commit(end: Offset): Unit = () // checkpoint state lives with Spark
  override def stop(): Unit = ()
  override def toString: String = s"GraftMicroBatchStream($branch.$tableName @ $root)"
}

private class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[GraftFilesPartition].files
    new PartitionReader[InternalRow] {
      private val it: Iterator[InternalRow] = files.iterator.flatMap { case (path, len) =>
        Bridge.flattenBatches(readFunc(Bridge.partitionedFile(path, len)))
      }
      private var current: InternalRow = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
