package graft.wap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.Serialization
import java.nio.charset.StandardCharsets
import java.util.UUID

/** A parquet data file owned by a snapshot. Row count comes from the
  * parquet footer (no data read). */
case class DataFileMeta(path: String, rows: Long)

/** An immutable table version: the complete list of data files plus the
  * schema DDL. Snapshots never share mutable state — a branch is just a
  * pointer, so branching is zero-copy (reference: Nessie's git-like
  * semantics, app.py:160-176). */
case class Snapshot(
    id: String,
    parentId: Option[String],
    files: Seq[DataFileMeta],
    schemaDdl: String,
    committedAtMillis: Long)

/** Catalog state on one branch: table name -> snapshot id. */
case class BranchState(tables: Map[String, String], baseOfMain: Map[String, String])

/** The root refs document, versioned. Version N+1 is committed with an
  * atomic create-if-absent, giving optimistic concurrency (reference
  * relies on Nessie's commit protocol for this). */
case class Refs(version: Long, branches: Map[String, BranchState])

/** Git-like branch-versioned table catalog over parquet + JSON metadata —
  * the Spark-native re-expression of the reference's Nessie+PyIceberg
  * layer (reference app.py:244-317).
  *
  * Layout under `root`:
  * {{{
  *   refs-<version>.json                  // branches -> {table -> snapshot}
  *   tables/<t>/meta/snap-<id>.json       // immutable snapshot manifests
  *   tables/<t>/data/<commit-uuid>/part-N.parquet
  * }}}
  *
  * Scale notes: all file IO goes through the Hadoop FileSystem API (works
  * on s3a/hdfs/abfs unchanged); metadata ops are O(files-per-commit), not
  * O(table); reads resolve branch -> snapshot -> file list and hand Spark a
  * plain parquet scan, so Catalyst still pushes filters/projections into
  * the columnar reader.
  */
class BranchCatalog(spark: SparkSession, val root: String) {
  private implicit val fmts: Formats = DefaultFormats
  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- low-level JSON IO ------------------------------------------------

  private def writeString(p: Path, s: String, overwriteExisting: Boolean): Boolean = {
    try {
      val out = fs.create(p, overwriteExisting)
      try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ---- refs (optimistic versioned commits) ------------------------------

  private def refsPath(v: Long) = new Path(rootPath, f"refs-$v%012d.json")

  private def currentVersion(): Long = {
    if (!fs.exists(rootPath)) return -1L
    val vs = fs.listStatus(rootPath).map(_.getPath.getName)
      .filter(n => n.startsWith("refs-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("refs-").stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  def currentRefs(): Refs = {
    val v = currentVersion()
    if (v < 0) Refs(-1L, Map("main" -> BranchState(Map.empty, Map.empty)))
    else Serialization.read[Refs](readString(refsPath(v)))
  }

  /** Optimistic commit: transform the latest refs, attempt to create the
    * next version file (atomic create-if-absent); on a lost race, re-read
    * and retry. */
  private def commitRefs(update: Refs => Refs, maxRetries: Int = 20): Refs = {
    var attempt = 0
    while (attempt < maxRetries) {
      val cur = currentRefs()
      val next = update(cur).copy(version = cur.version + 1)
      fs.mkdirs(rootPath)
      if (writeString(refsPath(next.version), Serialization.write(next), overwriteExisting = false))
        return next
      attempt += 1
    }
    throw new IllegalStateException(s"refs commit lost $maxRetries races at $root")
  }

  // ---- snapshots ---------------------------------------------------------

  private def snapPath(table: String, id: String) =
    new Path(rootPath, s"tables/$table/meta/snap-$id.json")

  private def loadSnapshot(table: String, id: String): Snapshot =
    Serialization.read[Snapshot](readString(snapPath(table, id)))

  private def writeSnapshot(table: String, s: Snapshot): Unit = {
    fs.mkdirs(new Path(rootPath, s"tables/$table/meta"))
    require(writeString(snapPath(table, s.id), Serialization.write(s), overwriteExisting = false),
      s"snapshot ${s.id} already exists for $table")
  }

  /** Write a DataFrame batch as immutable parquet files; return their
    * metadata (row counts read from footers, not by rescanning data). */
  private def writeDataFiles(table: String, df: DataFrame): Seq[DataFileMeta] = {
    val commitId = UUID.randomUUID().toString
    val dir = new Path(rootPath, s"tables/$table/data/$commitId")
    df.write.parquet(dir.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val rows = try reader.getFooter.getBlocks.asInstanceOf[java.util.List[_]]
          .toArray.map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData].getRowCount)
          .sum
        finally reader.close()
        DataFileMeta(st.getPath.toString, rows)
      }
  }

  // ---- public API (the reference's catalog surface) ----------------------

  /** reference app.py:125-149 create_table_if_not_exists. Returns true if
    * the table was created. */
  def createTableIfNotExists(table: String, schema: StructType, branch: String = "main"): Boolean = {
    if (tableExists(table, branch)) return false
    val snap = Snapshot(newId(), None, Seq.empty, schema.toDDL, System.currentTimeMillis())
    writeSnapshot(table, snap)
    commitRefs { refs =>
      val b = refs.branches.getOrElse(branch, sys.error(s"no branch $branch"))
      if (b.tables.contains(table)) refs
      else refs.copy(branches = refs.branches.updated(branch, b.copy(tables = b.tables.updated(table, snap.id))))
    }
    true
  }

  def tableExists(table: String, branch: String = "main"): Boolean =
    currentRefs().branches.get(branch).exists(_.tables.contains(table))

  /** reference app.py:138 list_tables. */
  def listTables(branch: String = "main"): Seq[String] =
    currentRefs().branches.get(branch).map(_.tables.keys.toSeq.sorted).getOrElse(Seq.empty)

  def listBranches(): Seq[String] = currentRefs().branches.keys.toSeq.sorted

  /** reference app.py:160-176 create_branch_from_main: zero-copy — copies
    * only the table->snapshot pointer map and records the fork base for
    * the eventual 3-way merge. */
  def createBranch(branch: String, from: String = "main"): Unit =
    commitRefs { refs =>
      require(!refs.branches.contains(branch), s"branch $branch exists")
      val src = refs.branches.getOrElse(from, sys.error(s"no branch $from"))
      refs.copy(branches = refs.branches.updated(branch, BranchState(src.tables, src.tables)))
    }

  /** reference app.py:303 drop_branch. */
  def dropBranch(branch: String): Unit = {
    require(branch != "main", "refusing to drop main")
    commitRefs(refs => refs.copy(branches = refs.branches - branch))
  }

  /** reference app.py:178-199 append_rows_to_table_in_branch: write the
    * batch as new immutable files and commit a child snapshot on the
    * branch. Readers of other branches never see these files (snapshot
    * isolation). */
  def append(table: String, df: DataFrame, branch: String = "main"): Snapshot = {
    val newFiles = writeDataFiles(table, df)
    var committed: Snapshot = null
    commitRefs { refs =>
      val b = refs.branches.getOrElse(branch, sys.error(s"no branch $branch"))
      val parentId = b.tables.getOrElse(table, sys.error(s"no table $table on $branch"))
      val parent = loadSnapshot(table, parentId)
      committed = Snapshot(newId(), Some(parentId), parent.files ++ newFiles,
        if (parent.schemaDdl.nonEmpty) parent.schemaDdl else df.schema.toDDL,
        System.currentTimeMillis())
      writeSnapshot(table, committed)
      refs.copy(branches = refs.branches.updated(branch, b.copy(tables = b.tables.updated(table, committed.id))))
    }
    committed
  }

  /** reference app.py:201-246 run_quality_checks scan: resolve
    * branch -> snapshot -> file list and return a plain parquet scan, so
    * downstream filters/projections push into the columnar reader exactly
    * as the reference's `scan(row_filter=..., selected_fields=...)`. */
  def scan(table: String, branch: String = "main"): DataFrame = {
    val refs = currentRefs()
    val b = refs.branches.getOrElse(branch, sys.error(s"no branch $branch"))
    val id = b.tables.getOrElse(table, sys.error(s"no table $table on branch $branch"))
    scanSnapshot(table, id)
  }

  /** Time travel: read any historical snapshot by id. */
  def scanSnapshot(table: String, snapshotId: String): DataFrame = {
    val snap = loadSnapshot(table, snapshotId)
    val schema = StructType.fromDDL(snap.schemaDdl)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(snap.files.map(_.path): _*)
  }

  def snapshotIdOf(table: String, branch: String = "main"): Option[String] =
    currentRefs().branches.get(branch).flatMap(_.tables.get(table))

  /** reference app.py:302 catalog.merge(branch, 'main'): 3-way append-only
    * merge — files the branch added since its fork base are appended onto
    * the target's current snapshot, table by table. Publishing is a pure
    * metadata commit (no data copied). */
  def merge(branch: String, into: String = "main"): Unit =
    commitRefs { refs =>
      val src = refs.branches.getOrElse(branch, sys.error(s"no branch $branch"))
      val dst = refs.branches.getOrElse(into, sys.error(s"no branch $into"))
      var dstTables = dst.tables
      for ((table, srcSnapId) <- src.tables) {
        val baseSnapId = src.baseOfMain.get(table)
        if (!baseSnapId.contains(srcSnapId)) {
          val srcFiles = loadSnapshot(table, srcSnapId).files
          val baseFiles = baseSnapId.map(loadSnapshot(table, _).files).getOrElse(Seq.empty)
          val added = srcFiles.filterNot(f => baseFiles.exists(_.path == f.path))
          val dstSnapOpt = dstTables.get(table).map(loadSnapshot(table, _))
          val merged = Snapshot(
            newId(),
            dstSnapOpt.map(_.id),
            dstSnapOpt.map(_.files).getOrElse(Seq.empty) ++ added,
            dstSnapOpt.map(_.schemaDdl).getOrElse(loadSnapshot(table, srcSnapId).schemaDdl),
            System.currentTimeMillis())
          writeSnapshot(table, merged)
          dstTables = dstTables.updated(table, merged.id)
        }
      }
      refs.copy(branches = refs.branches.updated(into, dst.copy(tables = dstTables)))
    }

  private def newId(): String = UUID.randomUUID().toString.take(16)
}
