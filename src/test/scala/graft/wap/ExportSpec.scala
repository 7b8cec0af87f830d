package graft.wap

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** Foreign-engine snapshot export ([[BranchCatalog.exportSnapshot]]):
  * the artifacts alone must let an engine that never loaded graft query
  * the published snapshot (the reference's "Querying from Snowflake"
  * premise, README:174-191). The strongest test here actually RUNS a
  * foreign engine: DuckDB (via the host python3) executes the generated
  * view.sql and must reproduce the branch scan.
  */
class ExportSpec extends SparkSpecBase {

  private def freshCat(): BranchCatalog =
    new BranchCatalog(spark, Files.createTempDirectory("graft-export-spec").toString)

  private def exportTo(): String =
    Files.createTempDirectory("graft-export-dest").toString + "/exp"


  /** Run `sql` in DuckDB after executing the export's view.sql; returns
    * the first result row as strings. */
  private def duckdb(viewPath: String, sql: String): Seq[String] = {
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute(open(${"\"\"\""}$viewPath${"\"\"\""}).read())
         |print("|".join(str(v) for v in con.execute(${"\"\"\""}$sql${"\"\"\""}).fetchone()))
         |""".stripMargin
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq("python3", "-c", script))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(rc == 0, s"duckdb run failed:\n$out")
    out.toString.trim.split("\\|").toSeq
  }

  test("export artifacts: manifest lists the snapshot's files, symlink farm matches") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 60)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 30).coalesce(1))
    cat.append("t", docs.filter(col("doc_id") >= 30).coalesce(1))

    val exp = cat.exportSnapshot("t", exportTo())
    assert(exp.fileCount == 2 && exp.rows == 60)
    val manifest = new String(Files.readAllBytes(Paths.get(
      new org.apache.hadoop.fs.Path(exp.manifestPath).toUri.getPath)))
    assert(manifest.contains("\"table\":\"t\"") && manifest.contains(exp.snapshotId))
    assert(manifest.contains("schemaDdl"))
    // the symlink farm holds exactly the manifest's files, in order
    val links = Files.list(Paths.get(exp.filesDir.get)).toArray.map(_.toString).sorted
    assert(links.length == 2)
    assert(links.forall(l => Files.isSymbolicLink(Paths.get(l))))
    // re-reading ONLY the exported paths reproduces the table
    val viaExport = spark.read.parquet(links.toIndexedSeq: _*)
    assert(viaExport.count() == 60)
    assert(viaExport.agg(sum("n_chars")).head.getLong(0) ==
      cat.scan("t").agg(sum("n_chars")).head.getLong(0))

    // the distributed file-list artifact agrees with the inline manifest
    val fl = spark.read.parquet(exp.filesParquet)
    assert(fl.columns.toSeq ==
      Seq("path", "rows", "bytes", "lower", "upper", "nullCounts", "partition"))
    assert(fl.count() == 2 && fl.agg(sum("rows")).head.getLong(0) == 60)
    // and the paths it lists ARE the data files (readable directly)
    val listed = fl.select("path").collect().map(_.getString(0))
    assert(spark.read.parquet(listed.toIndexedSeq: _*).count() == 60)
  }

  test("DuckDB executes view.sql and reproduces the branch scan (foreign-engine read)") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 100)
    cat.createTableIfNotExists("docs", docs.schema)
    cat.append("docs", docs.filter(col("doc_id") < 50))
    cat.append("docs", docs.filter(col("doc_id") >= 50))
    import spark.implicits._
    cat.deleteKeysMOR("docs", Seq(3L, 7L, 11L).toDF("doc_id"))
    cat.compactDataFiles("docs", targetFiles = 2)

    val exp = cat.exportSnapshot("docs", exportTo())
    val expected = cat.scan("docs")
      .agg(count(lit(1)), sum("n_chars"), countDistinct("doc_id"))
      .head
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT doc_id) FROM docs_export")
    assert(got == Seq(expected.getLong(0).toString,
      expected.getLong(1).toString, expected.getLong(2).toString),
      s"DuckDB saw $got, Spark saw $expected")
  }

  test("time-travel export: a historical snapshot exports its own content") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 80)
    cat.createTableIfNotExists("t", docs.schema)
    val s1 = cat.append("t", docs.filter(col("doc_id") < 40))
    cat.append("t", docs.filter(col("doc_id") >= 40)) // head moves on

    val exp = cat.exportSnapshot("t", exportTo(), snapshotId = Some(s1.id))
    assert(exp.snapshotId == s1.id && exp.rows == 40)
    // a foreign engine reading the export sees the HISTORICAL content
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*), max(doc_id) FROM t_export")
    assert(got == Seq("40", "39"), s"got $got")
    assert(cat.scan("t").count() == 80, "head unaffected")
  }

  test("empty snapshots refuse to export; partitioned tables export fine") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 60)
    // an EMPTY snapshot refuses: read_parquet([]) is not a view any
    // engine can run
    val catE = freshCat()
    catE.createTableIfNotExists("empty", docs.schema)
    val errEmpty = intercept[IllegalArgumentException] { catE.exportSnapshot("empty", exportTo()) }
    assert(errEmpty.getMessage.contains("no data files"))

    // hidden-partitioned data files carry full rows -> export like any parquet
    val cat2 = freshCat()
    cat2.createTableIfNotExists("p", docs.schema)
    cat2.appendPartitioned("p", docs, PartitionSpec.parse("bucket(4,doc_id)"))
    val exp = cat2.exportSnapshot("p", exportTo())
    assert(exp.rows == 60)
    assert(spark.read.parquet(exp.filesDir.get + "/*.parquet").count() == 60)
    val manifest = new String(Files.readAllBytes(Paths.get(
      new org.apache.hadoop.fs.Path(exp.manifestPath).toUri.getPath)))
    assert(manifest.contains("bucket(4,doc_id)"), "partition spec travels with the export")
  }

  test("pending POSITION sidecars export as a NOT EXISTS view DuckDB reproduces") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 100)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 50))
    cat.append("t", docs.filter(col("doc_id") >= 50))
    // two STACKED positional deletes, still pending at export time
    val d1 = cat.deleteWherePositional("t", col("doc_id") % 7 === 0)
    val d2 = cat.deleteWherePositional("t", col("doc_id") === 1L)
    assert(d1.filesRewritten == 0L && d2.filesRewritten == 0L)
    val head = cat.snapshotIdOf("t").get
    assert(cat.snapshotMeta("t", head).deleteManifests.nonEmpty, "sidecars pending")

    val exp = cat.exportSnapshot("t", exportTo())
    assert(exp.deleteFileCount > 0L, "sidecars exported alongside")
    val expected = cat.scan("t")
      .agg(count(lit(1)), sum("n_chars"), countDistinct("doc_id")).head
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT doc_id) FROM t_export")
    assert(got == Seq(expected.getLong(0).toString,
      expected.getLong(1).toString, expected.getLong(2).toString),
      s"DuckDB saw $got, Spark saw $expected")
    // the suppressed ids are really gone on the foreign side
    val gone = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*) FROM t_export WHERE doc_id % 7 = 0 OR doc_id = 1")
    assert(gone == Seq("0"))
  }

  test("pending EQUALITY tombstones export as an epoch-partitioned view DuckDB reproduces") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    import spark.implicits._
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 100)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 60))
    // gen 1: single-column key delete covering ONLY the first append
    cat.deleteKeysMOR("t", (0L until 10L).toDF("doc_id"))
    // post-delete append RE-ADDS 0..4: seq semantics make them visible
    // again — the epoch partition must keep them while suppressing the
    // pre-delete copies
    cat.append("t", docs.filter(col("doc_id") >= 60 || col("doc_id") < 5))
    // gen 2: a DIFFERENT key schema (composite), covering both appends
    cat.deleteKeysMOR("t",
      docs.filter(col("doc_id") >= 90).select("doc_id", "lang"))
    val head = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
    assert(head.deleteManifests.count(!_.posDelete) == 2, "two eq generations pending")

    val exp = cat.exportSnapshot("t", exportTo())
    assert(exp.deleteFileCount > 0L, "tombstones exported alongside")
    val expected = cat.scan("t")
      .agg(count(lit(1)), sum("n_chars"), countDistinct("doc_id")).head
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT doc_id) FROM t_export")
    assert(got == Seq(expected.getLong(0).toString,
      expected.getLong(1).toString, expected.getLong(2).toString),
      s"DuckDB saw $got, Spark saw $expected")
    // re-appended keys visible exactly once; never-re-added ones gone
    val readd = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*) FROM t_export WHERE doc_id < 5")
    assert(readd == Seq("5"), s"re-appended keys must survive: $readd")
    val goneEq = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*) FROM t_export WHERE (doc_id >= 5 AND doc_id < 10) OR doc_id >= 90")
    assert(goneEq == Seq("0"), s"tombstoned keys must be gone: $goneEq")

    // MIXED pending (positional sidecar first — the only reachable order,
    // eq-then-pos refuses — then an equality generation on top): both
    // representations land in the same epoch-partitioned view
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs.schema)
    cat2.append("t", docs.filter(col("doc_id") < 80))
    cat2.deleteWherePositional("t", col("doc_id") === 42L)
    cat2.deleteKeysMOR("t", Seq(7L).toDF("doc_id"))
    val exp2 = cat2.exportSnapshot("t", exportTo())
    val expected2 = cat2.scan("t")
      .agg(count(lit(1)), sum("n_chars"), countDistinct("doc_id")).head
    val got2 = duckdb(new org.apache.hadoop.fs.Path(exp2.viewPath).toUri.getPath,
      "SELECT count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT doc_id) FROM t_export")
    assert(got2 == Seq(expected2.getLong(0).toString,
      expected2.getLong(1).toString, expected2.getLong(2).toString),
      s"DuckDB saw $got2, Spark saw $expected2")
    val gone2 = duckdb(new org.apache.hadoop.fs.Path(exp2.viewPath).toUri.getPath,
      "SELECT count(*) FROM t_export WHERE doc_id IN (7, 42)")
    assert(gone2 == Seq("0"), s"both delete representations must apply: $gone2")
  }

  test("manifest carries pruning stats: bounds admit exactly the right files, " +
      "partition values drive transform pruning") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
    cat.createTableIfNotExists("t", docs.schema)
    // three bound-disjoint commits (sorted within each, so min/max are tight)
    cat.appendClustered("t", docs.filter(col("doc_id") < 40), Seq("doc_id"), files = 1)
    cat.appendClustered("t", docs.filter(col("doc_id") >= 40 && col("doc_id") < 80),
      Seq("doc_id"), files = 1)
    cat.appendClustered("t", docs.filter(col("doc_id") >= 80), Seq("doc_id"), files = 1)
    val exp = cat.exportSnapshot("t", exportTo())

    val files = spark.read.option("multiLine", true).json(exp.manifestPath)
      .select(explode(col("files")).as("f"))
      .select(col("f.path").as("path"),
        col("f.lower.doc_id").cast("long").as("lo"),
        col("f.upper.doc_id").cast("long").as("hi"),
        col("f.nullCounts.text").cast("long").as("text_nulls"))
      .collect()
    assert(files.length == 3)
    assert(files.forall(r => !r.isNullAt(1) && !r.isNullAt(2)), "bounds on every entry")
    assert(files.forall(r => !r.isNullAt(3)), "null counts on every entry")
    // a foreign planner pruning `doc_id >= 80` from the manifest alone
    // admits exactly one file, and reading ONLY it is still correct
    val admitted = files.filter(r => r.getLong(2) >= 80).map(_.getString(0))
    assert(admitted.length == 1, s"expected 1 admitted file, got ${admitted.length}")
    val pruned = spark.read.parquet(admitted.toIndexedSeq: _*)
      .filter(col("doc_id") >= 80)
    assert(pruned.count() == 40)
    assert(pruned.agg(sum("n_chars")).head.getLong(0) ==
      cat.scan("t").filter(col("doc_id") >= 80).agg(sum("n_chars")).head.getLong(0))

    // hidden-partitioned export: each entry carries its transform value,
    // so an engine that implements the transform prunes by partition
    val catP = freshCat()
    catP.createTableIfNotExists("p", docs.schema)
    catP.appendPartitioned("p", docs, PartitionSpec.parse("bucket(4,doc_id)"))
    val expP = catP.exportSnapshot("p", exportTo())
    val pFiles = spark.read.option("multiLine", true).json(expP.manifestPath)
      .select(explode(col("files")).as("f"))
      .select(col("f.path").as("path"), col("f.partition.pv").as("pv"))
      .collect()
    assert(pFiles.map(_.getString(1)).distinct.sorted.toSeq == Seq("0", "1", "2", "3"))
    // expected bucket value for doc_id=7, computed with the SAME transform
    // the spec serialized into the manifest
    val spec = PartitionSpec.parse("bucket(4,doc_id)")
    val pv7 = docs.filter(col("doc_id") === 7)
      .select(spec.valueCol(org.apache.spark.sql.types.LongType).cast("string"))
      .head.getString(0)
    val admittedP = pFiles.filter(_.getString(1) == pv7).map(_.getString(0))
    assert(admittedP.length < pFiles.length, "partition pruning skips files")
    val hit = spark.read.parquet(admittedP.toIndexedSeq: _*).filter(col("doc_id") === 7)
    assert(hit.count() == 1, "the pruned read still finds the row")
  }

  test("files.parquet carries the same stats and paths as manifest.json") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.coalesce(1))
    val exp = cat.exportSnapshot("t", exportTo())
    val fl = spark.read.parquet(exp.filesParquet)
    assert(fl.columns.toSeq ==
      Seq("path", "rows", "bytes", "lower", "upper", "nullCounts", "partition"))
    val flRow = fl.head
    assert(flRow.getMap[String, String](3).get("doc_id").contains("0"))
    assert(flRow.getMap[String, String](4).get("doc_id").contains("49"))
    // path normalization agrees byte-for-byte with manifest.json
    val manifestPaths = spark.read.option("multiLine", true).json(exp.manifestPath)
      .select(explode(col("files")).as("f")).select(col("f.path"))
      .collect().map(_.getString(0)).sorted.toSeq
    val parquetPaths = fl.select("path").collect().map(_.getString(0)).sorted.toSeq
    assert(manifestPaths == parquetPaths)
  }

  test("export refuses to destroy a non-export dest; re-export over a prior export works") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs)
    // dest holding unrelated data: refused, content intact
    val foreign = Files.createTempDirectory("graft-export-foreign")
    val keep = foreign.resolve("precious.txt")
    Files.writeString(keep, "do not delete")
    val err = intercept[IllegalArgumentException] {
      cat.exportSnapshot("t", foreign.toString)
    }
    assert(err.getMessage.contains("refusing to overwrite"))
    assert(Files.readString(keep) == "do not delete")
    // a prior export dest is fair game (it has manifest.json)
    val dest = exportTo()
    cat.exportSnapshot("t", dest)
    cat.append("t", Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 20 && col("doc_id") < 30))
    val again = cat.exportSnapshot("t", dest)
    assert(again.rows == 30)
  }

  test("view.sql survives a single quote in the data path (DuckDB executes it)") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    val root = Files.createTempDirectory("graft-export-q")
    val quoted = root.resolve("it's data")
    Files.createDirectories(quoted)
    val cat = new BranchCatalog(spark, quoted.toString)
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 25)
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs)
    val exp = cat.exportSnapshot("t", exportTo())
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT count(*), CAST(sum(n_chars) AS BIGINT) FROM t_export")
    val expected = cat.scan("t").agg(count(lit(1)), sum("n_chars")).head
    assert(got == Seq(expected.getLong(0).toString, expected.getLong(1).toString))
  }

  test("exportChanges: zero-copy transaction form whose signed fold is the window's net") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 150)
      .select("doc_id", "n_chars")
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 100).coalesce(1))
    val s1 = cat.snapshotIdOf("t").get
    cat.append("t", docs.filter(col("doc_id") >= 100).coalesce(1))
    cat.deleteWhere("t", col("doc_id") < 20) // rewrites file 1
    val s2 = cat.snapshotIdOf("t").get

    val exp = cat.exportChanges("t", s1, s2, exportTo())
    assert(!exp.materialized)
    assert(exp.deleteRows == 100, "the rewritten file's full rows are the delete leg")
    assert(exp.insertRows == 130, "survivors + the new commit are the insert leg")
    // symlink farms mirror the legs
    val ins = Files.list(Paths.get(new org.apache.hadoop.fs.Path(
      exp.dest, "inserts").toUri.getPath)).toArray
    val dels = Files.list(Paths.get(new org.apache.hadoop.fs.Path(
      exp.dest, "deletes").toUri.getPath)).toArray
    assert(ins.nonEmpty && dels.length == 1)
    if (duckdbAvailable) {
      // DuckDB executes the view; the signed fold reconstructs the net
      val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
        "SELECT CAST(sum(CASE WHEN _change_type = 'insert' THEN n_chars " +
          "ELSE -n_chars END) AS BIGINT), count(*) FROM t_changes_export")
      val netChars = docs.filter(col("doc_id") >= 100).agg(sum("n_chars")).head.getLong(0) -
        docs.filter(col("doc_id") < 20).agg(sum("n_chars")).head.getLong(0)
      assert(got == Seq(netChars.toString, "230"))
    }
    // append-only window: single-leg view, no delete farm
    cat.append("t", docs.filter(col("doc_id") < 10).coalesce(1))
    val exp2 = cat.exportChanges("t", s2, cat.snapshotIdOf("t").get, exportTo())
    assert(exp2.deleteFiles == 0 && exp2.insertRows == 10)
    if (duckdbAvailable) {
      val got2 = duckdb(new org.apache.hadoop.fs.Path(exp2.viewPath).toUri.getPath,
        "SELECT count(*), min(_change_type) FROM t_changes_export")
      assert(got2 == Seq("10", "insert"))
    }
  }

  test("exportChanges with pending POSITION sidecars: three-leg view DuckDB reproduces") {
    assume(duckdbAvailable, "host python3 lacks duckdb")
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
      .select("doc_id", "n_chars")
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 100).coalesce(2))
    val s1 = cat.snapshotIdOf("t").get

    // window 1: append a file, then positionally delete one CARRIED row
    // (doc 5 — zero file change, the leg a plain diff cannot see) and one
    // ADDED row (doc 120 — born and deleted inside the window)
    cat.append("t", docs.filter(col("doc_id") >= 100 && col("doc_id") < 150).coalesce(1))
    val d = cat.deleteWherePositional("t", col("doc_id").isin(5L, 120L))
    assert(d.filesRewritten == 0L, "must stay merge-on-read")
    val s2 = cat.snapshotIdOf("t").get

    val exp = cat.exportChanges("t", s1, s2, exportTo())
    assert(exp.insertRows == 49L, s"49 net inserts, got ${exp.insertRows}")
    assert(exp.deleteRows == 1L, s"1 net delete (doc 5), got ${exp.deleteRows}")
    val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
      "SELECT " +
        "(SELECT count(*) FROM t_changes_export WHERE _change_type='insert'), " +
        "(SELECT count(*) FROM t_changes_export WHERE _change_type='delete'), " +
        "(SELECT count(*) FROM t_changes_export WHERE _change_type='delete' AND doc_id = 5), " +
        "(SELECT count(*) FROM t_changes_export WHERE doc_id = 120)")
    assert(got == Seq("49", "1", "1", "0"),
      s"DuckDB legs disagree: $got (insert, delete, doc5-delete, doc120-anywhere)")

    // window 2 FROM a sidecar-pending endpoint: inherited marks must not
    // re-delete doc 5, only the window's NEW deletion (doc 7) surfaces
    cat.append("t", docs.filter(col("doc_id") >= 150).coalesce(1))
    val d2 = cat.deleteWherePositional("t", col("doc_id") === 7L)
    assert(d2.filesRewritten == 0L)
    val s3 = cat.snapshotIdOf("t").get
    val exp2 = cat.exportChanges("t", s2, s3, exportTo())
    assert(exp2.insertRows == 50L && exp2.deleteRows == 1L,
      s"got ${exp2.insertRows}/${exp2.deleteRows}")
    val got2 = duckdb(new org.apache.hadoop.fs.Path(exp2.viewPath).toUri.getPath,
      "SELECT " +
        "(SELECT count(*) FROM t_changes_export WHERE _change_type='delete' AND doc_id = 7), " +
        "(SELECT count(*) FROM t_changes_export WHERE doc_id = 5), " +
        "(SELECT count(*) FROM t_changes_export WHERE _change_type='insert')")
    assert(got2 == Seq("1", "0", "50"), s"got $got2")

    // guards: a window that FOLDED its sidecars refuses; net=true with
    // pending sidecars refuses
    val errNet = intercept[IllegalArgumentException](
      cat.exportChanges("t", s2, s3, exportTo(), net = true))
    assert(errNet.getMessage.contains("tombstone-free"), errNet.getMessage)
    cat.compactPositionDeletes("t")
    val s4 = cat.snapshotIdOf("t").get
    val errFold = intercept[IllegalArgumentException](
      cat.exportChanges("t", s2, s4, exportTo()))
    assert(errFold.getMessage.contains("folded or materialized"), errFold.getMessage)
  }

  test("exportChanges net=true materializes exactly the net rows; guards refuse") {
    val cat = freshCat()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
      .select("doc_id", "n_chars")
    cat.createTableIfNotExists("t", docs.schema)
    cat.append("t", docs.filter(col("doc_id") < 100).coalesce(1))
    val s1 = cat.snapshotIdOf("t").get
    cat.append("t", docs.filter(col("doc_id") >= 100).coalesce(1))
    cat.deleteWhere("t", col("doc_id") < 20)
    val s2 = cat.snapshotIdOf("t").get

    val exp = cat.exportChanges("t", s1, s2, exportTo(), net = true)
    assert(exp.materialized)
    assert(exp.insertRows == 20 && exp.deleteRows == 20,
      "net form: carried survivors cancel")
    if (duckdbAvailable) {
      val got = duckdb(new org.apache.hadoop.fs.Path(exp.viewPath).toUri.getPath,
        "SELECT count(*), CAST(sum(CASE WHEN _change_type = 'insert' THEN 1 " +
          "ELSE -1 END) AS BIGINT) FROM t_changes_export")
      assert(got == Seq("40", "0"), "20 inserts net against 20 deletes")
    }
    // a sidecar-ONLY window (zero data-file change) exports its one
    // in-place deletion through the carried-files leg
    cat.deleteWherePositional("t", col("doc_id") === 50)
    val s3 = cat.snapshotIdOf("t").get
    val expSc = cat.exportChanges("t", s2, s3, exportTo())
    assert(expSc.insertRows == 0L && expSc.deleteRows == 1L,
      s"got ${expSc.insertRows}/${expSc.deleteRows}")
    if (duckdbAvailable) {
      val gotSc = duckdb(new org.apache.hadoop.fs.Path(expSc.viewPath).toUri.getPath,
        "SELECT count(*), min(doc_id), min(_change_type) FROM t_changes_export")
      assert(gotSc == Seq("1", "50", "delete"), s"got $gotSc")
    }
    // empty windows still refuse
    val e2 = intercept[IllegalArgumentException] {
      cat.exportChanges("t", s1, s1, exportTo())
    }
    assert(e2.getMessage.contains("changed no files"))

    // a REFUSED net re-export must never destroy the prior artifact in
    // its dest: the tombstone guard fires BEFORE any filesystem mutation
    val netDest = exportTo()
    cat.exportChanges("t", s1, s2, netDest, net = true) // clean prior export
    val prior = new org.apache.hadoop.fs.Path(
      netDest, "manifest-changes.json").toUri.getPath
    val e3 = intercept[IllegalArgumentException] {
      cat.exportChanges("t", s2, s3, netDest, net = true) // s3 has pending sidecars
    }
    assert(e3.getMessage.contains("tombstone-free"))
    assert(Files.exists(Paths.get(prior)),
      "the refused re-export destroyed the consumer's current artifact")
  }
}
