package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** WHEN NOT MATCHED BY SOURCE on [[BranchCatalog.mergeInto]] (SQL:2023 /
  * Iceberg/Delta by-source merge semantics): by-source clauses fire on
  * TARGET rows no source row pairs with. Planning is two-tier on top of
  * the sound source-key prune — files provably holding no source key are
  * dropped METADATA-ONLY under a leading unconditional by-source DELETE
  * (the "sync target to source" fast path), or pruned by the by-source
  * conditions and rewritten JOIN-FREE otherwise; only match-candidate
  * files pay the full-outer join. */
class MergeBySourceSpec extends SparkSpecBase {
  import MergeClause._

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"mergebs$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def dataPaths(cat: BranchCatalog, t: String): Set[String] = {
    val id = cat.snapshotIdOf(t).get
    cat.filesOf(cat.snapshotMeta(t, id)).map(_.path).toSet
  }

  test("unconditional by-source DELETE syncs target to source; no-overlap files drop metadata-only") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.appendClustered("t", docs(0, 200), Seq("doc_id"), files = 8)
    val before = dataPaths(cat, "t")

    val source = docs(80, 120)
    val r = cat.mergeInto("t", source, Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("n_chars" -> (col("t.n_chars") + lit(1000L)))),
      NotMatchedBySourceDelete(None)))

    assert(r.rowsUpdated == 40L)
    assert(r.rowsDeleted == 160L)
    assert(r.rowsInserted == 0L)
    // clustered files wholly outside [80,120) were dropped unread
    assert(r.filesDropped >= 5L, s"expected metadata-only drops, got ${r.filesDropped}")
    assert(r.filesRewritten <= before.size - r.filesDropped)

    assert(ids(cat.scan("t")) == (80L until 120L))
    val sumChars = cat.scan("t").agg(sum("n_chars")).head.getLong(0)
    val wantChars = docs(80, 120).agg(sum("n_chars")).head.getLong(0) + 40L * 1000L
    assert(sumChars == wantChars)
  }

  test("conditional by-source clauses rewrite join-free only the files the conditions may touch") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.appendClustered("t", docs(0, 200), Seq("doc_id"), files = 8)
    val before = dataPaths(cat, "t")
    val totalFiles = before.size

    // source overlaps only the low ids; the by-source condition only the
    // high ids — the middle band's files must carry over by reference
    val r = cat.mergeInto("t", docs(0, 25), Seq("doc_id"), Seq(
      NotMatchedBySourceUpdate(Some(col("t.doc_id") >= 150),
        Map("lang" -> lit("stale")))))

    assert(r.filesDropped == 0L)
    assert(r.rowsUpdated == 50L)
    assert(r.rowsDeleted == 0L)
    assert(r.filesUntouched > 0L, "middle-band files must carry over unrewritten")
    assert(r.filesRewritten < totalFiles)
    // the carried files are ORIGINAL files, still in place
    assert(dataPaths(cat, "t").intersect(before).size.toLong == r.filesUntouched)

    assert(cat.scan("t").filter(col("lang") === "stale").count() == 50L)
    assert(ids(cat.scan("t")) == (0L until 200L)) // nothing deleted or inserted
    // untouched band byte-identical
    val mid = cat.scan("t").filter(col("doc_id") >= 25 && col("doc_id") < 150)
    val midWant = docs(25, 150)
    assert(mid.exceptAll(midWant).isEmpty && midWant.exceptAll(mid).isEmpty)
  }

  test("an EMPTY source still fires by-source clauses on every target row") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))

    val r = cat.mergeInto("t", docs(0, 100).limit(0), Seq("doc_id"), Seq(
      NotMatchedBySourceDelete(Some(col("t.doc_id") % 2 === 0))))
    val evens = docs(0, 100).filter(col("doc_id") % 2 === 0).count()
    assert(r.rowsDeleted == evens)
    assert(ids(cat.scan("t")) == (0L until 100L).filter(_ % 2 == 1))
  }

  test("first-match-wins across by-source clauses (update shields later delete)") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))

    // non-matched rows: multiples of 3 get flagged, the rest delete
    val r = cat.mergeInto("t", docs(0, 40), Seq("doc_id"), Seq(
      NotMatchedBySourceUpdate(Some(col("t.doc_id") % 3 === 0),
        Map("lang" -> lit("kept"))),
      NotMatchedBySourceDelete(None)))

    val nonMatched = (40L until 100L)
    val flagged = nonMatched.count(_ % 3 == 0)
    assert(r.rowsUpdated == flagged.toLong)
    assert(r.rowsDeleted == (nonMatched.size - flagged).toLong)
    assert(ids(cat.scan("t")) ==
      ((0L until 40L) ++ nonMatched.filter(_ % 3 == 0)).sorted)
    assert(cat.scan("t").filter(col("lang") === "kept").count() == flagged.toLong)
  }

  test("by-source clauses referencing source columns refuse") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    val err = intercept[RuntimeException] {
      cat.mergeInto("t", docs(0, 10), Seq("doc_id"), Seq(
        NotMatchedBySourceDelete(Some(col("s.doc_id") > 0))))
    }
    assert(err.getMessage.contains("source column"))
  }

  test("SQL MERGE INTO lowers WHEN NOT MATCHED BY SOURCE clauses") {
    n += 1
    val name = s"mergebslake$n"
    val root = Files.createTempDirectory("mergebs-sql").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.appendClustered("t", docs(0, 200), Seq("doc_id"), files = 8)
    cat.createBranch("b")
    docs(80, 120).createOrReplaceTempView("mergebs_src")

    spark.sql(
      s"""MERGE INTO $name.b.t t USING mergebs_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars + 7
         |WHEN NOT MATCHED BY SOURCE AND t.doc_id < 40 THEN UPDATE SET lang = 'old'
         |WHEN NOT MATCHED BY SOURCE AND t.doc_id >= 160 THEN DELETE
         |""".stripMargin)

    val got = cat.scan("t", branch = "b")
    assert(ids(got) == (0L until 160L))
    assert(got.filter(col("lang") === "old").count() == 40L)
    val inBand = got.filter(col("doc_id") >= 80 && col("doc_id") < 120)
    val wantChars = docs(80, 120).agg(sum("n_chars")).head.getLong(0) + 40L * 7L
    assert(inBand.agg(sum("n_chars")).head.getLong(0) == wantChars)
    // main untouched (branch DML)
    assert(cat.scan("t").count() == 200L)
  }

  test("schema evolution: mergeInto/upsert/MOR carry new source columns; off by default") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 150))
    val src = docs(100, 200).withColumn("score", (col("doc_id") * 3).cast("long"))

    // off by default: a source with an unknown column refuses loudly
    intercept[Exception](cat.mergeInto("t", src, Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("n_chars" -> col("s.n_chars"))), NotMatchedInsert())))

    val r = cat.mergeInto("t", src, Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("score" -> col("s.score"))),
      NotMatchedInsert()), schemaEvolution = true)
    assert(r.rowsUpdated == 50L && r.rowsInserted == 50L)
    val out = cat.scan("t")
    assert(out.columns.contains("score"))
    assert(out.count() == 200L)
    assert(out.filter(col("doc_id") < 100 && col("score").isNotNull).count() == 0L)
    assert(out.filter(col("doc_id") >= 100).filter(
      col("score").isNull || col("score") =!= col("doc_id") * 3).count() == 0L)

    // upsert evolves too, and WIDENS a narrower table column
    val cat2 = freshCat()
    val narrow = docs(0, 50).withColumn("n_chars", col("n_chars").cast("int"))
    cat2.createTableIfNotExists("t", narrow.schema)
    cat2.append("t", narrow)
    val up = docs(40, 60) // long n_chars: widens int -> long
      .withColumn("grade", concat(lit("g"), (col("doc_id") % 3).cast("string")))
    val ur = cat2.upsert("t", up, Seq("doc_id"), schemaEvolution = true)
    assert(ur.rowsReplaced == 10L && ur.rowsInserted == 10L)
    val out2 = cat2.scan("t")
    assert(out2.schema("n_chars").dataType == org.apache.spark.sql.types.LongType)
    assert(out2.filter(col("doc_id") >= 40).filter(col("grade").isNull).count() == 0L)
    assert(out2.filter(col("doc_id") < 40 && col("grade").isNotNull).count() == 0L)

    // MOR merge: same evolution, zero data files rewritten
    val cat3 = freshCat()
    cat3.createTableIfNotExists("t", docs(0, 1).schema)
    cat3.append("t", docs(0, 150))
    val m = cat3.mergeIntoMOR("t", src, Seq("doc_id"), Seq(
      MatchedUpdate(None, Map("score" -> col("s.score"))),
      NotMatchedInsert()), schemaEvolution = true)
    assert(m.rowsUpdated == 50L && m.rowsInserted == 50L && m.filesRewritten == 0L)
    assert(cat3.scan("t").filter(col("doc_id") >= 100).filter(
      col("score").isNull || col("score") =!= col("doc_id") * 3).count() == 0L)
  }

  test("append/upsertKeysMOR/WAP evolve for a widened batch when asked") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    val wide = docs(50, 60).withColumn("score", (col("doc_id") * 2).cast("long"))
    // off by default
    intercept[Exception](cat.append("t", wide))
    cat.append("t", wide, schemaEvolution = true)
    val out = cat.scan("t")
    assert(out.count() == 60L && out.columns.contains("score"))
    assert(out.filter(col("doc_id") < 50 && col("score").isNotNull).count() == 0L)

    // keyed MOR upsert evolves too
    cat.upsertKeysMOR("t",
      docs(55, 65).withColumn("score", (col("doc_id") * 2).cast("long"))
        .withColumn("grade", lit("a")),
      Seq("doc_id"), schemaEvolution = true)
    val out2 = cat.scan("t")
    assert(out2.count() == 65L && out2.columns.contains("grade"))
    assert(out2.filter(col("doc_id") >= 55).filter(col("grade") =!= "a").count() == 0L)

    // through WAP: the branch evolves, the audit runs on the evolved
    // shape, the PUBLISH carries the schema to main (3-way schema merge)
    val cat2 = freshCat()
    cat2.createTableIfNotExists("t", docs(0, 1).schema)
    cat2.append("t", docs(0, 30))
    val res = Wap.run(cat2, "t",
      docs(30, 40).withColumn("score", (col("doc_id") * 2).cast("long")),
      Seq(graft.quality.NotNull("doc_id")), "evo-branch",
      schemaEvolution = true)
    assert(res.published, "audit over the evolved shape passes")
    val main = cat2.scan("t")
    assert(main.count() == 40L && main.columns.contains("score"))
    assert(main.filter(col("doc_id") >= 30).filter(
      col("score") =!= col("doc_id") * 2).count() == 0L)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION adds source columns through the analyzer") {
    n += 1
    val name = s"mergeevolake$n"
    val root = Files.createTempDirectory("mergeevo-sql").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.write.main", "true")
    val cat = new BranchCatalog(spark, root)
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 150))
    docs(100, 200).withColumn("score", (col("doc_id") * 3).cast("long"))
      .createOrReplaceTempView("mergeevo_src")

    // without the clause: new source column refuses at analysis
    intercept[Exception](spark.sql(
      s"""MERGE INTO $name.main.t t USING mergeevo_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))

    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name.main.t t
         |USING mergeevo_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = cat.scan("t")
    assert(out.columns.contains("score"))
    assert(out.count() == 200L)
    assert(out.filter(col("doc_id") >= 100).filter(
      col("score").isNull || col("score") =!= col("doc_id") * 3).count() == 0L)
    assert(out.filter(col("doc_id") < 100 && col("score").isNotNull).count() == 0L)
  }

  test("schema evolution matches source columns case-insensitively; no case-duplicates ever") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    // a source column differing only in case must resolve to the table
    // column (default Spark SQL is case-insensitive), never be ADDED as
    // a case-duplicate the resolver could no longer disambiguate
    val up = docs(40, 60).withColumnRenamed("n_chars", "N_CHARS")
    cat.upsert("t", up, Seq("doc_id"), schemaEvolution = true)
    val cols = cat.scan("t").columns.toSeq
    assert(cols.count(_.equalsIgnoreCase("n_chars")) == 1, cols.mkString(","))
    assert(cat.scan("t").count() == 60L)

    // and evolveSchema itself refuses a case-duplicate schema outright
    val dup = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT, N_CHARS BIGINT")
    val e = intercept[Exception](cat.evolveSchema("t", dup, "main"))
    assert(e.getMessage.contains("case-insensitive duplicate"), e.getMessage)

    // case-only rename of a WIDENING column still widens in place
    val cat2 = freshCat()
    val narrow = docs(0, 30).withColumn("n_chars", col("n_chars").cast("int"))
    cat2.createTableIfNotExists("t", narrow.schema)
    cat2.append("t", narrow)
    val wide = docs(20, 40).withColumnRenamed("n_chars", "N_Chars") // long
    cat2.upsert("t", wide, Seq("doc_id"), schemaEvolution = true)
    val sch = cat2.scan("t").schema
    assert(sch.fieldNames.count(_.equalsIgnoreCase("n_chars")) == 1)
    assert(sch(sch.fieldIndex("n_chars")).dataType ==
      org.apache.spark.sql.types.LongType)
  }
}
