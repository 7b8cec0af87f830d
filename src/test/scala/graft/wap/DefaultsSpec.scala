package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.{SparkSpecBase, Tables}

/** Column DEFAULT values (W71 — Iceberg v3 initial/write defaults):
  * `ADD COLUMN ... DEFAULT v` serves `v` (not NULL) from files written
  * before the column existed — per FILE, through Spark's native
  * `EXISTS_DEFAULT` resolution, so a post-add row that wrote an explicit
  * NULL stays NULL — and writers omitting the column fill the WRITE
  * default, which `SET/DROP DEFAULT` moves for future writes only. */
class DefaultsSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"defaults$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  private def withScore(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("score", LongType, nullable = true))

  test("ADD COLUMN DEFAULT: pre-add files serve the default; explicit NULL stays NULL") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 40)) // written BEFORE the column exists
    cat.evolveSchema("t", withScore(docs(0, 1).schema), defaults = Map("score" -> "7"))

    // pre-add rows: default, not NULL
    val pre = cat.scan("t").filter(col("doc_id") < 40)
    assert(pre.filter(col("score") === 7L).count() == 40L)
    assert(pre.filter(col("score").isNull).count() == 0L)

    // post-add append carrying the column, one explicit NULL: NULL survives
    val post = docs(40, 50).withColumn("score",
      when(col("doc_id") === 45, lit(null).cast("long")).otherwise(lit(99L)))
    cat.append("t", post)
    val scanned = cat.scan("t")
    assert(scanned.filter(col("doc_id") === 45 && col("score").isNull).count() == 1L)
    assert(scanned.filter(col("score") === 99L).count() == 9L)
    assert(scanned.filter(col("score") === 7L).count() == 40L)

    // post-add append OMITTING the column: write default fills
    cat.append("t", docs(50, 55))
    assert(cat.scan("t").filter(col("score") === 7L).count() == 45L)
  }

  test("SET/DROP DEFAULT move the write tier only; the initial default is pinned") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    cat.evolveSchema("t", withScore(docs(0, 1).schema), defaults = Map("score" -> "1"))
    cat.append("t", docs(10, 20)) // fills write default 1

    cat.setColumnDefault("t", "score", Some("2"))
    cat.append("t", docs(20, 30)) // fills write default 2
    cat.setColumnDefault("t", "score", None)
    cat.append("t", docs(30, 40)) // back to NULL fill

    val s = cat.scan("t")
    assert(s.filter(col("doc_id") < 10 && col("score") === 1L).count() == 10L,
      "pre-add files keep serving the ORIGINAL initial default")
    assert(s.filter(col("doc_id") >= 10 && col("doc_id") < 20 && col("score") === 1L).count() == 10L)
    assert(s.filter(col("doc_id") >= 20 && col("doc_id") < 30 && col("score") === 2L).count() == 10L)
    assert(s.filter(col("doc_id") >= 30 && col("score").isNull).count() == 10L)
  }

  test("defaults are snapshot-versioned: time travel predates them; rename moves, drop retires") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 10))
    val preAdd = cat.snapshotIdOf("t").get
    cat.evolveSchema("t", withScore(docs(0, 1).schema), defaults = Map("score" -> "7"))

    // time travel to before the add: no column at all
    assert(!cat.scanSnapshot("t", preAdd).columns.contains("score"))

    // rename carries both default tiers
    cat.renameColumn("t", "score", "quality")
    val renamed = cat.scan("t")
    assert(renamed.filter(col("quality") === 7L).count() == 10L)
    cat.append("t", docs(10, 15)) // omitted -> write default under the new name
    assert(cat.scan("t").filter(col("quality") === 7L).count() == 15L)

    // drop retires the defaults with the column
    cat.evolveSchema("t", docs(0, 1).schema)
    assert(!cat.scan("t").columns.contains("quality"))
    assert(cat.snapshotMeta("t", cat.snapshotIdOf("t").get).evo.initDefaults.isEmpty)
    assert(cat.snapshotMeta("t", cat.snapshotIdOf("t").get).evo.writeDefaults.isEmpty)
  }

  test("CoW rewrites materialize the default; compaction clears the export residue") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 30))
    cat.evolveSchema("t", withScore(docs(0, 1).schema), defaults = Map("score" -> "7"))

    // export refuses while default-backed pre-add files remain
    val exDir = Files.createTempDirectory("defexport").toString
    val err = intercept[Exception](cat.exportSnapshot("t", exDir + "/a"))
    assert(err.getMessage.contains("DEFAULT"), err.getMessage)

    // a CoW UPDATE rewrites only the matching files — but those rewritten
    // files now carry the column PHYSICALLY with the default materialized
    cat.updateWhere("t", col("doc_id") === 3, Map("lang" -> lit("xx")))
    val s = cat.scan("t")
    assert(s.filter(col("score") === 7L).count() == 30L)
    assert(s.filter(col("doc_id") === 3 && col("lang") === "xx" && col("score") === 7L).count() == 1L)

    // full compaction materializes everywhere -> export allowed again
    cat.compactDataFiles("t")
    assert(cat.scan("t").filter(col("score") === 7L).count() == 30L)
    cat.exportSnapshot("t", exDir + "/b") // must not throw
  }

  test("metadata-only aggregates stay sound: defaulted columns fall back to the scan") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 20))
    cat.evolveSchema("t", withScore(docs(0, 1).schema), defaults = Map("score" -> "7"))
    cat.append("t", docs(20, 30).withColumn("score", lit(100L)))
    val head = cat.snapshotIdOf("t").get
    // min(score) is 7 (the served default), which no footer stat records:
    // the metadata path must refuse, and the scan must answer correctly
    assert(cat.metaAggregate("t", head, Seq(MetaAgg.MinCol("score"))).isEmpty)
    val row = cat.scan("t").agg(min("score"), max("score"), count(lit(1))).head
    assert(row.getLong(0) == 7L && row.getLong(1) == 100L && row.getLong(2) == 30L)
    // count(*) keeps its metadata-only answer
    assert(cat.metaAggregate("t", head, Seq(MetaAgg.CountStar)).contains(Seq(30L)))
  }

  test("illegal defaults fail the DDL, not a later read") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 5))
    val schema2 = withScore(docs(0, 1).schema)
    intercept[Exception](
      cat.evolveSchema("t", schema2, defaults = Map("score" -> "not_a_literal()")))
    intercept[Exception]( // non-deterministic defaults refuse
      cat.evolveSchema("t", schema2, defaults = Map("score" -> "cast(rand() * 10 as long)")))
    intercept[Exception]( // defaults only accompany ADDED columns
      cat.evolveSchema("t", docs(0, 1).schema, defaults = Map("lang" -> "'en'")))
    intercept[Exception]( // defaults that do not cast refuse
      cat.evolveSchema("t", schema2, defaults = Map("score" -> "'abc'")))
    // nothing committed by the failures
    assert(!cat.scan("t").columns.contains("score"))
  }

  test("folding defaults are pinned at DDL time: current_timestamp() never drifts") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 5))
    val schema2 = StructType(docs(0, 1).schema.fields :+
      StructField("seen_at", org.apache.spark.sql.types.TimestampType, nullable = true))
    // Spark's default analyzer constant-folds CURRENT_TIMESTAMP at DDL
    // time (SQL-standard column-default behavior); graft stores the
    // FOLDED literal, so the default is one fixed instant forever
    cat.evolveSchema("t", schema2, defaults = Map("seen_at" -> "current_timestamp()"))
    val pinned = cat.snapshotMeta("t", cat.snapshotIdOf("t").get)
      .evo.writeDefaults("seen_at")
    assert(pinned.startsWith("TIMESTAMP"), pinned)
    Thread.sleep(5)
    cat.append("t", docs(5, 10)) // omitted -> the SAME pinned instant
    assert(cat.scan("t").select("seen_at").distinct().count() == 1L)
  }
}
