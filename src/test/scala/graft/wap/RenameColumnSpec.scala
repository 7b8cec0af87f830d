package graft.wap

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpecBase, Tables}

/** W59 — `renameColumn`: one metadata commit, no data rewritten. Every
  * post-r12 table writes a STABLE parquet field id into each file footer
  * (ids minted at CREATE, [[SchemaEvo.forSchema]]) and attaches ids to
  * every read schema, so Spark's `spark.sql.parquet.fieldId.read`
  * matching resolves a renamed column IN OLD FILES by id — the Iceberg
  * rename mechanism, through Spark's native reader. */
class RenameColumnSpec extends SparkSpecBase {

  private var n = 0
  private def freshCat(): BranchCatalog = {
    n += 1
    new BranchCatalog(spark, Files.createTempDirectory(s"rename$n").toString)
  }

  private def docs(lo: Long, hi: Long): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "lang", "n_chars")

  test("rename is metadata-only: old files serve the column by field id") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    val before = cat.dataFiles("t").map(_.path).toSet
    val want = docs(0, 100).select(col("doc_id"), col("n_chars").as("chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    cat.renameColumn("t", "n_chars", "chars")
    assert(cat.dataFiles("t").map(_.path).toSet == before, "rename rewrote data")
    val schema = cat.schemaOfSnapshot("t", cat.snapshotIdOf("t").get)
    assert(schema.fieldNames.toSeq == Seq("doc_id", "lang", "chars"))

    val got = cat.scan("t").select("doc_id", "chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == want, "pre-rename files must serve the column under its new name")
  }

  test("appends after rename mix with pre-rename files; filters stay exact") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.renameColumn("t", "n_chars", "chars")
    // post-rename append arrives under the NEW name
    cat.append("t", docs(100, 200).withColumnRenamed("n_chars", "chars"))

    val all = docs(0, 200)
    assert(cat.scan("t").count() == all.count())
    // a filter on the renamed column crosses both file generations:
    // old files have footer stats keyed by the OLD name (conservative
    // keep), new files prune normally — values must be exact either way
    val got = cat.scan("t", filter = Some(col("chars") > 400))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = all.filter(col("n_chars") > 400)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // IS NULL / IS NOT NULL across generations stay sound too
    assert(cat.scan("t", filter = Some(col("chars").isNull)).count() == 0L)
    assert(cat.scan("t", filter = Some(col("chars").isNotNull)).count() == all.count())
  }

  test("time travel serves each snapshot under ITS schema") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    val s1 = cat.append("t", docs(0, 50))
    cat.renameColumn("t", "lang", "language")
    val old = cat.scanSnapshot("t", s1.id)
    assert(old.schema.fieldNames.contains("lang") &&
      !old.schema.fieldNames.contains("language"))
    assert(cat.scan("t").schema.fieldNames.contains("language"))
    assert(old.select("lang").distinct().count() ==
      cat.scan("t").select("language").distinct().count())
  }

  test("CoW delete and update work through renamed columns") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 100))
    cat.renameColumn("t", "n_chars", "chars")
    val r = cat.deleteWhere("t", col("chars") < 300)
    val expectDel = docs(0, 100).filter(col("n_chars") < 300).count()
    assert(r.rowsDeleted == expectDel)
    assert(cat.scan("t").count() == 100 - expectDel)
    cat.updateWhere("t", col("chars") >= 300, Map("chars" -> lit(0L)))
    assert(cat.scan("t").filter(col("chars") =!= 0L).count() == 0L)
  }

  test("refusals: target exists, partition source, pending MOR keys, missing column") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    intercept[IllegalArgumentException](cat.renameColumn("t", "n_chars", "lang"))
    intercept[Exception](cat.renameColumn("t", "nope", "x"))
    // hidden-partition source column
    val cat2 = freshCat()
    cat2.createTableIfNotExists("p", docs(0, 1).schema,
      spec = Some(PartitionSpec.parse("bucket(4,doc_id)")))
    cat2.append("p", docs(0, 50))
    val e = intercept[IllegalArgumentException](cat2.renameColumn("p", "doc_id", "id"))
    assert(e.getMessage.contains("hidden-partition"))
    // pending equality tombstones keyed on the column
    val cat3 = freshCat()
    cat3.createTableIfNotExists("m", docs(0, 1).schema)
    cat3.append("m", docs(0, 50))
    cat3.deleteKeysMOR("m", docs(0, 5).select("doc_id"))
    val e2 = intercept[IllegalArgumentException](cat3.renameColumn("m", "doc_id", "id"))
    assert(e2.getMessage.contains("tombstones"))
    cat3.compactDataFiles("m")
    cat3.renameColumn("m", "doc_id", "id") // materialized: now fine
    assert(cat3.scan("m").select("id").count() == 45)
  }

  test("name-reuse is guarded: renaming onto a retired name needs a rewrite first") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    // retire `n_chars` by renaming it away; its stats still sit in the
    // old files' footers under that name
    cat.renameColumn("t", "n_chars", "chars")
    val e = intercept[IllegalArgumentException](cat.renameColumn("t", "lang", "n_chars"))
    assert(e.getMessage.contains("existed until"),
      s"stale-stats name reuse must refuse, got: ${e.getMessage}")
    // same guard blocks ADD COLUMN under the retired name (evolveSchema)
    val cur = cat.schemaOfSnapshot("t", cat.snapshotIdOf("t").get)
    intercept[IllegalArgumentException](cat.evolveSchema("t",
      StructType(cur.fields :+ StructField("n_chars", LongType, nullable = true))))
    // a full rewrite stamps current names/ids everywhere and unblocks
    cat.compactDataFiles("t")
    cat.renameColumn("t", "lang", "n_chars")
    assert(cat.scan("t").select("n_chars").distinct().count() > 0)
  }

  test("export refuses while pre-rename files pend; a rewrite re-enables it") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.renameColumn("t", "n_chars", "chars")
    val dest = Files.createTempDirectory("rename-export").toString + "/out"
    val e = intercept[IllegalArgumentException](cat.exportSnapshot("t", dest))
    assert(e.getMessage.contains("renamed columns"))
    cat.compactDataFiles("t") // files now carry current names
    val exported = cat.exportSnapshot("t", dest)
    assert(exported.fileCount > 0)
    // after the rewrite the files really do carry the new name (a foreign
    // by-name reader sees `chars`)
    val plain = spark.read.parquet(cat.dataFiles("t").map(_.path): _*)
    assert(plain.schema.fieldNames.contains("chars"))
  }

  test("rename survives branch publish (3-way merge carries the schema commit)") {
    val cat = freshCat()
    cat.createTableIfNotExists("t", docs(0, 1).schema)
    cat.append("t", docs(0, 50))
    cat.createBranch("work")
    cat.renameColumn("t", "n_chars", "chars", branch = "work")
    cat.append("t", docs(50, 80).withColumnRenamed("n_chars", "chars"), branch = "work")
    cat.merge("work")
    val sch = cat.schemaOfSnapshot("t", cat.snapshotIdOf("t").get)
    assert(sch.fieldNames.contains("chars"))
    assert(cat.scan("t").count() == 80)
    assert(cat.scan("t").agg(sum("chars")).head.getLong(0) ==
      docs(0, 80).agg(sum("n_chars")).head.getLong(0))
  }
}
