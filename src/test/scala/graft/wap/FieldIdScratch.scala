package graft.wap

import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Scratch validation of Spark's parquet field-id matching (to be
  * replaced by the real rename spec). */
class FieldIdScratch extends SparkSpecBase {

  private def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong("parquet.field.id", id.toLong).build())

  test("scratch: rename resolves by field id; id-less files fall back by name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fieldid").toString
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")

    // file A: written WITH ids under the OLD name
    val dfA = Seq((1L, "x"), (2L, "y")).toDF("id", "old_name")
    val schemaA = StructType(Seq(
      withId(StructField("id", LongType), 1),
      withId(StructField("old_name", StringType), 2)))
    spark.createDataFrame(dfA.rdd, schemaA).write.parquet(s"$dir/a")

    // read with the NEW name bound to the same id
    val renamed = StructType(Seq(
      withId(StructField("id", LongType), 1),
      withId(StructField("new_name", StringType), 2)))
    val got = spark.read.schema(renamed).parquet(s"$dir/a")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "x"), (2L, "y")),
      s"field-id matching must serve old_name under new_name, got ${got.toSeq}")

    // file B: NO ids in the footer; same requested schema with ids.
    // PINNED Spark semantics: with ignoreMissing=true an id-less file
    // contributes NULL for EVERY id-ed requested column (no name
    // fallback) — which is why graft attaches an id-ed read schema ONLY
    // to tables whose files all carry ids (ids assigned at CREATE).
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    Seq((3L, "z")).toDF("id", "new_name").write.parquet(s"$dir/b")
    val both = spark.read.schema(renamed).parquet(s"$dir/b")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(both.toSeq == Seq((None, None)),
      s"id-less files must surface as all-NULL under id matching, got ${both.toSeq}")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    // a filter pushed on the renamed column against the id-matched file
    val filtered = spark.read.schema(renamed).parquet(s"$dir/a")
      .where("new_name = 'x'").collect()
    assert(filtered.length == 1 && filtered.head.getLong(0) == 1L)
  }
}
