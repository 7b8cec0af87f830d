package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.wap.BranchCatalog

/** The SQL surface of column DEFAULTs (W71): CREATE TABLE / ADD COLUMN /
  * ALTER COLUMN SET|DROP DEFAULT through the connector, INSERTs that omit
  * defaulted columns or write the DEFAULT keyword, and connector reads
  * serving initial defaults from pre-add files. */
class DefaultsSqlSpec extends SparkSpecBase {

  private var n = 0
  private def register(): (String, BranchCatalog) = {
    n += 1
    val name = s"deflake$n"
    val root = Files.createTempDirectory("sql-defaults").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.write.main", "true")
    (name, new BranchCatalog(spark, root))
  }

  test("CREATE TABLE ... DEFAULT + INSERT: omitted columns and the DEFAULT keyword fill") {
    val (lake, _) = register()
    spark.sql(s"CREATE TABLE $lake.main.t (id BIGINT, lang STRING DEFAULT 'en', score BIGINT DEFAULT 5)")
    spark.sql(s"INSERT INTO $lake.main.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $lake.main.t VALUES (2, 'fr', DEFAULT)")
    spark.sql(s"INSERT INTO $lake.main.t VALUES (3, NULL, 9)")
    val rows = spark.sql(s"SELECT * FROM $lake.main.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "en", 5L), (2L, "fr", 5L), (3L, null, 9L)))
  }

  test("ALTER TABLE ADD COLUMN DEFAULT: connector reads serve it from pre-add files") {
    val (lake, cat) = register()
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 30)
      .select("doc_id", "lang")
    cat.createTableIfNotExists("docs", docs.schema)
    cat.append("docs", docs)
    spark.sql(s"ALTER TABLE $lake.main.docs ADD COLUMN score BIGINT DEFAULT 7")
    // connector read path (not the Scala scan): pre-add files fill 7
    assert(spark.sql(s"SELECT count(*) FROM $lake.main.docs WHERE score = 7")
      .head.getLong(0) == 30L)
    assert(spark.sql(s"SELECT count(*) FROM $lake.main.docs WHERE score IS NULL")
      .head.getLong(0) == 0L)
    // write through SQL omitting the column: write default fills
    spark.sql(s"INSERT INTO $lake.main.docs (doc_id, lang) VALUES (1000, 'xx')")
    assert(spark.sql(s"SELECT score FROM $lake.main.docs WHERE doc_id = 1000")
      .head.getLong(0) == 7L)
  }

  test("ALTER COLUMN SET/DROP DEFAULT move future writes only") {
    val (lake, _) = register()
    spark.sql(s"CREATE TABLE $lake.main.t (id BIGINT, v BIGINT DEFAULT 1)")
    spark.sql(s"INSERT INTO $lake.main.t (id) VALUES (1)")
    spark.sql(s"ALTER TABLE $lake.main.t ALTER COLUMN v SET DEFAULT 2")
    spark.sql(s"INSERT INTO $lake.main.t (id) VALUES (2)")
    spark.sql(s"ALTER TABLE $lake.main.t ALTER COLUMN v DROP DEFAULT")
    spark.sql(s"INSERT INTO $lake.main.t (id) VALUES (3)")
    val got = spark.sql(s"SELECT id, v FROM $lake.main.t ORDER BY id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, -1L)))
  }

  test("time travel through the connector predates the default") {
    val (lake, cat) = register()
    spark.sql(s"CREATE TABLE $lake.main.t (id BIGINT)")
    spark.sql(s"INSERT INTO $lake.main.t VALUES (1), (2)")
    val preAdd = cat.snapshotIdOf("t").get
    spark.sql(s"ALTER TABLE $lake.main.t ADD COLUMN v BIGINT DEFAULT 42")
    assert(spark.sql(s"SELECT sum(v) FROM $lake.main.t").head.getLong(0) == 84L)
    val old = spark.sql(s"SELECT * FROM $lake.main.t VERSION AS OF '$preAdd'")
    assert(!old.columns.contains("v"))
    assert(old.count() == 2L)
  }
}
