package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a larger benchmark dataset from an existing SF directory by
  * deterministic key-shifted replication: fact/entity tables are unioned
  * `factor` times with every key column shifted by `copy * (max_key + 1)`,
  * so FK relationships, join selectivities and per-entity distributions
  * are preserved exactly while row counts scale linearly — the right
  * probe for "which plans go super-linear" (a faithful regenerated sf1
  * would need the driver's generator, which is not published; see
  * TESTDATA.md). Dimension tables (region/nation/supplier/part) stay
  * fixed, as TPC-H's own nation/region do.
  *
  * documents/embeddings are copied VERBATIM by default, not replicated:
  * replicating text ×N makes every doc an exact duplicate family, which
  * inverts the selectivity of the dedup/text family rather than scaling
  * it — those queries are benchmarked at driver SFs only (use
  * SPARK_GRAFT_ONLY to bench the scaled relational subset). A trailing
  * `--with-docs` ALSO key-shift-replicates documents (doc_id shifted,
  * text verbatim per copy): wrong for the similarity-sensitive families,
  * right for scaling the WAP lifecycle queries, whose work depends on
  * table/batch SIZE, never on text content.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <dstDir> [factor=10] [--with-docs]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcDir> <dstDir> [factor] [--with-docs]")
    val (src, dst) = (args(0), args(1))
    val withDocs = args.contains("--with-docs")
    val factor = args.drop(2).filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    val verbatim =
      if (withDocs) Seq("region", "nation", "supplier", "part", "embeddings")
      else Seq("region", "nation", "supplier", "part", "documents", "embeddings")
    for (t <- verbatim)
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def replicate(t: String, shifts: Map[String, Long]): Unit = {
      val df = read(t)
      (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, off)) =>
          d.withColumn(c, col(c) + lit(i * off))
        }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    // shared offsets keep FKs consistent across tables
    val custOff = maxOf(read("customer"), "c_custkey")
    val ordOff = maxOf(read("orders"), "o_orderkey")
    val evOff = maxOf(read("events"), "event_id")
    val userOff = maxOf(read("events"), "user_id")
    replicate("customer", Map("c_custkey" -> custOff))
    replicate("orders", Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    replicate("lineitem", Map("l_orderkey" -> ordOff))
    replicate("events", Map("event_id" -> evOff, "user_id" -> userOff))
    if (withDocs)
      replicate("documents", Map("doc_id" -> maxOf(read("documents"), "doc_id")))

    println(s"""{"scalegen":"done","src":"$src","dst":"$dst","factor":$factor}""")
    spark.stop()
  }
}
