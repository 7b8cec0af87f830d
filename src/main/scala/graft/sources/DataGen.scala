package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic data generator — the reference's ingest tooling
  * (data_loader.py:36-116: columns my_col_0 int32 / my_col_1 string /
  * my_col_2 float64, optional NULL injection to make the audit fail).
  *
  * Re-expressed distributed: `spark.range(n)` partitions the id space
  * across executors and every value is a pure hash of the row id — no
  * driver-side loop, no RNG state, reproducible at any scale and any
  * partitioning.
  */
object DataGen {

  private val words = Seq("amber", "bolt", "cedar", "drift", "ember", "flint",
    "grove", "harbor", "iris", "jasper", "kite", "lunar", "maple", "nectar",
    "onyx", "pine", "quartz", "river", "slate", "tidal")

  /** n rows of the reference's 3-column schema. When injectNulls is set,
    * every nullEvery-th row carries a NULL my_col_1 (the column the
    * reference's quality check audits). */
  def customerBatch(spark: SparkSession, n: Long, injectNulls: Boolean = false,
      nullEvery: Int = 100, seed: Long = 42L): DataFrame = {
    val base = spark.range(n)
    val h = hash(col("id"), lit(seed))
    val wordAt = (i: Int) => element_at(
      array(words.map(lit): _*), (pmod(hash(col("id"), lit(seed + i)), lit(words.size)) + 1).cast("int"))
    val str = concat_ws(" ", wordAt(1), wordAt(2), wordAt(3))
    base.select(
      pmod(h, lit(1317317)).cast("int").as("my_col_0"),
      (if (injectNulls) when(col("id") % nullEvery =!= 0, str) else str).as("my_col_1"),
      (abs(hash(col("id"), lit(seed + 7))).cast("double") / Int.MaxValue.toDouble * 1000.0).as("my_col_2"))
  }
}
