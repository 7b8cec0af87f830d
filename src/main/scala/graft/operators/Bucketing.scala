package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) table layout (SURVEY §4). For fact-fact joins
  * that recur on the same key, bucketing both sides once removes the
  * shuffle from EVERY subsequent join/aggregation on that key — at 100 TB
  * the shuffle of the smaller fact table usually dominates the join, and
  * bucketing trades it for a one-time layout cost.
  *
  * Buckets are Spark's hash buckets (`bucketBy` + `sortBy`): two tables
  * bucketed into the same count on the join key produce SortMergeJoin
  * plans with NO Exchange on either side (asserted in BucketingSpec).
  * Pick bucket counts that divide evenly into cluster cores (e.g. 2-4x
  * executor count) and keep each bucket under a few hundred MB. */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table in the session catalog. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction when both were written with the same bucket count. */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
