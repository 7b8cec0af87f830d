package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins: match points to [lo, hi) intervals.
  *
  * Spark has no native range-join operator; a plain non-equi join plans a
  * BroadcastNestedLoopJoin (O(points x ranges) comparisons — fine for a
  * handful of ranges, fatal for an IP-to-geo style table with millions).
  * The scale path here is BUCKET DECOMPOSITION: pick a bucket width, each
  * interval explodes to the buckets it covers, each point computes its
  * bucket, and the match becomes an EQUI-join on the bucket key followed
  * by the exact bounds filter — a hash join Catalyst can shuffle or
  * broadcast like any other, with work proportional to
  * points + ranges x (avg interval width / bucket width).
  */
object Ranges {

  /** Inner interval join: one output row per (point row, containing
    * interval). Intervals are [lo, hi) half-open; overlapping intervals
    * yield multiple matches. `width` trades explode factor against bucket
    * selectivity — pick it near the median interval width so most
    * intervals cover O(1) buckets.
    *
    * The bucket key is floor(x / width) via integer-safe arithmetic on
    * doubles; the exact predicate re-checks bounds, so bucketing only
    * affects performance, never results. */
  def intervalJoin(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def bucketOf(c: org.apache.spark.sql.Column) = floor(c / lit(width)).cast("long")
    // an interval covers buckets floor(lo/w) .. floor(hi/w); hi is
    // exclusive but a point in [hi-epsilon, hi) shares hi's bucket, so
    // the hi bucket stays included and the exact filter decides
    val banded = ranges.withColumn("__b",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    points.withColumn("__b", bucketOf(col(pointCol)))
      .join(banded, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }
}
