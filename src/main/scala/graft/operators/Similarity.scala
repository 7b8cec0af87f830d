package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2.5).
  *
  * Scale design: the query set is the small side and is broadcast — the
  * corpus is scored map-side with the codegen cosine expression and never
  * re-shuffled for brute force; only (corpus x queries) score rows move in
  * the per-query top-k shuffle, and AQE coalesces them. The LSH path
  * buckets the corpus once (reusable across query batches) and probes
  * only matching buckets.
  */
object Similarity {

  /** Signed-random-projection bucket id: `planes` hyperplanes with
    * hash-derived Rademacher (+1/-1) components — deterministic, no RNG
    * state, identical on every executor. Bit j = sign of <v, r_j>. */
  def srpBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // projection = sum_d v[d] * (+1|-1), the sign pattern derived from
      // xxhash64(plane, dim): reduce via aggregate over the vector
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * (pmod(xxhash64(lit(p), d), lit(2)) * 2 - 1).cast("float")),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_)).as("srp_bucket")
  }

  /** Brute-force cosine top-k: every query scored against every corpus
    * vector (the exactness baseline). Scores are rounded before ranking so
    * rank order is reproducible across engines; ties break on corpus id. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .withColumn("cosine", round(cosineSimF(col("__cv"), col("__qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** LSH-bucketed ANN: corpus bucketed by SRP signature once; each query
    * probes only its own bucket, then exact cosine re-ranks within it.
    * Falls back to nothing for empty buckets (recall/speed trade measured
    * in SimilaritySpec against the brute-force baseline). */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, planes: Int = 4): DataFrame = {
    val cb = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .withColumn("__bucket", srpBucket(col("__cv"), planes))
    val qb = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .withColumn("__bucket", srpBucket(col("__qv"), planes))
    val scored = cb.join(broadcast(qb), "__bucket")
      .withColumn("cosine", round(cosineSimF(col("__cv"), col("__qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
