package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Deduplication operators for LLM training-data pipelines (SURVEY §2.4).
  *
  * Scale design: nothing here collects to the driver or materializes a
  * cross join. MinHash signatures are computed in one projection (native
  * [[graft.functions.MinHashSig]] — no shingle explode); LSH banding
  * explodes exactly `bands` rows per doc; the candidate join shuffles on
  * (band, bucket) keys that are uniform by construction; the verify step
  * touches only candidate pairs. Dedup semantics are "drop any doc with a
  * near-duplicate of smaller id" — pairwise, no transitive closure, which
  * is the standard large-corpus behavior and needs no iterative jobs.
  */
object Dedup {

  /** Normalized lowercase tokens of a text column. */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9\\s]", " ")), "\\s+")

  /** Token n-gram shingles (distinct). Texts shorter than n tokens yield
    * their whole token string as a single shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Exact dedup: hash-groupBy on the raw text, keep the smallest id.
    * One shuffle on the text hash; count kept for observability. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Exact dedup on normalized text (lowercase, punctuation stripped,
    * whitespace collapsed). */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__norm", concat_ws(" ", tokens(col(textCol))))
      .groupBy(col("__norm"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Candidate near-duplicate pairs via MinHash + LSH banding, verified
    * with exact shingle-set Jaccard.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .withColumn("__sig", minhashSig(col("__sh"), numHashes))

    // band key: hash of each signature slice; explode = bands rows per doc
    val banded = sh.select(col("__id"), col("__sh"),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("__sig"), b * rows + 1, rows), lit(b))): _*)).as(Seq("__band", "__bkey")))

    val a = banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"), col("__sh").as("sh_a"))
    val b = banded.select(col("__band"), col("__bkey"), col("__id").as("id_b"), col("__sh").as("sh_b"))
    val candidates = a.join(b,
        a("__band") === b("__band") && a("__bkey") === b("__bkey") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash-LSH dedup: survivors after dropping every doc that has a
    * verified near-duplicate with a smaller id. */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashPairs(df, idCol, textCol, numHashes, bands, shingleN, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit signature, then block on rotated
    * 16-bit chunks (any pair within Hamming distance <= 3 shares at least
    * one of 4 chunks — pigeonhole), verify exact Hamming distance.
    * @return (id_a, id_b, hamming) with hamming <= maxHamming */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("__id"), simhash64(tokens(col(textCol))).as("__sig"))
    val chunked = sigs.select(col("__id"), col("__sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("__sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("__chunk", "__ckey")))
    val a = chunked.select(col("__chunk"), col("__ckey"), col("__id").as("id_a"), col("__sig").as("sig_a"))
    val b = chunked.select(col("__chunk"), col("__ckey"), col("__id").as("id_b"), col("__sig").as("sig_b"))
    a.join(b, a("__chunk") === b("__chunk") && a("__ckey") === b("__ckey") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** n-gram Jaccard similarity for given candidate pairs — exact verify
    * used standalone (small data) or downstream of LSH blocking. */
  def ngramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // blocking key: doc length bucket — exact small-scale verify path;
    // the scale path is minhashPairs (LSH blocking)
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
    val a = sh.select(col("__id").as("id_a"), col("__sh").as("sh_a"))
    val b = sh.select(col("__id").as("id_b"), col("__sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs, blocked by signed-random-
    * projection LSH buckets (exact within-bucket verify with the codegen
    * cosine). Pairs whose cosine >= threshold. */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val bucketed = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bucket", Similarity.srpBucket(col("__v"), planes))
    val a = bucketed.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("v_a"))
    val b = bucketed.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("v_b"))
    a.join(b, a("__bucket") === b("__bucket") && col("id_a") < col("id_b"))
      .withColumn("cosine", cosineSimF(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding near-dup survivors (drop docs with a near-dup of smaller id). */
  def embeddingDedup(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val dupIds = embeddingPairs(df, idCol, vecCol, threshold, planes)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}
