package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.operators.SessionCaches.CheckpointOps

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2.5).
  *
  * Scale design: the query set is the small side and is broadcast — the
  * corpus is scored map-side with the codegen cosine expression and never
  * re-shuffled for brute force. Top-k is a two-phase reduction: a bounded
  * per-partition heap emits at most (#queries x k) rows per partition, and
  * only that partial set shuffles for the exact final rank — no stage ever
  * shuffles all scored rows onto #queries reducers. The LSH path buckets
  * the corpus once with banded multi-table SRP signatures (ids-only join;
  * vectors re-attached to surviving candidates) and exact-cosine re-ranks.
  */
object Similarity {

  /** Per-query exact top-k over a (query_id, neighbor_id, cosine) score
    * set, without a global shuffle of the scores.
    *
    * Phase 1 (map-side): bounded heap per (partition, query) — each input
    * partition emits at most #queries x k rows. Phase 2: exact rank over
    * the partial winners (tiny: #partitions x #queries x k rows).
    * Ordering is (cosine desc, neighbor_id asc), ties fully broken.
    *
    * Id columns keep their input types: integral ids take a primitive
    * LongMap fast path; string / floating ids a generic path keyed on the
    * untyped values (heap tie-break = the same natural ordering the rank
    * phase uses). Other id types are rejected loudly rather than silently
    * cast to null. */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = scored.sparkSession
    import spark.implicits._

    val qType = scored.schema("query_id").dataType
    val nType = scored.schema("neighbor_id").dataType
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

    val partial: DataFrame =
      if (integral(qType) && integral(nType)) {
        val typed = scored.select(
            col("query_id").cast("long"),
            col("neighbor_id").cast("long"),
            col("cosine").cast("double"))
          .as[(Long, Long, Double)]

        // head of the queue = current worst of the kept k (lowest cosine,
        // then largest neighbor id) so one compare decides evict-vs-skip
        val worstFirst: Ordering[(Double, Long)] =
          Ordering.by { case (c, id) => (-c, id) }

        typed.mapPartitions { it =>
          val heaps = scala.collection.mutable.LongMap
            .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
          it.foreach { case (q, id, c) =>
            val pq = heaps.getOrElseUpdate(q,
              scala.collection.mutable.PriorityQueue.empty(worstFirst))
            if (pq.size < k) pq.enqueue((c, id))
            else {
              val (wc, wid) = pq.head
              if (c > wc || (c == wc && id < wid)) { pq.dequeue(); pq.enqueue((c, id)) }
            }
          }
          heaps.iterator.flatMap { case (q, pq) =>
            pq.iterator.map { case (c, id) => (q, id, c) }
          }
        }.toDF("query_id", "neighbor_id", "cosine")
          .select(col("query_id").cast(qType), col("neighbor_id").cast(nType),
            col("cosine"))
      } else {
        def idOrdering(dt: DataType): Ordering[Any] = dt match {
          case StringType => Ordering.by((a: Any) => a.asInstanceOf[String])
          case FloatType  => Ordering.by((a: Any) => a.asInstanceOf[Float])
          case DoubleType => Ordering.by((a: Any) => a.asInstanceOf[Double])
          case other => throw new IllegalArgumentException(
            s"topKPerQuery: unsupported id type $other (use integral, string, " +
              "float or double ids)")
        }
        idOrdering(qType) // fail fast even though query ids only key a map
        val nOrd = idOrdering(nType)
        val worstFirst: Ordering[(Double, Any)] = new Ordering[(Double, Any)] {
          def compare(x: (Double, Any), y: (Double, Any)): Int = {
            val c = java.lang.Double.compare(y._1, x._1)
            if (c != 0) c else nOrd.compare(x._2, y._2)
          }
        }
        val prepared = scored.select(
          col("query_id"), col("neighbor_id"), col("cosine").cast("double"))
        val outSchema = StructType(Seq(
          StructField("query_id", qType), StructField("neighbor_id", nType),
          StructField("cosine", DoubleType)))
        val rdd = prepared.rdd.mapPartitions { it =>
          val heaps = scala.collection.mutable.HashMap
            .empty[Any, scala.collection.mutable.PriorityQueue[(Double, Any)]]
          it.foreach { row =>
            val q = row.get(0); val id = row.get(1); val c = row.getDouble(2)
            val pq = heaps.getOrElseUpdate(q,
              scala.collection.mutable.PriorityQueue.empty(worstFirst))
            if (pq.size < k) pq.enqueue((c, id))
            else if (worstFirst.compare((c, id), pq.head) < 0) {
              pq.dequeue(); pq.enqueue((c, id))
            }
          }
          heaps.iterator.flatMap { case (q, pq) =>
            pq.iterator.map { case (c, id) => org.apache.spark.sql.Row(q, id, c) }
          }
        }
        spark.createDataFrame(rdd, outSchema)
      }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
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
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed ANN: corpus signatures computed once (banded SRP,
    * `tables` hash tables of `bits` bits — multi-table banding keeps
    * recall high while each table stays selective; the signature pass is
    * the native one-pass [[graft.functions.SrpBands]]). A query matches a
    * corpus vector if they share any table's bucket; the candidate join
    * carries ids only, vectors re-attach to survivors, exact cosine
    * re-ranks via the partial top-k. Recall vs brute force is asserted in
    * SimilaritySpec. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, bits: Int = 8, tables: Int = 8, seed: Long = 0L): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))

    val cb = c.select(col("neighbor_id"),
      posexplode(srpBands(col("__cv"), bits, tables, seed)).as(Seq("__t", "__b")))
    val qb = q.select(col("query_id"),
      posexplode(srpBands(col("__qv"), bits, tables, seed)).as(Seq("__t", "__b")))

    val cand = cb.join(broadcast(qb), Seq("__t", "__b"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")

    val scored = cand
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** PCA-reduced ANN: candidates are generated in a PCA-projected
    * low-dimensional space (scoring cost drops by dims/pcaK per pair),
    * then re-ranked with the EXACT full-dimension cosine — the classic
    * reduce-then-refine pipeline (PCA projection preserves the dominant
    * variance directions, so true neighbors stay in the candidate set
    * when candidateFactor gives headroom). At 100 TB compose the reduced
    * space with [[ivfTopK]] instead of the reduced brute force used
    * here; the model fit is one distributed moment pass either way
    * ([[Embeddings.pca]]). Recall vs brute force asserted in
    * SimilaritySpec. */
  def pcaTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, pcaK: Int = 8, candidateFactor: Int = 4): DataFrame = {
    val model = Embeddings.pca(corpus, corpusVec, pcaK)
    def reduced(df: DataFrame, id: String, vec: String): DataFrame =
      Embeddings.project(df, id, vec, model)
        .select(col(id), transform(col("pc"), x => x.cast("float")).as("__pcf"))
    val cand = bruteForceTopK(
        reduced(corpus, corpusId, corpusVec), corpusId, "__pcf",
        reduced(queries, queryId, queryVec), queryId, "__pcf",
        k = k * candidateFactor)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    val scored = cand
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN — the second scale path, complementary to
    * SRP-LSH: better recall on clustered corpora, and the centroid
    * assignment is reusable across query batches.
    *
    *  1. `centroids` corpus vectors are picked as centroids by a
    *     DETERMINISTIC seeded sample (global sort on xxhash64(id) —
    *     K rows, driver never touches vectors).
    *  2. Every corpus vector is assigned to its nearest centroid: scored
    *     against the broadcast centroid set map-side, argmax via the
    *     bounded partial top-k (k=1) — the shuffle carries one row per
    *     corpus vector, never the N x K score set.
    *  3. A query probes the `nprobe` nearest centroid lists; candidates
    *     re-rank with the exact codegen cosine through the partial top-k.
    *
    * At scale, pick centroids ~ sqrt(corpus) so inverted lists stay
    * balanced and the probe join keys stay numerous (no few-reducer
    * skew). Recall vs brute force is asserted in SimilaritySpec. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, centroids: Int = 64, nprobe: Int = 8, seed: Long = 11L,
      refineSteps: Int = 0): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))

    // nearest centroid per corpus vector: map-side native argmax — no
    // N x K crossJoin, no N-row shuffle (see assignToCents)
    def assign(cents: DataFrame): DataFrame = assignToCents(c, cents)

    // centroids are MATERIALIZED (localCheckpoint, K tiny rows) at every
    // step: the centroid plan embeds a full corpus pass (TakeOrdered pick,
    // then one assignment pass per Lloyd step), and `cents` is broadcast
    // by several consumers (assignment, query probes) — without the
    // checkpoint each broadcast re-executes those corpus passes.
    var cents = c.orderBy(xxhash64(col("neighbor_id"), lit(seed)), col("neighbor_id"))
      .limit(centroids)
      .select(col("neighbor_id").as("cent_id"), col("__cv").as("cent_vec"))
      .trackedLocalCheckpoint()

    // optional Lloyd steps: recentre each inverted list on its mean via
    // the native VecSumF aggregate (K small arrays shuffle, no explode)
    for (_ <- 0 until refineSteps) {
      cents = assign(cents)
        .join(c, "neighbor_id")
        .groupBy(col("cent_id"))
        .agg(vecSumF(col("__cv")).as("__s"), count(lit(1)).as("__n"))
        .select(col("cent_id"),
          transform(col("__s"), x => (x / col("__n")).cast("float")).as("cent_vec"))
        .trackedLocalCheckpoint()
    }

    val assigned = assign(cents)

    // nprobe nearest centroid lists per query (Q x K is tiny)
    val probeScores = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id").as("neighbor_id"),
        round(cosineSimF(col("__qv"), col("cent_vec")), 6).as("cosine"))
    val probes = topKPerQuery(probeScores, nprobe)
      .select(col("query_id"), col("neighbor_id").as("cent_id"))

    val cand = assigned.join(broadcast(probes), "cent_id")
      .select(col("query_id"), col("neighbor_id"))

    val scored = cand
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVF with int8-quantized candidate scoring (the IVF-PQ shape with a
    * scalar quantizer): the probed candidates are first scored against
    * the INT8 corpus — cosine is scale-invariant, so symmetric per-vector
    * quantization needs no dequantization factor — and only the
    * quantized shortlist (k x candidateFactor per query) re-ranks with
    * the exact full-precision cosine. At 100 TB this is the memory
    * story: the corpus resident in the scoring path is byte arrays (4x
    * smaller in cache/shuffle than float32), full-precision vectors are
    * touched for k x candidateFactor rows per query only. Index build
    * (centroids, assignment, probes) stays full-precision — it is
    * one-time / tiny respectively. Recall floor asserted in
    * SimilaritySpec. */
  def ivfTopKQuantized(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, centroids: Int = 64, nprobe: Int = 8, seed: Long = 11L,
      candidateFactor: Int = 4, refineSteps: Int = 0): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))

    // symmetric int8: scale = max|x| / 127 per vector (emb_quantize's
    // exact arithmetic); byte arrays are what the candidate join carries
    val scale = array_max(transform(col("__cv"), x => abs(x))) / lit(127.0)
    val c8 = c.select(col("neighbor_id"),
      transform(col("__cv"), x =>
        greatest(lit(-127.0), least(lit(127.0), round(x / nullif(scale, lit(0.0)))))
          .cast("tinyint")).as("__q8"))

    // map-side native argmax assignment — see assignToCents
    def assign(cents: DataFrame): DataFrame = assignToCents(c, cents)
    // materialized like ivfTopK: the centroid plan is a corpus pass and
    // is broadcast by several consumers — checkpoint K tiny rows instead
    // of re-running those passes per consumer
    var cents = c.orderBy(xxhash64(col("neighbor_id"), lit(seed)), col("neighbor_id"))
      .limit(centroids)
      .select(col("neighbor_id").as("cent_id"), col("__cv").as("cent_vec"))
      .trackedLocalCheckpoint()
    // optional Lloyd steps (same recipe as ivfTopK): tighter cells raise
    // probe recall for the same nprobe
    for (_ <- 0 until refineSteps) {
      cents = assign(cents)
        .join(c, "neighbor_id")
        .groupBy(col("cent_id"))
        .agg(vecSumF(col("__cv")).as("__s"), count(lit(1)).as("__n"))
        .select(col("cent_id"),
          transform(col("__s"), x => (x / col("__n")).cast("float")).as("cent_vec"))
        .trackedLocalCheckpoint()
    }
    val assigned = assign(cents)
    val probeScores = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id").as("neighbor_id"),
        round(cosineSimF(col("__qv"), col("cent_vec")), 6).as("cosine"))
    val probes = topKPerQuery(probeScores, nprobe)
      .select(col("query_id"), col("neighbor_id").as("cent_id"))

    val cand = assigned.join(broadcast(probes), "cent_id")
      .select(col("query_id"), col("neighbor_id"))

    // quantized scoring pass: byte arrays only, dequantized per pair into
    // the codegen cosine (cosine ignores the per-vector scale)
    val candQ = cand
      .join(c8, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(transform(col("__q8"), x => x.cast("float")), col("__qv")), 4)
          .as("cosine"))
    val shortlist = topKPerQuery(candQ, k * candidateFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact full-precision re-rank of the shortlist only
    val scored = shortlist
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVF with TRUE product quantization (SURVEY §7's r5+ item): candidates
    * carry `m` one-byte subspace codeword ids instead of the vector — at
    * the default geometry (m=8 over 64 float dims) that is 8 bytes + one
    * reconstruction-norm float per candidate vs 256 bytes float32, a ~24x
    * reduction in what the candidate-scoring path holds in cache/shuffle
    * (the scalar-int8 variant stops at 4x). Scoring is asymmetric: each
    * query computes its m x ksub partial-dot table ONCE
    * ([[graft.functions.PqAdcTableExpr]]), and each candidate pair costs m
    * table lookups + adds instead of d multiply-adds. The PQ shortlist
    * (k x candidateFactor per query) re-ranks with the exact
    * full-precision cosine, so final scores are bit-equal to brute force
    * on the surfaced ids (SimilaritySpec asserts this and the recall
    * floor).
    *
    * Codebooks train driver-side on a BOUNDED deterministic sample of
    * `trainSample` corpus vectors (hash-ordered; O(1) in corpus scale —
    * the standard PQ training recipe), and the trained codec broadcasts
    * inside the expressions as ~4 KB of reference data. Index build
    * (coarse centroids, assignment, probes) is the same full-precision
    * machinery as [[ivfTopK]], with optional Lloyd `refineSteps`.
    *
    * `residual = true` (default) is the canonical IVFADC layout: codes
    * quantize r = v - c(v) against the vector's coarse centroid, whose
    * spread is one cell diameter instead of the whole space, so the same
    * codebook bits buy a finer grid; scoring decomposes dot(q, v_hat) =
    * dot(q, cent) + dot(q, r_hat) with the first term exact over the
    * tiny (query x probed-cell) frame. */
  /** A prebuilt IVF-PQ index: coarse centroids, the m-byte-encoded
    * corpus (persisted), the full-precision corpus for exact re-rank,
    * and the trained codec. At 100 TB the index is built ONCE and
    * amortized over every query batch — the same reuse seam as
    * [[Dedup.prepare]]; `unpersist()` when done. */
  final case class IvfPqIndex private[operators] (
      cents: DataFrame,   // (cent_id, cent_vec) — K rows, broadcast at use
      cPq: DataFrame,     // (neighbor_id, cent_id, __code, __rn), persisted
      corpus: DataFrame,  // (neighbor_id, __cv) for the exact re-rank
      codec: graft.functions.PqCodec,
      residual: Boolean) {
    def unpersist(): Unit = { cPq.unpersist(); () }
  }

  /** Nearest coarse centroid per corpus row — (neighbor_id, cent_id) as
    * ONE map-side projection: the bounded centroid table (K rows — the
    * old code broadcast it, which already implied a driver collect) is
    * inlined into the native [[graft.functions.NearestCentF]] argmax, so
    * the corpus is scored without materializing N x K crossJoin rows and
    * WITHOUT the N-row partial-top-1 + window shuffle the old plan paid.
    * Assignments are bit-identical (same cosine loop, same round-6, same
    * tie rule). `c` is the normalized (neighbor_id, __cv) frame. Shared
    * by the one-shot builds, the Lloyd steps and the persisted index's
    * delta encoder ([[VectorIndex]]). */
  private[graft] def assignToCents(c: DataFrame, cents: DataFrame): DataFrame = {
    val idType = cents.schema("cent_id").dataType
    val rows = cents.select(col("cent_id").cast("long"), col("cent_vec")).collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[java.lang.Float](1)
      .map(x => if (x == null) 0.0f else x.floatValue).toArray)
    // fail FAST on a null corpus vector (the crossJoin formulation this
    // replaced crashed its row encoder on nulls, and brute force still
    // errors on the same data — silently dropping the row would leave it
    // unreachable by any probe, an inconsistent null policy). The strict
    // (AssertNotNull) form also makes cent_id NON-NULLABLE, so downstream
    // joins add no IsNotNull filter — the pushed filter re-evaluated the
    // full K x d argmax a second time per corpus row. The cast back to
    // the caller's id type (mirrors topKPerQuery's cast-back) keeps the
    // persisted codes-table schema and join key types from drifting.
    val nearest = graft.functions.VectorFunctions.nearestCentFStrict(col("__cv"), ids, vecs)
    c.select(col("neighbor_id"), nearest.cast(idType).as("cent_id"))
  }

  /** The residual (or plain) encode input for a corpus row joined with
    * its centroid. Residual encoding is the canonical IVFADC layout:
    * codes quantize r = v - c(v), whose spread is a cell diameter
    * instead of the whole space — the same codebook bits buy a finer
    * grid. */
  private[operators] def encodeInput(residual: Boolean) =
    if (residual)
      zip_with(col("__cv"), col("cent_vec"), (a, b) => (a - b).cast("float"))
    else col("__cv")

  /** Encode `c` (neighbor_id, __cv) against FIXED centroids and a
    * TRAINED codec — one map-side pass producing the persisted code rows
    * (neighbor_id, cent_id, __code, __rn). This is the whole per-row
    * cost of an incremental index refresh: appended vectors run through
    * here, nothing else is touched. */
  private[operators] def encodeAgainst(
      c: DataFrame, cents: DataFrame, codec: graft.functions.PqCodec,
      residual: Boolean): DataFrame = {
    import graft.functions.PqFunctions
    val withCent = c.join(assignToCents(c, cents), "neighbor_id")
      .join(broadcast(cents), "cent_id")
    withCent
      .withColumn("__code", PqFunctions.pqEncode(encodeInput(residual), codec))
      .withColumn("__rn",
        if (residual) PqFunctions.pqResidualNorm(col("__code"), col("cent_vec"), codec)
        else PqFunctions.pqReconNorm(col("__code"), codec))
      .select(col("neighbor_id"), col("cent_id"), col("__code"), col("__rn"))
  }

  /** Train the coarse centroids (deterministic seeded pick + optional
    * Lloyd steps) and the PQ codec (bounded driver-side sample) for a
    * corpus. Shared by [[prepareIvfPq]] and [[VectorIndex.build]]. */
  private[operators] def trainIvfPq(
      c: DataFrame, centroids: Int, seed: Long, m: Int, ksub: Int,
      trainSample: Int, trainIters: Int, residual: Boolean,
      refineSteps: Int): (DataFrame, graft.functions.PqCodec) = {
    import graft.functions.PqCodec
    // materialized like ivfTopK: the centroid plan is a corpus pass, and
    // the returned cents are broadcast by the trainer's sample pull, the
    // encode pass and every query probe — checkpoint K tiny rows instead
    // of re-running those passes per consumer
    var cents = c.orderBy(xxhash64(col("neighbor_id"), lit(seed)), col("neighbor_id"))
      .limit(centroids)
      .select(col("neighbor_id").as("cent_id"), col("__cv").as("cent_vec"))
      .trackedLocalCheckpoint()
    // optional Lloyd steps (same recipe as ivfTopK): tighter coarse cells
    // mean smaller residuals, which the PQ codebooks then quantize better
    for (_ <- 0 until refineSteps) {
      cents = assignToCents(c, cents)
        .join(c, "neighbor_id")
        .groupBy(col("cent_id"))
        .agg(vecSumF(col("__cv")).as("__s"), count(lit(1)).as("__n"))
        .select(col("cent_id"),
          transform(col("__s"), x => (x / col("__n")).cast("float")).as("cent_vec"))
        .trackedLocalCheckpoint()
    }
    // bounded driver pull: trainSample encode inputs in deterministic
    // hash order (~0.5 MB at the defaults, independent of corpus size);
    // null vectors carry no codebook signal and would NPE the trainer
    val sample: Array[Array[Float]] = c
      .filter(col("__cv").isNotNull)
      .join(assignToCents(c, cents), "neighbor_id")
      .join(broadcast(cents), "cent_id")
      .orderBy(xxhash64(col("neighbor_id"), lit(seed + 7)), col("neighbor_id"))
      .limit(trainSample)
      .select(encodeInput(residual).as("__ti"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    (cents, PqCodec.train(sample, m, ksub, trainIters))
  }

  /** Build the IVF-PQ index for a corpus (see [[ivfTopKPQ]] for the
    * scheme). `storage = None` skips persistence for one-shot use. */
  def prepareIvfPq(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Int = 64, seed: Long = 11L, m: Int = 8, ksub: Int = 16,
      trainSample: Int = 2048, trainIters: Int = 8,
      residual: Boolean = true, refineSteps: Int = 0,
      storage: Option[org.apache.spark.storage.StorageLevel] =
        Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)): IvfPqIndex = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val (cents, codec) = trainIvfPq(c, centroids, seed, m, ksub,
      trainSample, trainIters, residual, refineSteps)
    // m-byte codes + reconstruction norm (|cent + r_hat| in residual
    // mode), derived map-side in one index-build pass over the corpus
    val cPq = encodeAgainst(c, cents, codec, residual)
    val stored = storage.map(cPq.persist).getOrElse(cPq)
    IvfPqIndex(cents, stored, c, codec, residual)
  }

  /** Query a prebuilt [[IvfPqIndex]]: probe, ADC-score, exact re-rank —
    * no index-build work on this path. */
  def ivfTopKPQ(
      index: IvfPqIndex, queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int, candidateFactor: Int): DataFrame = {
    import graft.functions.PqFunctions
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))

    val probeScores = q.crossJoin(broadcast(index.cents))
      .select(col("query_id"), col("cent_id").as("neighbor_id"),
        round(cosineSimF(col("__qv"), col("cent_vec")), 6).as("cosine"))
    val probes = topKPerQuery(probeScores, nprobe)
      .select(col("query_id"), col("neighbor_id").as("cent_id"))

    // residual scoring decomposes dot(q, v_hat) = dot(q, cent) +
    // dot(q, r_hat); the first term is exact per (query, probed cell) —
    // a Q x nprobe frame
    val probeDots = probes
      .join(broadcast(q), "query_id")
      .join(broadcast(index.cents), "cent_id")
      .select(col("query_id"), col("cent_id"),
        dotF(col("__qv"), col("cent_vec")).as("__qc"))

    // per-query ADC table + true query norm, computed once per query row
    val qAdc = q.select(col("query_id"),
      PqFunctions.pqAdcTable(col("__qv"), index.codec).as("__tab"),
      sqrt(dotF(col("__qv"), col("__qv"))).as("__qn"))

    // PQ scoring pass: codes + m table lookups per pair; approximate
    // cosine = dot(q, v_hat) / (|q| * |v_hat|), null-guarded for zeros.
    // Candidates come straight off the encoded corpus x probed cells.
    val adc = PqFunctions.pqAdcDot(col("__code"), col("__tab"), index.codec)
    val dotEst = if (index.residual) col("__qc") + adc else adc
    val base = index.cPq
      .join(broadcast(probes), "cent_id")
      .join(broadcast(qAdc), "query_id")
    val candQ = (if (index.residual) base.join(broadcast(probeDots), Seq("query_id", "cent_id"))
                 else base)
      .select(col("query_id"), col("neighbor_id"),
        round(dotEst / nullif(col("__qn") * col("__rn"), lit(0.0)), 4).as("cosine"))
    val shortlist = topKPerQuery(candQ, k * candidateFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact full-precision re-rank of the shortlist only
    val scored = shortlist
      .join(index.corpus, "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineSimF(col("__cv"), col("__qv")), 4).as("cosine"))
    topKPerQuery(scored, k)
  }

  def ivfTopKPQ(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 5, centroids: Int = 64, nprobe: Int = 8, seed: Long = 11L,
      candidateFactor: Int = 4, m: Int = 8, ksub: Int = 16,
      trainSample: Int = 2048, trainIters: Int = 8,
      residual: Boolean = true, refineSteps: Int = 0): DataFrame = {
    val index = prepareIvfPq(corpus, corpusId, corpusVec, centroids, seed, m,
      ksub, trainSample, trainIters, residual, refineSteps, storage = None)
    ivfTopKPQ(index, queries, queryId, queryVec, k, nprobe, candidateFactor)
  }
}
