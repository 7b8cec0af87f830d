package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Value oracles for the ANN surface: brute-force top-k must equal an
  * in-test exhaustive computation exactly; the LSH path must reach a
  * recall floor against that baseline (SURVEY §6). */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 24
  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    // clustered corpus: 8 centroids, members = centroid + noise, so each
    // query has genuinely-near neighbors (ANN recall on uniformly random
    // vectors is meaningless)
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0L until 200L).map { i =>
      val c = centroids((i % 8).toInt)
      i -> c.map(x => x + 0.3f * rnd.nextGaussian().toFloat)
    }
  }
  private lazy val queries: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(13)
    corpus.take(10).map { case (i, v) =>
      (1000L + i) -> v.map(x => x + 0.1f * rnd.nextGaussian().toFloat)
    }
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var k = 0
    while (k < math.min(a.length, b.length)) {
      d += a(k).toDouble * b(k); na += a(k).toDouble * a(k); nb += b(k).toDouble * b(k); k += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0) 0 else d / den
  }
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** exhaustive top-k with the operator's exact ordering contract:
    * rounded cosine desc, neighbor id asc */
  private def bruteTopK(k: Int): Map[Long, Seq[(Long, Int, Double)]] =
    queries.map { case (qid, qv) =>
      val ranked = corpus.map { case (cid, cv) => (cid, r4(cos(cv, qv))) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(k).zipWithIndex
        .map { case ((cid, c), idx) => (cid, idx + 1, c) }
      qid -> ranked
    }.toMap

  private lazy val corpusDf = corpus.toDF("vec_id", "embedding")
  private lazy val queryDf = queries.toDF("vec_id", "embedding")

  test("bruteForceTopK equals the in-test exhaustive ranking exactly") {
    val got = Similarity.bruteForceTopK(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(2)).map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      }
    val expected = bruteTopK(5)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, exp) =>
      assert(got(q) == exp, s"query $q: got ${got(q)} expected $exp")
    }
  }

  test("partial top-k is partition-count invariant") {
    val many = Similarity.bruteForceTopK(corpusDf.repartition(13), "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val one = Similarity.bruteForceTopK(corpusDf.coalesce(1), "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(many == one)
  }

  test("lshTopK: recall >= 0.6 vs brute force on clustered data, exact precision on scores") {
    val got = Similarity.lshTopK(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, bits = 8, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = corpus.toMap
    val qvecs = queries.toMap
    // every reported cosine is the true (rounded) cosine
    got.foreach { case (q, n, c) => assert(math.abs(c - r4(cos(vecs(n), qvecs(q)))) < 1e-9) }
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = expected.toSeq.map { case (q, exp) =>
      exp.count(gotByQ.getOrElse(q, Set.empty).contains).toDouble / exp.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.6, s"LSH recall $recall below floor")
  }

  test("ivfTopK: recall >= 0.8 vs brute force on clustered data, exact scores") {
    val got = Similarity.ivfTopK(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = corpus.toMap
    val qvecs = queries.toMap
    got.foreach { case (q, n, c) => assert(math.abs(c - r4(cos(vecs(n), qvecs(q)))) < 1e-9) }
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = expected.toSeq.map { case (q, exp) =>
      exp.count(gotByQ.getOrElse(q, Set.empty).contains).toDouble / exp.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.8, s"IVF recall $recall below floor")
  }

  test("ivfTopKQuantized: int8 candidate scoring keeps recall >= 0.8; final scores are exact") {
    val got = Similarity.ivfTopKQuantized(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = corpus.toMap
    val qvecs = queries.toMap
    // the re-rank reports FULL-PRECISION cosines despite int8 candidate scoring
    got.foreach { case (q, n, c) => assert(math.abs(c - r4(cos(vecs(n), qvecs(q)))) < 1e-9) }
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = expected.toSeq.map { case (q, exp) =>
      exp.count(gotByQ.getOrElse(q, Set.empty).contains).toDouble / exp.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.8, s"quantized IVF recall $recall below floor")
  }

  test("ivfTopKPQ: true PQ candidate scoring reaches the int8 recall floor; final scores exact") {
    val got = Similarity.ivfTopKPQ(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4,
        candidateFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = corpus.toMap
    val qvecs = queries.toMap
    // the re-rank reports FULL-PRECISION cosines despite m-byte candidate scoring
    got.foreach { case (q, n, c) => assert(math.abs(c - r4(cos(vecs(n), qvecs(q)))) < 1e-9) }
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = expected.toSeq.map { case (q, exp) =>
      exp.count(gotByQ.getOrElse(q, Set.empty).contains).toDouble / exp.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.8, s"PQ IVF recall $recall below floor")
  }

  test("ivfTopKPQ residual mode (IVFADC) matches non-residual recall on clustered data") {
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    def recall(res: Boolean): Double = {
      val got = Similarity.ivfTopKPQ(corpusDf, "vec_id", "embedding",
          queryDf, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4,
          candidateFactor = 8, residual = res, refineSteps = 1)
        .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val hits = expected.toSeq.map { case (q, exp) =>
        exp.count(got.getOrElse(q, Set.empty).contains).toDouble / exp.size }
      hits.sum / hits.size
    }
    val plain = recall(false)
    val resid = recall(true)
    // residual codes quantize a cell diameter instead of the whole space —
    // on clustered corpora that buys equal-or-better recall per bit
    assert(resid >= plain - 0.05, s"residual recall $resid collapsed vs plain $plain")
    assert(resid >= 0.8, s"residual recall $resid below floor")
  }

  test("prepareIvfPq: one index serves many query batches with one-shot-identical results") {
    val index = Similarity.prepareIvfPq(corpusDf, "vec_id", "embedding",
      centroids = 16, refineSteps = 1)
    try {
      def run(qs: Seq[(Long, Array[Float])]) =
        Similarity.ivfTopKPQ(index, qs.toDF("vec_id", "embedding"),
            "vec_id", "embedding", k = 3, nprobe = 4, candidateFactor = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch1 = queries.take(5)
      val batch2 = queries.drop(5)
      val oneShot = Similarity.ivfTopKPQ(corpusDf, "vec_id", "embedding",
          queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = 3, centroids = 16, nprobe = 4, candidateFactor = 8, refineSteps = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert((run(batch1) ++ run(batch2)) == oneShot,
        "per-batch queries over the shared index must equal the one-shot run")
    } finally index.unpersist()
  }

  test("PqCodec: m-byte codes, ADC dot equals dot(q, reconstruction), deterministic train") {
    import graft.functions.{PqCodec, PqFunctions}
    val samples = corpus.map(_._2).toArray
    val codec = PqCodec.train(samples, m = 8, ksub = 16, iters = 8)
    assert(codec.dsub == dim / 8)

    // the candidate representation really is m bytes (the memory claim)
    val encoded = corpusDf
      .select(PqFunctions.pqEncode(col("embedding"), codec).as("code"))
    assert(encoded.schema("code").dataType == org.apache.spark.sql.types.BinaryType)
    val codes = encoded.collect().map(_.getAs[Array[Byte]](0))
    assert(codes.forall(_.length == 8))

    // ADC identity: table lookups sum to dot(q, c_hat) against the codec's
    // own reconstruction, and reconNorm is |c_hat|
    def reconstruct(code: Array[Byte]): Array[Float] =
      Array.tabulate(dim) { i =>
        val sub = i / codec.dsub
        val base = (sub * codec.ksub + (code(sub) & 0xff)) * codec.dsub
        codec.codebooks(base + (i % codec.dsub))
      }
    val (qid0, qv0) = queries.head
    val tableDf = queryDf.filter(col("vec_id") === qid0)
      .select(PqFunctions.pqAdcTable(col("embedding"), codec).as("t"))
    val table = tableDf.collect().head.getSeq[Float](0)
    corpus.take(20).foreach { case (_, cv) =>
      val code = codec.encode(new org.apache.spark.sql.catalyst.util.GenericArrayData(cv))
      val chat = reconstruct(code)
      val wantDot = qv0.zip(chat).map { case (a, b) => a.toDouble * b }.sum
      val gotDot = (0 until 8).map(s => table(s * codec.ksub + (code(s) & 0xff)).toDouble).sum
      assert(math.abs(gotDot - wantDot) < 1e-3, s"ADC dot $gotDot != $wantDot")
      val wantNorm = math.sqrt(chat.map(x => x.toDouble * x).sum)
      assert(math.abs(codec.reconNorm(code) - wantNorm) < 1e-5)
    }

    // training is deterministic (same sample order, same codebooks)
    val codec2 = PqCodec.train(samples, m = 8, ksub = 16, iters = 8)
    assert(java.util.Arrays.equals(codec.codebooks, codec2.codebooks))

    // quantization actually quantizes toward the data: mean reconstruction
    // error is well below the mean vector norm
    val errs = corpus.map { case (_, cv) =>
      val code = codec.encode(new org.apache.spark.sql.catalyst.util.GenericArrayData(cv))
      val chat = reconstruct(code)
      math.sqrt(cv.zip(chat).map { case (a, b) => val d = a - b; d.toDouble * d }.sum)
    }
    val norms = corpus.map { case (_, cv) => math.sqrt(cv.map(x => x.toDouble * x).sum) }
    assert(errs.sum / errs.size < 0.5 * norms.sum / norms.size,
      s"mean recon error ${errs.sum / errs.size} vs mean norm ${norms.sum / norms.size}")
  }

  test("ivfTopKPQ plans ADC scoring over binary codes in the optimized plan") {
    import graft.functions.PqAdcDotExpr
    val df = Similarity.ivfTopKPQ(corpusDf, "vec_id", "embedding",
      queryDf, "vec_id", "embedding", k = 3, centroids = 16, nprobe = 4)
    // structural search (plan STRINGS truncate on wide plans). Over this
    // test's LocalRelation corpus, ConvertToLocalRelation folds the pure
    // encode/table projections into precomputed rows at optimization
    // time — itself evidence they are side-effect-free projections — so
    // the one expression that must survive is the per-pair ADC dot fed
    // by the candidate JOIN, and its code input must be BINARY (the
    // m-byte representation), never a float vector.
    val adcDots = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case e: PqAdcDotExpr => e })
    }.flatten
    assert(adcDots.nonEmpty, "candidate scoring must go through the ADC table")
    adcDots.foreach { e =>
      assert(e.left.dataType == org.apache.spark.sql.types.BinaryType,
        "ADC scoring must consume m-byte PQ codes")
    }
  }

  test("ivfTopK Lloyd refinement never hurts recall on clustered data") {
    val expected = bruteTopK(5).map { case (q, rs) => q -> rs.map(_._1).toSet }
    def recall(steps: Int): Double = {
      val got = Similarity.ivfTopK(corpusDf, "vec_id", "embedding",
          queryDf, "vec_id", "embedding", k = 5, centroids = 16, nprobe = 4,
          refineSteps = steps)
        .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val hits = expected.toSeq.map { case (q, exp) =>
        exp.count(got.getOrElse(q, Set.empty).contains).toDouble / exp.size }
      hits.sum / hits.size
    }
    val r0 = recall(0)
    val r1 = recall(1)
    assert(r1 >= r0 - 0.05, s"refined recall $r1 collapsed vs unrefined $r0")
    assert(r1 >= 0.8, s"refined recall $r1")
  }

  test("bruteForceTopK supports string ids and preserves id types") {
    // same vectors, ids rendered as zero-padded strings so the string
    // sort order equals the numeric order used by the long-id baseline
    val sCorpus = corpus.map { case (i, v) => (f"c$i%04d", v) }.toDF("vec_id", "embedding")
    val sQueries = queries.map { case (i, v) => (f"q$i%04d", v) }.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(sCorpus, "vec_id", "embedding",
        sQueries, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    val expected = bruteTopK(5)
    assert(got.keySet == expected.keySet.map(q => f"q$q%04d"))
    for ((qid, rows) <- got) {
      val want = expected(qid.stripPrefix("q").toLong)
        .map { case (cid, rk, c) => (f"c$cid%04d", rk, c) }
      val have = rows.toSeq.sortBy(_._3).map { case (_, cid, rk, c) => (cid, rk, c) }
      assert(have == want, s"query $qid: $have != $want")
    }
    // long-id results keep their input type (not silently widened)
    val typed = Similarity.bruteForceTopK(
        corpus.map { case (i, v) => (i.toInt, v) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding",
        queries.map { case (i, v) => (i.toInt, v) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3)
    assert(typed.schema("query_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(typed.schema("neighbor_id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(typed.count() == queries.size * 3)
  }

  test("pcaTopK: reduced-space candidates + exact re-rank reach a recall floor") {
    val brute = bruteTopK(5)
    val got = Similarity.pcaTopK(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, pcaK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.toSeq.map { case (qid, want) =>
      want.map(_._1).count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    val recall = hits.toDouble / (brute.size * 5)
    assert(recall >= 0.8, s"pca-reduced recall $recall")
    // ranks returned are exact full-dimension cosine order
    val ranked = Similarity.pcaTopK(corpusDf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, pcaK = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    ranked.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b },
        "cosines must descend with rank")
    }
  }

  test("ivfTopK is deterministic across runs (seeded centroid sample)") {
    def run() = Similarity.ivfTopK(corpusDf.repartition(7), "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 3, centroids = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run() == run())
  }

  test("vecSumF aggregates element-wise, skips nulls, partition-invariant") {
    import graft.functions.VectorFunctions.vecSumF
    val data = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(10.0f, 20.0f, 30.0f)),
      (2L, Array(0.5f, 0.5f, 0.5f)),
      (2L, null.asInstanceOf[Array[Float]]))
    val df = data.toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("g")).agg(vecSumF(col("v")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val a = run(df)
    assert(a(1L) == Seq(11.0, 22.0, 33.0))
    assert(a(2L) == Seq(0.5, 0.5, 0.5), "null vectors contribute nothing")
    assert(run(df.repartition(5)) == a)
  }

  test("srp bands are deterministic across evaluations") {
    import graft.functions.VectorFunctions._
    val a = corpusDf.select(srpBands(col("embedding"), 8, 8).as("b")).collect().map(_.getSeq[Long](0))
    val b = corpusDf.select(srpBands(col("embedding"), 8, 8).as("b")).collect().map(_.getSeq[Long](0))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.length == 8))
    assert(a.forall(_.forall(k => k >= 0 && k < 256)))
  }

  test("map-side assignToCents equals the crossJoin + top-1 formulation it replaced") {
    import graft.functions.VectorFunctions._
    // the r16 optimization replaced the N x K crossJoin + partial-top-1 +
    // window assignment with the native NearestCentF argmax — this pins
    // bit-identical assignments, including the tie rule (equal rounded
    // cosine -> smaller centroid id), on clustered data plus PLANTED
    // exact ties (duplicate centroids under different ids)
    val c = corpusDf.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    val base = corpus.take(6)
    val cents = (base.map { case (i, v) => (i, v) } ++
      base.take(2).map { case (i, v) => (i + 500L, v) }) // exact-tie duplicates
      .toDF("cent_id", "cent_vec")
      .select(col("cent_id"), transform(col("cent_vec"), x => x.cast("float")).as("cent_vec"))
    val got = Similarity.assignToCents(c, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scores = c.crossJoin(broadcast(cents))
      .select(col("neighbor_id").as("query_id"), col("cent_id").as("neighbor_id"),
        round(cosineSimF(col("__cv"), col("cent_vec")), 6).as("cosine"))
    val want = Similarity.topKPerQuery(scores, 1)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // every duplicated centroid's tie resolved to the SMALLER id
    assert(got.values.forall(_ < 500L))
  }

  test("assignToCents runs whole-stage-codegen'd, once per row, and fails fast on nulls") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // repartition so the input is not a LocalRelation (those constant-fold
    // the projection at optimization time and never reach codegen)
    val c = corpusDf.repartition(2)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    val cents = corpus.take(4).toDF("cent_id", "cent_vec")
      .select(col("cent_id"), transform(col("cent_vec"), x => x.cast("float")).as("cent_vec"))
    val assigned = Similarity.assignToCents(c, cents)
    // a janino compile failure must FAIL here, not silently interpret
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assigned.collect() // materialize THROUGH this Dataset's queryExecution
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // r17: NearestCentF grew doGenCode — the assignment projection must sit
    // INSIDE a WholeStageCodegen span (CodegenFallback broke the whole
    // stage), and AssertNotNull's non-nullable output must keep downstream
    // IsNotNull filters (which re-evaluated the K x d argmax) out of plans.
    // executedPlan is read AFTER the collect so AQE has collapsed codegen
    // stages into the final plan.
    val executed = assigned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps stages in QueryStageExec nodes that `collect` does not
    // descend into, so assert on the rendered plan: the `*(n)` prefix IS
    // the WholeStageCodegen span marker
    val planStr = executed.toString
    val codegenLine = planStr.linesIterator
      .exists(l => l.contains("nearest_cent_f") && l.contains("*("))
    assert(codegenLine, s"assignment projection not codegen'd:\n$planStr")
    assert(!assigned.schema("cent_id").nullable, "cent_id must be non-nullable")
    // exactly ONE argmax evaluation per row in the whole plan
    assert(executed.toString.split("nearest_cent_f").length - 1 == 1)
    // null corpus vector: fail fast (matching brute force), never a drop
    val withNull = c.unionByName(Seq((999L, null.asInstanceOf[Array[Float]]))
      .toDF("neighbor_id", "__cv"))
    val e = intercept[Exception] {
      Similarity.assignToCents(withNull, cents)
        .write.format("noop").mode("overwrite").save()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("null")),
      s"expected a null-vector failure, got: ${messages(e)}")
  }
}
