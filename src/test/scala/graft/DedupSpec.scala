package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.VectorFunctions._

/** Value-level oracles for the hash/LSH dedup family (SURVEY §6): these
  * operators are not ANSI-SQL-expressible, so brute-force comparisons
  * computed IN THE TEST are their only correctness signal. */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic synthetic corpus: 40 base docs + 10 near-duplicates of
  // the first 10 (one token appended => token-trigram jaccard >= ~0.9 for
  // the longer docs) + 5 exact duplicates
  private lazy val docs: Seq[(Long, String)] = {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    val base = (0L until 40L).map { i =>
      val rnd = new scala.util.Random(i * 7919)
      i -> Seq.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
    }
    val nearDups = (0L until 10L).map(i => (100L + i) -> (base(i.toInt)._2 + " zulu"))
    val exactDups = (0L until 5L).map(i => (200L + i) -> base(i.toInt)._2)
    base ++ nearDups ++ exactDups
  }
  private lazy val docsDf = docs.toDF("doc_id", "text")

  /** in-test shingle sets via the same native expression (its own unit
    * tests below pin the definition) */
  private lazy val shingleSets: Map[Long, Set[Long]] =
    docsDf.select(col("doc_id"), shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    a.intersect(b).size.toDouble / a.union(b).size.toDouble

  private lazy val trueJaccard: Map[(Long, Long), Double] = {
    val ids = shingleSets.keys.toSeq.sorted
    (for { i <- ids; j <- ids if i < j }
      yield (i, j) -> jaccard(shingleSets(i), shingleSets(j))).toMap
  }

  test("shingle hashes: n-gram count, dedupe, short-text fallback") {
    val sh = Seq((1L, "a b c d"), (2L, "a b"), (3L, ""), (4L, "x x x x x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sh(1L).length == 2)              // [a b c], [b c d]
    assert(sh(2L).length == 1)              // short text -> one shingle
    assert(sh(3L).length == 1)              // empty text -> empty-shingle hash
    assert(sh(4L).length == 1)              // identical trigrams dedupe to 1
    assert(sh(1L).distinct.length == sh(1L).length)
  }

  test("minhash signature agreement estimates jaccard") {
    val sigs = docsDf.select(col("doc_id"),
        minhashSig(shingleHashes(col("text"), 3), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 128))
    // near-dup pairs (0,100)... : signature agreement ~ true jaccard
    for (i <- 0L until 10L) {
      val est = sigs(i).zip(sigs(100L + i)).count { case (a, b) => a == b } / 128.0
      val truth = trueJaccard((i, 100L + i))
      assert(math.abs(est - truth) < 0.2,
        s"pair ($i,${100 + i}): minhash est $est vs true $truth")
    }
    // exact dups agree on every component
    for (i <- 0L until 5L)
      assert(sigs(i) == sigs(200L + i), s"exact dup $i signature mismatch")
  }

  test("minhashPairs: precision 1.0 (exact verify) and high recall vs brute force") {
    val got = Dedup.minhashPairs(docsDf, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision: every returned pair really has jaccard >= 0.8 (and the
    // reported value matches the in-test recompute)
    got.foreach { case ((a, b), j) =>
      assert(trueJaccard((a, b)) >= 0.8, s"false positive ($a,$b) j=$j")
      assert(math.abs(trueJaccard((a, b)) - j) < 1e-3)
    }
    // recall: every true pair at jaccard >= 0.9 must be found (16 bands of
    // 8 rows: candidate probability > 0.999 at j=0.9)
    val strong = trueJaccard.filter(_._2 >= 0.9).keys.toSeq
    assert(strong.nonEmpty, "test corpus must contain strong near-dups")
    strong.foreach { p =>
      assert(got.contains(p), s"missed strong near-dup $p j=${trueJaccard(p)}")
    }
  }

  test("prepared projection: every variant equals its from-scratch result, one corpus pass") {
    val p = Dedup.prepare(docsDf, "doc_id", "text")
    try {
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairSet(Dedup.minhashPairs(p, bands = 16, threshold = 0.8)) ==
        pairSet(Dedup.minhashPairs(docsDf, "doc_id", "text", threshold = 0.8)))
      assert(pairSet(Dedup.ngramJaccard(p, threshold = 0.5)) ==
        pairSet(Dedup.ngramJaccard(docsDf, "doc_id", "text", threshold = 0.5)))
      assert(pairSet(Dedup.containmentPairs(p, bands = 32, threshold = 0.9)) ==
        pairSet(Dedup.containmentPairs(docsDf, "doc_id", "text", threshold = 0.9)))
      def idSet(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idSet(Dedup.minhashLsh(docsDf, "doc_id", p, bands = 16, threshold = 0.8)) ==
        idSet(Dedup.minhashLsh(docsDf, "doc_id", "text")))
      assert(idSet(Dedup.minhashLshClustered(docsDf, "doc_id", p, bands = 16, threshold = 0.8)) ==
        idSet(Dedup.minhashLshClustered(docsDf, "doc_id", "text")))
      assert(p.sh.storageLevel.useMemory || p.sh.storageLevel.useDisk,
        "prepared projection must be persisted")
    } finally p.unpersist()
  }

  test("minhashLsh survivors = all ids minus greater-id members of dup pairs") {
    val pairs = Dedup.minhashPairs(docsDf, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    val survivors = Dedup.minhashLsh(docsDf, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == docs.map(_._1).toSet -- dropped)
  }

  test("connectedComponents labels every node with its component minimum") {
    // components: {1,2,3} via non-monotone chain 2-3, 1-3; {10,11}; {20,21,22}
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusterDedup collapses transitive chains that pairwise dedup keeps") {
    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // doc 2's only duplicate-path to the minimum 1 runs through 3
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clustered = Dedup.clusterDedup(corpus, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clustered == Set(1L, 10L, 50L), "one representative per component")
    // the pairwise rule keeps 2 as well (no DIRECT smaller neighbor)
    val pairwise = corpus.join(
      pairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pairwise == Set(1L, 2L, 10L, 50L))
  }

  test("minhashLshClustered equals an in-test union-find over the verified pairs") {
    val pairs = Dedup.minhashPairs(docsDf, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // in-test union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedDropped = docs.map(_._1).filter(id => find(id) != id).toSet
    val survivors = Dedup.minhashLshClustered(docsDf, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == docs.map(_._1).toSet -- expectedDropped)
  }

  test("clusterDedupBest keeps each component's highest-quality member, ties to min id") {
    val corpus = Seq(
      (1L, "a", 10L), (2L, "b", 99L), (3L, "c", 99L), // one comp: 2 and 3 tie on quality
      (10L, "d", 5L), (11L, "e", 50L),                // one comp: 11 wins outright
      (50L, "f", 1L)                                  // singleton survives
    ).toDF("doc_id", "text", "n_chars")
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val best = Dedup.clusterDedupBest(corpus, "doc_id", pairs, col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 11L, 50L),
      s"quality argmax with min-id tiebreak: got $best")
    // min-id semantics would have kept {1, 10, 50} — the rules differ
    val minId = Dedup.clusterDedup(corpus, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 10L, 50L))
    // component count preserved: one survivor per component either way
    assert(best.size == minId.size)
  }

  test("containmentPairs catches doc-inside-doc pairs that jaccard under-scores") {
    // B = A + 60% more text: containment(A,B) = 1.0, jaccard ~ 0.62
    val base = docs.take(6).map(_._2)
    val contained = base.zipWithIndex.map { case (t, i) =>
      (300L + i, t + " " + docs(20 + i)._2.split(" ").take(18).mkString(" "))
    }
    val df = (docs.take(6) ++ contained ++ docs.drop(30).take(10)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until 6) {
      val pair = (i.toLong, 300L + i)
      assert(got.contains(pair), s"containment pair $pair missed; got ${got.keys}")
      assert(got(pair) >= 0.9)
    }
    // verify the in-test ground truth: containment high, jaccard below 0.8
    val sets = df.select(col("doc_id"), shingleHashes(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (i <- 0 until 6) {
      val (a, b) = (sets(i.toLong), sets(300L + i))
      val cont = a.intersect(b).size.toDouble / math.min(a.size, b.size)
      val jac = a.intersect(b).size.toDouble / a.union(b).size
      assert(cont >= 0.9 && jac < 0.8,
        s"test construction: containment $cont jaccard $jac")
    }
  }

  test("simhashPairs: exactly the brute-force hamming<=3 pairs (pigeonhole blocking is lossless)") {
    val sigs = docsDf.select(col("doc_id"), simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sigs.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (i, j, h)).toSet
    val got = Dedup.simhashPairs(docsDf, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got.map(t => (t._1, t._2, t._3)) ==
      expected.map(t => (t._1, t._2, t._3.toLong)))
    assert(expected.nonEmpty, "test corpus must contain simhash near-dups")
  }

  test("embeddingPairs: precision exact, recall ~1 for cosine>=0.99 dups") {
    val rnd = new scala.util.Random(42)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 30L).map(i => i -> unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    // near-dups: tiny perturbation => cosine ~0.999
    val dups = base.take(8).map { case (i, v) =>
      (100L + i) -> unit(v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val all = base ++ dups
    val df = all.toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (k <- a.indices) { d += a(k) * b(k).toDouble; na += a(k) * a(k).toDouble; nb += b(k) * b(k).toDouble }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = all.toMap
    val expected = (for {
      (i, _) <- all; (j, _) <- all if i < j
      c = cos(vecs(i), vecs(j)) if c >= 0.95
    } yield (i, j)).toSet
    assert(expected.size >= 8)
    val got = Dedup.embeddingPairs(df, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0: exact verify after blocking
    got.foreach { case (a, b) => assert(cos(vecs(a), vecs(b)) >= 0.95 - 1e-6) }
    // recall: banded SRP (16 tables x 12 bits) at cosine ~0.999 -> ~1.0
    val found = expected.count(got.contains)
    assert(found.toDouble / expected.size >= 0.9,
      s"embedding near-dup recall ${found.toDouble / expected.size}")
  }

  test("normHash64 equals normalized-string grouping and is order/format sensitive") {
    val texts = Seq((1L, "Hello,   World!"), (2L, "hello world"), (3L, "world hello"),
      (4L, "HELLO world."), (5L, ""))
    val h = texts.toDF("doc_id", "text")
      .select(col("doc_id"), normHash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L) && h(2L) == h(4L), "case/punct/whitespace normalize away")
    assert(h(2L) != h(3L), "token order must matter")
    assert(h(5L) != h(2L))
  }

  test("simhash string mode preserves token multiplicity") {
    val h = Seq((1L, "spam spam spam spam eggs"), (2L, "spam eggs"), (3L, "Spam  SPAM spam spam eggs!"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(3L), "normalization-equal multisets hash equal")
    assert(h(1L) != h(2L), "multiplicity must influence the vote")
  }

  test("LSH band joins resolve to DISTINCT sides (no trivially-true predicate)") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plans = Seq(
      Dedup.minhashPairs(docsDf, "doc_id", "text").queryExecution.analyzed,
      Dedup.simhashPairs(docsDf, "doc_id", "text").queryExecution.analyzed,
      Dedup.embeddingPairs(
        docsDf.select(col("doc_id"), array(lit(1.0f), lit(0.5f)).as("v")),
        "doc_id", "v").queryExecution.analyzed)
    for (plan <- plans) {
      val eqs = plan.collect { case j: Join =>
        j.condition.toSeq.flatMap(_.collect {
          case EqualTo(l: AttributeReference, r: AttributeReference) => (l, r)
        })
      }.flatten
      assert(eqs.nonEmpty, "band join must carry equi-conditions")
      for ((l, r) <- eqs)
        assert(l.exprId != r.exprId,
          s"join condition $l = $r references the SAME attribute on both sides " +
            "(trivially true => within-bucket cross join)")
    }
  }

  test("exact dedup keeps min id per duplicate group") {
    val out = Dedup.exact(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 5 exact dup groups collapse to the base id with n_copies=2
    for (i <- 0L until 5L) assert(out(i) == 2L, s"group $i n_copies=${out.get(i)}")
    assert(out.size == docs.size - 5)
  }
}
