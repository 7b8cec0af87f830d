package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** Value oracles for the PCA/whitening pipeline: the distributed moment
  * pass must reproduce an in-test exact covariance, and the extracted
  * eigenpairs must satisfy the defining algebra (no eigensolver to
  * compare against in this sandbox — the properties ARE the spec). */
class EmbeddingsSpec extends SparkSpecBase {

  private lazy val embDf = Tables.embeddings(spark, sfDir)
  private lazy val vecs: Array[Array[Double]] =
    embDf.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
  private lazy val d = vecs.head.length

  private lazy val exactCov: Array[Array[Double]] = {
    val n = vecs.length.toDouble
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
  }

  test("pca: moments match the exact covariance; eigenpairs satisfy the algebra") {
    val model = Embeddings.pca(embDf, "embedding", k = 6)
    assert(model.rows == vecs.length)
    // spot-check covariance through the eigen residual AND directly via
    // the quadratic form on a unit basis vector pair
    val totalVar = (0 until d).map(i => exactCov(i)(i)).sum
    assert(math.abs(model.totalVariance - totalVar) < 1e-6 * math.max(1.0, totalVar))
    // eigenvalues descending, non-negative, bounded by total variance
    assert(model.eigenvalues.forall(_ >= -1e-9))
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(model.eigenvalues.sum <= totalVar + 1e-6)
    // components orthonormal
    for (a <- model.components.indices; b <- a until model.components.length) {
      val dot = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-6, s"<v$a, v$b> = $dot")
    }
    // Cv = lambda v against the EXACT covariance (verifies the
    // distributed moment pass and the eigensolve at once)
    for (c <- model.components.indices) {
      val v = model.components(c)
      val cv = Array.tabulate(d)(r => (0 until d).map(j => exactCov(r)(j) * v(j)).sum)
      val resid = math.sqrt(cv.zip(v).map { case (x, y) =>
        val e = x - model.eigenvalues(c) * y; e * e
      }.sum)
      assert(resid < 1e-6 * math.max(1.0, model.eigenvalues(c)),
        s"component $c residual $resid (lambda=${model.eigenvalues(c)})")
    }
  }

  test("projection variance equals the eigenvalue; whitening normalizes it") {
    val model = Embeddings.pca(embDf, "embedding", k = 4)
    def componentVariances(whiten: Boolean): Array[Double] = {
      val pcs = Embeddings.project(embDf, "vec_id", "embedding", model, whiten)
        .select(col("pc")).collect().map(_.getSeq[Double](0).toArray)
      Array.tabulate(4) { c =>
        val xs = pcs.map(_(c))
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }
    }
    val raw = componentVariances(whiten = false)
    for (c <- 0 until 4)
      assert(math.abs(raw(c) - model.eigenvalues(c)) < 1e-6 * math.max(1.0, model.eigenvalues(c)),
        s"pc$c variance ${raw(c)} vs eigenvalue ${model.eigenvalues(c)}")
    val white = componentVariances(whiten = true)
    for (c <- 0 until 4)
      assert(math.abs(white(c) - 1.0) < 1e-6, s"whitened pc$c variance ${white(c)}")
  }

  test("pca is partition-invariant within float tolerance") {
    val a = Embeddings.pca(embDf, "embedding", k = 3)
    val b = Embeddings.pca(embDf.repartition(13), "embedding", k = 3)
    for (c <- 0 until 3) {
      assert(math.abs(a.eigenvalues(c) - b.eigenvalues(c)) < 1e-8 * math.max(1.0, a.eigenvalues(c)))
      // eigenvectors match up to sign
      val dot = a.components(c).zip(b.components(c)).map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6, s"component $c dot $dot")
    }
  }
}
