package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PCA / whitening over embedding columns — the dimensionality-reduction
  * and decorrelation step of an embedding pipeline (retrieval indexes
  * shrink, downstream cosine distances stop being dominated by a few
  * high-variance axes).
  *
  * Scale split: the DATA-sized work (second-moment accumulation,
  * projection) is distributed — moments reduce through `treeAggregate`
  * with one dense upper-triangle accumulator per partition (the same
  * shape MLlib's RowMatrix Gramian uses), projection is a map-side dot
  * product against broadcast components. The d x d eigensolve runs on
  * the driver: for embedding dims (d <= a few thousand) that matrix is
  * KILOBYTES — distributing it would be pure overhead. Deterministic
  * throughout: fixed rotation order, index tie-breaks, canonical signs —
  * no RNG anywhere.
  */
object Embeddings {

  /** Results of [[pca]]: top-k principal axes of the covariance. */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]], // k rows, each a unit d-vector
      eigenvalues: Array[Double],       // descending, same order
      totalVariance: Double,
      rows: Long)

  /** Fit PCA on `vecCol` (array<float>): one distributed pass accumulates
    * count, per-dim sums and the upper-triangle second-moment matrix;
    * the driver forms the covariance (population, /n) and runs a cyclic
    * Jacobi eigensolve (see inline note — eigengap-independent, exact,
    * deterministic), returning the top-k eigenpairs sign-canonicalized. */
  def pca(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 200): PcaModel = {
    val vecs = df.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0))
    val d = vecs.first().length
    require(k >= 1 && k <= d, s"k in [1, $d]")
    val triLen = d * (d + 1) / 2
    // accumulator: [count, sum_0..sum_{d-1}, upper-triangle moments]
    val zero = new Array[Double](1 + d + triLen)
    def seqOp(acc: Array[Double], v: Seq[Float]): Array[Double] = {
      acc(0) += 1.0
      var i = 0
      while (i < d) {
        val xi = v(i).toDouble
        acc(1 + i) += xi
        var j = i
        var t = 1 + d + i * d - i * (i - 1) / 2
        while (j < d) { acc(t) += xi * v(j).toDouble; t += 1; j += 1 }
        i += 1
      }
      acc
    }
    def combOp(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    val acc = vecs.treeAggregate(zero)(seqOp, combOp)
    val n = acc(0)
    require(n > 0, "pca needs at least one vector")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      var t = 1 + d + i * d - i * (i - 1) / 2
      while (j < d) {
        val c = acc(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val totalVar = (0 until d).map(i => cov(i)(i)).sum

    // cyclic Jacobi eigensolve — exact full decomposition of the tiny
    // symmetric matrix (d x d doubles on the driver). Power iteration
    // converges poorly here: gaussian-ish embedding spectra are clustered
    // (Marchenko-Pastur), so adjacent-eigenvalue ratios approach 1 and
    // deflation leaks between components. Jacobi's convergence does not
    // depend on eigengaps, and rotation order is fixed -> deterministic.
    val a = cov.map(_.clone())
    val vmat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxIter && off > 1e-14 * math.max(totalVar, 1e-300)) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cth * arp - sth * arq
              a(r)(q) = sth * arp + cth * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cth * apr - sth * aqr
              a(q)(r) = sth * apr + cth * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = vmat(r)(p); val vrq = vmat(r)(q)
              vmat(r)(p) = cth * vrp - sth * vrq
              vmat(r)(q) = sth * vrp + cth * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i2 = 0
      while (i2 < d) {
        var j2 = i2 + 1
        while (j2 < d) { off += a(i2)(j2) * a(i2)(j2); j2 += 1 }
        i2 += 1
      }
      off = math.sqrt(off)
      sweep += 1
    }
    // top-k by eigenvalue (descending; index tiebreak), sign-canonical
    val order = (0 until d).sortBy(i => (-a(i)(i), i)).take(k)
    val components = order.map { idx =>
      val v = Array.tabulate(d)(r => vmat(r)(idx))
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    val eigenvalues = order.map(i => a(i)(i)).toArray
    PcaModel(mean, components, eigenvalues, totalVar, n.toLong)
  }

  /** Project embeddings onto the model's components, map-side against
    * the broadcast (tiny) model. `whiten = true` additionally scales
    * each coordinate by 1/sqrt(eigenvalue), so projected components have
    * ~unit variance (zero-variance axes stay unscaled). Output:
    * (idCol, pc array<double> of length k). */
  def project(
      df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      whiten: Boolean = false): DataFrame = {
    val d = model.mean.length
    val scales = model.eigenvalues.map(l => if (whiten && l > 1e-12) 1.0 / math.sqrt(l) else 1.0)
    val comps = model.components
    val mean = model.mean
    val k = comps.length
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((mean, comps, scales))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(idCol),
      org.apache.spark.sql.types.StructField("pc",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false))))
    val rdd = df.select(col(idCol), col(vecCol)).rdd.mapPartitions { it =>
      val (m, cs, sc) = bc.value
      it.map { row =>
        val v = row.getSeq[Float](1)
        val out = new Array[Double](k)
        var c = 0
        while (c < k) {
          var s = 0.0
          var i = 0
          while (i < d) { s += (v(i).toDouble - m(i)) * cs(c)(i); i += 1 }
          out(c) = s * sc(c)
          c += 1
        }
        Row(row.get(0), out.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
