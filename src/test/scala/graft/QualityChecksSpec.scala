package graft

import org.apache.spark.sql.functions._
import graft.quality.{Drift, Referential}

/** Value oracles for the cross-table quality checks (referential
  * integrity + PSI drift). */
class QualityChecksSpec extends SparkSpecBase {
  import spark.implicits._

  test("referential orphans: missing and null FKs count, matches never do") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val r = Referential.orphans(child, "fk", parent, "pk").collect().head
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 2, "one unknown key + one null FK")
    assert(r.getDouble(2) == 0.4)
  }

  test("psi: identical halves near zero, a shifted distribution alarms, brute-force parity") {
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(4000)(rnd.nextGaussian() * 10.0 + 50.0)
    val sameA = base.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val sameB = base.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)
    val shifted = base.map(_ + 15.0)

    def run(ref: Seq[Double], cur: Seq[Double]): (Long, Long, Double) = {
      val r = Drift.psi(ref.toDF("x"), cur.toDF("x"), "x", buckets = 10).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val (nr, nc, stable) = run(sameA, sameB)
    assert(nr == 2000 && nc == 2000)
    assert(stable < 0.05, s"homogeneous halves must be stable, psi=$stable")
    val (_, _, alarm) = run(sameA, shifted)
    assert(alarm > 0.25, s"a 1.5-sigma shift must alarm, psi=$alarm")

    // brute-force recompute of the exact definition
    def brute(ref: Seq[Double], cur: Seq[Double], b: Int = 10): Double = {
      val all = ref ++ cur
      val (lo, hi) = (all.min, all.max)
      def bucket(x: Double) = math.min(b - 1, math.floor((x - lo) / (hi - lo) * b).toLong)
      val cr = ref.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val cc = cur.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val (nrB, ncB) = (ref.size.toDouble, cur.size.toDouble)
      (0L until b.toLong).map { i =>
        val p = (cr.getOrElse(i, 0L) + 0.5) / (nrB + 0.5 * b)
        val q = (cc.getOrElse(i, 0L) + 0.5) / (ncB + 0.5 * b)
        (p - q) * math.log(p / q)
      }.sum
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(stable - r6(brute(sameA, sameB))) <= 1e-6)
    assert(math.abs(alarm - r6(brute(sameA, shifted))) <= 1e-6)
  }

  test("psi: nulls are excluded, degenerate constant range is stable, empty sides pass DriftCheck") {
    // Nulls must not form a phantom bucket that drives the analytic
    // empty-bin count negative.
    val ref = Seq(Some(1.0), Some(2.0), None, Some(3.0)).toDF("x")
    val cur = Seq(Some(1.0), None, None, Some(3.0)).toDF("x")
    val r = Drift.psi(ref, cur, "x", buckets = 10).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2, "n_ref/n_cur count non-null values only")
    assert(r.getDouble(2) >= 0.0, "PSI is non-negative by definition")

    // hi == lo (constant column): everything lands in bucket 0, no NaN.
    val const = Drift.psi(Seq(7.0, 7.0).toDF("x"), Seq(7.0).toDF("x"), "x").collect().head
    assert(const.getLong(0) == 2 && const.getLong(1) == 1)
    assert(!const.getDouble(2).isNaN)

    // Both sides empty (or all-null): DriftCheck passes instead of NPE-ing.
    val empty = Seq.empty[Double].toDF("x")
    val check = graft.quality.DriftCheck(() => empty, "x")
    val res = check.run(Seq(Option.empty[Double]).toDF("x"))
    assert(res.passed && res.violations == 0L)
  }
}
