package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table / cross-batch quality checks that the single-pass
  * [[Audit]] suite can't express (they need a second input): referential
  * integrity and distribution drift. Both are WAP companions — run them
  * on the branch against the published main before merging.
  */
object Referential {

  /** Orphan count: child rows whose foreign key has no match in the
    * parent's key set (null FKs count as orphans — they reference
    * nothing). One distinct-project on the parent + one left join;
    * Catalyst broadcasts the parent side when it's dimension-sized.
    * @return one row: (n_rows, n_orphans, orphan_ratio) */
  def orphans(
      child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame =
    child.select(col(fkCol).as("__fk"))
      .join(parent.select(col(pkCol).as("__pk")).distinct(),
        col("__fk") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(col("n_rows"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_rows"), 6).as("orphan_ratio"))
}

/** An audit check that needs more than the audited batch itself (the
  * published table, a dimension) — evaluated by [[graft.wap.Wap.run]]
  * alongside the single-pass [[Expect]] suite and merged into the same
  * report, so drift/integrity failures quarantine the branch exactly
  * like a null check would. */
trait CrossCheck {
  def name: String
  def run(audited: DataFrame): CheckResult
}

/** Quarantine the batch when its distribution of `colName` drifts from
  * the reference (usually the published table: pass
  * `() => catalog.scan(table)`) by more than `maxPsi`. An EMPTY reference
  * passes — the first ever batch has nothing to drift from. `violations`
  * reports the PSI in millionths for observability. */
case class DriftCheck(
    reference: () => DataFrame, colName: String,
    maxPsi: Double = 0.25, buckets: Int = 10) extends CrossCheck {
  def name = s"drift($colName, max=$maxPsi)"
  def run(audited: DataFrame): CheckResult = {
    val row = Drift.psi(reference(), audited, colName, buckets).collect().head
    // n_ref is NULL (not 0) when both sides are empty of non-null values —
    // nothing to drift from either way.
    if (row.isNullAt(0) || row.getLong(0) == 0L)
      CheckResult(name, passed = true, violations = 0L)
    else {
      val psi = row.getDouble(2)
      CheckResult(name, passed = psi <= maxPsi, violations = math.round(psi * 1e6))
    }
  }
}

/** Quarantine the batch when it contains more than `maxOrphans` rows
  * whose `fkCol` is missing from the parent's `pkCol` key set. */
case class OrphanCheck(
    parent: () => DataFrame, fkCol: String, pkCol: String,
    maxOrphans: Long = 0L) extends CrossCheck {
  def name = s"ref_integrity($fkCol -> $pkCol)"
  def run(audited: DataFrame): CheckResult = {
    val row = Referential.orphans(audited, fkCol, parent(), pkCol).collect().head
    CheckResult(name, passed = row.getLong(1) <= maxOrphans, violations = row.getLong(1))
  }
}

/** Population Stability Index between a reference and a current
  * distribution of one numeric column — the standard drift alarm
  * (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift). */
object Drift {

  /** PSI over `buckets` equal-width bins spanning the COMBINED min/max,
    * with +0.5 Laplace smoothing per bin so empty bins never divide by
    * zero. NULL values are excluded before bucketing (n_ref/n_cur count
    * non-null values only); a degenerate hi==lo range folds everything
    * into bucket 0. Bins empty on both sides contribute analytically
    * (their count is `buckets` minus the observed bins, clamped at 0 —
    * no bin table materialized). Two tiny aggregates over one pass of
    * each side; every arithmetic step is ANSI-expressible, so the driver
    * hash-checks it.
    * @return one row: (n_ref, n_cur, psi) */
  def psi(
      ref: DataFrame, cur: DataFrame, colName: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "at least 2 buckets")
    val b = buckets.toDouble
    val all = ref.select(col(colName).cast("double").as("__x"))
      .filter(col("__x").isNotNull).withColumn("__side", lit("ref"))
      .unionByName(
        cur.select(col(colName).cast("double").as("__x"))
          .filter(col("__x").isNotNull).withColumn("__side", lit("cur")))
    val bounds = all.agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val bucketed = all.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0L)).otherwise(
          least(lit(buckets - 1),
            floor((col("__x") - col("__lo")) / (col("__hi") - col("__lo")) * lit(b)))))
    val counts = bucketed.groupBy(col("__b")).agg(
      sum(when(col("__side") === "ref", 1L).otherwise(0L)).as("cr"),
      sum(when(col("__side") === "cur", 1L).otherwise(0L)).as("cc"))
    val totals = counts.agg(
      sum(col("cr")).as("nr"), sum(col("cc")).as("nc"), count(lit(1)).as("np"))
    val p = (col("cr").cast("double") + lit(0.5)) / (col("nr").cast("double") + lit(0.5) * lit(b))
    val q = (col("cc").cast("double") + lit(0.5)) / (col("nc").cast("double") + lit(0.5) * lit(b))
    val p0 = lit(0.5) / (col("nr").cast("double") + lit(0.5) * lit(b))
    val q0 = lit(0.5) / (col("nc").cast("double") + lit(0.5) * lit(b))
    counts.crossJoin(broadcast(totals))
      .agg(
        sum((p - q) * log(p / q)).as("__present"),
        first(col("nr")).as("n_ref"), first(col("nc")).as("n_cur"),
        first(col("np")).as("__np"),
        first(p0).as("__p0"), first(q0).as("__q0"))
      .select(col("n_ref"), col("n_cur"),
        round(col("__present") +
          greatest(lit(0.0), lit(b) - col("__np")) *
            (col("__p0") - col("__q0")) * log(col("__p0") / col("__q0")),
          6).as("psi"))
  }
}
