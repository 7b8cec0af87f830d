package graft.sql

import org.apache.spark.sql.SparkSession

import graft.wap.BranchCatalog

/** W65's orchestration tier: [[BranchCatalog.maintain]]'s STRUCTURAL
  * actions (materialize / BIN_PACK / manifest fold / expiry / orphans)
  * plus opt-in DERIVED-ARTIFACT freshness — the two artifacts whose
  * refresh classifiers already make a no-op free:
  *
  *  - `graft.maintain.refresh-mview=true` on a materialized view: run
  *    [[GraftMaterializedViews.refresh]] (mode `fresh` = zero work, and
  *    the incremental modes are O(delta)).
  *  - `graft.maintain.refresh-vector-index=<vecCol>[,<col>…]` on an
  *    indexed source table: advance each column's persisted IVF-PQ
  *    index ([[graft.operators.VectorIndex.refresh]] — append-only
  *    windows encode only the delta).
  *  - `graft.maintain.refresh-dedup-index=<textCol>[,<col>…]`: advance
  *    each column's persisted MinHash dedup index
  *    ([[graft.operators.DedupIndex.refresh]] — append-only windows
  *    sign only the delta).
  *
  * This sits ABOVE the catalog (it re-executes view queries and encode
  * jobs), which is why it lives with the SQL orchestration and is what
  * `CALL <cat>.system.maintain[_all]` runs. */
object GraftMaintenance {

  def run(spark: SparkSession, cat: BranchCatalog, table: String,
      branch: String = "main"): Seq[(String, String)] = {
    val acts = Seq.newBuilder[(String, String)]
    acts ++= cat.maintain(table, branch)
    val props = cat.tableProperties(table, branch)
    if (props.get("graft.maintain.refresh-mview").contains("true") &&
        props.contains(GraftMaterializedViews.SqlKey)) {
      val mode = GraftMaterializedViews.refresh(spark, cat, table, branch)
      if (mode != "fresh") acts += "refresh-mview" -> mode
    }
    props.get("graft.maintain.refresh-vector-index").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).foreach { vc =>
        val mode = graft.operators.VectorIndex.refresh(spark, cat, table, vc, branch)
        if (mode != "fresh") acts += "refresh-vector-index" -> s"$vc: $mode"
      }
    props.get("graft.maintain.refresh-dedup-index").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).foreach { tc =>
        val mode = graft.operators.DedupIndex.refresh(spark, cat, table, tc, branch)
        if (mode != "fresh") acts += "refresh-dedup-index" -> s"$tc: $mode"
      }
    // `graft.maintain.analyze=<col>[,<col>…]` (or `true` for defaults):
    // keep NDV planner stats fresh — the incremental variant folds
    // per-manifest HLL sketches and scans only manifests sketched for
    // the first time, so a quiet table sweeps for metadata cost only
    props.get("graft.maintain.analyze").foreach { v =>
      val cols = if (v.trim == "true") Nil
        else v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (_, n) = cat.analyzeTableIncremental(table, branch, cols)
      if (n > 0) acts += "analyze" -> s"$n manifest(s) sketched"
    }
    // W80: `graft.maintain.sum-stats=<col>[,<col>…]` (or `true` for every
    // integral column) keeps per-file sum sidecars fresh — only manifests
    // the last pass hasn't seen are summed, so a no-op costs metadata only
    props.get("graft.maintain.sum-stats").foreach { v =>
      val cols = if (v == "true") Nil
        else v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val n = cat.ensureSumStats(table, branch, cols)
      if (n > 0) acts += "sum-stats" -> s"$n manifest(s) summed"
    }
    acts.result()
  }

  def runAll(spark: SparkSession, cat: BranchCatalog,
      branch: String = "main"): Seq[(String, String, String)] =
    cat.listTables(branch).flatMap(t =>
      run(spark, cat, t, branch).map { case (a, d) => (t, a, d) })
}
