package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.wap.BranchCatalog

/** Materialized views with INCREMENTAL refresh (W56) — the missing rung
  * between W52's virtual views (re-executed on every read) and plain
  * tables (stale forever): a materialized view is an ordinary branch
  * table whose definition and source-snapshot watermarks live in its
  * branch-versioned table properties, plus a `refresh` that advances it.
  *
  * {{{
  *   CALL lake.system.create_mview('daily', 'SELECT lang, count(*) AS n
  *                                            FROM lake.main.docs GROUP BY lang')
  *   CALL lake.system.refresh_mview('daily')   -- after new appends
  *   SELECT * FROM lake.main.daily             -- reads a plain table
  * }}}
  *
  * Refresh picks the CHEAPEST sound mode by classifying the definition's
  * analyzed Catalyst plan (never by re-parsing SQL):
  *
  *  - `fresh`: every source is at its recorded snapshot — zero work.
  *  - `incremental`: a pure select/project/filter over ONE source whose
  *    window is provably APPEND-ONLY (every `from` manifest still present
  *    in `to`, no tombstones) — the definition re-executes over just the
  *    window's append delta (the relation is rewritten in-plan to a W46
  *    `graft.changes.from/to` windowed read, so in-window pruning
  *    applies) and the delta rows APPEND to the view. O(delta), the shape
  *    a 100 TB nightly pipeline needs.
  *  - `incremental_agg`: a single `GROUP BY` over such a source whose
  *    aggregates are all re-aggregatable (SUM/COUNT/MIN/MAX, no
  *    DISTINCT/FILTER): the delta is aggregated through the same windowed
  *    plan, unioned with the view's CURRENT (small) content and folded —
  *    COUNT and SUM by summing, MIN/MAX by min/max — then the view is
  *    overwritten. O(delta + |view|), never O(source).
  *  - `full`: everything else (joins, non-distributive aggregates,
  *    windows with deletes/compactions in them, expired watermarks) —
  *    recompute and overwrite. Correct by construction; the fallback is
  *    automatic, never an error.
  *
  * The watermarks recorded after any refresh are the snapshot ids the
  * ANALYZED plan pinned — the exact versions the content was computed
  * from — so a concurrent source commit during refresh is simply the
  * next refresh's delta. Views over views work (analysis expands a W52
  * view to its underlying tables); every source must be a graft table of
  * the same catalog root + branch (staleness of foreign/file sources is
  * untrackable, so create refuses them). */
object GraftMaterializedViews {

  val SqlKey = "graft.mview.sql"
  val SourcesKey = "graft.mview.sources"

  /** Create `name` on `branch`: materialize the query and record the
    * definition + source watermarks in the table's properties. */
  def create(spark: SparkSession, cat: BranchCatalog, name: String,
      query: String, branch: String): Unit = {
    require(!cat.tableExists(name, branch), s"table $name exists on $branch")
    val df = spark.sql(query)
    val sources = sourceTables(df.queryExecution.analyzed, cat.root, branch)
    require(sources.nonEmpty,
      s"materialized view $name reads no table of this catalog on branch $branch — " +
        "nothing to track staleness against")
    cat.createTableIfNotExists(name, df.schema, branch)
    cat.append(name, df, branch)
    cat.setTableProperties(name, Map(
      SqlKey -> query,
      SourcesKey -> sources.map { case (t, id) => s"$t=$id" }.mkString(";")), branch)
  }

  /** Refresh `name`; returns the mode actually run: `fresh`,
    * `incremental`, `incremental_agg`, or `full`. */
  def refresh(spark: SparkSession, cat: BranchCatalog, name: String,
      branch: String): String = {
    val props = cat.tableProperties(name, branch)
    val query = props.getOrElse(SqlKey, sys.error(
      s"$name on $branch is not a materialized view (no ${SqlKey} property)"))
    val recorded: Map[String, String] = props.getOrElse(SourcesKey, "").split(";")
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }.toMap
    val analyzed = spark.sql(query).queryExecution.analyzed
    val pinned = sourceTables(analyzed, cat.root, branch).toMap
    if (pinned == recorded) return "fresh"

    val stale = pinned.filter { case (t, id) => !recorded.get(t).contains(id) }
    val mode =
      if (stale.size == 1 && recorded.contains(stale.head._1) &&
          appendOnlyWindow(cat, stale.head._1, recorded(stale.head._1), stale.head._2))
        tryIncremental(spark, cat, name, branch, analyzed,
          stale.head._1, recorded(stale.head._1))
      else None
    mode.getOrElse {
      cat.overwrite(name, Bridge.dataFrame(spark, analyzed), branch)
      "full"
    } match {
      case m =>
        cat.setTableProperties(name, Map(
          SourcesKey -> pinned.map { case (t, id) => s"$t=$id" }.mkString(";")), branch)
        m
    }
  }

  /** Drop the view's table and definition. */
  def drop(cat: BranchCatalog, name: String, branch: String): Unit = {
    require(cat.tableProperties(name, branch).contains(SqlKey),
      s"$name on $branch is not a materialized view — refusing to drop a plain table")
    cat.dropTable(name, branch) // drops the props in the same refs commit
    ()
  }

  // ---- classification ----

  private def tableOf(r: DataSourceV2Relation): Option[GraftTable] = r.table match {
    case t: GraftTable => Some(t)
    case _ => None
  }

  private def sourceTables(plan: LogicalPlan, root: String,
      branch: String): Seq[(String, String)] =
    plan.collect { case r: DataSourceV2Relation => r }.map { r =>
      tableOf(r).filter(t => t.root == root && t.branch == branch && !t.isTag)
        .map(t => t.tableName -> t.snapshotId)
        .getOrElse(sys.error(
          s"materialized view source ${r.table.name} is not a graft table of " +
            "this catalog root on the view's branch — staleness is untrackable"))
    }.distinct

  /** Is `from..to` a pure append window? Every `from` manifest must still
    * be present in `to` (deletes/updates/compactions REPLACE manifests),
    * and neither end may carry tombstones. An expired `from` returns
    * false — the full recompute handles it. */
  private def appendOnlyWindow(cat: BranchCatalog, table: String,
      fromId: String, toId: String): Boolean =
    (for {
      from <- cat.snapshotMetaOpt(table, fromId)
      to <- cat.snapshotMetaOpt(table, toId)
    } yield {
      val toPaths = to.manifests.map(_.path).toSet
      from.deleteManifests.isEmpty && to.deleteManifests.isEmpty &&
        from.manifests.forall(m => toPaths.contains(m.path))
    }).getOrElse(false)

  /** Pure select/project/filter over exactly one relation? */
  private def selectOnly(plan: LogicalPlan): Boolean = plan match {
    case _: DataSourceV2Relation => true
    case p: Project => selectOnly(p.child)
    case f: Filter => selectOnly(f.child)
    case s: SubqueryAlias => selectOnly(s.child)
    case _ => false
  }

  /** One fold instruction per re-aggregatable output column. */
  private def aggMerges(agg: Aggregate): Option[(Seq[String], Seq[(String, String)])] = {
    if (!selectOnly(agg.child)) return None
    val groupSet = agg.groupingExpressions.map(_.canonicalized).toSet
    val matchedKeys = scala.collection.mutable.Set.empty[org.apache.spark.sql.catalyst.expressions.Expression]
    val groups = Seq.newBuilder[String]
    val merges = Seq.newBuilder[(String, String)]
    val ok = agg.aggregateExpressions.forall {
      case a @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case _: Sum => merges += (a.name -> "sum"); true
          case _: Count => merges += (a.name -> "sum"); true
          case _: Min => merges += (a.name -> "min"); true
          case _: Max => merges += (a.name -> "max"); true
          case _ => false // avg/collect/percentile…: not foldable from outputs
        }
      case ne: NamedExpression if groupSet.contains(ne.canonicalized) =>
        matchedKeys += ne.canonicalized; groups += ne.name; true
      case Alias(c, n) if groupSet.contains(c.canonicalized) =>
        matchedKeys += c.canonicalized; groups += n; true
      case _ => false // sum(x)+1 and friends: the fold key is not a column
    }
    val g = groups.result()
    val m = merges.result()
    // Every grouping expression must be projected: re-aggregating the
    // delta∪view union on a PARTIAL key set (e.g. `SELECT count(*) FROM t
    // GROUP BY lang`) would silently collapse distinct groups into one row.
    if (ok && m.nonEmpty && matchedKeys.size == groupSet.size) Some((g, m)) else None
  }

  private def windowed(plan: LogicalPlan, table: String,
      fromId: String): LogicalPlan = plan transform {
    case r: DataSourceV2Relation
        if tableOf(r).exists(_.tableName == table) =>
      val t = tableOf(r).get
      val opts = new java.util.HashMap[String, String](r.options)
      opts.put("graft.changes.from", fromId)
      opts.put("graft.changes.to", t.snapshotId)
      r.copy(options = new CaseInsensitiveStringMap(opts))
  }

  /** The two incremental modes; None = not classifiable, run full. */
  private def tryIncremental(spark: SparkSession, cat: BranchCatalog,
      name: String, branch: String, analyzed: LogicalPlan,
      table: String, fromId: String): Option[String] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => strip(s.child)
      case other => other
    }
    strip(analyzed) match {
      case p if selectOnly(p) =>
        val delta = Bridge.dataFrame(spark, windowed(p, table, fromId))
        cat.append(name, delta, branch)
        Some("incremental")
      case agg: Aggregate =>
        aggMerges(agg).map { case (groupCols, merges) =>
          val deltaAgg = Bridge.dataFrame(spark, windowed(agg, table, fromId))
          val mvSchema = deltaAgg.schema // same plan shape as the stored view
          val combined = cat.scan(name, branch).unionByName(deltaAgg)
          val folds = merges.map {
            case (c, "sum") => fsum(col(c)).as(c)
            case (c, "min") => fmin(col(c)).as(c)
            case (c, _) => fmax(col(c)).as(c)
          }
          val reagg =
            if (groupCols.isEmpty) combined.agg(folds.head, folds.tail: _*)
            else combined.groupBy(groupCols.map(col): _*).agg(folds.head, folds.tail: _*)
          // fold widening (sum over sum) casts back to the view's types,
          // in the view's column order
          val aligned = reagg.select(mvSchema.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
          cat.overwrite(name, aligned, branch)
          "incremental_agg"
        }
      case _ => None
    }
  }
}
