package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.wap.{BranchCatalog, ViewDef}

/** Branch-versioned SQL views over graft catalogs (the Nessie view
  * surface). Spark 4.1 ships the DSv2 [[org.apache.spark.sql.connector
  * .catalog.ViewCatalog]] API but no analyzer wiring for it — worse,
  * `ResolveSessionCatalog` UNCONDITIONALLY refuses view DDL on any
  * non-session catalog, in the same Resolution pass that resolves the
  * identifier, so an extension RESOLUTION rule can never win the race.
  * This rule therefore runs in the HINTS batch (before Resolution):
  *
  *  - `CREATE [OR REPLACE] VIEW <cat>.<branch>.v AS ...` /
  *    `DROP VIEW` / `SHOW VIEWS IN <cat>.<branch>` lower onto
  *    [[BranchCatalog]]'s view CRUD — the definition is versioned IN
  *    the branch (branching copies it zero-copy, `merge` publishes it).
  *  - Reading `<cat>.<branch>.v` substitutes the stored query text,
  *    re-parsed (with CTE substitution applied manually — the
  *    Substitution batch already ran) and re-QUALIFIED under the view's
  *    creation context (bare table names resolve against the view's own
  *    catalog+branch, like Spark's V1 catalog-and-namespace capture), so
  *    a view over branch tables follows that branch's LIVE data. Column
  *    aliases from `CREATE VIEW v (a, b)` apply through the analyzer's
  *    own subquery-alias machinery. The Hints batch runs to fixpoint, so
  *    views over views expand transitively; a recursive definition fails
  *    with a loud cycle error (in-flight names tracked per thread).
  *
  * Schema binding is "evolution" mode: the view re-analyzes per read — a
  * table column added since creation flows through a `SELECT *` view.
  * Tag namespaces carry no views: a tag pins table snapshots; a view is
  * a definition that would re-resolve against live state, which is
  * exactly what a tag must not do. */
class GraftViewRules(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViewRules._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case c @ CreateView(UnresolvedIdentifier(parts, _), _, _, _, _, _, _, _, _, _)
        if parts.length == 3 && rootOf(spark, parts.head).isDefined =>
      val text = c.originalText.getOrElse(throw new UnsupportedOperationException(
        "CREATE VIEW without query text is not supported on graft catalogs"))
      GraftCreateViewCommand(rootOf(spark, parts.head).get, parts.head, parts(1), parts(2),
        text, c.userSpecifiedColumns.map(_._1), c.userSpecifiedColumns.map(_._2.getOrElse("")),
        c.properties, c.query, c.allowExisting, c.replace)

    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if parts.length == 3 && rootOf(spark, parts.head).isDefined =>
      GraftDropViewCommand(rootOf(spark, parts.head).get, parts(1), parts(2), ifExists)

    case ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if parts.length == 2 && rootOf(spark, parts.head).isDefined =>
      GraftShowViewsCommand(rootOf(spark, parts.head).get, parts(1), pattern, output)

    case a @ org.apache.spark.sql.catalyst.plans.logical.AlterViewAs(child, text, query) =>
      viewIdent(child) match {
        case Some((root, cat, branch, name)) =>
          // redefine = replace keeping name; schema recomputed at run
          GraftCreateViewCommand(root, cat, branch, name, text,
            Nil, Nil, Map.empty, query, allowExisting = false, replace = true)
        case None => a
      }

    case r @ org.apache.spark.sql.catalyst.plans.logical.RenameTable(child, newName, true) =>
      viewIdent(child) match {
        case Some((root, _, branch, name)) =>
          require(newName.length == 1,
            "RENAME VIEW takes a bare view name (views stay on their branch)")
          GraftRenameViewCommand(root, branch, name, newName.head)
        case None => r
      }

    // `<cat>.<branch|tag>.t$lineage` (W73): substitute the ROW-LINEAGE
    // scan plan — the table's columns plus `_row_id`/`_last_updated_seq`,
    // decoded as one broadcast join of the O(files) lineage map onto the
    // parquet scan, so Spark's own pushdown/codegen applies end to end
    // (the same plan the Scala scanLineage builds; no per-row V1 shim).
    case UnresolvedRelation(parts, _, false)
        if parts.length == 3 && parts(2).endsWith("$lineage") &&
          rootOf(spark, parts.head).isDefined =>
      val root = rootOf(spark, parts.head).get
      val table = parts(2).stripSuffix("$lineage")
      val cat = new BranchCatalog(spark, root)
      val snapId = cat.snapshotIdOf(table, parts(1))
        .orElse(cat.snapshotIdAtTag(table, parts(1)))
        .getOrElse(sys.error(s"no table $table on branch or tag ${parts(1)}"))
      SubqueryAlias(parts(2),
        cat.scanLineageSnapshot(table, snapId).queryExecution.analyzed)

    case u @ UnresolvedRelation(parts, _, false)
        if parts.length == 3 && rootOf(spark, parts.head).isDefined =>
      val root = rootOf(spark, parts.head).get
      new BranchCatalog(spark, root).viewDef(parts(2), parts(1)) match {
        case Some(d) => expand(spark, parts, d)
        case None => u
      }
  }

  /** (root, catalog, branch, view) when `child` names an EXISTING view
    * of a graft catalog — ALTER/RENAME must only divert actual views,
    * table DDL keeps its normal path. */
  private def viewIdent(child: LogicalPlan): Option[(String, String, String, String)] = {
    val parts = child match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        u.multipartIdentifier
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
        u.multipartIdentifier
      case UnresolvedIdentifier(p, _) => p
      case _ => Nil
    }
    if (parts.length != 3) None
    else rootOf(spark, parts.head).flatMap { root =>
      if (new BranchCatalog(spark, root).viewDef(parts(2), parts(1)).isDefined)
        Some((root, parts.head, parts(1), parts(2)))
      else None
    }
  }
}

object GraftViewRules {

  /** The lake root of `name` IF it is a configured graft catalog. */
  private[sql] def rootOf(spark: SparkSession, name: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .filter(_ == classOf[GraftTableCatalog].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$name.root"))

  /** Views currently being expanded on this thread — a self- or
    * mutually-recursive definition would otherwise loop the analyzer. */
  private val expanding = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** The stored view body as a plan in its creation context: parsed,
    * CTE-substituted, bare/2-part table references qualified with the
    * view's own catalog (+branch), aliases applied. */
  private[sql] def contextualize(
      spark: SparkSession, d: ViewDef, body: LogicalPlan = null): LogicalPlan = {
    val parsed = Option(body).getOrElse(
      CTESubstitution(spark.sessionState.sqlParser.parsePlan(d.sql)))
    parsed.transformWithSubqueries {
      case r @ UnresolvedRelation(p, opts, streaming) if p.length < 3 =>
        val full =
          if (p.length == 1) d.currentCatalog +: d.currentNamespace.take(1) ++: p
          else d.currentCatalog +: p
        UnresolvedRelation(full, opts, streaming)
    }
  }

  private def expand(spark: SparkSession, parts: Seq[String], d: ViewDef): LogicalPlan = {
    val key = parts.mkString(".")
    if (expanding.get().contains(key))
      throw new IllegalStateException(s"recursive view reference: $key")
    expanding.set(expanding.get() + key)
    try {
      val qualified = contextualize(spark, d)
      // TRANSITIVE expansion inside this guarded call: nested view
      // references must expand here, while the in-flight set still holds
      // the ancestors — the analyzer fixpoint re-entering the rule with
      // a fresh scope per iteration could never see a cycle (it would
      // spin to max-iterations instead of failing by name)
      val deep = qualified.transformWithSubqueries {
        case u @ UnresolvedRelation(p, _, false)
            if p.length == 3 && rootOf(spark, p.head).isDefined =>
          new BranchCatalog(spark, rootOf(spark, p.head).get).viewDef(p(2), p(1)) match {
            case Some(dd) => expand(spark, p, dd)
            case None => u
          }
      }
      val aliased =
        if (d.columnAliases.nonEmpty)
          UnresolvedSubqueryColumnAliases(d.columnAliases, deep)
        else deep
      SubqueryAlias(parts(2), aliased)
    } finally expanding.set(expanding.get() - key)
  }
}

/** `CREATE [OR REPLACE] VIEW <cat>.<branch>.v` — commits the definition
  * into the branch's refs state. The query plan is carried UNRESOLVED
  * (this command is built before the Resolution batch) and analyzed at
  * run time, in the view's own context, to record the creation-time
  * schema. */
case class GraftCreateViewCommand(
    root: String, catName: String, branch: String, viewName: String,
    sql: String, aliases: Seq[String], aliasComments: Seq[String],
    properties: Map[String, String], queryPlan: LogicalPlan,
    allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = new BranchCatalog(spark, root)
    if (allowExisting && cat.viewDef(viewName, branch).isDefined) return Nil
    val ctx = ViewDef(sql, catName, Seq(branch), "")
    val analyzed = spark.sessionState.executePlan(
      GraftViewRules.contextualize(spark, ctx, CTESubstitution(queryPlan))).analyzed
    require(aliases.isEmpty || aliases.length == analyzed.output.length,
      s"CREATE VIEW declared ${aliases.length} columns, query produces ${analyzed.output.length}")
    cat.createView(viewName,
      ctx.copy(schemaDdl = analyzed.schema.toDDL,
        queryColumnNames = analyzed.output.map(_.name),
        columnAliases = aliases, columnComments = aliasComments,
        properties = properties),
      branch, replace)
    Nil
  }
}

case class GraftDropViewCommand(
    root: String, branch: String, viewName: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val existed = new BranchCatalog(spark, root).dropView(viewName, branch)
    if (!existed && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array(branch), viewName))
    Nil
  }
}

case class GraftRenameViewCommand(
    root: String, branch: String, from: String, to: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    new BranchCatalog(spark, root).renameView(from, to, branch)
    Nil
  }
}

case class GraftShowViewsCommand(
    root: String, branch: String, pattern: Option[String],
    override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = new BranchCatalog(spark, root).listViews(branch)
    val filtered = pattern match {
      case Some(p) =>
        // SHOW VIEWS LIKE patterns: '*'/'%' are wildcards, everything
        // else is LITERAL (a dot in a pattern must not match any char)
        val rx = p.split("[*%]", -1).map(java.util.regex.Pattern.quote).mkString(".*").r
        names.filter(n => rx.pattern.matcher(n).matches())
      case None => names
    }
    filtered.map(n => Row(branch, n, false))
  }
}
