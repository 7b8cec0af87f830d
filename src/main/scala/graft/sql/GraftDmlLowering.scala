package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.Bridge

import graft.wap.{BranchCatalog, MergeClause}

/** Lowers SQL `UPDATE` and `MERGE INTO` on catalog tables onto the
  * native row-level operations ([[BranchCatalog.updateWhere]] /
  * [[BranchCatalog.mergeInto]]) — closing the SQL DML surface so it
  * equals the Scala surface (the reference's tables take Iceberg's full
  * SQL DML; after r8 graft SQL had INSERT and DELETE but not these).
  *
  * An analyzer resolution rule replaces the resolved [[UpdateTable]] /
  * [[MergeIntoTable]] plan with an eager command — the same pattern the
  * Delta connector uses for DML on its own tables — instead of
  * implementing SupportsRowLevelOperations' group-based rewrite plans:
  * the catalog's copy-on-write machinery ALREADY does stats-bounded
  * file-group rewrites internally, so wiring Spark's rewrite plumbing
  * would run the same join twice. The r8 predicate rule carries over in
  * a stronger form: conditions and SET expressions are re-bound BY NAME
  * and passed WHOLE to the catalog (nothing is weakened or dropped);
  * shapes that cannot cross that boundary (subqueries, nondeterminism)
  * are REFUSED at analysis time, never approximated — lossy conversion
  * is sound for pruning but not for DML.
  *
  * Both commands enforce the branch guard: DML on `main` is refused
  * unless the catalog opts in (`write.main=true`), keeping
  * write-audit-publish intact for mutations exactly as for inserts.
  */
class GraftDmlLowering(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftDmlLowering._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UpdateTable if u.resolved && graftTable(u.table).isDefined =>
      lowerUpdate(u, graftTable(u.table).get)
    case m: MergeIntoTable if m.resolved && graftTable(m.targetTable).isDefined =>
      lowerMerge(m, graftTable(m.targetTable).get)
  }
}

object GraftDmlLowering {

  private def graftTable(p: LogicalPlan): Option[GraftTable] = p match {
    case SubqueryAlias(_, child) => graftTable(child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some(r.table.asInstanceOf[GraftTable])
    case _ => None
  }

  /** DML expressions cross to the catalog WHOLE or not at all: a
    * subquery or nondeterministic piece cannot be re-bound against the
    * catalog's own scan, and dropping it would mutate the wrong rows. */
  private def requirePlain(e: Expression, what: String): Unit =
    if (!e.deterministic || e.exists(_.isInstanceOf[PlanExpression[_]]))
      throw new UnsupportedOperationException(
        s"$what is not expressible against the catalog (subquery or " +
          "nondeterministic piece) — use the Scala API for this shape")

  /** Re-bind by NAME into an opaque [[Column]]: the catalog resolves it
    * against its own scan (or its t/s merge join), so analyzed attribute
    * ids must not leak through — and the command must carry it as a
    * Column, NOT an Expression field, or CheckAnalysis would walk the
    * deliberately-unresolved attributes and fail the query. */
  private def unresolve(e: Expression): Column = Bridge.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  })

  private def assignName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"assignment target $other is not a top-level column")
  }

  private def lowerUpdate(u: UpdateTable, t: GraftTable): LogicalPlan = {
    u.condition.foreach(requirePlain(_, "UPDATE condition"))
    u.assignments.foreach(a => requirePlain(a.value, s"UPDATE SET ${assignName(a)}"))
    // the analyzer aligns assignments to the full schema; identity
    // assignments are dropped so the catalog casts only real changes
    // (all-identity falls back to the full list — a valid no-op update)
    val all = u.assignments.map(a => assignName(a) -> unresolve(a.value))
    val real = u.assignments.filterNot(a => a.value.semanticEquals(a.key))
      .map(a => assignName(a) -> unresolve(a.value))
    GraftUpdateCommand(t, if (real.nonEmpty) real.toMap else all.toMap,
      u.condition.map(unresolve))
  }

  private def lowerMerge(m: MergeIntoTable, t: GraftTable): LogicalPlan = {
    // `WITH SCHEMA EVOLUTION` needs no handling here: GraftTable reports
    // AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer's
    // ResolveMergeIntoSchemaEvolution has ALREADY applied the source's
    // AddColumn/widen changes through alterTable and re-resolved the
    // merge against the evolved table by the time this rule sees it.
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // the catalog merge pairs rows on same-name equality keys; anything
    // else in ON cannot map and is refused (not silently weakened)
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) && a.name.equalsIgnoreCase(b.name) => a.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) && a.name.equalsIgnoreCase(b.name) => a.name
      case other => throw new UnsupportedOperationException(
        s"MERGE ON must be a conjunction of target.<k> = source.<k> same-name " +
          s"equalities for catalog tables, got: ${other.sql}")
    }

    /** Clause expressions see the catalog join under aliases t/s (as
      * opaque Columns — see [[unresolve]] on why not Expressions). */
    def aliased(e: Expression, what: String): Column = {
      requirePlain(e, what)
      Bridge.column(e.transform {
        case a: AttributeReference if tOut.contains(a) => UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference if sOut.contains(a) => UnresolvedAttribute(Seq("s", a.name))
      })
    }

    val targetCols = m.targetTable.output.map(_.name)
    val matched: Seq[MergeClause] = m.matchedActions.map {
      case UpdateAction(cond, assigns, _) =>
        val real = assigns.filterNot(a => a.value.semanticEquals(a.key))
        val use = if (real.nonEmpty) real else assigns
        MergeClause.MatchedUpdate(cond.map(aliased(_, "MERGE UPDATE condition")),
          use.map(a => assignName(a) -> aliased(a.value, s"MERGE SET ${assignName(a)}")).toMap)
      case UpdateStarAction(cond) =>
        MergeClause.MatchedUpdate(cond.map(aliased(_, "MERGE UPDATE condition")),
          targetCols.map(c => c -> Bridge.column(UnresolvedAttribute(Seq("s", c)))).toMap)
      case DeleteAction(cond) =>
        MergeClause.MatchedDelete(cond.map(aliased(_, "MERGE DELETE condition")))
      case other => throw new UnsupportedOperationException(s"unsupported MERGE action $other")
    }
    val notMatched: Seq[MergeClause] = m.notMatchedActions.map {
      case InsertAction(cond, assigns) =>
        // the catalog inserts the source row ALIGNED TO THE TABLE SCHEMA:
        // the SQL insert must be that same row (each value a bare source
        // column of the target column's name) — anything else would need
        // a second source projection the matched clauses don't see
        assigns.foreach { a =>
          val ok = a.value match {
            case ar: AttributeReference =>
              sOut.contains(ar) && ar.name.equalsIgnoreCase(assignName(a))
            case _ => false
          }
          if (!ok) throw new UnsupportedOperationException(
            s"MERGE INSERT must insert source columns by matching name " +
              s"(got ${assignName(a)} = ${a.value.sql}); alias them in the " +
              "source subquery instead")
        }
        MergeClause.NotMatchedInsert(cond.map(aliased(_, "MERGE INSERT condition")))
      case InsertStarAction(cond) =>
        MergeClause.NotMatchedInsert(cond.map(aliased(_, "MERGE INSERT condition")))
      case other => throw new UnsupportedOperationException(s"unsupported MERGE action $other")
    }
    val bySource: Seq[MergeClause] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, assigns, _) =>
        // by-source clauses see only the target row; the analyzer already
        // rejects source references, this guards the invariant locally
        (cond.toSeq ++ assigns.map(_.value)).foreach { e =>
          require(e.references.subsetOf(tOut),
            s"NOT MATCHED BY SOURCE expression ${e.sql} references non-target columns")
        }
        val real = assigns.filterNot(a => a.value.semanticEquals(a.key))
        val use = if (real.nonEmpty) real else assigns
        MergeClause.NotMatchedBySourceUpdate(
          cond.map(aliased(_, "MERGE BY SOURCE UPDATE condition")),
          use.map(a => assignName(a) ->
            aliased(a.value, s"MERGE BY SOURCE SET ${assignName(a)}")).toMap)
      case DeleteAction(cond) =>
        cond.foreach(e => require(e.references.subsetOf(tOut),
          s"NOT MATCHED BY SOURCE condition ${e.sql} references non-target columns"))
        MergeClause.NotMatchedBySourceDelete(
          cond.map(aliased(_, "MERGE BY SOURCE DELETE condition")))
      case other => throw new UnsupportedOperationException(s"unsupported MERGE action $other")
    }
    GraftMergeCommand(t, m.sourceTable, keys, matched ++ notMatched ++ bySource)
  }

  private[sql] def requireDmlWritable(t: GraftTable, op: String): Unit = {
    if (t.isTag)
      throw new IllegalArgumentException(
        s"SQL $op on ${t.tableName}@${t.branch} refused: ${t.branch} is a TAG — " +
          "tags are immutable release points; run the DML on a branch and re-tag")
    if (t.branch == "main" && !t.mainWritesAllowed)
      throw new IllegalArgumentException(
        s"SQL $op on ${t.tableName}@main is disabled: main only changes through " +
          "write-audit-publish (run it on a branch namespace and publish, or " +
          "set spark.sql.catalog.<name>.write.main=true)")
  }
}

/** Eager `UPDATE` over a catalog table: runs
  * [[BranchCatalog.updateWhere]] (stats-bounded copy-on-write rewrite)
  * by default, or [[BranchCatalog.updateWherePositional]] (merge-on-read
  * position sidecars + appended new versions, zero files rewritten) when
  * the table carries `write.update.mode=merge-on-read` — the Iceberg
  * property of the same name, mirroring SQL DELETE's routing. Both under
  * the branch guard. Conditions/SET values are opaque Columns (already
  * name-bound) so analysis checks do not walk them. */
case class GraftUpdateCommand(
    graftTable: GraftTable, set: Map[String, Column],
    condition: Option[Column]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    GraftDmlLowering.requireDmlWritable(graftTable, "UPDATE")
    val cat = new BranchCatalog(spark, graftTable.root)
    val cond = condition.getOrElse(org.apache.spark.sql.functions.lit(true))
    if (graftTable.storedProps.get("write.update.mode").contains("merge-on-read"))
      cat.updateWherePositional(graftTable.tableName, cond, set, graftTable.branch)
    else
      cat.updateWhere(graftTable.tableName, cond, set, graftTable.branch)
    Seq.empty
  }
}

/** Eager `MERGE INTO` over a catalog table: materializes the analyzed
  * source plan as a DataFrame and runs [[BranchCatalog.mergeInto]]
  * (key-bounded copy-on-write merge) under the branch guard — or
  * [[BranchCatalog.mergeIntoMOR]] (position sidecars + appended
  * outcomes, zero data files rewritten) when the table carries
  * `write.merge.mode=merge-on-read`, completing the Iceberg mode
  * triangle with DELETE and UPDATE. Merges with NOT MATCHED BY SOURCE
  * clauses stay copy-on-write even under the property: by-source fires
  * on every target row outside the source, where the CoW tiers drop
  * whole files metadata-only while a positional encoding would write
  * O(table) sidecar entries — the mode is a write-amplification
  * preference, not a semantics switch, so the engine picks the cheaper
  * sound plan. */
case class GraftMergeCommand(
    graftTable: GraftTable, source: LogicalPlan, keys: Seq[String],
    clauses: Seq[MergeClause]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftDmlLowering.requireDmlWritable(graftTable, "MERGE INTO")
    val cat = new BranchCatalog(spark, graftTable.root)
    val bySource = clauses.exists(c => c.isInstanceOf[MergeClause.NotMatchedBySourceUpdate] ||
      c.isInstanceOf[MergeClause.NotMatchedBySourceDelete])
    if (graftTable.storedProps.get("write.merge.mode").contains("merge-on-read") && !bySource)
      cat.mergeIntoMOR(graftTable.tableName, Bridge.dataFrame(spark, source),
        keys, clauses, graftTable.branch)
    else
      cat.mergeInto(graftTable.tableName, Bridge.dataFrame(spark, source),
        keys, clauses, graftTable.branch)
    Seq.empty
  }
}
