package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Iceberg's partition-evolution DDL surface (W83's user-facing form —
  * Iceberg Spark extensions `AlterTableAddPartitionFieldContext`):
  *
  * {{{
  *   ALTER TABLE <cat>.<branch>.t ADD PARTITION FIELD days(ts)
  *   ALTER TABLE <cat>.<branch>.t DROP PARTITION FIELD bucket(4, user_id)
  * }}}
  *
  * Vanilla Spark has no grammar for these (exactly the gap the Iceberg
  * runtime fills with its own injected parser), so graft injects this
  * thin delegating parser: the two statement shapes above lower onto
  * [[graft.wap.BranchCatalog.addPartitionField]]/`dropPartitionField`
  * (metadata-only spec evolution — old files keep pruning under their
  * written layout, new writes route by the evolved one); EVERYTHING else
  * delegates to Spark's parser untouched, so the session's SQL surface
  * is unchanged. The `CALL <cat>.system.add/drop_partition_field`
  * procedures remain as the engine-neutral form. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    AddDropPartitionField.findFirstMatchIn(sqlText) match {
      case Some(m) =>
        GraftPartitionFieldCommand(
          delegate.parseMultipartIdentifier(m.group(1)),
          canonicalTransform(m.group(3)),
          add = m.group(2).equalsIgnoreCase("ADD"))
      case None => delegate.parsePlan(sqlText)
    }

  /** The interface DEFAULT drops the ParameterContext (falls back to
    * parsePlan), which would break `spark.sql(sql, args)` parameter
    * binding through this wrapper — delegate explicitly. The partition
    * DDL shapes carry no parameters, so they only need parsePlan. */
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    AddDropPartitionField.findFirstMatchIn(sqlText) match {
      case Some(_) => parsePlan(sqlText)
      case None => delegate.parsePlanWithParameters(sqlText, ctx)
    }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] = delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

object GraftSqlParser {
  /** `ALTER TABLE <ident> ADD|DROP PARTITION FIELD <transform>` — the
    * identifier is re-parsed by Spark's own multipart parser (so quoting
    * rules match), the transform by [[canonicalTransform]]. */
  private val AddDropPartitionField =
    """(?is)\A\s*ALTER\s+TABLE\s+([\w.`]+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*\z""".r

  /** Normalize the typed transform to [[graft.wap.PartitionSpec.parse]]'s
    * canonical format: lowercase, no whitespace, Iceberg's plural
    * `days/months/hours(c)` accepted as graft's `day/month/hour(c)`, and
    * a bare column as `identity(c)` (Iceberg's shorthand). */
  private[sql] def canonicalTransform(s: String): String = {
    val t = s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", "")
    val plural = t.replaceFirst("^days\\(", "day(")
      .replaceFirst("^months\\(", "month(")
      .replaceFirst("^hours\\(", "hour(")
    if (plural.contains("(")) plural else s"identity($plural)"
  }
}

/** Eager partition-field evolution command (the parser's target): one
  * metadata-only commit through W83, branch-guarded like every other
  * graft mutation (tags refuse by name). */
case class GraftPartitionFieldCommand(
    ident: Seq[String], transform: String, add: Boolean)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val what = s"ALTER TABLE ... ${if (add) "ADD" else "DROP"} PARTITION FIELD"
    val cm = spark.sessionState.catalogManager
    val (catName, branch, table) = ident match {
      case Seq(c, b, t) => (c, b, t)
      case Seq(b, t) => (cm.currentCatalog.name(), b, t)
      case Seq(t) => (cm.currentCatalog.name(), "main", t)
      case other => throw new IllegalArgumentException(
        s"$what: cannot resolve ${other.mkString(".")} — use <catalog>.<branch>.<table>")
    }
    val gtc = cm.catalog(catName) match {
      case g: GraftTableCatalog => g
      case _ => throw new UnsupportedOperationException(
        s"$what targets graft lake tables; $catName is not a graft catalog")
    }
    val cat = new graft.wap.BranchCatalog(spark, gtc.lakeRoot)
    require(!cat.listTags().contains(branch),
      s"$branch is a TAG namespace (immutable, read-only) — $what needs a branch")
    if (add)
      cat.addPartitionField(table, graft.wap.PartitionSpec.parse(transform), branch)
    else
      cat.dropPartitionField(table, transform, branch)
    Seq.empty
  }
}
