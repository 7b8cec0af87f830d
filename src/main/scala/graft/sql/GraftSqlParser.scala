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
      case None => WriteOrderedBy.findFirstMatchIn(sqlText) match {
        case Some(m) =>
          GraftWriteOrderCommand(
            delegate.parseMultipartIdentifier(m.group(1)),
            Option(m.group(2)).map(_.split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq).getOrElse(Nil))
        case None => delegate.parsePlan(sqlText)
      }
    }

  /** The interface DEFAULT drops the ParameterContext (falls back to
    * parsePlan), which would break `spark.sql(sql, args)` parameter
    * binding through this wrapper — delegate explicitly. The partition
    * DDL shapes carry no parameters, so they only need parsePlan. */
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    if (claimed(sqlText)) parsePlan(sqlText)
    else delegate.parsePlanWithParameters(sqlText, ctx)

  /** True when one of the injected DDL shapes owns the statement. */
  private def claimed(sqlText: String): Boolean =
    AddDropPartitionField.findFirstMatchIn(sqlText).isDefined ||
      WriteOrderedBy.findFirstMatchIn(sqlText).isDefined

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

  /** `ALTER TABLE t WRITE ORDERED BY c1[, c2...]` / `WRITE UNORDERED`
    * (Iceberg's write sort-order DDL) — lowers onto the W86
    * `graft.write.sort-order` branch-versioned property. */
  private val WriteOrderedBy =
    """(?is)\A\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+(?:ORDERED\s+BY\s+([\w,\s]+?)|(?:UNORDERED))\s*;?\s*\z""".r

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

/** `ALTER TABLE ... WRITE ORDERED BY c1, c2` / `WRITE UNORDERED` (the
  * Iceberg write sort-order DDL, W86): validates the columns against the
  * live schema HERE (writeOrderOf would otherwise refuse at the first
  * append — this surface is where the user can fix a typo) and stores or
  * clears the `graft.write.sort-order` property. */
case class GraftWriteOrderCommand(ident: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, branch, table) =
      GraftPartitionFieldCommand.resolve(spark, ident, "ALTER TABLE ... WRITE ORDERED BY")
    if (cols.nonEmpty) {
      val id = cat.snapshotIdOf(table, branch).getOrElse(
        throw new IllegalArgumentException(s"no table $table on $branch"))
      val schema = cat.schemaOfSnapshot(table, id)
      cols.foreach(c => require(schema.fieldNames.contains(c),
        s"WRITE ORDERED BY names unknown column $c of $table"))
    }
    cat.setTableProperties(table,
      Map(graft.wap.BranchCatalog.WriteOrderKey ->
        (if (cols.isEmpty) "" else cols.mkString(","))), branch)
    Seq.empty
  }
}

object GraftPartitionFieldCommand {
  /** Shared ident resolution for the injected DDL commands: catalog by
    * name (must be a graft catalog), tag namespaces refuse. */
  private[sql] def resolve(spark: SparkSession, ident: Seq[String],
      what: String): (graft.wap.BranchCatalog, String, String) = {
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
    (cat, branch, table)
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
    val (cat, branch, table) = GraftPartitionFieldCommand.resolve(spark, ident, what)
    if (add)
      cat.addPartitionField(table, graft.wap.PartitionSpec.parse(transform), branch)
    else
      cat.dropPartitionField(table, transform, branch)
    Seq.empty
  }
}
