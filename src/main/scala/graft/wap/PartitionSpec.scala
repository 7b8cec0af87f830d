package graft.wap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Cast, EmptyRow, EvalMode, Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden-partitioning transform (the Iceberg partition-spec analogue the
  * reference gets from PyIceberg): data files carry the TRANSFORM value
  * (a day, a bucket number) in manifest metadata, the transform column
  * itself is never stored, and readers never name it — scans prune on
  * transform-aligned predicates over the SOURCE column before footer
  * stats are even consulted.
  *
  * Transform values serialize as strings chosen to compare correctly
  * under plain string ordering (ISO dates; bucket equality only), so the
  * same alignment logic serves the driver prune path and the distributed
  * manifest-entry DataFrame path.
  */
sealed trait PartitionSpec {
  /** Source column the transform derives from. */
  def column: String
  /** The transform value as a string Column over the data. `colType` is
    * the SOURCE column's declared type: time transforms must render a
    * TimestampType instant in UTC explicitly (date_format alone renders
    * in the SESSION timezone, and align() computes units in UTC — a
    * non-UTC session would otherwise write partition values that
    * disagree with prune-time alignment, an unsound prune). */
  def valueCol(colType: DataType): Column
  /** Canonical serialized form, stored in the snapshot. */
  def format: String
  /** Align one predicate conjunct with this transform: Some((op, value))
    * with op in {"=", "<=", ">="} when the conjunct constrains the
    * partition value, None when it doesn't (never prune on it).
    * `colType` is the SOURCE column's declared type: comparisons may
    * arrive with the literal coerced wider than the column (int column
    * vs long literal), and the transform must evaluate the literal in
    * the column's own type to match what was computed at write time. */
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)]
}

/** day(col): one partition value per UTC day of a timestamp/date column.
  * Range predicates align at day granularity (conservative: the boundary
  * day is always kept). */
case class DayPartition(column: String) extends PartitionSpec {
  def valueCol(colType: DataType): Column =
    date_format(PartitionSpec.utcRender(col(column), colType), "yyyy-MM-dd")
  def format: String = s"day($column)"
  /** Day of the literal; `backOff` shifts one unit earlier first, so a
    * strict `col < L` bound at exactly midnight excludes L's whole day
    * instead of conservatively keeping it. */
  private def dayOf(l: Literal, backOff: Boolean = false): Option[String] = l.dataType match {
    case TimestampType | TimestampNTZType =>
      val micros = l.value.asInstanceOf[Number].longValue() - (if (backOff) 1L else 0L)
      Some(java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
    case DateType =>
      val days = l.value.asInstanceOf[Number].longValue() - (if (backOff) 1L else 0L)
      Some(java.time.LocalDate.ofEpochDay(days).toString)
    case _ => None
  }
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)] = op match {
    case "=" => dayOf(lit).map(("=", _))
    // > and >= both keep the literal's own day (rows later that day qualify)
    case ">" | ">=" => dayOf(lit).map((">=", _))
    case "<" => dayOf(lit, backOff = true).map(("<=", _))
    case "<=" => dayOf(lit).map(("<=", _))
    case _ => None
  }
}

/** Shared shape for the time-hierarchy transforms: a strftime-style
  * value whose string ordering equals time ordering, alignment backed
  * off one microsecond for strict upper bounds. */
sealed abstract class TimePartition extends PartitionSpec {
  /** "yyyy-MM" / "yyyy-MM-dd" / "yyyy-MM-dd HH" */
  protected def pattern: String
  def valueCol(colType: DataType): Column =
    date_format(PartitionSpec.utcRender(col(column), colType), pattern)
  protected def render(t: java.time.ZonedDateTime): String
  private def unitOf(l: Literal, backOff: Boolean): Option[String] = l.dataType match {
    case TimestampType | TimestampNTZType =>
      val micros = l.value.asInstanceOf[Number].longValue() - (if (backOff) 1L else 0L)
      Some(render(java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(java.time.ZoneOffset.UTC)))
    case DateType =>
      val days = l.value.asInstanceOf[Number].longValue() - (if (backOff) 1L else 0L)
      Some(render(java.time.LocalDate.ofEpochDay(days)
        .atStartOfDay(java.time.ZoneOffset.UTC)))
    case _ => None
  }
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)] = op match {
    case "=" => unitOf(lit, backOff = false).map(("=", _))
    case ">" | ">=" => unitOf(lit, backOff = false).map((">=", _))
    case "<" => unitOf(lit, backOff = true).map(("<=", _))
    case "<=" => unitOf(lit, backOff = false).map(("<=", _))
    case _ => None
  }
}

/** month(col): one partition value per UTC month. */
case class MonthPartition(column: String) extends TimePartition {
  protected def pattern = "yyyy-MM"
  protected def render(t: java.time.ZonedDateTime): String =
    f"${t.getYear}%04d-${t.getMonthValue}%02d"
  def format: String = s"month($column)"
}

/** hour(col): one partition value per UTC hour. */
case class HourPartition(column: String) extends TimePartition {
  protected def pattern = "yyyy-MM-dd HH"
  protected def render(t: java.time.ZonedDateTime): String =
    f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d ${t.getHour}%02d"
  def format: String = s"hour($column)"
}

/** truncate(width, col): the first `width` characters of a string key —
  * prefix truncation preserves lexicographic order, so equality AND
  * range predicates align. */
case class TruncatePartition(width: Int, column: String) extends PartitionSpec {
  require(width >= 1, "truncate width >= 1")
  def valueCol(colType: DataType): Column = substring(col(column), 1, width)
  def format: String = s"truncate($width,$column)"
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)] =
    lit.dataType match {
      case StringType =>
        val prefix = lit.value.toString.take(width)
        op match {
          case "=" => Some(("=", prefix))
          case ">" | ">=" => Some((">=", prefix))
          case "<" | "<=" => Some(("<=", prefix))
          case _ => None
        }
      case _ => None
    }
}

/** identity(col): the source value itself as the partition value (the
  * classic Hive layout, first-class in Iceberg) — right for LOW-
  * cardinality columns (a status, a language, a tenant). Equality
  * predicates prune for every supported type (the literal renders
  * through the same Catalyst cast-to-string the write used); RANGE
  * predicates additionally prune for string and date sources, whose
  * rendered form orders like the domain — numeric ranges do NOT
  * ("10" < "2" lexicographically), so they conservatively keep.
  * Timestamp sources refuse at construction: their string rendering is
  * session-timezone-dependent (use day/month/hour instead). */
case class IdentityPartition(column: String) extends PartitionSpec {
  def valueCol(colType: DataType): Column = {
    require(colType != TimestampType && colType != TimestampNTZType,
      s"identity($column) on a timestamp column is session-timezone-" +
        "dependent — partition by day/month/hour instead")
    col(column).cast("string")
  }
  def format: String = s"identity($column)"
  private def render(l: Literal, colType: DataType): Option[String] =
    try {
      val v = Cast(l, StringType, Some("UTC"), EvalMode.TRY).eval(EmptyRow)
      Option(v).map(_.toString)
    } catch { case _: Exception => None }
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)] =
    colType match {
      case TimestampType | TimestampNTZType => None
      case StringType | DateType => // rendered order = domain order
        render(lit, colType).map { v =>
          op match {
            case "=" => ("=", v)
            case ">" | ">=" => (">=", v)
            case _ => ("<=", v)
          }
        }
      case _ if op == "=" =>
        // numeric/bool: equality only, and only when the literal is in
        // the column's own type (a widened literal renders differently:
        // int 57 -> "57" but double 57.0 -> "57.0")
        if (lit.dataType == colType) render(lit, colType).map(("=", _))
        else try {
          val coerced = Cast(lit, colType, Some("UTC"), EvalMode.TRY).eval(EmptyRow)
          if (coerced == null) None
          else render(Literal(coerced, colType), colType).map(("=", _))
        } catch { case _: Exception => None }
      case _ => None
    }
}

/** bucket(n, col): xxhash64 of the source value mod n — spreads any
  * high-cardinality key over n stable buckets; point predicates prune to
  * one bucket. */
case class BucketPartition(n: Int, column: String) extends PartitionSpec {
  require(n >= 2, "bucket count >= 2")
  def valueCol(colType: DataType): Column =
    pmod(xxhash64(col(column)), lit(n)).cast("string")
  def format: String = s"bucket($n,$column)"
  def align(op: String, lit: Literal, colType: DataType): Option[(String, String)] = op match {
    case "=" =>
      // xxhash64 is TYPE-sensitive (the same numeric value hashes
      // differently as int vs long), so the literal must be evaluated in
      // the column's own type — a comparison like `intCol = 57L` arrives
      // with a LONG literal that would otherwise hash to the wrong
      // bucket and prune away the matching file. TRY-cast: a literal
      // that can't represent in the column's type matches nothing, so
      // pruning nothing is sound.
      try {
        val coerced =
          if (lit.dataType == colType) lit
          else Literal(
            Cast(lit, colType, Some("UTC"), EvalMode.TRY).eval(EmptyRow), colType)
        if (coerced.value == null) None
        else {
          val h = XxHash64(Seq(coerced), 42L).eval(EmptyRow).asInstanceOf[Long]
          Some(("=", (((h % n) + n) % n).toString))
        }
      } catch { case _: Exception => None }
    case _ => None // a bucket constrains nothing about ranges
  }
}

object PartitionSpec {
  /** Render `c` timezone-independently for the time transforms: a
    * TimestampType instant is converted to its UTC wall clock
    * (convert_timezone returns TIMESTAMP_NTZ, which date_format renders
    * verbatim); DateType and TimestampNTZType values are already
    * timezone-free and must NOT be shifted (the 2-arg convert_timezone
    * would reinterpret an NTZ value as session-local time). align()
    * treats NTZ micros as UTC micros, so both paths agree. */
  private[wap] def utcRender(c: Column, colType: DataType): Column = colType match {
    case TimestampType => convert_timezone(lit("UTC"), c)
    case _ => c
  }

  private val Day = """day\(([^)]+)\)""".r
  private val Month = """month\(([^)]+)\)""".r
  private val Hour = """hour\(([^)]+)\)""".r
  private val Bucket = """bucket\((\d+),([^)]+)\)""".r
  private val Truncate = """truncate\((\d+),([^)]+)\)""".r
  private val Identity = """identity\(([^)]+)\)""".r
  def parse(s: String): PartitionSpec = s match {
    case Identity(c) => IdentityPartition(c)
    case Day(c) => DayPartition(c)
    case Month(c) => MonthPartition(c)
    case Hour(c) => HourPartition(c)
    case Bucket(n, c) => BucketPartition(n.toInt, c)
    case Truncate(w, c) => TruncatePartition(w.toInt, c)
    case other => throw new IllegalArgumentException(s"unknown partition spec: $other")
  }

  /** A MULTI-transform layout serializes as `;`-joined single formats
    * ("day(ts);bucket(8,user_id)") — order matters: it is the physical
    * directory nesting and the positional [[pvKey]] assignment. */
  def parseMulti(s: String): Seq[PartitionSpec] =
    s.split(";").toSeq.filter(_.nonEmpty).map(parse)

  def formatMulti(specs: Seq[PartitionSpec]): String =
    specs.map(_.format).mkString(";")

  /** Manifest partition-map key of the transform with STABLE field id
    * `i`: the first field ever keeps the historical bare "pv"
    * (single-transform tables and their files stay byte-compatible),
    * later ones are id-suffixed. Before spec evolution (r14) ids were
    * positions — identical keys for any unevolved layout. */
  def pvKey(i: Int): String = if (i == 0) "pv" else s"pv$i"

  /** One field of an (possibly EVOLVED) partition layout: the transform,
    * its STABLE manifest-key id — assigned once, NEVER reused across
    * ADD/DROP evolution, so a pv value written years ago can never be
    * reinterpreted under a different transform — and whether new writes
    * still route by it. Dropped fields stay in the registry: files
    * written under them keep their keys, and scans keep pruning those
    * files on the retired transform (Iceberg keeps void-transform
    * fields for the same reason). */
  final case class SpecField(spec: PartitionSpec, id: Int, active: Boolean) {
    /** The manifest partition-map key this field's values live under. */
    def key: String = pvKey(id)
    def fieldFormat: String =
      (if (active) "" else "-") + spec.format + "@" + id
  }

  /** Parse a snapshot's layout string into its field registry. Two
    * forms: the legacy `fmt;fmt` (ids = positions, all active —
    * byte-stable for every table that never evolved) and the evolved
    * `[-]fmt@id;...` written by [[formatFields]] after an ADD/DROP. */
  def parseFields(s: String): Seq[SpecField] =
    s.split(";").toSeq.filter(_.nonEmpty).zipWithIndex.map { case (tok0, pos) =>
      val (active, tok) =
        if (tok0.startsWith("-")) (false, tok0.tail) else (true, tok0)
      tok.lastIndexOf('@') match {
        case -1 => SpecField(parse(tok), pos, active)
        case at => SpecField(parse(tok.substring(0, at)),
          tok.substring(at + 1).toInt, active)
      }
    }

  /** Serialize a field registry: the legacy form whenever it losslessly
    * round-trips (unevolved layouts stay byte-identical — W24's
    * format-equality contract and pre-r14 snapshots both depend on it),
    * the annotated form otherwise. */
  def formatFields(fields: Seq[SpecField]): String =
    if (fields.zipWithIndex.forall { case (f, i) => f.active && f.id == i })
      formatMulti(fields.map(_.spec))
    else fields.map(_.fieldFormat).mkString(";")
}

/** Locale-portable %XX layer for `__pv=` partition directory names.
  *
  * Spark's Hive-style path escaping (`ExternalCatalogUtils.escapePathName`)
  * only covers special ASCII characters — bytes >= 0x80 pass through
  * literally, and a JVM on an ASCII-locale filesystem
  * (`sun.jnu.encoding=ANSI_X3.4-1968`) cannot create such a directory
  * (`InvalidPathException`). This layer %XX-escapes '%' and every byte
  * >= 0x80 BEFORE the value reaches `partitionBy`, so the physical
  * directory name is always pure ASCII on any filesystem locale. The
  * two layers compose cleanly because Spark's escape set includes '%':
  *
  *   write: "café" --escape--> "caf%C3%A9" --Spark--> "caf%25C3%25A9"
  *   read:  dir --unescapePathName--> "caf%C3%A9" --unescape--> "café"
  *
  * Manifest metadata stores the TRUE string, so pruning semantics are
  * untouched — this layer exists only in the physical layout.
  */
object PathSafeEscape {
  private val HEX = "0123456789ABCDEF"

  /** Called from generated code — must stay public with this signature. */
  def escape(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var needs = false
    var i = 0
    while (i < bytes.length && !needs) {
      val b = bytes(i)
      if (b == '%' || (b & 0x80) != 0) needs = true
      i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(bytes.length * 3)
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '%' || (b & 0x80) != 0) {
        sb.append('%').append(HEX.charAt((b >> 4) & 0xf)).append(HEX.charAt(b & 0xf))
      } else sb.append(b.toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Inverse of [[escape]]; input is escape's output (pure ASCII), after
    * Spark's own unescapePathName has already removed its layer. */
  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  def unescape(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        out.write((hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2)))
        i += 3
      } else if (c < 0x80) {
        // a '%' not followed by two hex digits (legacy dir written before
        // this layer) passes through literally
        out.write(c)
        i += 1
      } else {
        // non-ASCII input means the dir predates this layer and the
        // filesystem locale allowed it — re-encode as UTF-8 bytes rather
        // than silently truncating the char to one byte
        val end =
          if (Character.isHighSurrogate(c) && i + 1 < s.length &&
              Character.isLowSurrogate(s.charAt(i + 1))) i + 2
          else i + 1
        val bytes = s.substring(i, end).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bytes, 0, bytes.length)
        i = end
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** Codegen'd wrapper over [[PathSafeEscape.escape]] for the write path. */
case class PathSafeEscapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    PathSafeEscape.escape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.wap.PathSafeEscape.escape($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
