package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) layout expressions (SURVEY §2.1 W29): map each
  * cluster column to a small bucket index through its own quantile
  * cutpoints, then interleave the bucket bits into one z-value. Sorting
  * files by z-value gives every file a tight hyper-rectangle in the
  * cluster-column space, so a selective predicate on ANY clustered
  * column prunes most files — where a lexicographic sort only serves its
  * leading column. The quantile cutpoints come from one `approxQuantile`
  * sketch job per column (driver holds 2^bits doubles per column).
  */

/** Bucket index of a double value against sorted cutpoints (binary
  * search; null → bucket 0 so null rows cluster together at the low
  * corner rather than scattering). */
case class BucketizeSortedExpr(child: Expression, cuts: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects double input")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "bucketize_sorted"

  /** Called from generated code — must stay public with this signature. */
  def bucket(v: Double): Int = {
    var lo = 0
    var hi = cuts.length // bucket in [0, cuts.length]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > cuts(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else bucket(v.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bucketizer", this, classOf[BucketizeSortedExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |int ${ev.value} = ${c.isNull} ? 0 : $self.bucket(${c.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Interleave the low `bits` bits of each child bucket index into one
  * Morton z-value (child 0 owns the most significant bit of each
  * round). Supports up to 8 columns x 8 bits within the long. */
case class ZInterleaveExpr(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty && children.size * bits <= 63,
    s"z-order needs children*bits <= 63, got ${children.size} x $bits")
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects int bucket inputs")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_interleave"

  /** Called from generated code — must stay public with this signature. */
  def interleave(buckets: Array[Int]): Long = {
    var z = 0L
    var b = bits - 1
    while (b >= 0) {
      var c = 0
      while (c < buckets.length) {
        z = (z << 1) | ((buckets(c) >>> b) & 1)
        c += 1
      }
      b -= 1
    }
    z
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val buckets = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      buckets(i) = if (v == null) 0 else v.asInstanceOf[Int]
      i += 1
    }
    interleave(buckets)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zinterleaver", this, classOf[ZInterleaveExpr].getName)
    val cs = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zbuckets")
    val eval = cs.map(c => c.code.toString).mkString("\n") + "\n" +
      s"int[] $arr = new int[${children.size}];\n" +
      cs.zipWithIndex.map { case (c, i) =>
        s"$arr[$i] = ${c.isNull} ? 0 : ${c.value};"
      }.mkString("\n")
    ev.copy(
      code = code"""
        |$eval
        |long ${ev.value} = $self.interleave($arr);
        """.stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderFunctions {
  def bucketizeSorted(c: Column, cuts: Array[Double]): Column =
    Bridge.column(BucketizeSortedExpr(Bridge.expression(c), cuts))
  def zInterleave(bits: Int, buckets: Column*): Column =
    Bridge.column(ZInterleaveExpr(buckets.map(Bridge.expression), bits))
}
