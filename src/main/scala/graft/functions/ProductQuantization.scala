package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** True product quantization (SURVEY §2.5, the §7 r5+ item): the vector
  * space is split into `m` contiguous subspaces of `dsub` dims each, every
  * subspace gets its own `ksub`-codeword codebook, and a vector encodes as
  * `m` one-byte codeword ids — 64 float dims become 8 bytes (32x smaller
  * than float32, 4-8x smaller than the scalar-int8 path), the memory
  * story for a 100 TB vector corpus.
  *
  * Scoring is asymmetric (ADC): the query stays full-precision, a per-query
  * table of `m x ksub` partial dot products is computed ONCE, and each
  * candidate scores with `m` table lookups + adds instead of `d`
  * multiply-adds. Cosine comes out exactly for the QUERY side (true |q|)
  * and approximately for the candidate (reconstruction norm |c_hat|,
  * derivable from the codes alone) — the shortlist then re-ranks with the
  * exact full-precision cosine, so final scores are bit-equal to brute
  * force on whatever the index surfaces (same contract as the scalar-int8
  * variant).
  *
  * Codebooks train driver-side on a BOUNDED deterministic sample (the
  * standard PQ training recipe: codebook quality depends on the sample's
  * distribution, not the corpus size, so training stays O(1) in corpus
  * scale and the broadcast codec is m*ksub*dsub floats — 4 KB at the
  * default geometry).
  */
case class PqCodec(m: Int, ksub: Int, dsub: Int, codebooks: Array[Float])
    extends Serializable {
  require(codebooks.length == m * ksub * dsub,
    s"codebooks length ${codebooks.length} != m*ksub*dsub = ${m * ksub * dsub}")
  def d: Int = m * dsub

  /** |codeword|^2 per (sub, code) — reconstruction norms come from here. */
  @transient private lazy val cwNormSq: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) { val x = codebooks(base + i); acc += x.toDouble * x; i += 1 }
        out(s * ksub + j) = acc
        j += 1
      }
      s += 1
    }
    out
  }

  private def readFloat(a: ArrayData, i: Int): Float =
    if (i < a.numElements() && !a.isNullAt(i)) a.getFloat(i) else 0.0f

  /** Nearest codeword per subspace (L2), as m bytes. Called from generated
    * code — must stay public with this signature. */
  def encode(vec: ArrayData): Array[Byte] = {
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val diff = readFloat(vec, s * dsub + i) - codebooks(base + i)
          acc += diff.toDouble * diff
          i += 1
        }
        // strict < keeps the LOWEST code id on exact ties (determinism)
        if (acc < bestDist) { bestDist = acc; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }

  /** |c_hat| of the reconstruction, from codes alone (subspaces are
    * orthogonal slices, so |c_hat|^2 = sum of per-sub codeword norms). */
  def reconNorm(codes: Array[Byte]): Double = {
    var acc = 0.0
    var s = 0
    while (s < m) { acc += cwNormSq(s * ksub + (codes(s) & 0xff)); s += 1 }
    math.sqrt(acc)
  }

  /** Per-query ADC table: partial dot of the query's sub-slice with every
    * codeword, laid out [sub * ksub + code]. Computed once per query. */
  def adcTable(q: ArrayData): ArrayData = {
    val out = new Array[Float](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) { acc += readFloat(q, s * dsub + i).toDouble * codebooks(base + i); i += 1 }
        out(s * ksub + j) = acc.toFloat
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** dot(q, c_hat) via m table lookups — the per-candidate hot path. */
  def adcDot(codes: Array[Byte], table: ArrayData): Double = {
    var acc = 0.0
    var s = 0
    while (s < m) { acc += table.getFloat(s * ksub + (codes(s) & 0xff)); s += 1 }
    acc
  }

  /** |cent + r_hat|: reconstruction norm when `codes` encode a RESIDUAL
    * against coarse centroid `cent` (the IVFADC layout). One fused pass
    * at index-build time; the scoring path reads the stored float. */
  def residualNorm(codes: Array[Byte], cent: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val dd = d
    while (i < dd) {
      val sub = i / dsub
      val base = (sub * ksub + (codes(sub) & 0xff)) * dsub
      val c = if (i < cent.numElements() && !cent.isNullAt(i)) cent.getFloat(i) else 0.0f
      val x = c.toDouble + codebooks(base + (i % dsub))
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }
}

object PqCodec {
  /** Per-subspace Lloyd k-means over a bounded sample (driver-side: the
    * sample is fixed-size regardless of corpus scale). Deterministic:
    * centroids seed from evenly-spaced sample positions (callers pass the
    * sample in a deterministic hash order) and exact ties keep the lowest
    * code id. Empty clusters keep their previous centroid. */
  def train(samples: Array[Array[Float]], m: Int, ksub: Int, iters: Int): PqCodec = {
    require(samples.nonEmpty, "PqCodec.train: empty sample")
    val d = samples.head.length
    require(d % m == 0, s"dims $d not divisible by m=$m")
    require(samples.length >= ksub, s"sample ${samples.length} smaller than ksub=$ksub")
    val dsub = d / m
    val codebooks = new Array[Float](m * ksub * dsub)
    val n = samples.length
    var s = 0
    while (s < m) {
      // working centroids for this subspace, double precision
      val cent = Array.tabulate(ksub) { j =>
        val src = samples((j.toLong * n / ksub).toInt)
        Array.tabulate(dsub)(i => src(s * dsub + i).toDouble)
      }
      val assign = new Array[Int](n)
      var it = 0
      while (it < iters) {
        // assignment
        var v = 0
        while (v < n) {
          val vec = samples(v)
          var best = 0
          var bestDist = Double.MaxValue
          var j = 0
          while (j < ksub) {
            var acc = 0.0
            var i = 0
            while (i < dsub) {
              val diff = vec(s * dsub + i) - cent(j)(i)
              acc += diff * diff
              i += 1
            }
            if (acc < bestDist) { bestDist = acc; best = j }
            j += 1
          }
          assign(v) = best
          v += 1
        }
        // update
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        v = 0
        while (v < n) {
          val j = assign(v)
          counts(j) += 1
          var i = 0
          while (i < dsub) { sums(j)(i) += samples(v)(s * dsub + i); i += 1 }
          v += 1
        }
        var j = 0
        while (j < ksub) {
          if (counts(j) > 0) {
            var i = 0
            while (i < dsub) { cent(j)(i) = sums(j)(i) / counts(j); i += 1 }
          }
          j += 1
        }
        it += 1
      }
      var j = 0
      while (j < ksub) {
        var i = 0
        while (i < dsub) { codebooks((s * ksub + j) * dsub + i) = cent(j)(i).toFloat; i += 1 }
        j += 1
      }
      s += 1
    }
    PqCodec(m, ksub, dsub, codebooks)
  }
}

/** Encode a float vector as m PQ codes (binary). */
case class PqEncodeExpr(child: Expression, codec: PqCodec) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    codec.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec, classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reconstruction norm |c_hat| from PQ codes (no vector access). */
case class PqReconNormExpr(child: Expression, codec: PqCodec) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary PQ codes")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_norm"
  override protected def nullSafeEval(input: Any): Any =
    codec.reconNorm(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec, classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.reconNorm($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table (m x ksub partial dots, computed once). */
case class PqAdcTableExpr(child: Expression, codec: PqCodec) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override protected def nullSafeEval(input: Any): Any =
    codec.adcTable(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec, classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.adcTable($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |cent + r_hat| for residual-encoded codes (IVFADC reconstruction norm). */
case class PqResidualNormExpr(left: Expression, right: Expression, codec: PqCodec)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary codes, array<float> centroid)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_residual_norm"
  override protected def nullSafeEval(codes: Any, cent: Any): Any =
    codec.residualNorm(codes.asInstanceOf[Array[Byte]], cent.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec, classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, (c, v) => s"$ref.residualNorm($c, $v)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(query, c_hat) via the ADC table — m lookups per candidate pair. */
case class PqAdcDotExpr(left: Expression, right: Expression, codec: PqCodec)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary codes, array<float> table)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"
  override protected def nullSafeEval(codes: Any, table: Any): Any =
    codec.adcDot(codes.asInstanceOf[Array[Byte]], table.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodec", codec, classOf[PqCodec].getName)
    defineCodeGen(ctx, ev, (c, t) => s"$ref.adcDot($c, $t)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers. */
object PqFunctions {
  def pqEncode(vec: Column, codec: PqCodec): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(vec), codec))
  def pqReconNorm(codes: Column, codec: PqCodec): Column =
    Bridge.column(PqReconNormExpr(Bridge.expression(codes), codec))
  def pqResidualNorm(codes: Column, cent: Column, codec: PqCodec): Column =
    Bridge.column(PqResidualNormExpr(Bridge.expression(codes), Bridge.expression(cent), codec))
  def pqAdcTable(queryVec: Column, codec: PqCodec): Column =
    Bridge.column(PqAdcTableExpr(Bridge.expression(queryVec), codec))
  def pqAdcDot(codes: Column, table: Column, codec: PqCodec): Column =
    Bridge.column(PqAdcDotExpr(Bridge.expression(codes), Bridge.expression(table), codec))
}
