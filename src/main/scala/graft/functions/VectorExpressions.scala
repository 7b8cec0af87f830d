package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector / hashing hot paths
  * (SURVEY §2.4-2.5). These run inside whole-stage codegen (cosine/dot)
  * or as tight eval loops (minhash/simhash), instead of Scala UDFs that
  * would box every element — at 100 TB the similarity scan is
  * compute-bound on exactly these loops.
  */

/** Cosine similarity between two float vectors, computed in one fused
  * loop with double accumulators. Null elements count as 0. */
case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float> inputs")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_f"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0f else a.getFloat(i)
      val y = if (b.isNullAt(i)) 0.0f else b.getFloat(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("denom")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          float $x = $a.isNullAt($i) ? 0.0f : $a.getFloat($i);
          float $y = $b.isNullAt($i) ? 0.0f : $b.getFloat($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        double $d = Math.sqrt($na) * Math.sqrt($nb);
        ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (codegen, fused loop). */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float> inputs")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) dot += a.getFloat(i) * b.getFloat(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) $dot += $a.getFloat($i) * $b.getFloat($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct 64-bit hashes of token n-gram shingles, in ONE pass over the
  * text: inline ascii-alnum tokenization (lowercase; any other char is a
  * separator — same token semantics as Dedup.tokens), incremental
  * per-token hashing, rolling n-gram combination, sort+dedupe. Compared
  * with composing Catalyst transform/slice/concat_ws/array_distinct this
  * is ~100x cheaper and allocates no intermediate strings — shingling is
  * the hot inner loop of minhash dedup over 100 TB of text, and the
  * downstream set ops (Jaccard intersect/union) run on longs instead of
  * strings. Texts shorter than n tokens yield one shingle over all their
  * tokens; empty text yields the empty-shingle hash. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 16, "shingle n in [1,16]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    // tokenize: ascii alnum runs, lowercased; everything else separates
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = 0L
    var inTok = false
    var i = 0
    val len = s.length
    while (i < len) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { h = h * 31L + c; inTok = true }
      else if (inTok) { tokenHashes += mix(h); h = 0L; inTok = false }
      i += 1
    }
    if (inTok) tokenHashes += mix(h)

    val nt = tokenHashes.length
    val out: Array[Long] =
      if (nt == 0) Array(mix(0L))
      else if (nt < n) {
        var g = 0L
        var j = 0
        while (j < nt) { g = g * 1000003L + tokenHashes(j); j += 1 }
        Array(mix(g))
      } else {
        val raw = new Array[Long](nt - n + 1)
        var start = 0
        while (start <= nt - n) {
          var g = 0L
          var j = 0
          while (j < n) { g = g * 1000003L + tokenHashes(start + j); j += 1 }
          raw(start) = mix(g)
          start += 1
        }
        java.util.Arrays.sort(raw)
        var w = 1
        var r = 1
        while (r < raw.length) {
          if (raw(r) != raw(r - 1)) { raw(w) = raw(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(raw, w)
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-sensitive 64-bit hash of a text's NORMALIZED token stream
  * (lowercased ascii-alnum runs — identical token semantics to
  * [[ShingleHashes]] and the regex in Dedup.tokens), in one pass with no
  * intermediate strings or arrays. Two texts get equal hashes iff their
  * normalized token sequences are equal (modulo 64-bit collisions) —
  * exactly the grouping key normalized dedup needs, ~100x cheaper than
  * regexp_replace + split + concat_ws per row. */
case class NormHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "norm_hash64"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var acc = 0L
    var h = 0L
    var inTok = false
    var i = 0
    val len = s.length
    while (i < len) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { h = h * 31L + c; inTok = true }
      else if (inTok) { acc = acc * 1000003L + mix(h); h = 0L; inTok = false }
      i += 1
    }
    if (inTok) acc = acc * 1000003L + mix(h)
    mix(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-permutation MinHash signature over a token/shingle array, computed in
  * ONE pass: two xxhash64 values per token, the k "permutations" derive
  * via the Kirsch-Mitzenmacher construction g_j = h1 + j*h2. O(tokens + k)
  * instead of k full hash passes — this is what makes 128-perm signatures
  * affordable over 100 TB of shingles. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024, "k in (0,1024]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string> or array<long> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val fromStrings = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // two independent 64-bit hashes per shingle: from the string via
        // xxhash64 with two seeds, or (pre-hashed shingles) via two mixes
        var h1 = 0L; var h2 = 0L
        if (fromStrings) {
          val s = arr.getUTF8String(i)
          h1 = XxHash64Function.hash(s, StringType, 0xA5A5A5A5L)
          h2 = XxHash64Function.hash(s, StringType, 0x5A5A5A5AL) | 1L
        } else {
          val x = arr.getLong(i)
          h1 = mix(x ^ 0xA5A5A5A5L)
          h2 = mix(x ^ 0x5A5A5A5AL) | 1L
        }
        var j = 0
        var g = h1
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per-bit vote of xxhash64(token),
  * single pass. Near-duplicate texts land within small Hamming distance. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string> or string input")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private lazy val fromTokenArray = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (fromTokenArray) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) vote(XxHash64Function.hash(arr.getUTF8String(i), StringType, 0x51C6EL))
        i += 1
      }
    } else {
      // raw text: inline one-pass ascii-alnum tokenization (same token
      // semantics as ShingleHashes/NormHash64), one vote per OCCURRENCE —
      // multiplicity matters for simhash, so no dedupe here
      val s = v.toString
      var h = 0L
      var inTok = false
      var i = 0
      val len = s.length
      while (i < len) {
        val c0 = s.charAt(i)
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (alnum) { h = h * 31L + c; inTok = true }
        else if (inTok) { vote(mix(h ^ 0x51C6EL)); h = 0L; inTok = false }
        i += 1
      }
      if (inTok) vote(mix(h ^ 0x51C6EL))
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit polynomial rolling-hash fingerprint over a token array:
  * fp = fold(tokens, acc * 1000003 + xxhash64(token)), with two's-complement
  * wraparound (the standard rolling-hash semantics — done natively because
  * ANSI SQL mode rejects the intentional overflow). Order-sensitive,
  * deterministic, single pass. */
case class RollingFp64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string> input")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var fp = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        fp = fp * 1000003L + XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      }
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded signed-random-projection signatures for cosine LSH, computed in
  * ONE pass over the vector: `tables` hash tables, each a `bits`-bit
  * signature; bit j of table t = sign of <v, r_{t,b+j}> where the
  * hyperplane components are deterministic Rademacher (+1/-1) signs derived
  * from a splitmix64 mix of (seed, plane, dim) — no RNG state, identical on
  * every executor and across rounds. Returns array<long> of length `tables`
  * (the per-table bucket keys). Multi-table banding is what keeps recall
  * high while each table stays selective — the standard LSH structure for
  * ANN at corpus scale. */
case class SrpBands(child: Expression, bits: Int, tables: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 30, "bits in [1,30]")
  require(tables >= 1 && tables <= 64, "tables in [1,64]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nbits = bits * tables
    val acc = new Array[Double](nbits)
    val n = arr.numElements()
    var d = 0
    while (d < n) {
      val x = if (arr.isNullAt(d)) 0.0f else arr.getFloat(d)
      if (x != 0.0f) {
        var j = 0
        while (j < nbits) {
          val h = mix(seed + (j.toLong << 32) + d.toLong)
          if ((java.lang.Long.bitCount(h) & 1) == 1) acc(j) += x else acc(j) -= x
          j += 1
        }
      }
      d += 1
    }
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        if (acc(t * bits + j) > 0) key |= (1L << j)
        j += 1
      }
      buckets(t) = key
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass language-ID scoring: inline tokenization (same semantics
  * as [[NormHash64]]), one vote per stopword hit per language, argmax
  * with deterministic alphabetical tie-break. Replaces L per-language
  * filter expressions over materialized token arrays with ONE scan of the
  * text — per-language profiles are plain (lang, words) pairs, so richer
  * profiles (char n-grams) slot in without touching the plan. Stopwords
  * that do not survive the tokenizer as a single token (e.g. contain
  * non-ascii letters) are dropped from their profile at construction.
  * Returns struct(pred_lang: string, hits: int). */
/** Language-ID scorer in one pass over the text.
  *
  * Two profile modes, same `lang -> Seq[String]` profile format:
  *  - `charNgram = 0` (default): profile entries are stopWORDS; the text
  *    is tokenized inline (ascii-alnum runs, lowercased) and each token
  *    occurrence that equals a profile word scores one hit.
  *  - `charNgram = n > 0`: Cavnar-Trenkle-style character n-grams. The
  *    text is normalized on the fly (letters lowercased, every non-letter
  *    becomes a space, space runs collapse, one virtual boundary space at
  *    each end) and every n-char window that appears in a language's
  *    profile scores a hit. Profile entries are written WITH explicit
  *    boundary spaces (" the ", "ung ", "sch") and contribute all their
  *    n-char windows, so one entry can encode a word, prefix or suffix.
  *    N-grams catch morphology ("ción ", "sch", "mente ") on text that
  *    contains no stopword at all — TextSpec asserts this mode beats the
  *    stopword baseline on held-out samples.
  *
  * Either way the argmax ties break to the alphabetically first language,
  * and `cjkLang` votes once per han/kana character (CJK text tokenizes to
  * nothing in both modes). */
case class LangIdScore(
    child: Expression, profiles: Seq[(String, Seq[String])],
    cjkLang: Option[String] = None, charNgram: Int = 0)
    extends UnaryExpression with CodegenFallback {
  require(profiles.nonEmpty, "at least one language profile")
  require(charNgram == 0 || (charNgram >= 2 && charNgram <= 8), "charNgram in 0 or [2,8]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("pred_lang", StringType, nullable = false),
    StructField("hits", IntegerType, nullable = false)))
  override def prettyName: String = "langid_score"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def tokenHashes(s: String): Seq[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](32)
    var h = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { h = h * 31L + c; inTok = true }
      else if (inTok) { out += mix(h); h = 0L; inTok = false }
      i += 1
    }
    if (inTok) out += mix(h)
    out.toSeq
  }

  /** All charNgram-length window hashes of a profile entry: lowercased,
    * space runs collapsed, spaces kept as written (entries carry their own
    * boundary spaces). */
  private def entryNgramHashes(w: String): Seq[Long] = {
    val norm = new StringBuilder(w.length)
    var lastSpace = false
    w.foreach { c0 =>
      val isLetter = Character.isLetter(c0)
      val c = if (isLetter) Character.toLowerCase(c0) else ' '
      if (c != ' ') { norm.append(c); lastSpace = false }
      else if (!lastSpace) { norm.append(' '); lastSpace = true }
    }
    val s = norm.toString
    (0 to s.length - charNgram).map { i =>
      var h = 0L
      var j = 0
      while (j < charNgram) { h = h * 31L + s.charAt(i + j); j += 1 }
      mix(h)
    }
  }

  // alphabetical language order => argmax tie resolves to the first
  private lazy val langs: Array[String] =
    (profiles.map(_._1) ++ cjkLang.filterNot(profiles.map(_._1).contains)).sorted.toArray
  private lazy val cjkIdx: Int = cjkLang.map(l => langs.indexOf(l)).getOrElse(-1)
  private lazy val wordSets: Array[java.util.HashSet[java.lang.Long]] = {
    val byLang = profiles.toMap
    langs.map { l =>
      val set = new java.util.HashSet[java.lang.Long]()
      byLang.getOrElse(l, Seq.empty).foreach { w =>
        if (charNgram > 0) entryNgramHashes(w).foreach(set.add(_))
        else {
          val hs = tokenHashes(w)
          if (hs.length == 1) set.add(hs.head)
        }
      }
      set
    }
  }

  /** Rolling n-char window over the normalized text (letters lowercased,
    * non-letters as collapsed spaces, virtual boundary spaces), scoring
    * every window against each language set — one pass, no allocation
    * beyond the n-char ring. */
  private def scoreNgrams(s: String, hits: Array[Int]): Unit = {
    val n = charNgram
    val win = new Array[Char](n)
    var filled = 0
    var lastSpace = false
    def push(c: Char): Unit = {
      var k = 1
      while (k < n) { win(k - 1) = win(k); k += 1 }
      win(n - 1) = c
      if (filled < n) filled += 1
      if (filled == n) {
        var h = 0L
        var j = 0
        while (j < n) { h = h * 31L + win(j); j += 1 }
        val hm = mix(h)
        var l = 0
        while (l < langs.length) {
          if (wordSets(l).contains(hm)) hits(l) += 1
          l += 1
        }
      }
    }
    push(' '); lastSpace = true // virtual leading boundary
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val isLetter = Character.isLetter(c0)
      val c = if (isLetter) Character.toLowerCase(c0) else ' '
      if (c != ' ') { push(c); lastSpace = false }
      else if (!lastSpace) { push(' '); lastSpace = true }
      i += 1
    }
    if (!lastSpace) push(' ') // virtual trailing boundary
  }

  override protected def nullSafeEval(v: Any): Any = {
    val hits = new Array[Int](langs.length)
    val s = v.toString
    if (charNgram > 0) scoreNgrams(s, hits)
    else tokenHashes(s).foreach { h =>
      var l = 0
      while (l < langs.length) {
        if (wordSets(l).contains(h)) hits(l) += 1
        l += 1
      }
    }
    // CJK script detection: each han/kana character votes like a stopword
    // hit for the configured language (CJK text has no ascii tokens at all)
    if (cjkIdx >= 0) {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3040 && c <= 0x30FF)) hits(cjkIdx) += 1
        i += 1
      }
    }
    var best = 0
    var l = 1
    while (l < langs.length) {
      if (hits(l) > hits(best)) best = l
      l += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(langs(best)), hits(best))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Element-wise SUM of float vectors as a real aggregate function
  * (TypedImperativeAggregate): buffer = double accumulator array, updated
  * map-side and merged across partitions like any Spark partial
  * aggregate — group centroids / mean-pooling over embeddings run as one
  * shuffle of K small arrays instead of exploding N x D rows. Vectors of
  * differing lengths accumulate up to their own length. */
case class VecSumF(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float> input")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_f"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) b(i) += arr.getFloat(i)
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumF = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumF = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** One-pass text-quality statistics: struct(n_chars, punct, n_toks,
  * stop_hits) in a single scan of the string, replacing four separate
  * regex/split/array passes (measured ~5x on the quality query).
  *
  * Semantics EXACTLY mirror the SQL formulation the DuckDB oracle runs
  * (and the previous Column implementation):
  *  - n_chars  = length(text): Unicode code points
  *  - punct    = code points matching [^a-zA-Z0-9 ] (tabs/newlines count)
  *  - n_toks   = size(split(trim(lower(text)), "\\s+")): trim strips
  *    SPACES only; Java split keeps leading/trailing empty segments when
  *    the trimmed string still starts/ends with other whitespace; the
  *    empty string yields one empty token
  *  - stop_hits = tokens equal to a stopword (compared lowercased via a
  *    64-bit mixed hash; stopword lists are tiny and ASCII) */
case class TextQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("n_toks", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))
  override def prettyName: String = "text_quality_stats"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def tokenHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i); i += 1 }
    mix(h)
  }

  private lazy val stopSet: java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    stopwords.foreach(w => set.add(tokenHash(w.toLowerCase(java.util.Locale.ROOT))))
    set
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val len = s.length
    var nChars = 0
    var punct = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      nChars += 1
      val c = cp.toChar
      val allowed = cp < 128 &&
        ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == ' ')
      if (!allowed) punct += 1
      i += Character.charCount(cp)
    }
    // token window: trim SPACES only (split still sees other whitespace)
    var i0 = 0
    while (i0 < len && s.charAt(i0) == ' ') i0 += 1
    var i1 = len
    while (i1 > i0 && s.charAt(i1 - 1) == ' ') i1 -= 1
    var nToks = 0
    var stopHits = 0
    if (i0 >= i1) nToks = 1 // split("") -> [""]
    else {
      if (isWs(s.charAt(i0))) nToks += 1 // leading empty segment
      if (isWs(s.charAt(i1 - 1))) nToks += 1 // trailing empty segment
      var h = 0L
      var inTok = false
      var j = i0
      while (j < i1) {
        val c = s.charAt(j)
        if (isWs(c)) {
          if (inTok) {
            nToks += 1
            if (stopSet.contains(mix(h))) stopHits += 1
            h = 0L; inTok = false
          }
        } else {
          h = h * 31L + Character.toLowerCase(c)
          inTok = true
        }
        j += 1
      }
      if (inTok) {
        nToks += 1
        if (stopSet.contains(mix(h))) stopHits += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nChars, punct, nToks, stopHits)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass token counting: struct(ws_tokens, re_tokens) in a single
  * scan, replacing a regex split AND a regexp_extract_all evaluation.
  *
  * Semantics EXACTLY mirror the SQL formulation the DuckDB oracle runs:
  *  - ws_tokens = size(split(trim(text), "\\s+")): trim strips SPACES
  *    only; Java split keeps leading/trailing empty segments when the
  *    trimmed string still starts/ends with other whitespace; empty
  *    string yields one empty token
  *  - re_tokens = count of [a-z]+|[0-9]+|[^a-z0-9\s] matches over
  *    lower(text): each letter run, digit run, and individual other
  *    non-whitespace character counts once */
case class TokenCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("re_tokens", IntegerType, nullable = false)))
  override def prettyName: String = "token_counts"

  private def isWs(c: Char): Boolean = // Java regex \s = [ \t\n\x0B\f\r]
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val len = s.length
    // ws_tokens over trim(s) (spaces only at the edges)
    var i0 = 0
    while (i0 < len && s.charAt(i0) == ' ') i0 += 1
    var i1 = len
    while (i1 > i0 && s.charAt(i1 - 1) == ' ') i1 -= 1
    var wsToks = 0
    if (i0 >= i1) wsToks = 1 // split("") -> [""]
    else {
      if (isWs(s.charAt(i0))) wsToks += 1
      if (isWs(s.charAt(i1 - 1))) wsToks += 1
      var inTok = false
      var j = i0
      while (j < i1) {
        if (isWs(s.charAt(j))) { if (inTok) { wsToks += 1; inTok = false } }
        else inTok = true
        j += 1
      }
      if (inTok) wsToks += 1
    }
    // re_tokens over lower(s): run-length state machine, no regex.
    // Iterate CODE POINTS — the regex engine counts one match per
    // supplementary character, not per surrogate half.
    var reToks = 0
    var state = 0 // 0 none/ws, 1 in letter run, 2 in digit run
    var k = 0
    while (k < len) {
      val cp0 = s.codePointAt(k)
      val cp = Character.toLowerCase(cp0)
      if (cp >= 'a' && cp <= 'z') { if (state != 1) { reToks += 1; state = 1 } }
      else if (cp >= '0' && cp <= '9') { if (state != 2) { reToks += 1; state = 2 } }
      else if (cp < 128 && isWs(cp.toChar)) state = 0
      else { reToks += 1; state = 0 } // single-char match
      k += Character.charCount(cp0)
    }
    org.apache.spark.sql.catalyst.InternalRow(wsToks, reToks)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher-style duplicate word-n-gram statistics in one pass: tokenize
  * (ascii-alnum runs, lowercased — the [[ShingleHashes]] token semantics),
  * hash every n-gram of consecutive tokens, count occurrences, and report
  * struct(n_grams, n_dup_grams, dup_char_frac) where dup_char_frac is the
  * fraction of TOKEN CHARACTERS covered by at least one n-gram that
  * occurs more than once (marked coverage: overlapping duplicated n-grams
  * never double-count a token, so the fraction is bounded [0,1]). Texts
  * with fewer than n tokens have no n-grams -> (0, 0, 0.0). */
case class DupNgramStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 2 && n <= 16, "ngram n in [2,16]")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_dup_grams", IntegerType, nullable = false),
    StructField("dup_char_frac", DoubleType, nullable = false)))
  override def prettyName: String = "dup_ngram_stats"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    val tokLens = new scala.collection.mutable.ArrayBuffer[Int](64)
    var h = 0L
    var tl = 0
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { h = h * 31L + c; tl += 1 }
      else if (tl > 0) { tokHashes += mix(h); tokLens += tl; h = 0L; tl = 0 }
      i += 1
    }
    if (tl > 0) { tokHashes += mix(h); tokLens += tl }

    val nt = tokHashes.length
    val grams = nt - this.n + 1
    if (grams <= 0)
      return org.apache.spark.sql.catalyst.InternalRow(0, 0, 0.0)
    val gramHashes = new Array[Long](grams)
    val counts = new java.util.HashMap[java.lang.Long, Integer](grams * 2)
    var g = 0
    while (g < grams) {
      var acc = 0L
      var j = 0
      while (j < this.n) { acc = acc * 1000003L + tokHashes(g + j); j += 1 }
      val gh = mix(acc)
      gramHashes(g) = gh
      val prev = counts.get(gh)
      counts.put(gh, if (prev == null) 1 else prev + 1)
      g += 1
    }
    val covered = new Array[Boolean](nt)
    var dupGrams = 0
    g = 0
    while (g < grams) {
      if (counts.get(gramHashes(g)) > 1) {
        dupGrams += 1
        var j = 0
        while (j < this.n) { covered(g + j) = true; j += 1 }
      }
      g += 1
    }
    var totalChars = 0L
    var dupChars = 0L
    var t = 0
    while (t < nt) {
      totalChars += tokLens(t)
      if (covered(t)) dupChars += tokLens(t)
      t += 1
    }
    val frac = if (totalChars == 0L) 0.0 else dupChars.toDouble / totalChars.toDouble
    org.apache.spark.sql.catalyst.InternalRow(grams, dupGrams, frac)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-side nearest-centroid assignment (the IVF build/query hot path):
  * scores the input vector against a BOUNDED in-expression centroid table
  * and returns the argmax centroid id. Replicates EXACTLY the plan shape
  * it replaces — `round(cosineSimF(vec, cent), 6)` per centroid, winner =
  * highest cosine, ties to the smaller centroid id (topKPerQuery(k=1)'s
  * evict rule) — but as ONE projection per row: the old path exploded
  * N x K rows through a crossJoin, heap-reduced them per partition and
  * re-ranked through a window, i.e. a full N-row shuffle per assignment
  * pass. Cosine arithmetic is the same fused double-accumulator loop as
  * [[CosineSimF]] (including the min-length truncation and null-element-
  * as-zero rules), and the rounding is Spark `round`'s HALF_UP-at-6
  * BigDecimal rule, so assignments are bit-identical. Null vector -> null
  * (the old path crashed the row encoder on nulls; callers drop them). */
case class NearestCentF(child: Expression, centIds: Array[Long],
    centVecs: Array[Array[Float]])
    extends UnaryExpression {
  require(centIds.length == centVecs.length && centIds.nonEmpty,
    "nearest_cent_f needs a non-empty centroid table")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float> input")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cent_f"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val an = a.numElements()
    val x = new Array[Float](an)
    var i = 0
    while (i < an) { x(i) = if (a.isNullAt(i)) 0.0f else a.getFloat(i); i += 1 }
    var bestC = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var c = 0
    while (c < centVecs.length) {
      val w = centVecs(c)
      val n = math.min(an, w.length)
      // same loop as CosineSimF: BOTH norms accumulate over the first n
      // elements only, so truncation behavior matches bit for bit
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val xv = x(j); val yv = w(j)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        j += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      // Spark round(_, 6) on DoubleType: BigDecimal HALF_UP at scale 6.
      // RoundBase returns NaN/Infinity UNCHANGED (BigDecimal would throw
      // NumberFormatException on them), so guard the same way — a corpus
      // vector containing NaN must rank, not crash the assignment.
      val r =
        if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
        else scala.math.BigDecimal(cos)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      val id = centIds(c)
      // Double.compare ordering = the replaced window's DESC sort rule:
      // NaN sorts ABOVE every value (incl. +Infinity), matching Spark's
      // SQL double ordering the old round+window plan ranked with
      val cmp = java.lang.Double.compare(r, bestC)
      if (cmp > 0 || (cmp == 0 && id < bestId)) { bestC = r; bestId = id }
      c += 1
    }
    bestId
  }

  /** Whole-stage codegen of the same loop (the interpreted CodegenFallback
    * broke codegen of the whole assignment PROJECTION — guide §4). The
    * centroid table rides along as reference objects; rounding matches
    * RoundBase's generated code (BigDecimal.valueOf == the Scala
    * string-constructor path nullSafeEval uses), NaN/Infinity bypass it
    * unchanged, and Double.compare keeps NaN-sorts-highest. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val an = ctx.freshName("an"); val x = ctx.freshName("x")
      val i = ctx.freshName("i"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom"); val cos = ctx.freshName("cos")
      val r = ctx.freshName("r"); val id = ctx.freshName("id"); val cmp = ctx.freshName("cmp")
      val bestC = ctx.freshName("bestC"); val bestId = ctx.freshName("bestId")
      s"""
        final int $an = $a.numElements();
        final float[] $x = new float[$an];
        for (int $i = 0; $i < $an; $i++) {
          $x[$i] = $a.isNullAt($i) ? 0.0f : $a.getFloat($i);
        }
        double $bestC = Double.NEGATIVE_INFINITY;
        long $bestId = Long.MAX_VALUE;
        for (int $c = 0; $c < $vecs.length; $c++) {
          final float[] $w = $vecs[$c];
          final int $n = Math.min($an, $w.length);
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            final float xv = $x[$j]; final float yv = $w[$j];
            $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
          }
          final double $denom = Math.sqrt($na) * Math.sqrt($nb);
          final double $cos = ($denom == 0.0) ? 0.0 : $dot / $denom;
          final double $r = (Double.isNaN($cos) || Double.isInfinite($cos)) ? $cos :
            java.math.BigDecimal.valueOf($cos)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
          final long $id = $ids[$c];
          final int $cmp = Double.compare($r, $bestC);
          if ($cmp > 0 || ($cmp == 0 && $id < $bestId)) { $bestC = $r; $bestId = $id; }
        }
        ${ev.value} = $bestId;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API wrappers. */
object VectorFunctions {
  def cosineSimF(a: Column, b: Column): Column =
    Bridge.column(CosineSimF(Bridge.expression(a), Bridge.expression(b)))
  def nearestCentF(vec: Column, centIds: Array[Long],
      centVecs: Array[Array[Float]]): Column =
    Bridge.column(NearestCentF(Bridge.expression(vec), centIds, centVecs))
  /** [[nearestCentF]] wrapped in AssertNotNull: throws on a null input
    * vector (fail-fast — the crossJoin formulation this path replaced
    * crashed its row encoder on nulls, and brute force still errors on
    * the same data) and, crucially, makes the output NON-NULLABLE, so a
    * downstream join on cent_id adds no IsNotNull filter — the pushed
    * filter re-evaluated the whole K x d argmax a second time per corpus
    * row (plans/r16 and the r17 before-dumps both show the duplicated
    * nearest_cent_f in the scan Condition). */
  def nearestCentFStrict(vec: Column, centIds: Array[Long],
      centVecs: Array[Array[Float]]): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
      NearestCentF(Bridge.expression(vec), centIds, centVecs),
      Seq("assignToCents: null corpus vector (corpus vectors must be non-null)")))
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))
  def minhashSig(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), k))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def rollingFp64(tokens: Column): Column =
    Bridge.column(RollingFp64(Bridge.expression(tokens)))
  def srpBands(vec: Column, bits: Int, tables: Int, seed: Long = 0L): Column =
    Bridge.column(SrpBands(Bridge.expression(vec), bits, tables, seed))
  def shingleHashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
  def normHash64(text: Column): Column =
    Bridge.column(NormHash64(Bridge.expression(text)))
  def langIdScore(text: Column, profiles: Seq[(String, Seq[String])],
      cjkLang: Option[String] = None, charNgram: Int = 0): Column =
    Bridge.column(LangIdScore(Bridge.expression(text), profiles, cjkLang, charNgram))
  def textQualityStats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextQualityStats(Bridge.expression(text), stopwords))
  def tokenCounts(text: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(text)))
  def dupNgramStats(text: Column, n: Int): Column =
    Bridge.column(DupNgramStats(Bridge.expression(text), n))
  /** aggregate: element-wise sum of array<float> vectors (array<double>) */
  def vecSumF(vec: Column): Column =
    Bridge.column(VecSumF(Bridge.expression(vec)).toAggregateExpression())
}
