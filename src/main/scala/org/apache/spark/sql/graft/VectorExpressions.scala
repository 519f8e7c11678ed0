/* Lives under org.apache.spark.sql so the private[sql] extension points
 * (AbstractDataType, classic.ExpressionUtils) are in scope — the standard
 * pattern for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Cosine similarity of two array<double> vectors as a single fused,
  * whole-stage-codegen'd pass: one loop accumulates dot, |a|², |b|².
  *
  * Why a native expression: the `functions.aggregate`/`zip_with`
  * formulation is CodegenFallback (interpreted lambda per element) and
  * walks each array three times; on an all-pairs near-dup join that is the
  * entire query cost (measured 64 s → <2 s at sf0.1). Accumulation is a
  * sequential left fold per accumulator — bit-identical to the
  * `aggregate(zip_with(...))` order, so quantized comparisons against
  * external oracles are unchanged.
  *
  * Mismatched lengths use the common prefix; null elements are treated as
  * 0.0 (embedding columns are non-null in practice). A zero-norm (or
  * empty) vector yields 0.0, not NaN — downstream `floor(sim*1e4)`
  * casts would throw under ANSI mode on a NaN, letting one degenerate
  * embedding row kill a whole near-dup/kNN job.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getDouble($i);
         |  final double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id of an array<double> vector: bit p of the
  * result is the sign of `vec · signs[p]`. The sign matrix is baked into
  * the expression at plan time, so the generated code is one tight
  * dims×planes loop — replacing an `element_at`-per-term column tree
  * (nPlanes × dim terms) that bloated codegen.
  *
  * Accumulation per plane is a sequential left fold over dims — bit-equal
  * to the `(0 until dim).map(...).reduce(_ + _)` formulation it replaced.
  * Vectors shorter than `dim` treat missing trailing dims as 0.
  */
case class SignProjectionBucket(child: Expression, signs: Array[Double], nPlanes: Int, dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(signs.length == nPlanes * dim, "signs must be nPlanes*dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_projection_bucket"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var j = 0
      while (j < n) { proj += x.getDouble(j) * signs(p * dim + j); j += 1 }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $bucket = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $proj = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $proj += $v.getDouble($j) * $signsRef[$p * $dim + $j];
         |  }
         |  if ($proj >= 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: code s = argmin_c L2²(vec[s·d .. s·d+d),
  * codebook[s][c]) for each of `m` subspaces → array<int> of m codes.
  * The codebooks are baked into the expression at plan time
  * (`addReferenceObj`), so the generated code is one tight m×k×d loop —
  * the `transform`/`aggregate` HOF formulation is CodegenFallback and
  * interprets m·k lambda trees per row.
  *
  * Tie-break: strict `<` keeps the FIRST minimal centroid — identical to
  * `array_position(dists, array_min(dists))`. Missing trailing dims read
  * as 0. Accumulation is the same sequential left fold as
  * `aggregate(zip_with(...))`, so codes are bit-identical to the HOF
  * formulation (pinned in OpsSpec).
  */
case class PqCodes(child: Expression, codebooks: Array[Double], m: Int, k: Int, d: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(codebooks.length == m * k * d, "codebooks must be m*k*d flattened")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0.0
        var j = 0
        while (j < d) {
          val idx = s * d + j
          val xj = if (idx < n) x.getDouble(idx) else 0.0
          val t = xj - codebooks(s * k * d + c * d + j)
          dist += t * t
          j += 1
        }
        if (dist < bd) { bd = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val xj = ctx.freshName("xj")
      val t = ctx.freshName("t")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |final int $n = $v.numElements();
         |final int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $dist = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      final int $idx = $s * $d + $j;
         |      final double $xj = $idx < $n ? $v.getDouble($idx) : 0.0;
         |      final double $t = $xj - $cbRef[$s * $k * $d + $c * $d + $j];
         |      $dist += $t * $t;
         |    }
         |    if ($dist < $bd) { $bd = $dist; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_s lut[s][codes[s]] — the product-quantization asymmetric
  * distance sum over a per-query lookup table (array<array<double>>) and
  * a corpus row's code array. Codegen'd single loop; the
  * `aggregate(zip_with(element_at...))` HOF tree it replaces is
  * interpreted per element. Out-of-range codes contribute 0 (never
  * throw). Sequential left fold — bit-identical to the HOF formulation
  * (pinned in OpsSpec).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = math.min(lut.numElements(), codes.numElements())
    var sum = 0.0
    var s = 0
    while (s < m) {
      val sub = lut.getArray(s)
      val c = codes.getInt(s)
      if (c >= 0 && c < sub.numElements()) sum += sub.getDouble(c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val sum = ctx.freshName("sum")
      s"""
         |final int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $sub = $a.getArray($s);
         |  final int $c = $b.getInt($s);
         |  if ($c >= 0 && $c < $sub.numElements()) $sum += $sub.getDouble($c);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Nearest centroid over an integer-quantized vector: argmin_c Σ_j
  * (qv[j] - cents[c][j])² with ties to the LOWEST centroid index, packed
  * as `dist · 2^14 + list_id` in one long (k ≤ 16384 — sized for
  * thousand-cluster 100 TB curation fits, not a demo constant). The
  * argmin compares EXACT 64-bit distances; only the distance that rides
  * the pack saturates, at 2^49 − 1 ≈ 5.6e14 — for 1e-6-grid 64-dim
  * unit-scale vectors dist ≤ ~2.6e14, so within that envelope the pack
  * is exact and never overflows (beyond it — higher dims or
  * larger-magnitude vectors — list_id stays correct and dist clamps;
  * quantize coarser if exact inertia is needed there).
  *
  * Why integers: the distributed k-means fit must be replayable by an
  * external SQL oracle, and floating-point distance sums accumulate in
  * engine-private order. On the integer grid every distance is EXACT in
  * any order, so the argmin — and therefore the whole fit trajectory —
  * is bit-identical cross-engine. Why one expression: the k×d loop over
  * a plan-time centroid matrix (`addReferenceObj`) stays inside
  * whole-stage codegen; the `transform`/`aggregate` HOF formulation is
  * CodegenFallback and interprets k lambda trees per row (the PqCodes
  * lesson). Missing trailing dims read as 0.
  */
case class NearestCentroid(child: Expression, cents: Array[Long], k: Int, d: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(k > 0 && k <= 16384, "NearestCentroid packs list_id in 14 bits: k must be 1..16384")
  require(cents.length == k * d, "cents must be k*d flattened")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), d)
    var best = 0
    var bd = Long.MaxValue
    var c = 0
    while (c < k) {
      var dist = 0L
      var j = 0
      while (j < n) {
        val t = x.getLong(j) - cents(c * d + j)
        dist += t * t
        j += 1
      }
      while (j < d) { val t = cents(c * d + j); dist += t * t; j += 1 }
      if (dist < bd) { bd = dist; best = c }
      c += 1
    }
    (math.min(bd, (1L << 49) - 1) << 14) + best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $d);
         |int $best = 0; long $bd = Long.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  long $dist = 0L;
         |  int $j = 0;
         |  for (; $j < $n; $j++) {
         |    final long $t = $v.getLong($j) - $centsRef[$c * $d + $j];
         |    $dist += $t * $t;
         |  }
         |  for (; $j < $d; $j++) {
         |    final long $t = $centsRef[$c * $d + $j];
         |    $dist += $t * $t;
         |  }
         |  if ($dist < $bd) { $bd = $dist; $best = $c; }
         |}
         |${ev.value} = (java.lang.Math.min($bd, (1L << 49) - 1) << 14) + $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[CosineSim]]: `cosineSim($"a", $"b")`. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[SignProjectionBucket]]. */
  def signProjectionBucket(vec: Column, signs: Array[Double], nPlanes: Int, dim: Int): Column =
    ExpressionUtils.column(
      SignProjectionBucket(ExpressionUtils.expression(vec), signs, nPlanes, dim))

  /** Column API for [[PqCodes]]; codebooks indexed [s][c][j] flattened to
    * s·k·d + c·d + j. */
  def pqCodes(vec: Column, codebooks: Array[Double], m: Int, k: Int, d: Int): Column =
    ExpressionUtils.column(
      PqCodes(ExpressionUtils.expression(vec), codebooks, m, k, d))

  /** Column API for [[AdcScore]]. */
  def adcScore(lut: Column, codes: Column): Column =
    ExpressionUtils.column(
      AdcScore(ExpressionUtils.expression(lut), ExpressionUtils.expression(codes)))

  /** Column API for [[NearestCentroid]]; cents indexed [c][j] flattened
    * to c·d + j; result packed `dist·16 + list_id`. */
  def nearestCentroid(qv: Column, cents: Array[Long], k: Int, d: Int): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(qv), cents, k, d))
}
