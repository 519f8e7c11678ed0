/* Lives under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] extension points (AbstractDataType,
 * classic.ExpressionUtils) are needed for a native expression. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping character n-grams of a string, in order — the
  * tokenizer for char-n-gram language ID and fingerprinting. A native
  * expression because the `transform(sequence(...), i -> substr(i, n))`
  * formulation is CodegenFallback: one interpreted lambda tree per
  * character of every document (the whole cost of the langid-model scan).
  * Codepoint-based (`UTF8String.substringSQL`), matching `Column.substr`
  * exactly — bit-equality with the HOF formulation is pinned in OpsSpec.
  * Strings shorter than `n` yield an empty array; null stays null.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(n >= 1, "n-gram length must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(v: Any): Any =
    CharNgrams.eval(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // call through MODULE$: scalac suppresses the static eval(UTF8String,
    // int) forwarder here (name collision with Expression.eval), and a
    // bare CharNgrams.eval fails Janino resolution — silently demoting
    // the whole langid scan to interpreted eval via codegen fallback
    // (OpsSpec pins compiled execution with fallback off)
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = org.apache.spark.sql.graft.CharNgrams$$.MODULE$$.eval($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  /** Static helper shared by interpreted eval and generated code. */
  def eval(s: UTF8String, n: Int): GenericArrayData = {
    val total = s.numChars()
    val count = math.max(total - n + 1, 0)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All overlapping character n-grams of a string PACKED into primitive
  * longs — 21 bits per codepoint, big-endian, so the numeric order of
  * packed codes equals the lexicographic (byte-wise UTF-8, i.e.
  * codepoint) order of the gram strings: any `ORDER BY gram` tie-break
  * downstream is engine-identical whether it ran on strings or codes.
  * The point is allocation: [[CharNgrams]] materializes one UTF8String
  * per gram (measured 12.7 s for one bare explode pass over the 10×
  * corpus — object churn, not compute); this emits one primitive-long
  * array per document (`UnsafeArrayData.fromPrimitiveArray`), and every
  * downstream explode/groupBy/join moves 8-byte longs. n ≤ 3 (3 × 21
  * bits; the langid trigram case). Strings shorter than `n` yield an
  * empty array; null stays null.
  */
case class CharNgramCodes(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(n >= 1 && n <= 3, "packed n-gram length must be 1..3")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_codes"

  override def nullSafeEval(v: Any): Any =
    CharNgramCodes.eval(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ call: the bare companion reference would hit the suppressed
    // static-forwarder trap (same as CharNgrams/ZOrder2)
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = org.apache.spark.sql.graft.CharNgramCodes$$.MODULE$$.eval($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramCodes {
  /** Static helper shared by interpreted eval and generated code. */
  def eval(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString // one decode per document, not per gram
    val m = str.codePointCount(0, str.length)
    val cps = new Array[Int](m)
    var ci = 0
    var off = 0
    while (ci < m) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      off += Character.charCount(cp)
      ci += 1
    }
    val count = math.max(m - n + 1, 0)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var code = 0L
      var j = 0
      while (j < n) {
        code = (code << 21) | cps(i + j).toLong
        j += 1
      }
      out(i) = code
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Unicode NFC normalization — the canonical-composition pass every text
  * pipeline needs before fingerprinting/dedup (the same logical document
  * arrives as precomposed 'é' from one crawler and 'e'+U+0301 from
  * another; without normalization exact dedup silently misses them).
  * Spark has no built-in for this, so it's a native codegen'd expression
  * (a Scala UDF would serialize UTF8String→String→UTF8String per row AND
  * break whole-stage codegen). Delegates to `java.text.Normalizer` (ICU
  * canonical composition, locale-independent, stable across JDKs by the
  * Unicode stability policy). Fast path: `Normalizer.isNormalized` on the
  * decoded string avoids the rebuild allocation for the (overwhelmingly
  * common) already-NFC case. Null stays null.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ call: same suppressed-static-forwarder trap as CharNgrams
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = org.apache.spark.sql.graft.NfcNormalize$$.MODULE$$.eval($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static helper shared by interpreted eval and generated code. */
  def eval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Per-row character-unigram stats for the entropy quality signal:
  * struct(n_chars, n_char_types, ent_sum_micro) where `ent_sum_micro =
  * Σ_types cnt·⌊1e6·ln cnt⌋` — exactly the integer-term contract of the
  * explode + two-aggregate formulation in
  * [[graft.ops.TextOps]] (equivalence pinned in OpsSpec), but computed in
  * ONE pass over the row with a small open-addressing count table: no
  * explode, no (doc, char) exchange, no per-doc aggregate — the whole
  * entropy scan is projection-shaped (measured 15.7 s → scan-bound on the
  * 10× corpus where the explode form shuffles ~30 M (doc, char) rows).
  * Codepoint-based like [[CharNgrams]]. Null stays null.
  */
case class CharStats(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override val dataType: DataType = CharStats.schema
  override def prettyName: String = "char_stats"

  override def nullSafeEval(v: Any): Any =
    CharStats.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ call: same suppressed-static-forwarder trap as CharNgrams
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = org.apache.spark.sql.graft.CharStats$$.MODULE$$.eval($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  import org.apache.spark.sql.types.{LongType => L, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_chars", L, nullable = false),
    StructField("n_char_types", L, nullable = false),
    StructField("ent_sum_micro", L, nullable = false)))

  /** Static helper shared by interpreted eval and generated code. */
  def eval(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var off = 0
    var n = 0L
    while (off < str.length) {
      val cp = str.codePointAt(off)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      n += 1
      off += Character.charCount(cp)
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      sum += c * math.floor(math.log(c.toDouble) * 1e6).toLong
    }
    org.apache.spark.sql.catalyst.InternalRow(n, counts.size.toLong, sum)
  }
}

object TextFunctions {
  /** Column API for [[CharNgrams]]. */
  def charNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgrams(ExpressionUtils.expression(text), n))

  /** Column API for [[CharNgramCodes]]. */
  def charNgramCodes(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgramCodes(ExpressionUtils.expression(text), n))

  /** Column API for [[NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

  /** Column API for [[CharStats]]. */
  def charStats(text: Column): Column =
    ExpressionUtils.column(CharStats(ExpressionUtils.expression(text)))
}
