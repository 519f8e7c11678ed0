/* Lives under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] extension points (AbstractDataType,
 * classic.ExpressionUtils) are needed for a native expression. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
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

object TextFunctions {
  /** Column API for [[CharNgrams]]. */
  def charNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgrams(ExpressionUtils.expression(text), n))
}
