/* Lives under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] extension points (AbstractDataType,
 * classic.ExpressionUtils) are needed for a native expression. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Morton (Z-order) interleave of two non-negative dimension values: bit
  * `i` of `x` lands at bit `2i`, bit `i` of `y` at bit `2i+1`, so sorting
  * by the result clusters rows that are close in BOTH dimensions — the
  * standard multi-dimensional clustering key for min/max data skipping
  * (each parquet row group / file then spans a bounded range of every
  * interleaved dimension, and a selective filter on ANY of them prunes;
  * a plain lexicographic sort only skips on its leading column).
  *
  * Native with `doGenCode` because it sits in the write path of every
  * clustered table: the bit-spread is 12 ALU ops per dimension, and a HOF
  * `aggregate(sequence(0,31), ...)` formulation would be an interpreted
  * lambda per bit per row. Inputs are longs; each must be in [0, 2^31)
  * — callers bucketize raw columns first (the z-value orders bucket
  * coordinates, so 31 bits per dim is already ~2e9 buckets). Out-of-range
  * input is a null z-value (never an exception mid-write), matching the
  * container parsers' null-on-bad-input discipline.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.eval(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // call through MODULE$: scalac suppresses the static eval(long,long)
    // forwarder here (name collision with Expression.eval), and Janino
    // then can't resolve a bare ZOrder2.eval — which would silently
    // demote every z-ordered write to interpreted eval via codegen
    // fallback (PipelineSpec pins compiled execution with fallback off)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""java.lang.Long z = org.apache.spark.sql.graft.ZOrder2$$.MODULE$$.eval($x, $y);
         |if (z == null) { ${ev.isNull} = true; } else { ${ev.value} = z.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 31 bits of `v` to even bit positions (0,2,4,…,60). */
  private def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Boxed so generated code can signal null on out-of-range input. */
  def eval(x: Long, y: Long): java.lang.Long =
    if (x < 0L || y < 0L || x > Int.MaxValue || y > Int.MaxValue) null
    else java.lang.Long.valueOf(spread(x) | (spread(y) << 1))
}

object ZOrderFunctions {
  /** Column API for [[ZOrder2]]. */
  def zorder2(x: Column, y: Column): Column =
    ExpressionUtils.column(
      ZOrder2(ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
