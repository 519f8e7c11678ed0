/** Column-level bridge to Spark's internal bloom-filter join expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind InjectRuntimeFilter). Lives in the sql package tree because the
  * expression constructors and `classic.ExpressionUtils` are
  * `private[sql]`; the public surface is [[graft.ops.Joins.bloomPrunedSemiJoin]].
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

object BloomJoinExpressions {

  /** Aggregate column building a serialized bloom filter over
    * xxhash64(key) — mergeable per-partition sketches, O(numBits) state.
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(key))),
        Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe of `key` against the FINISHED bloom bits
    * (embedded as a literal — `BloomFilterMightContain` requires a
    * constant/scalar-subquery bloom side, same as Spark's own runtime
    * filter rewrite).
    */
  def mightContain(bits: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(bits, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
