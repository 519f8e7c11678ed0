package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stream join operators (SURVEY §2.4).
  *
  * Batch formulations; the watermark-driven streaming versions live in
  * [[graft.streaming.StreamJoins]].
  */
object Joins {

  /** Interval (range) equi-join — reference J1
    * (`gmall-order-pay/.../app/PayReceiptWithJoinApp.java:50-70`:
    * `orders.intervalJoin(receipts).between(-3s, +5s)` on txId).
    *
    * Inner join on `key` with `rightTs` ∈ [leftTs + lowerSec, leftTs +
    * upperSec]. Left/right frames must already have disjoint column names;
    * `leftTs`/`rightTs` are column names, `key` the shared equi-key pair.
    * Plan shape: hash exchange both sides on the equi-key, range predicate
    * evaluated inside the join — no cross product.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      rightTs: Column,
      lowerSec: Long,
      upperSec: Long): DataFrame =
    left.join(
      right,
      leftKey === rightKey &&
        unix_micros(rightTs) >= unix_micros(leftTs) + lowerSec * 1000000L &&
        unix_micros(rightTs) <= unix_micros(leftTs) + upperSec * 1000000L,
      "inner")

  /** Two-stream reconciliation — reference J2
    * (`gmall-order-pay/.../app/PayReceiptWithConnectApp.java:62-157`:
    * keyed connect of pays and receipts, matched → "Payed And Receipt",
    * unmatched after a timeout → side outputs "Payed No Receipt" /
    * "No Payed But Receipt").
    *
    * Batch semantics: full-outer key-equi join with a time-proximity bound;
    * the three Flink outputs collapse into a `status` column (tagged-union
    * encoding of side outputs — split downstream with `filter`).
    */
  def reconcile(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      rightTs: Column,
      toleranceSec: Long,
      matchedStatus: String = "matched",
      leftOnlyStatus: String = "left_only",
      rightOnlyStatus: String = "right_only"): DataFrame =
    left
      .join(
        right,
        leftKey === rightKey &&
          abs(unix_micros(rightTs) - unix_micros(leftTs)) <= toleranceSec * 1000000L,
        "full_outer")
      .withColumn(
        "status",
        when(leftTs.isNotNull && rightTs.isNotNull, matchedStatus)
          .when(leftTs.isNotNull, leftOnlyStatus)
          .otherwise(rightOnlyStatus))
}
