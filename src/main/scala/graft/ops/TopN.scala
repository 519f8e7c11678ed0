package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-partition top-N (reference T1/T2: the `KeyedProcessFunction`s that
  * buffer window results in ListState/MapState, sort on an event-time
  * timer, and emit the first N —
  * `gmall-user-behavior/.../app/HotItemApp.java:116-190`,
  * `gmall-network-flow/.../app/HotUrlApp.java:115-183`,
  * `HotUrlApp_MapState.java:116-186`).
  *
  * Spark-first: a `row_number` over a window spec. The sort is per
  * partition key (e.g. per time-window), so the shuffle is
  * hash-partitioned by the window key and each partition sorts only its
  * own candidate set — no global sort. The MapState-dedup concern of T2
  * (last write per url wins) is inherent here: rank always runs over the
  * latest aggregated counts.
  *
  * `order` must include a unique tie-breaker (e.g. the key column) so
  * results are deterministic under re-partitioning.
  */
object TopN {
  def perPartition(
      df: DataFrame,
      partition: Seq[Column],
      order: Seq[Column],
      n: Int,
      rankName: String = "rank"): DataFrame =
    df.withColumn(
        rankName,
        row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)).cast("long"))
      .filter(col(rankName) <= n)
}
