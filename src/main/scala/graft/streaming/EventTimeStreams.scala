package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TopN

/** Watermarked event-time window aggregations — the streaming forms of
  * [[graft.ops.WindowAggs]] (reference A1–A8 over W1–W6).
  *
  * Semantics mapping (SURVEY §2.6):
  *  - ascending-timestamp extractor (W1) → `withWatermark(ts, "0 seconds")`
  *  - bounded out-of-orderness 2 s (W2) → `withWatermark(ts, "2 seconds")`
  *  - allowed lateness (W6) → for the built-in window aggregation, fold the
  *    lateness into the watermark delay and run in update mode (same final
  *    rows, last-write-wins at the sink); the EXACT firing model — on-time
  *    fire, per-element late re-fires, too-late side output — is
  *    [[WindowTriggers.countWithAllowedLateness]]
  *  - FIRE_AND_PURGE per-element emission (W5) → exact per-EVENT firing is
  *    [[WindowTriggers.fireAndPurgeCount]]; update mode on the built-in
  *    aggregation remains the per-micro-batch approximation when only
  *    last-write-wins results matter
  *
  * In append mode a window's single final row emits once the watermark
  * passes window end + delay — Flink's default on-watermark firing.
  */
object EventTimeStreams {

  /** Tumbling/sliding windowed count over a watermarked stream. `slide`
    * None → tumbling. Same flattened (window_start, keys..., cnt) shape as
    * the batch op, so batch/stream equivalence is row-identical.
    */
  def windowedCount(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      size: String,
      slide: Option[String] = None,
      keys: Seq[Column] = Nil,
      countName: String = "cnt"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), size, s)
      case None    => window(col(tsCol), size)
    }
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win +: keys: _*)
      .agg(count(lit(1)).as(countName))
      .withColumn("window_start", col("window.start"))
      .drop("window")
  }

  /** Streaming approximate distinct (reference A8): HLL++ per window —
    * constant state per (window,key), the scale-path replacement for the
    * reference's Redis bitmap (`UniqueVisitorApp2.java:93-167`).
    */
  def windowedApproxDistinct(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      size: String,
      distinctCol: Column,
      rsd: Double = 0.05,
      countName: String = "uv_approx"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), size))
      .agg(approx_count_distinct(distinctCol, rsd).as(countName))
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Streaming exact distinct per window via pre-window dedup (reference
    * A7 exact UV, stream-safe): `dropDuplicates` holds one state row per
    * (value, window) — bounded by the watermark, evicted after it passes.
    */
  def windowedExactDistinct(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      size: String,
      distinctColName: String,
      countName: String = "uv"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("__w", window(col(tsCol), size))
      .dropDuplicates("__w", distinctColName)
      .groupBy(col("__w"))
      .agg(count(lit(1)).as(countName))
      .withColumn("window_start", col("__w.start"))
      .drop("__w")

  /** Streaming exact content dedup — the streaming half of
    * [[graft.ops.Dedup.exact]]: keep the first-seen row per content
    * fingerprint, with state bounded by the watermark (a duplicate
    * arriving later than `delay` after the original will pass through —
    * the unbounded-state alternative is not viable on an infinite
    * stream; widen `delay` to widen the dedup horizon).
    */
  def streamingExactDedup(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      fingerprint: Column): DataFrame =
    stream
      .withColumn("__fp", fingerprint)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Per-window top-N for streams (reference T1/T2 — the
    * `KeyedProcessFunction` buffer/sort/emit-on-timer at
    * `HotItemApp.java:116-190`): rank the completed micro-batch of window
    * counts inside `foreachBatch`. With append-mode upstream counts, each
    * window arrives exactly once, finalized — the rank is the reference's
    * timer-at-windowEnd+1 emission without the hand-built ListState.
    * Returns the function to pass to `writeStream.foreachBatch`.
    */
  def topNPerWindowBatcher(
      partition: Seq[String],
      order: Seq[Column],
      n: Int)(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      sink(TopN.perPartition(batch, partition.map(col), order, n))
}
