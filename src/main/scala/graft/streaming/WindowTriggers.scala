package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import StateMachines.{sorted, tsOf, usOf}

/** Per-event pane firing: one row per input element with the pane's count
  * after folding it in. `fire_ts` is the firing element's event time.
  */
case class PaneFire(key: String, window_start: Timestamp, cnt: Long, fire_ts: Timestamp)

/** Window firing under allowed lateness. `firing` is `on_time` (the
  * watermark-driven initial fire, `id` empty), `late_update` (a re-fire
  * caused by the allowed-late element `id`), or `too_late` (an element past
  * window end + lateness — the reference's late side output; `cnt` is 0,
  * the element is NOT folded into the window).
  */
case class LateFire(key: String, window_start: Timestamp, cnt: Long, firing: String, id: String)

/** Custom window trigger/eviction semantics Spark's built-in windowed
  * aggregation cannot express — the two reference behaviors rounds 1–3
  * carried as documented deviations, now implemented exactly on
  * `flatMapGroupsWithState`:
  *
  *  - '''W5 FIRE_AND_PURGE''' (`gmall-network-flow/.../app/
  *    UniqueVisitorApp2.java:74-88`: a custom `Trigger` returning
  *    `FIRE_AND_PURGE` on every element, window contents held outside the
  *    window in Redis) → [[fireAndPurgeCount]]: per-ELEMENT emission of the
  *    running pane aggregate, state purged when the watermark passes window
  *    end. True per-event cadence inside each micro-batch — not the
  *    update-mode per-batch approximation.
  *  - '''W6 allowed lateness''' (`gmall-network-flow/.../app/
  *    HotUrlApp.java:67-69`: `allowedLateness(Time.minutes(1))` +
  *    `sideOutputLateData`) → [[countWithAllowedLateness]]: on-time fire at
  *    watermark = window end, per-element re-fires for allowed-late
  *    arrivals, a `too_late` side output past the lateness horizon, state
  *    purged at window end + lateness.
  *
  * Scale: state is partitioned by key hash like every stateful op; per key
  * it is O(open windows) counters — for [[fireAndPurgeCount]] in distinct
  * mode it is O(distinct ids per open window) (the reference holds exactly
  * this in a Redis bitmap; the bounded-memory scale path for global UV
  * remains A8's HLL++, `graft.ops.WindowAggs.tumblingApproxDistinct`).
  * Emission volume is one row per input element — pane firing is a serving
  * pattern, not an analytics reduction; downstream should be a sink, a
  * last-write-wins store, or a final per-window reduce.
  */
object WindowTriggers {

  /** Tumbling-window count (or distinct-id count) with FIRE_AND_PURGE
    * firing: every element of `matchKind` emits the pane's updated
    * aggregate immediately. In `distinctOnId` mode a duplicate id still
    * fires (the reference's trigger fires unconditionally per element) but
    * leaves the count unchanged, so `max(cnt)` per (key, window) is the
    * exact windowed (distinct) count — the batch-equivalence the
    * q_uv_pane_stream correctness row checks.
    */
  def fireAndPurgeCount(
      events: Dataset[KeyedEvent],
      matchKind: String,
      sizeSec: Long,
      distinctOnId: Boolean = false,
      watermarkDelay: String = "0 seconds"): Dataset[PaneFire] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sizeUs = sizeSec * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[PaneState, PaneFire](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)((key, it, state) => {
        var st = state.getOption.getOrElse(PaneState(Map.empty, Set.empty))
        val out = Seq.newBuilder[PaneFire]
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        for (e <- sorted(it) if e.kind == matchKind) {
          val ws = Math.floorDiv(usOf(e.ts), sizeUs) * sizeUs
          if (ws + sizeUs > wmUs) { // a purged pane never resurrects
            val seenKey = s"$ws|${e.id}"
            if (distinctOnId && st.seen.contains(seenKey))
              out += PaneFire(key, tsOf(ws), st.cnt(ws), e.ts) // fire, unchanged
            else {
              val n = st.cnt.getOrElse(ws, 0L) + 1L
              st = PaneState(
                st.cnt.updated(ws, n),
                if (distinctOnId) st.seen + seenKey else st.seen)
              out += PaneFire(key, tsOf(ws), n, e.ts)
            }
          }
        }
        // PURGE: watermark past window end drops the pane entirely
        val live = st.cnt.filter { case (ws, _) => ws + sizeUs > wmUs }
        if (live.isEmpty) state.remove()
        else {
          val liveSeen =
            if (distinctOnId) st.seen.filter(sk => live.contains(sk.takeWhile(_ != '|').toLong))
            else st.seen
          state.update(PaneState(live, liveSeen))
          // ceil to ms so the purge timer never fires before the us deadline
          state.setTimeoutTimestamp((live.keys.map(_ + sizeUs).min + 999L) / 1000L)
        }
        out.result().iterator
      })
  }

  /** Panes per window start: running counts, and in distinct mode the
    * `"windowStartUs|id"` membership set (the Redis bitmap's role).
    */
  case class PaneState(cnt: Map[Long, Long], seen: Set[String])

  /** Open windows: running counts plus the set already fired on time. */
  case class LateState(cnt: Map[Long, Long], fired: Set[Long])

  /** Windowed count with Flink's allowed-lateness firing model:
    * each window fires once when the (reference-side) watermark reaches its
    * end; each element arriving within `latenessSec` after that re-fires
    * the window with the updated count; elements later than that emit a
    * `too_late` row (the late side output) and are dropped from the count;
    * state is purged at window end + lateness.
    *
    * `slideSec` < `sizeSec` gives sliding windows (the reference's
    * HotUrlApp shape: 10 m / 5 s + 60 s lateness): an element folds into
    * its `size/slide` containing windows and an allowed-late element
    * re-fires every already-fired one. State stays O(open windows) per
    * key — counters only, like Flink's incremental-aggregate sliding
    * window. Granularity note: `too_late` rows are emitted per expired
    * WINDOW; Flink's side output emits the element once, only when every
    * assigned window has expired (identical for tumbling windows).
    *
    * Watermark bookkeeping: Spark's watermark must lag the reference's by
    * `latenessSec + sizeSec` so allowed-late elements (and near-boundary
    * too-late ones, which Flink judges by WINDOW END + lateness, not
    * element time) survive the pre-state late-row filter. The reference
    * watermark is recovered inside the function as
    * `spark watermark + lateness + size`; all fire/purge decisions use it,
    * so firing happens at the same event-time points as the reference.
    * Elements displaced further than `outOfOrderSec + latenessSec +
    * sizeSec` are dropped by Spark upstream of the function — beyond even
    * the too-late horizon, so only the side output (not the counts) could
    * under-report, and only for pathologically old input.
    */
  def countWithAllowedLateness(
      events: Dataset[KeyedEvent],
      matchKind: String,
      sizeSec: Long,
      latenessSec: Long,
      outOfOrderSec: Long = 0L,
      slideSec: Option[Long] = None): Dataset[LateFire] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sizeUs = sizeSec * 1000000L
    val lateUs = latenessSec * 1000000L
    val slideUs = slideSec.getOrElse(sizeSec) * 1000000L
    require(slideUs > 0 && sizeUs % slideUs == 0, "size must be a multiple of slide")
    // every slide-aligned window containing t: newest start first
    def windowsOf(tUs: Long): Seq[Long] = {
      val newest = Math.floorDiv(tUs, slideUs) * slideUs
      Iterator.iterate(newest)(_ - slideUs).takeWhile(_ > tUs - sizeUs).toSeq
    }
    events
      .withWatermark("ts", s"${outOfOrderSec + latenessSec + sizeSec} seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[LateState, LateFire](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)((key, it, state) => {
        var st = state.getOption.getOrElse(LateState(Map.empty, Set.empty))
        val out = Seq.newBuilder[LateFire]
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val refWmUs = wmUs + lateUs + sizeUs // the reference-side watermark
        for (e <- sorted(it) if e.kind == matchKind; ws <- windowsOf(usOf(e.ts))) {
          if (ws + sizeUs + lateUs <= refWmUs)
            out += LateFire(key, tsOf(ws), 0L, "too_late", e.id)
          else {
            val n = st.cnt.getOrElse(ws, 0L) + 1L
            st = st.copy(cnt = st.cnt.updated(ws, n))
            if (st.fired.contains(ws))
              out += LateFire(key, tsOf(ws), n, "late_update", e.id)
          }
        }
        // on-time firings: reference watermark reached window end
        val toFire = st.cnt.keys
          .filter(ws => ws + sizeUs <= refWmUs && !st.fired.contains(ws)).toSeq.sorted
        for (ws <- toFire) out += LateFire(key, tsOf(ws), st.cnt(ws), "on_time", "")
        st = LateState(st.cnt, st.fired ++ toFire)
        // purge at window end + lateness (⇔ ws <= spark watermark)
        val live = st.cnt.filter { case (ws, _) => ws > wmUs }
        if (live.isEmpty) state.remove()
        else {
          state.update(LateState(live, st.fired.filter(live.contains)))
          // next deadline in spark-watermark coordinates: fire at
          // ws - lateness (ref ws+size), purge at ws; ceil us → ms
          val next = live.keys
            .map(ws => if (st.fired.contains(ws)) ws else ws - lateUs).min
          state.setTimeoutTimestamp((next + 999L) / 1000L)
        }
        out.result().iterator
      })
  }
}
