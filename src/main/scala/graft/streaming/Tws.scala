package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** The modern arbitrary-state API (`transformWithState`, Spark 4.x
  * `StatefulProcessor`) carrying the same operator semantics as the
  * `flatMapGroupsWithState` machines in [[StateMachines]] — the forward
  * path for keyed state: NAMED typed state variables (value/list/map)
  * instead of one monolithic state case class, first-class named timers
  * (`registerTimer`/`handleExpiredTimer`) instead of the single
  * `setTimeoutTimestamp` slot, per-state TTL, and RocksDB-only execution
  * (the provider for state beyond executor heap, SURVEY §4).
  *
  * One machine is carried on both APIs ([[matchWithTimeout]] here, its
  * `flatMapGroupsWithState` twin in [[StateMachines.matchWithTimeout]]):
  * `TwsSpec` pins row-for-row equality on replayed real events, so the
  * library's state-machine semantics are API-agnostic and a migration to
  * `transformWithState` is mechanical. The reference's timer surface
  * (`ctx.timerService().registerEventTimeTimer`, reference W7 —
  * `gmall-order-pay/.../OrderTimeOutStateApp.java:57-112`) maps MORE
  * directly here than onto `GroupStateTimeout`: one named timer per
  * deadline, deleted/re-armed as the pending set changes.
  *
  * NOTE: `transformWithState` requires the RocksDB state store provider
  * (`GraftSession.builder(rocksdbStateStore = true)`); the HDFS-backed
  * default provider rejects the operator.
  */
object Tws {

  /** Request→response matcher with event-time timeout on the
    * StatefulProcessor API — same rows as
    * [[StateMachines.matchWithTimeout]]: `reqKind` opens a request;
    * the earliest open request in `(resp − timeout, resp)` matches →
    * "matched"; an unmatched response → "resp_no_req"; a request whose
    * deadline the watermark passes → "timeout".
    */
  class MatchWithTimeoutProcessor(reqKind: String, respKind: String, timeoutSec: Long)
      extends StatefulProcessor[String, KeyedEvent, TaggedRow] {
    import StateMachines.{sorted, tsOf, usOf}

    private val timeoutUs = timeoutSec * 1000000L

    // pending open requests (id, request-ts epoch-us), earliest first —
    // a NAMED list state variable instead of a state case-class field
    @transient private var pending: ListState[(String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[(String, Long)](
        "pending", Encoders.product[(String, Long)], TTLConfig.NONE)

    /** Flush expired requests against the current watermark, update the
      * state variable, and re-arm ONE timer at the earliest remaining
      * deadline (delete-then-register keeps exactly one live timer per
      * key — the reference's registerEventTimeTimer discipline). */
    private def flushAndArm(
        open0: List[(String, Long)],
        wmUs: Long,
        out: scala.collection.mutable.Builder[TaggedRow, Seq[TaggedRow]]): Unit = {
      val (expired, open) = open0.partition { case (_, reqUs) => reqUs + timeoutUs <= wmUs }
      for ((reqId, reqUs) <- expired)
        out += TaggedRow(null, "timeout", tsOf(reqUs), tsOf(reqUs + timeoutUs), reqId)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (open.isEmpty) pending.clear()
      else {
        pending.put(open.toArray)
        // ceil to ms so the timer never fires before the us deadline
        getHandle.registerTimer((open.map(_._2).min + timeoutUs + 999L) / 1000L)
      }
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[TaggedRow] = {
      var open: List[(String, Long)] =
        if (pending.exists()) pending.get().toList else Nil
      val out = Seq.newBuilder[TaggedRow]
      for (e <- sorted(rows); if e.kind != Replay.Sentinel) e.kind match {
        case k if k == reqKind =>
          open = (open :+ (e.id, usOf(e.ts))).sortBy(_._2)
        case k if k == respKind =>
          open.find { case (_, reqUs) =>
            usOf(e.ts) > reqUs && usOf(e.ts) <= reqUs + timeoutUs
          } match {
            case Some(hit @ (reqId, reqUs)) =>
              out += TaggedRow(key, "matched", tsOf(reqUs), e.ts, reqId)
              open = open.filterNot(_ == hit)
            case None =>
              out += TaggedRow(key, "resp_no_req", e.ts, e.ts, e.id)
          }
        case _ => ()
      }
      flushAndArm(open, timerValues.getCurrentWatermarkInMs() * 1000L, out)
      out.result().map(r => if (r.key == null) r.copy(key = key) else r).iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TaggedRow] = {
      val open: List[(String, Long)] =
        if (pending.exists()) pending.get().toList else Nil
      val out = Seq.newBuilder[TaggedRow]
      flushAndArm(open, timerValues.getCurrentWatermarkInMs() * 1000L, out)
      out.result().map(r => if (r.key == null) r.copy(key = key) else r).iterator
    }
  }

  def matchWithTimeout(
      events: Dataset[KeyedEvent],
      reqKind: String,
      respKind: String,
      timeoutSec: Long,
      watermarkDelay: String = "0 seconds"): Dataset[TaggedRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(
        new MatchWithTimeoutProcessor(reqKind, respKind, timeoutSec),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
