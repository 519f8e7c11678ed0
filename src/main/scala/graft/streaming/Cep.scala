package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Generic CEP pattern combinator — the reference's Flink-CEP surface
  * (`gmall-login-fail/.../LoginFailwithStateCEP.java:48-58` builds
  * `Pattern.<Bean>begin("start").where(...).next("next").where(...)
  * .within(Time.seconds(2))`; `LoginFailwithStateCEP_More.java:46-53` the
  * `times(n).consecutive()` flavor; `gmall-order-pay/.../
  * OrderTimeOutWithCepApp.java:53-76` the `followedBy(...).within(15 min)`
  * + timeout-side-output flavor) re-expressed as a small immutable DSL
  * compiled to ONE `flatMapGroupsWithState` NFA. Before round 9 each
  * instantiated pattern was a hand-written machine
  * ([[StateMachines.consecutiveMatches]], [[StateMachines.matchWithTimeout]]);
  * this is the missing COMBINATOR layer — a user brings a new pattern as
  * an expression, not a new machine.
  *
  * Supported surface (the reference's full usage):
  *   - `Pattern.begin(name)(pred)` — start step.
  *   - `.next(name)(pred)` — STRICT contiguity: the key's immediately
  *     next (non-sentinel) event must match, else the partial dies
  *     (Flink `next`, the "no success in between" login-fail rule).
  *   - `.followedBy(name)(pred)` — RELAXED contiguity (skip-till-next):
  *     non-matching events are skipped; the partial advances on the first
  *     STRICTLY LATER (event-time) matching event. Non-consuming: every
  *     open partial advances on the same event, so one response can
  *     complete many requests — exactly the SQL `min(resp) per req`
  *     semantics (unlike [[StateMachines.matchWithTimeout]]'s greedy
  *     consuming matcher).
  *   - `.times(n)` — repeat the LAST step to n strict-consecutive
  *     occurrences total (Flink `times(n).consecutive()`), sliding
  *     emission: every event completing a run emits.
  *   - `.within(sec)` — horizon anchored at the first step's event time;
  *     advances require `ts − anchor ≤ sec` (inclusive, the reference's
  *     deadline rule). With `emitTimeouts` expired partials emit one
  *     `status = "timeout"` row at `anchor + sec` the moment the
  *     watermark proves no in-horizon event can still arrive — Flink's
  *     timeout side output as EventTimeTimeout timers.
  *
  * Matching model: per key, events fold in (ts, id) order (the
  * [[StateMachines]] ordering contract); every event matching step 0
  * opens a partial; open partials advance/die per their next step's
  * contiguity. After-match: the completed partial leaves state (emission
  * is not a tombstone — overlapping runs re-emit, the sliding login-fail
  * behavior).
  *
  * State posture: O(open partials) per key — runs bounded by pattern
  * length, requests bounded by the within-horizon (expired partials leave
  * state at watermark) — never O(events).
  */
object Cep {

  /** One NFA step: events advance a partial at this step when `pred`
    * holds; `strict` = the partial dies instead when the event does not
    * match (Flink `next` vs `followedBy`). */
  final case class Step(name: String, pred: KeyedEvent => Boolean, strict: Boolean)
      extends Serializable

  final case class Pattern private[streaming] (
      steps: Vector[Step],
      withinSec: Option[Long]) extends Serializable {

    def next(name: String)(pred: KeyedEvent => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, strict = true))

    def followedBy(name: String)(pred: KeyedEvent => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, strict = false))

    /** Flink `times(n).consecutive()`: the last step must occur n times
      * in strictly consecutive events. */
    def times(n: Int): Pattern = {
      require(n >= 1, "times(n) needs n >= 1")
      require(steps.nonEmpty, "times(n) needs a step to repeat")
      val last = steps.last
      copy(steps = steps ++ Vector.fill(n - 1)(last.copy(strict = true)))
    }

    def within(sec: Long): Pattern = {
      require(sec > 0, "within(sec) needs a positive horizon")
      copy(withinSec = Some(sec))
    }
  }

  object Pattern {
    def begin(name: String)(pred: KeyedEvent => Boolean): Pattern =
      Pattern(Vector(Step(name, pred, strict = false)), None)
  }

  /** A completed or timed-out match. `first_*` bind the step-0 event,
    * `last_ts` the completing event's time (or `anchor + within` for
    * timeouts). */
  final case class CepMatch(
      key: String,
      status: String, // "matched" | "timeout"
      first_ts: Timestamp,
      last_ts: Timestamp,
      first_id: String)

  /** Open partial: completed `step` steps, anchored at the step-0 event. */
  final case class CepPartial(step: Int, anchorUs: Long, firstId: String, lastUs: Long)
  final case class CepState(partials: List[CepPartial])

  /** Compile `pattern` over a keyed event stream. `emitTimeouts` requires
    * `within` (the horizon is what defines a timeout). */
  def run(
      events: Dataset[KeyedEvent],
      pattern: Pattern,
      emitTimeouts: Boolean = false,
      watermarkDelay: String = "0 seconds"): Dataset[CepMatch] = {
    require(pattern.steps.size >= 1, "empty pattern")
    require(!emitTimeouts || pattern.withinSec.isDefined,
      "emitTimeouts needs within(sec) — the horizon defines the timeout")
    val spark = events.sparkSession
    import spark.implicits._
    import StateMachines.{sorted, tsOf, usOf}
    val steps = pattern.steps
    val nSteps = steps.size
    val withinUs = pattern.withinSec.map(_ * 1000000L)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append,
        if (withinUs.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)((key, it, state) => {
        var partials = state.getOption.map(_.partials).getOrElse(Nil)
        val out = Seq.newBuilder[CepMatch]
        for (e <- sorted(it); if e.kind != Replay.Sentinel) {
          val us = usOf(e.ts)
          val inHorizon = (p: CepPartial) => withinUs.forall(w => us - p.anchorUs <= w)
          partials = partials.flatMap { p =>
            val step = steps(p.step) // the step this partial must match NEXT
            val timeOk = (!step.strict && us > p.lastUs) || step.strict
            if (step.pred(e) && timeOk && inHorizon(p)) {
              if (p.step + 1 == nSteps) {
                out += CepMatch(key, "matched", tsOf(p.anchorUs), e.ts, p.firstId)
                Nil // after-match: the completed partial leaves state
              } else Some(p.copy(step = p.step + 1, lastUs = us))
            } else if (step.strict) Nil // strict contiguity: a non-match kills
            else Some(p) // relaxed: skip this event (horizon reaped below)
          }
          // every step-0 match opens a new partial — including an event
          // that just advanced or completed others (sliding runs)
          if (steps.head.pred(e)) {
            if (nSteps == 1) out += CepMatch(key, "matched", e.ts, e.ts, e.id)
            else partials = CepPartial(1, us, e.id, us) :: partials
          }
        }
        // horizon reaping at the watermark: a partial whose deadline the
        // watermark passed can never advance (advances need ts ≤ deadline
        // and the watermark proves no such event is still coming)
        withinUs match {
          case Some(w) =>
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (expired, open) = partials.partition(p => p.anchorUs + w <= wmUs)
            if (emitTimeouts)
              for (p <- expired)
                out += CepMatch(key, "timeout", tsOf(p.anchorUs), tsOf(p.anchorUs + w), p.firstId)
            partials = open
            if (open.isEmpty) state.remove()
            else {
              state.update(CepState(open))
              // ceil to ms so the timer never fires before the us deadline
              state.setTimeoutTimestamp((open.map(_.anchorUs).min + w + 999L) / 1000L)
            }
          case None =>
            if (partials.isEmpty) state.remove() else state.update(CepState(partials))
        }
        out.result().iterator
      })
  }
}
