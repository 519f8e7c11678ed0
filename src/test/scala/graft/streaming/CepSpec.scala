package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Cep.{CepMatch, Pattern}

/** The generic CEP combinator ([[Cep]]): strict `next` contiguity kills,
  * relaxed `followedBy` skips and does NOT consume (response reuse),
  * `times(n)` slides, `within` excludes and drives timeout side output —
  * and the combinator reproduces the hand-written machines
  * ([[StateMachines.consecutiveMatches]]) on real replayed data.
  */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(key: String, t: String, kind: String, id: String): KeyedEvent =
    KeyedEvent(key, ts(t), kind, id)

  private def runScenario(
      name: String,
      pattern: Pattern,
      batches: Seq[Seq[KeyedEvent]],
      emitTimeouts: Boolean = false): Set[(String, String, Timestamp, Timestamp, String)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = Cep.run(input.toDS(), pattern, emitTimeouts = emitTimeouts)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      for (b <- batches) { input.addData(b); q.processAllAvailable() }
      spark.table(name).as[CepMatch]
        .collect().map(m => (m.key, m.status, m.first_ts, m.last_ts, m.first_id)).toSet
    } finally q.stop()
  }

  test("next is strict: an intervening non-match kills the run; times(3) slides") {
    val p = Pattern.begin("f")(_.kind == "fail").times(3).within(3600L)
    val got = runScenario("cep_strict", p, Seq(Seq(
      ev("u1", "2020-01-01 00:00:00", "fail", "a"),
      ev("u1", "2020-01-01 00:01:00", "fail", "b"),
      ev("u1", "2020-01-01 00:02:00", "ok", "c"), // kills the a-b run
      ev("u1", "2020-01-01 00:03:00", "fail", "d"),
      ev("u1", "2020-01-01 00:04:00", "fail", "e"),
      ev("u1", "2020-01-01 00:05:00", "fail", "f"), // d-e-f completes
      ev("u1", "2020-01-01 00:06:00", "fail", "g")))) // e-f-g slides
    assert(got == Set(
      ("u1", "matched", ts("2020-01-01 00:03:00"), ts("2020-01-01 00:05:00"), "d"),
      ("u1", "matched", ts("2020-01-01 00:04:00"), ts("2020-01-01 00:06:00"), "e")))
  }

  test("within excludes a run whose span exceeds the horizon") {
    val p = Pattern.begin("f")(_.kind == "fail").times(2).within(60L)
    val got = runScenario("cep_within", p, Seq(Seq(
      ev("u1", "2020-01-01 00:00:00", "fail", "a"),
      ev("u1", "2020-01-01 00:02:00", "fail", "b"), // 120 s > 60 s: no match
      ev("u1", "2020-01-01 00:02:30", "fail", "c")))) // b-c inside 60 s
    assert(got == Set(
      ("u1", "matched", ts("2020-01-01 00:02:00"), ts("2020-01-01 00:02:30"), "b")))
  }

  test("followedBy skips non-matches, requires strictly-later time, and does NOT consume") {
    val p = Pattern.begin("req")(_.kind == "req")
      .followedBy("resp")(_.kind == "resp").within(3600L)
    val got = runScenario("cep_relaxed", p, Seq(Seq(
      ev("u1", "2020-01-01 00:00:00", "req", "r1"),
      ev("u1", "2020-01-01 00:00:00", "resp", "x0"), // same ts: NOT later
      ev("u1", "2020-01-01 00:01:00", "req", "r2"),
      ev("u1", "2020-01-01 00:02:00", "noise", "n1"), // skipped, kills nothing
      ev("u1", "2020-01-01 00:03:00", "resp", "x1")))) // completes BOTH r1 and r2
    assert(got == Set(
      ("u1", "matched", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:03:00"), "r1"),
      ("u1", "matched", ts("2020-01-01 00:01:00"), ts("2020-01-01 00:03:00"), "r2")))
  }

  test("timeout side output fires at anchor + within once the watermark passes it") {
    val p = Pattern.begin("req")(_.kind == "req")
      .followedBy("resp")(_.kind == "resp").within(60L)
    val got = runScenario("cep_timeout", p, Seq(
      Seq(ev("u1", "2020-01-01 00:00:00", "req", "r1")),
      // watermark rides to 01:00 — r1's 00:01 deadline expires unmatched
      Seq(ev("u2", "2020-01-01 01:00:00", "req", "r9"))),
      emitTimeouts = true)
    assert(got == Set(
      ("u1", "timeout", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:01:00"), "r1")))
  }

  test("combinator == hand-written consecutiveMatches machine on replayed real events") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.io.Tables(spark, dir).events
      .select(
        col("user_id").cast("string").as("key"),
        col("ts"),
        col("event_type").as("kind"),
        col("event_id").cast("string").as("id"))
    val cep = Replay.keyedEvents(events, nChunks = 6) { stream =>
      Cep.run(stream, Pattern.begin("f")(_.kind == "error").times(2).within(7200L)).toDF()
        .select(col("key"), col("first_ts"), col("last_ts"))
    }.as[(String, Timestamp, Timestamp)].collect().toSet
    val machine = Replay.keyedEvents(events, nChunks = 6) { stream =>
      StateMachines.consecutiveMatches(stream, "error", 2, 7200L).toDF()
        .select(col("key"), col("first_ts"), col("last_ts"))
    }.as[(String, Timestamp, Timestamp)].collect().toSet
    assert(cep.nonEmpty, "gate is vacuous: no consecutive errors in the corpus")
    assert(cep == machine)
  }
}
