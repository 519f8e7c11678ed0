package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY §5.5): random event interleavings through the
  * streaming state machines must match the batch window-function
  * formulation (consecutive runs) / an in-memory brute-force oracle
  * (request-timeout), independent of how the stream is chopped into
  * micro-batches.
  */
class StateMachinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2020-01-01 00:00:00").getTime

  /** Random per-key in-order event sequences + a random batch split point. */
  private case class Scenario(events: List[KeyedEvent], splitAt: Int)

  private def scenarioGen(kinds: Seq[String]): Gen[Scenario] =
    for {
      n <- Gen.choose(1, 24)
      keys <- Gen.listOfN(n, Gen.oneOf("k1", "k2", "k3"))
      gaps <- Gen.listOfN(n, Gen.choose(0L, 4000L))
      kindsPick <- Gen.listOfN(n, Gen.oneOf(kinds))
      split <- Gen.choose(0, n)
    } yield {
      val ts = gaps.scanLeft(base)(_ + _).tail
      val evs = keys.lazyZip(ts).lazyZip(kindsPick).toList.zipWithIndex.map {
        case ((k, t, kind), i) => KeyedEvent(k, new Timestamp(t), kind, s"e$i")
      }
      Scenario(evs, split)
    }

  private def runStream(
      scenario: Scenario,
      name: String)(op: Dataset[KeyedEvent] => Dataset[TaggedRow]): Seq[TaggedRow] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = op(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val (b1, b2) = scenario.events.splitAt(scenario.splitAt)
      if (b1.nonEmpty) { input.addData(b1); q.processAllAvailable() }
      if (b2.nonEmpty) { input.addData(b2); q.processAllAvailable() }
      input.addData(Seq(KeyedEvent("__s", new Timestamp(base + 864000000L), "noop", "s1")))
      q.processAllAvailable()
      input.addData(Seq(KeyedEvent("__s", new Timestamp(base + 864000001L), "noop", "s2")))
      q.processAllAvailable()
      spark.table(name).as[TaggedRow].collect().toSeq.filterNot(_.key == "__s")
    } finally q.stop()
  }

  /** Drive a Gen deterministically across `n` seeds (no scalatest-scalacheck
    * bridge in the offline cache). */
  private def forAllSeeded(gen: Gen[Scenario], n: Int)(prop: (Scenario, Int) => Unit): Unit =
    (1 to n).foreach { i =>
      val sc = gen(Gen.Parameters.default, Seed(i.toLong)).get
      prop(sc, i)
    }

  test("property: streaming consecutiveMatches == batch formulation") {
    forAllSeeded(scenarioGen(Seq("fail", "ok")), 20) { (sc, i) =>
      val streamed = runStream(sc, s"prop_consec_$i")(
        StateMachines.consecutiveMatches(_, "fail", 2, 2L))
        .map(r => (r.key, r.first_ts, r.last_ts)).sorted
      val batch = graft.ops.Sequences
        .consecutiveMatches(
          sc.events.toDF(), col("key"), col("ts"), col("id"), col("kind") === "fail", 2, 2L)
        .as[(String, Timestamp, Timestamp)].collect().toSeq.sorted
      assert(streamed == batch, s"seed=$i events=${sc.events}")
    }
  }

  test("property: dailyThreshold warn days equal batch formulation") {
    forAllSeeded(scenarioGen(Seq("click", "view")), 15) { (sc, i) =>
      val streamed = runStream(sc, s"prop_daily_$i")(
        StateMachines.dailyThreshold(_, "click", 3L))
        .filter(_.tag == "warn")
        .map(r => (r.key, r.first_ts)) // first_ts = utc day start
        .sorted
      val batch = graft.ops.Sequences
        .dailyThreshold(sc.events.toDF(), col("key"), col("ts"), col("kind") === "click", 3L)
        .select("key", "day").as[(String, Timestamp)].collect().toSeq.sorted
      assert(streamed == batch, s"seed=$i events=${sc.events}")
    }
  }

  test("property: reconcile tags match greedy in-memory replay") {
    forAllSeeded(scenarioGen(Seq("pay", "receipt")), 15) { (sc, i) =>
      val streamed = runStream(sc, s"prop_rec_$i")(
        StateMachines.reconcile(_, "pay", "receipt", 2L))
        .map(r => (r.key, r.tag, r.info)).sorted
      val oracle = sc.events.groupBy(_.key).toSeq.flatMap { case (key, evs) =>
        var left = Vector.empty[(String, Long)]
        var right = Vector.empty[(String, Long)]
        val out = Seq.newBuilder[(String, String, String)]
        for (e <- evs.sortBy(ev => (ev.ts.getTime, ev.id))) {
          val ms = e.ts.getTime
          if (e.kind == "pay") right.find { case (_, o) => Math.abs(o - ms) <= 2000L } match {
            case Some(hit) =>
              out += ((key, "matched", s"${e.id}|${hit._1}")); right = right.filterNot(_ == hit)
            case None => left :+= (e.id, ms)
          }
          else left.find { case (_, o) => Math.abs(o - ms) <= 2000L } match {
            case Some(hit) =>
              out += ((key, "matched", s"${hit._1}|${e.id}")); left = left.filterNot(_ == hit)
            case None => right :+= (e.id, ms)
          }
        }
        left.foreach { case (id, _) => out += ((key, "left_only", id)) }
        right.foreach { case (id, _) => out += ((key, "right_only", id)) }
        out.result()
      }.sorted
      assert(streamed == oracle, s"seed=$i events=${sc.events}")
    }
  }

  test("property: streaming asOf == batch asOfJoin on any interleaving") {
    forAllSeeded(scenarioGen(Seq("b", "p")), 20) { (sc, i) =>
      // 5 s watermark delay: a row exactly AT the watermark is
      // late-dropped, and random split points put equal-ts events in
      // adjacent batches (gaps are <= 4 s, so 5 s keeps them alive)
      val streamed = runStream(sc, s"prop_asof_$i")(
        StateMachines.asOf(_, "b", "p", watermarkDelay = "5 seconds"))
        .map { r =>
          if (r.tag == "matched") {
            val Array(pid, bid) = r.info.split("\\|")
            (r.key, pid, bid)
          } else (r.key, r.info, null)
        }.sorted
      val df = sc.events.toDF()
      val probes = df.filter(col("kind") === "p")
        .select(col("key").as("pk"), col("ts").as("pts"), col("id").as("pid"))
      val builds = df.filter(col("kind") === "b")
        .select(col("key").as("bk"), col("ts").as("bts"), col("id").as("bid"))
      val batch = graft.ops.Joins
        .asOfJoin(probes, builds, col("pk"), col("bk"), col("pts"), col("bts"),
          buildTieBreak = Seq("bid"))
        .select("pk", "pid", "bid").as[(String, String, String)]
        .collect().toSeq.sorted
      assert(streamed == batch, s"seed=$i events=${sc.events}")
    }
  }

  test("property: matchWithTimeout matches in-memory oracle") {
    forAllSeeded(scenarioGen(Seq("req", "resp")), 20) { (sc, i) =>
      val streamed = runStream(sc, s"prop_mt_$i")(
        StateMachines.matchWithTimeout(_, "req", "resp", 2L))
        .map(r => (r.key, r.tag, r.info)).sorted
      // brute-force oracle: replay per key in order, earliest-pending match
      val oracle = sc.events.groupBy(_.key).toSeq.flatMap { case (key, evs) =>
        var pending = Vector.empty[(String, Long)]
        val out = Seq.newBuilder[(String, String, String)]
        for (e <- evs.sortBy(ev => (ev.ts.getTime, ev.id))) e.kind match {
          case "req" => pending = (pending :+ (e.id, e.ts.getTime)).sortBy(_._2)
          case "resp" =>
            pending.find { case (_, rm) =>
              e.ts.getTime > rm && e.ts.getTime <= rm + 2000L
            } match {
              case Some(hit) =>
                out += ((key, "matched", hit._1)); pending = pending.filterNot(_ == hit)
              case None => out += ((key, "resp_no_req", e.id))
            }
          case _ => ()
        }
        pending.foreach { case (id, _) => out += ((key, "timeout", id)) }
        out.result()
      }.sorted
      assert(streamed == oracle, s"seed=$i events=${sc.events}")
    }
  }
}
