package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.WindowAggs

case class TsEvent(ts: Timestamp, user: Long, kind: String)

/** Streaming window-agg specs: append-mode finalization on watermark, and
  * batch/stream equivalence (SURVEY §5 item 4).
  */
class EventTimeStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCount append-mode emits finalized hour windows, late row dropped") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val q = EventTimeStreams
      .windowedCount(input.toDF(), "ts", "0 seconds", "1 hour")
      .writeStream.format("memory").queryName("wc1").outputMode("append").start()
    try {
      input.addData(Seq(
        TsEvent(ts("2020-01-01 10:05:00"), 1, "view"),
        TsEvent(ts("2020-01-01 10:50:00"), 2, "view")))
      q.processAllAvailable()
      // watermark passes 11:00 -> the 10:00 window finalizes
      input.addData(Seq(TsEvent(ts("2020-01-01 11:10:00"), 3, "view")))
      q.processAllAvailable()
      // a late 10:xx row behind the watermark must be dropped, not re-counted
      input.addData(Seq(TsEvent(ts("2020-01-01 10:59:00"), 4, "view")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 13:00:00"), 5, "view")))
      q.processAllAvailable()
      val got = spark.table("wc1").as[(Long, Timestamp)].collect().toMap
      assert(got == Map(2L -> ts("2020-01-01 10:00:00"), 1L -> ts("2020-01-01 11:00:00")))
    } finally q.stop()
  }

  test("streaming windowedCount equals batch tumblingCount on the same data") {
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      TsEvent(ts("2020-01-01 10:05:00"), 1, "a"),
      TsEvent(ts("2020-01-01 10:15:00"), 2, "a"),
      TsEvent(ts("2020-01-01 11:05:00"), 3, "b"),
      TsEvent(ts("2020-01-01 12:01:00"), 4, "b"))
    val input = MemoryStream[TsEvent]
    val q = EventTimeStreams
      .windowedCount(input.toDF(), "ts", "0 seconds", "1 hour", keys = Seq(col("kind")))
      .writeStream.format("memory").queryName("wc_eq").outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2030-01-01 00:00:00"), 9, "z"))) // advance watermark
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2030-01-01 00:00:01"), 9, "z")))
      q.processAllAvailable()
      val streamed = spark.table("wc_eq")
        .filter(col("kind") =!= "z")
        .select("window_start", "kind", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = WindowAggs
        .tumblingCount(rows.toDF(), col("ts"), "1 hour", Seq(col("kind")))
        .select("window_start", "kind", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowedExactDistinct dedups within window across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val q = EventTimeStreams
      .windowedExactDistinct(input.toDF(), "ts", "0 seconds", "1 hour", "user")
      .writeStream.format("memory").queryName("uv1").outputMode("append").start()
    try {
      input.addData(Seq(
        TsEvent(ts("2020-01-01 10:05:00"), 1, "v"),
        TsEvent(ts("2020-01-01 10:20:00"), 2, "v")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 10:40:00"), 1, "v"))) // dup user in window
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 12:00:00"), 9, "v")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 12:00:01"), 9, "v")))
      q.processAllAvailable()
      val got = spark.table("uv1").select("window_start", "uv")
        .as[(Timestamp, Long)].collect().toMap
      assert(got(ts("2020-01-01 10:00:00")) == 2L)
    } finally q.stop()
  }

  test("out-of-order rows inside the watermark delay are counted (W2 semantics)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val q = EventTimeStreams
      .windowedCount(input.toDF(), "ts", "2 seconds", "1 minute")
      .writeStream.format("memory").queryName("wc_ooo").outputMode("append").start()
    try {
      input.addData(Seq(TsEvent(ts("2020-01-01 10:00:30"), 1, "v")))
      q.processAllAvailable()
      // 2s out of order, still ahead of watermark (10:00:28): counted
      input.addData(Seq(TsEvent(ts("2020-01-01 10:00:29"), 2, "v")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 10:05:00"), 3, "v")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 10:06:00"), 4, "v")))
      q.processAllAvailable()
      val got = spark.table("wc_ooo").select("window_start", "cnt")
        .as[(Timestamp, Long)].collect().toMap
      assert(got(ts("2020-01-01 10:00:00")) == 2L)
    } finally q.stop()
  }

  test("streaming top-N via foreachBatch ranks each finalized window") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val counts = EventTimeStreams
      .windowedCount(input.toDF(), "ts", "0 seconds", "1 hour", keys = Seq(col("user")))
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, Long, Long)]
    val batcher = EventTimeStreams.topNPerWindowBatcher(
      Seq("window_start"), Seq(col("cnt").desc, col("user").asc), 1) { ranked =>
      sunk ++= ranked.select("window_start", "user", "rank")
        .as[(Timestamp, Long, Long)].collect()
    }
    val q = counts.writeStream.outputMode("append").foreachBatch(batcher).start()
    try {
      input.addData(Seq(
        TsEvent(ts("2020-01-01 10:00:00"), 7, "a"),
        TsEvent(ts("2020-01-01 10:30:00"), 7, "a"),
        TsEvent(ts("2020-01-01 10:40:00"), 8, "a")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 12:00:00"), 9, "a")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 13:00:00"), 9, "a")))
      q.processAllAvailable()
      // the finalized 10:00 window ranks user 7 (2 events) first
      assert(sunk.toSeq.contains((ts("2020-01-01 10:00:00"), 7L, 1L)))
      assert(!sunk.toSeq.exists(r => r._1 == ts("2020-01-01 10:00:00") && r._3 > 1L))
    } finally q.stop()
  }

  test("update mode re-emits revised window counts for allowed-late rows (W6/T2 mapping)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val q = EventTimeStreams
      .windowedCount(input.toDF(), "ts", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("wc_upd").outputMode("update").start()
    try {
      input.addData(Seq(TsEvent(ts("2020-01-01 10:05:00"), 1, "v")))
      q.processAllAvailable()
      // late row still inside the 10-min delay: window count is REVISED
      input.addData(Seq(TsEvent(ts("2020-01-01 10:01:00"), 2, "v")))
      q.processAllAvailable()
      val emissions = spark.table("wc_upd")
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toSeq
      // update mode emitted the window twice: cnt=1 then revised cnt=2 —
      // Flink's allowed-lateness re-fire, last-write-wins at the sink
      assert(emissions.sorted == Seq(
        (ts("2020-01-01 10:00:00"), 1L), (ts("2020-01-01 10:00:00"), 2L)))
    } finally q.stop()
  }

  test("streamingExactDedup drops duplicate fingerprints within the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val out = EventTimeStreams.streamingExactDedup(
      input.toDF(), "ts", "10 minutes", col("kind"))
    val q = out.writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(Seq(
        TsEvent(ts("2020-01-01 10:00:00"), 1, "docA"),
        TsEvent(ts("2020-01-01 10:00:10"), 2, "docA"), // dup content
        TsEvent(ts("2020-01-01 10:00:20"), 3, "docB")))
      q.processAllAvailable()
      input.addData(Seq(TsEvent(ts("2020-01-01 10:01:00"), 4, "docA"))) // still in horizon
      q.processAllAvailable()
      val got = spark.table("sdedup").select("user").as[Long].collect().toSet
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }

  test("side-output split separates tags") {
    val df = Seq(("k1", "pass"), ("k2", "warn"), ("k3", "pass")).toDF("key", "tag")
    val parts = SideOutputs.split(df, Seq("pass", "warn"))
    assert(parts("pass").count() == 2 && parts("warn").count() == 1)
  }

  test("synthetic behavior stream yields deterministic schema") {
    val df = Sources.syntheticBehaviorStream(spark, 10)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("user_id", "behavior", "channel", "ts"))
  }
}
