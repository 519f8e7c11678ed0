package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pipeline-level specs: the reference apps as one-call compositions, plus
  * a file-stream equivalence run (SURVEY §5.4) — the same windowed count
  * over the same rows must agree between a batch read and a streaming
  * parquet-file replay.
  */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def behaviors = Seq(
    (1L, 100L, "pv", "2020-01-01 10:05:00"),
    (2L, 100L, "pv", "2020-01-01 10:10:00"),
    (3L, 200L, "pv", "2020-01-01 10:15:00"),
    (1L, 100L, "buy", "2020-01-01 10:20:00"),
    (1L, 100L, "pv", "2020-01-01 11:05:00"))
    .toDF("user_id", "item_id", "behavior", "ts")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("hotItems pipeline: pv filter, sliding count, rank") {
    val got = Pipelines.hotItems(behaviors, n = 1, size = "1 hour", slide = "30 minutes")
      .filter(col("rank") === 1 && col("window_start") === lit("2020-01-01 10:00:00").cast("timestamp"))
      .select("item_id", "cnt").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((100L, 2L))) // item 100 beats 200; buy row ignored
  }

  test("pageViews + uniqueVisitors pipelines agree with hand counts") {
    val pv = Pipelines.pageViews(behaviors)
      .select("window_start", "cnt").as[(Timestamp, Long)].collect().toMap
    assert(pv(Timestamp.valueOf("2020-01-01 10:00:00")) == 3L)
    assert(pv(Timestamp.valueOf("2020-01-01 11:00:00")) == 1L)
    val uv = Pipelines.uniqueVisitors(behaviors)
      .select("window_start", "uv").as[(Timestamp, Long)].collect().toMap
    assert(uv(Timestamp.valueOf("2020-01-01 10:00:00")) == 3L)
  }

  test("channelStats drops UNINSTALL and counts (channel,behavior)") {
    val df = Seq(
      ("wechat", "CLICK", "2020-01-01 10:00:01"),
      ("wechat", "CLICK", "2020-01-01 10:00:02"),
      ("wechat", "UNINSTALL", "2020-01-01 10:00:03"))
      .toDF("channel", "behavior", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Pipelines.channelStats(df, size = "1 hour", slide = "1 hour")
      .select("channel", "behavior", "cnt").as[(String, String, Long)].collect().toSet
    assert(got == Set(("wechat", "CLICK", 2L)))
  }

  test("hotUrls pipeline: raw apache log lines to ranked urls") {
    val lines = Seq(
      "1.1.1.1 u1 - 17/05/2015:10:00:01 +0000 GET /a",
      "1.1.1.2 u2 - 17/05/2015:10:00:02 +0000 GET /a",
      "1.1.1.3 u3 - 17/05/2015:10:00:03 +0000 GET /b",
      "1.1.1.4 u4 - 17/05/2015:10:00:04 +0000 POST /a") // POST filtered out
      .toDF("value")
    val parsed = graft.io.LogParse.apacheLog(lines, col("value"))
    val got = Pipelines.hotUrls(parsed, n = 1, size = "10 minutes", slide = "10 minutes")
      .select("url", "cnt").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("/a", 2L)))
  }

  test("file-stream replay of events equals batch windowed count (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.io.Tables(spark, dir).events
      .filter(col("event_type") === "view").select("ts")
    val batch = graft.ops.WindowAggs.tumblingCount(batchEvents, col("ts"), "1 hour")
      .select("window_start", "cnt").as[(Timestamp, Long)].collect().toSet

    // replay the same rows through a streaming parquet source; complete
    // mode so the final table is comparable without watermark finalization
    val tmp = Files.createTempDirectory("graft-replay").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(tmp)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("window_start", col("window.start"))
      .drop("window")
    val q = stream.writeStream.format("memory").queryName("replay_eq")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay_eq")
        .select("window_start", "cnt").as[(Timestamp, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
