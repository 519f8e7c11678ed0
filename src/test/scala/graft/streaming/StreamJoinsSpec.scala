package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class PayEv(txId: String, pid: String, pts: Timestamp)
case class RcptEv(rxId: String, rid: String, rts: Timestamp)

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream intervalJoin pairs rows inside [-3s,+5s] on txId") {
    implicit val ctx = spark.sqlContext
    val pays = MemoryStream[PayEv]
    val rcpts = MemoryStream[RcptEv]
    val joined = StreamJoins.intervalJoin(
      pays.toDF(), rcpts.toDF(),
      ("pts", "2 seconds"), ("rts", "2 seconds"),
      col("txId") === col("rxId"), -3L, 5L)
    val q = joined.writeStream.format("memory").queryName("sj1").outputMode("append").start()
    try {
      pays.addData(Seq(
        PayEv("tx1", "p1", ts("2020-01-01 00:00:10")),
        PayEv("tx2", "p2", ts("2020-01-01 00:00:10"))))
      rcpts.addData(Seq(
        RcptEv("tx1", "r1", ts("2020-01-01 00:00:12")), // +2s: inside
        RcptEv("tx2", "r2", ts("2020-01-01 00:00:20")))) // +10s: outside
      q.processAllAvailable()
      val got = spark.table("sj1").select("pid", "rid").as[(String, String)].collect()
      assert(got.toSeq == Seq(("p1", "r1")))
    } finally q.stop()
  }

  test("equivalence: streaming intervalJoin rows == batch intervalJoin") {
    implicit val ctx = spark.sqlContext
    val pays = MemoryStream[PayEv]
    val rcpts = MemoryStream[RcptEv]
    val joined = StreamJoins.intervalJoin(
      pays.toDF(), rcpts.toDF(),
      ("pts", "0 seconds"), ("rts", "0 seconds"),
      col("txId") === col("rxId"), -3L, 5L)
    val q = joined.writeStream.format("memory").queryName("sj_eq").outputMode("append").start()
    val payRows = Seq(
      PayEv("a", "p1", ts("2020-01-01 00:00:00")),
      PayEv("b", "p2", ts("2020-01-01 00:00:05")))
    val rcptRows = Seq(
      RcptEv("a", "r1", ts("2020-01-01 00:00:03")),
      RcptEv("a", "r2", ts("2020-01-01 00:00:06")), // outside +5
      RcptEv("b", "r3", ts("2020-01-01 00:00:02"))) // -3s side
    try {
      pays.addData(payRows); rcpts.addData(rcptRows)
      q.processAllAvailable()
      val streamed = spark.table("sj_eq").select("pid", "rid")
        .as[(String, String)].collect().toSet
      val batch = graft.ops.Joins
        .intervalJoin(payRows.toDF(), rcptRows.toDF(),
          col("txId"), col("rxId"), col("pts"), col("rts"), -3L, 5L)
        .select("pid", "rid").as[(String, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(("p1", "r1"), ("p2", "r3")))
    } finally q.stop()
  }
}
