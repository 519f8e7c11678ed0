package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Joins, Sequences}

/** End-to-end runs over the REFERENCE'S OWN curated inputs
  * (the CSVs under `/root/reference/input/`, copied to test resources per
  * FIXTURES.md): our operators must reproduce the scenarios those files
  * were hand-built to exercise. Expected values pinned from an independent
  * Python replay of each app's intended semantics (SURVEY §5 documents
  * where intended deviates from the reference's bugs).
  */
class ReferenceFixturesSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/reference-input/$name").getPath

  private def csv(name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).csv(res(name))

  private lazy val logins = csv(
    "LoginLog.csv",
    StructType(Seq(
      StructField("userId", LongType),
      StructField("ip", StringType),
      StructField("eventType", StringType),
      StructField("t", LongType))))
    .withColumn("ts", timestamp_seconds(col("t")))

  private lazy val orders = csv(
    "OrderLog.csv",
    StructType(Seq(
      StructField("orderId", LongType),
      StructField("eventType", StringType),
      StructField("txId", StringType),
      StructField("t", LongType))))
    .withColumn("ts", timestamp_seconds(col("t")))

  private lazy val receipts = csv(
    "ReceiptLog.csv",
    StructType(Seq(
      StructField("txId", StringType),
      StructField("payChannel", StringType),
      StructField("t", LongType))))
    .withColumn("ts", timestamp_seconds(col("t")))

  private lazy val adClicks = csv(
    "AdClickLog.csv",
    StructType(Seq(
      StructField("userId", LongType),
      StructField("adId", LongType),
      StructField("province", StringType),
      StructField("city", StringType),
      StructField("t", LongType))))
    .withColumn("ts", timestamp_seconds(col("t")))

  test("LoginLog: the planted consecutive-fail burst is user 1035, twice") {
    // LoginFailWithState2 semantics (2 fails <=2s apart) on the reference's
    // own 48-row input: user 1035's 3-fail burst fires two sliding warnings
    val got = Sequences
      .consecutiveMatches(
        logins, col("userId"), col("ts"), col("ip"),
        col("eventType") === "fail", n = 2, maxGapSec = 2L)
      .as[(String, Timestamp, Timestamp)].collect().toSeq.sorted
    assert(got.map(_._1).distinct == Seq("1035"))
    assert(got.map(r => (r._2.getTime / 1000, r._3.getTime / 1000)) ==
      Seq((1558430842L, 1558430843L), (1558430843L, 1558430844L)))
  }

  test("OrderLog: 39 creates -> 36 paid in 15 min, 3 order timeouts") {
    val reqs = orders.filter(col("eventType") === "create")
      .select(col("orderId").cast("string").as("key"), col("txId").as("id"), col("ts"))
    val resps = orders.filter(col("eventType") === "pay")
      .select(col("orderId").cast("string").as("key"), col("ts"))
    val got = Sequences.matchWithTimeout(reqs, resps, timeoutSec = 900L)
    assert(got.count() == 39)
    val byStatus = got.groupBy("status").count().as[(String, Long)].collect().toMap
    assert(byStatus == Map("matched" -> 36L, "timeout" -> 3L))
  }

  test("OrderLog pay x ReceiptLog: interval join [-3s,+5s] on txId -> 4 pairs") {
    val pays = orders.filter(col("eventType") === "pay" && col("txId").isNotNull)
      .select(col("txId").as("p_tx"), col("ts").as("p_ts"))
    val rcpt = receipts.select(col("txId").as("r_tx"), col("ts").as("r_ts"))
    val got = Joins.intervalJoin(
      pays, rcpt, col("p_tx"), col("r_tx"), col("p_ts"), col("r_ts"), -3L, 5L)
    assert(got.count() == 4)
  }

  test("OrderLog pay x ReceiptLog: reconciliation finds 38 matched, 2+2 unmatched") {
    // PayReceiptWithConnectApp matches purely by txId (its timers only bound
    // real-time wait): a wide tolerance reproduces that — the planted
    // unmatched rows are 2 pays and 2 receipts
    val pays = orders.filter(col("eventType") === "pay" && col("txId").isNotNull)
      .select(col("txId").as("p_tx"), col("ts").as("p_ts"))
    val rcpt = receipts.select(col("txId").as("r_tx"), col("ts").as("r_ts"))
    val got = Joins
      .reconcile(pays, rcpt, col("p_tx"), col("r_tx"), col("p_ts"), col("r_ts"),
        toleranceSec = 86400L, "matched", "pay_no_receipt", "receipt_no_pay")
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(got == Map("matched" -> 38L, "pay_no_receipt" -> 2L, "receipt_no_pay" -> 2L))
  }

  test("AdClickLog: blacklist at the reference's 100/day threshold trips (937166,1715)") {
    val got = Sequences
      .dailyThreshold(
        adClicks, concat_ws("|", col("userId"), col("adId")), col("ts"),
        lit(true), minCount = 100L)
      .select("key", "cnt").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("937166|1715", 121L)))
  }

  test("AdClickLog: full adClickAnalytics pipeline — warn once, suppress, count the rest") {
    import graft.streaming.{KeyedEvent, Pipelines}
    // batch execution of the streaming pipeline (flatMapGroupsWithState
    // runs per-group in batch): key=(user|ad), id carries the province
    val events = adClicks.select(
      concat_ws("|", col("userId"), col("adId")).as("key"),
      col("ts"),
      lit("click").as("kind"),
      col("province").as("id")).as[KeyedEvent]
    val (counts, warnings) = Pipelines.adClickAnalytics(
      events, threshold = 100L, size = "1 hour", slide = "1 hour")
    val warns = warnings.select("key").as[String].collect()
    assert(warns.toSeq == Seq("937166|1715"))
    // 143 clicks total; the tripped pair contributes its 99 pre-threshold
    // passes, the 100th becomes the warning, 21 are suppressed
    assert(counts.agg(sum("cnt")).as[Long].head() == 121L)
  }

  test("AdClickLog: province counts match hand-tally") {
    val got = adClicks.groupBy("province").count().as[(String, Long)].collect().toMap
    assert(got == Map(
      "beijing" -> 123L, "guangdong" -> 5L, "shanghai" -> 2L, "jiangsu" -> 4L,
      "zhejiang" -> 5L, "henan" -> 3L, "hebei" -> 1L))
  }
}
