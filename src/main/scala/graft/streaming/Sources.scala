package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink builders for the streaming layer (reference §2.1 S1–S7).
  *
  * Every builder returns an un-started DataFrame so callers compose
  * transforms then pick a sink; schemas are explicit (streaming reads
  * never infer).
  */
object Sources {

  /** S1: file stream — the streaming form of `env.readTextFile`. Reads
    * files appearing under `dir` as micro-batches; with `maxFilesPerTrigger`
    * for replay-style tests.
    */
  def csvStream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      header: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema).option("header", header.toString)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.csv(dir)
  }

  /** S2: socket source (`env.socketTextStream("hadoop102", 9999)` in the
    * reference's test drafts) — dev/debug only, not fault-tolerant.
    */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket").option("host", host).option("port", port).load()

  /** S3: Kafka source — declared-but-unused in the reference
    * (`pom.xml:44-47`); here it is the primary production stream. `value`
    * arrives as binary; callers parse (csv/json) with the table schema.
    */
  def kafkaStream(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Parse a kafka-shaped frame's binary `value` as CSV into `schema`'s
    * columns (the reference's manual `split(",")` bean parsing, P1, done by
    * `from_csv`). Malformed rows yield null columns, not job failures.
    */
  def parseCsvValue(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_csv(col("value").cast("string"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))

  /** S4: deterministic synthetic behavior stream — the reference's
    * `MarketBehaviorSource` (`gmall-market/.../source/MarketBehaviorSource
    * .java:16-46`: random user/behavior/channel every 100 ms) on the rate
    * source, minus its throttling sleep. splitmix-style hashes of the rate
    * `value` make the stream reproducible run-to-run (same rows for the
    * same value range), which the reference's `new Random()` was not.
    */
  def syntheticBehaviorStream(spark: SparkSession, rowsPerSecond: Long): DataFrame = {
    val behaviors = array(Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL").map(lit): _*)
    val channels = array(Seq("wechat", "weibo", "appstore", "huawei").map(lit): _*)
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        pmod(xxhash64(col("value")), lit(1000000L)).as("user_id"),
        element_at(behaviors, (pmod(xxhash64(col("value"), lit(1)), lit(4)) + 1).cast("int"))
          .as("behavior"),
        element_at(channels, (pmod(xxhash64(col("value"), lit(2)), lit(4)) + 1).cast("int"))
          .as("channel"),
        col("timestamp").as("ts"))
  }
}

/** S5/S6: sinks and the side-output splitter. */
object SideOutputs {

  /** S6: split a tagged-union stream (see [[TaggedRow]]) into per-tag
    * frames — Flink's `getSideOutput` equivalent. Batch/foreachBatch use;
    * for fully independent streaming sinks run one query per tag (each
    * filter prunes at the source).
    */
  def split(df: DataFrame, tags: Seq[String], tagCol: String = "tag"): Map[String, DataFrame] =
    tags.map(t => t -> df.filter(col(tagCol) === t)).toMap
}
