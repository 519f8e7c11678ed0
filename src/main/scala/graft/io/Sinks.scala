package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Output paths (reference §2.1 S5 generalized): the reference only ever
  * `print()`s; a real deployment lands results in partitioned parquet (or
  * kafka). Helpers keep the partitioning decision explicit — at 100 TB an
  * unpartitioned write is unreadable downstream.
  */
object Sinks {

  /** Batch: partitioned parquet. Partition columns should be low-
    * cardinality (date / hour buckets), never high-cardinality keys —
    * one directory per value.
    */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed managed table: pre-hash the data into `nBuckets` files per
    * partition on the join/agg key. Two tables bucketed the same way
    * sort-merge join with ZERO exchanges — the co-located-join layout for
    * fact tables that join repeatedly on the same key at 100 TB (pay the
    * shuffle once at write time, never at read time).
    */
  def bucketedTable(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Z-order-clustered parquet: interleave two bucketized dimension
    * columns into a Morton key ([[org.apache.spark.sql.graft.ZOrder2]]),
    * range-partition + sort by it, write. Each output file then spans a
    * bounded range of BOTH dimensions, so parquet min/max row-group stats
    * prune scans filtered on EITHER column — a lexicographic sort only
    * skips on its leading column. This is the layout step a 100 TB fact
    * table pays once at write time; `nFiles` ≈ total size / target file
    * size. The Morton key is dropped before writing (derivable, and
    * files stay schema-identical with unclustered writes).
    */
  def zorderedParquet(
      df: DataFrame, x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      path: String, nFiles: Int): Unit =
    df.withColumn("__z", org.apache.spark.sql.graft.ZOrderFunctions.zorder2(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Kafka's record contract for an arbitrary frame: key = `keyCol` as
    * string, value = JSON of every other column. Split out from
    * [[streamingKafka]] so the serialization is spec-testable batch-side
    * (no broker ships in the test env, mirroring the reference, whose
    * kafka connector is a declared dependency never instantiated —
    * `pom.xml:44-47`).
    */
  def kafkaPayload(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.filterNot(_ == keyCol).map(col): _*)).as("value"))

  /** Streaming: kafka sink builder over [[kafkaPayload]]'s contract.
    * Delivery is AT-LEAST-ONCE: Spark's kafka sink does not use Kafka
    * transactions, so a retried micro-batch can re-publish records —
    * dedupe downstream (or key records so consumers can). Returns the
    * un-started writer so callers can override options before `.start()`.
    */
  def streamingKafka(
      df: DataFrame,
      bootstrap: String,
      topic: String,
      keyCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    kafkaPayload(df, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)

  /** Streaming: append-mode partitioned parquet with a processing-time
    * trigger; exactly-once via the checkpoint. Returns the un-started
    * writer so callers can override options before `.start()`.
    */
  def streamingParquet(
      df: DataFrame,
      path: String,
      checkpoint: String,
      partitionCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[Row] = {
    val w = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }
}
