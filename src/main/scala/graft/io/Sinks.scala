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

  /** External serving-store contract (reference S7 serving role:
    * `UniqueVisitorApp2.java:107,128-134` writes the UV counters to Redis
    * for dashboards to read — distinct from the STATE role, which the
    * state store + HLL/bloom already carry). Implementations wrap a real
    * client (Redis, Cassandra, an RDBMS); `putAll` runs ON EXECUTORS once
    * per partition (open the connection there, never serialize one), the
    * batch ledger lives IN the store next to the data so idempotency
    * survives anything the Spark side loses.
    */
  trait KvStore extends Serializable {

    /** Upsert all entries; called once per partition, executor-side.
      * Must be retry-safe: the same (key, value) may be written again if
      * a micro-batch is retried before its commit marker landed. */
    def putAll(entries: Iterator[(String, String)]): Unit

    /** Highest micro-batch id already fully applied for `sinkId`, or -1. */
    def committedBatch(sinkId: String): Long

    /** Record `batchId` as fully applied for `sinkId` (driver-side, after
      * every partition's putAll returned). */
    def commitBatch(sinkId: String, batchId: Long): Unit
  }

  /** The idempotent `foreachBatch` upsert body — the serving-store sink's
    * whole exactly-once discipline, factored out so specs can drive it
    * with a forced redelivery:
    *
    *   1. a REPLAYED batch (id ≤ the store's committed ledger) is skipped
    *      whole — restarts re-offer the last uncommitted micro-batch, and
    *      this check makes the re-offer a no-op once committed;
    *   2. rows upsert per partition on the executors (deterministic
    *      values, so a retry that died before its commit marker
    *      re-applies and CONVERGES — at-least-once writes + idempotent
    *      upserts + the ledger = exactly-once observable state);
    *   3. the ledger advances only after the full batch landed.
    *
    * Rows are (key = `keyCol` as string, value = JSON of the rest) — the
    * same wire contract as [[kafkaPayload]].
    */
  def kvUpsertBatch(store: KvStore, sinkId: String, keyCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batchId > store.committedBatch(sinkId)) {
      kafkaPayload(batch, keyCol).foreachPartition { rows: Iterator[Row] =>
        store.putAll(rows.map(r => (r.getString(0), r.getString(1))))
      }
      store.commitBatch(sinkId, batchId)
    }
  }

  /** Streaming: idempotent key-value upsert into an external serving
    * store via [[kvUpsertBatch]]. Use for counters a dashboard reads
    * (UV per day, hot items) — the reference's Redis serving writes.
    * Returns the un-started writer so callers can override options
    * before `.start()`.
    */
  def streamingKvUpsert(
      df: DataFrame,
      store: KvStore,
      sinkId: String,
      keyCol: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch(kvUpsertBatch(store, sinkId, keyCol) _)
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
