package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (TESTDATA.md): one parquet file per table under a scale-factor dir.
  *
  * All reads go through `spark.read.parquet`, so Catalyst predicate
  * pushdown / column pruning apply to every downstream query — at 100 TB
  * the same call reads a partitioned parquet lake; nothing here assumes
  * single-file layout.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** The `ts` column's physical parquet type has changed across testdata
    * regenerations (TIMESTAMP(NANOS) ↔ TIMESTAMP(MICROS)), so the loader
    * adapts to whatever is on disk instead of hardcoding one layout:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so we set
    *    `spark.sql.legacy.parquet.nanosAsLong` (surfaces the raw int64
    *    nanos as LongType) and truncate to µs — exactly what DuckDB's
    *    reader does, so oracle timestamps stay bit-identical.
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false: Spark infers
    *    TIMESTAMP_NTZ; cast to TIMESTAMP. The session timezone is pinned
    *    to UTC everywhere (Verify/Bench/specs), so the cast preserves the
    *    stored µs value bit-for-bit and matches DuckDB's reading.
    *  - TIMESTAMP (µs, UTC-adjusted): pass through.
    *
    * NOTE: the nanosAsLong conf is set SESSION-WIDE up front (it only
    * affects nano-typed columns, so it is a no-op for micros files). It
    * cannot be save/restored around the call: the returned frame is lazy
    * and the conf is read again at execution time. There is no per-read
    * option for this legacy flag in Spark 4.1.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType)) // TIMESTAMP_NTZ
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Register every table as a temp view so the engine's full surface is
    * reachable from plain `spark.sql(...)` — the DataFrame ops and SQL
    * compile to the same plans.
    */
  def registerAll(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(n => t(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
    documents.createOrReplaceTempView("documents")
    embeddings.createOrReplaceTempView("embeddings")
  }
}
