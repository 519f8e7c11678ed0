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
  /** The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read the raw int64 nanos and truncate to µs — exactly
    * what DuckDB's reader does, so oracle timestamps stay bit-identical.
    *
    * NOTE: this sets `spark.sql.legacy.parquet.nanosAsLong` SESSION-WIDE
    * (nano-timestamp columns in any later parquet read surface as raw
    * longs instead of erroring). It cannot be save/restored around the
    * call: the returned frame is lazy and the conf is read again at
    * execution time, so restoring it would break the scan. There is no
    * per-read option for this legacy flag in Spark 4.1.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
