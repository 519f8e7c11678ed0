package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard config.
  *
  * Local-mode defaults sized for the test harness (local[32], 32 shuffle
  * partitions); on a real cluster the same code runs unchanged — AQE
  * coalesces/splits shuffle partitions at runtime, so the static
  * `spark.sql.shuffle.partitions` is only a starting hint.
  */
object GraftSession {

  /** @param rocksdbStateStore use RocksDB-backed streaming state
    *   (spills to local disk; the right provider once keyed state exceeds
    *   executor heap — SURVEY §4). Default stays the in-memory HDFS-backed
    *   provider, which is faster for small state.
    */
  def builder(
      master: String = "local[32]",
      rocksdbStateStore: Boolean = false): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(GraftExtensions) // SQL names for the native expressions
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // reliable checkpoint() files (the CC loop writes one per round) are
      // deleted once their RDD is GC'd instead of accumulating forever
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    if (rocksdbStateStore)
      b.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else b
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
