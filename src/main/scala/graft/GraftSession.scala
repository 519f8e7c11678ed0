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
  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
