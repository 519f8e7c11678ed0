import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Replay

/** Scratch docs/s probe for the ingest admission pipeline (r13 ask #6). */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props.getOrElseUpdate("graft.replay.tmpdir", "/dev/shm")
    val docs = graft.io.Tables(spark, sfDir).documents
    val n = docs.count()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val prep = Replay.prepareDocs(
      docs.select(lit("").as("key"), timestamp_seconds(col("doc_id")).as("ts"),
        col("doc_id").cast("string").as("id"), col("text")), nChunks = 4)
    def run(label: String, parts: Int, sigParts: Int, changelog: Boolean = false): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", changelog)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        prep.replay(s => graft.streaming.StreamingDedup.ingestGate(s.toDF(), sigPartitions = sigParts).toDF()).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-16s best=${ts.min}%.2f docs/s=${(n / ts.min).toLong} passes=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    run("p4_sig32", 4, 32)
    run("p4_sig32_clog", 4, 32, changelog = true)
    run("p8_sig32_clog", 8, 32, changelog = true)
    prep.close()
    spark.stop()
  }
}
