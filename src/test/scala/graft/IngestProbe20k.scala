import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Replay

/** Scratch probe: ingest admission throughput with the per-query fixed
  * costs (stream start, two sentinel batches, first-batch planning)
  * amortized over a 4×-salted corpus — the steady-state number a larger
  * deployment sees. Salting the doc ids (and prefixing the text so no
  * synthetic exact-dups collapse at the fingerprint stage) keeps every
  * doc on the expensive path.
  */
object IngestProbe20k {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props.getOrElseUpdate("graft.replay.tmpdir", "/dev/shm")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", true)
    val docs0 = graft.io.Tables(spark, sfDir).documents
    val copies = spark.range(4).select(col("id").as("copy"))
    val docs = docs0.crossJoin(copies).select(
      (col("doc_id") * 4 + col("copy")).as("doc_id"),
      concat(lit("v"), col("copy"), lit(" "), col("text")).as("text"))
    val n = docs.count()
    val prep = Replay.prepareDocs(
      docs.select(lit("").as("key"), timestamp_seconds(col("doc_id")).as("ts"),
        col("doc_id").cast("string").as("id"), col("text")), nChunks = 4)
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      prep.replay(s => graft.streaming.StreamingDedup.ingestGate(s.toDF(), sigPartitions = 32).toDF()).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"n=$n best=${ts.min}%.2f docs/s=${(n / ts.min).toLong} passes=${ts.map(t => f"$t%.1f").mkString(",")}")
    prep.close(); spark.stop()
  }
}
