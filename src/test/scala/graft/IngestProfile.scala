import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.Replay

object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props.getOrElseUpdate("graft.replay.tmpdir", "/dev/shm")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.map(s => s"${s.operatorName}:commit=${s.allUpdatesTimeMs}/${s.commitTimeMs}").mkString(" ")
        println(s"batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs} state[$st]")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      args.drop(1).headOption.forall(_ == "clog"))
    val docs = graft.io.Tables(spark, sfDir).documents
    val prep = Replay.prepareDocs(
      docs.select(lit("").as("key"), timestamp_seconds(col("doc_id")).as("ts"),
        col("doc_id").cast("string").as("id"), col("text")), nChunks = 4)
    val t0 = System.nanoTime()
    val n = prep.replay(s => graft.streaming.StreamingDedup.ingestGate(s.toDF(), sigPartitions = 32).toDF()).count()
    println(f"total=${(System.nanoTime()-t0)/1e9}%.1f out=$n")
    prep.close(); spark.stop()
  }
}
