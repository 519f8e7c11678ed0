import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.{Replay, StateMachines}

object BatchProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props.getOrElseUpdate("graft.replay.tmpdir", "/dev/shm")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"batch=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val input = graft.io.Tables(spark, sfDir).events
      .filter(col("event_type") === "click")
      .select(
        lpad(col("user_id").cast("string"), 12, "0").as("key"),
        col("ts"), col("event_type").as("kind"), col("event_id").cast("string").as("id"))
    val t0 = System.nanoTime()
    val n = Replay.keyedEvents(input) { stream =>
      StateMachines.windowTopN(stream, 3600000000L, 300000000L, 5).toDF()
    }.count()
    println(f"total=${(System.nanoTime()-t0)/1e9}%.1f out=$n")
    spark.stop()
  }
}
