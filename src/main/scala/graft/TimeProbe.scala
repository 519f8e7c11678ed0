package graft
import org.apache.spark.sql.SparkSession

/** Per-query phase timing probe (round-14 optimization round): splits a
  * declared query's wall-clock into (a) DataFrame construction (builder
  * code incl. any fitted-artifact work), (b) planning to executedPlan,
  * (c) execution through the noop sink — so plan-size cost (guide §7.3,
  * driver-side single-threaded work) is attributable instead of folded
  * into "execution". Usage: runMain graft.TimeProbe <sfDir> <q1,q2,...> [reps]
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + physical
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[probe] rep=$r $n%-36s build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f total=${(t3 - t0) / 1e9}%6.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
