package graft
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SCRATCH_SF", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val t = graft.io.Tables(spark, dir)
    time("events_scan")(t.events.count())
    time("reconcile_1")(SparkEntry.queries("q_reconcile")(spark, dir).count())
    time("reconcile_2")(SparkEntry.queries("q_reconcile")(spark, dir).count())
    if (args.contains("explain")) {
      SparkEntry.queries("q_reconcile")(spark, dir).explain("formatted")
      SparkEntry.queries("q5_region_revenue")(spark, dir).explain("formatted")
      SparkEntry.queries("q_hot_items")(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
