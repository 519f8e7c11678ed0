package graft

import org.apache.spark.sql.SparkSession

/** Reproducible harness behind docs/SCALE.md: time declared queries warm
  * (one untimed pass, then one timed pass through the noop sink — the
  * Bench steady-state shape without the full-suite sweep) on any table
  * directory, typically the driver's sf0.1 next to a 10×-replicated copy.
  *
  * Usage: runMain graft.ScaleProbe <q1,q2,...> <dir1> [dir2 ...]
  *
  * The 10× corpus itself is built driver-side (DuckDB/pyarrow: replicate
  * each table 10× with remapped ids, preserving events' TIMESTAMP(NANOS)
  * physical type) — see docs/SCALE.md "Method".
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs; n <- names) {
      def pass(): Double = {
        val t0 = System.nanoTime
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime - t0) / 1e9
        // round-9 lesson: without this, a query's internal persist()
        // survives into the timed pass (plan-identical → cache hit) and
        // the probe silently reports a cached number — the portable
        // minhash cut measured 2.6 s here vs 10 s in the honest bench
        spark.catalog.clearCache()
        sec
      }
      pass() // warm: plan + shuffle files + JIT (caches cleared)
      println(f"SCALE $n%-24s $d%-24s ${pass()}%.2f s")
    }
    spark.stop()
  }
}
