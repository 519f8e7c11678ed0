import org.apache.spark.sql.SparkSession

/** Scratch back-to-back recheck of the r12→r13 drift suspects (r13 verdict
  * ask #4): q_rollup_revenue (1.26→2.07 s) and d_substring_dedup
  * (1.70→2.70 s). Runs each query N times interleaved under the bench's
  * session config and prints min/median, so a quiet-host ratio vs the r12
  * record (or a plan-level cause) can go on the round-14 record.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("q_rollup_revenue", "d_substring_dedup", "d_chunk_dedup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      sec
    }
    names.foreach(runOne) // warm pass
    val passes = (1 to 5).map(_ => names.map(n => n -> runOne(n)).toMap)
    names.foreach { n =>
      val vs = passes.map(_(n)).sorted
      println(f"$n%-20s min=${vs.min}%.2f med=${vs(vs.size / 2)}%.2f all=${vs.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
