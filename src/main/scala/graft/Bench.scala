package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with steady-state per-query seconds.
  *
  * Protocol (unchanged since round 1, disclosed in the JSON): a full
  * untimed warm pass first (JIT + whole-stage-codegen compilation are
  * one-time costs a long-running service never re-pays), then the timed
  * pass through the `noop` sink (forces every output column to be
  * computed — a bare count() would let Catalyst prune projection-only
  * work to a row count). `value` = steady-state total; `cold_sec` = the
  * warm pass (cold end-to-end), so both protocols are always reported.
  *
  * Reporting channel: the JSON line goes to stdout AND to the file named
  * by `SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in the cwd) —
  * sbt wraps stdout in `[info]` prefixes that broke the driver's parser
  * in round 1. `failed` counts queries that errored in either pass;
  * their per-query value is -1 and they are excluded from totals.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); true
        } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }

    // q_*_stream queries are correctness-gate replays (file-source
    // micro-batches, ~0.3 s trigger cadence each): their wall time
    // measures the replay harness's scheduling, not engine throughput, so
    // the bench covers the batch headline queries and reports the skips.
    val (streamNames, names) = SparkEntry.queries.keys.toSeq.sorted.partition(_.endsWith("_stream"))
    val tCold = System.nanoTime()
    val cold = names.map(n => n -> runOne(n)).toMap // warm pass (also sanity)
    val coldSec = (System.nanoTime() - tCold) / 1e9
    val results = names.map { n =>
      n -> (if (cold(n) < 0) -1.0 else runOne(n)) // keep failures marked
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    // a partial total must never be comparable to a complete one: any
    // failure nulls the headline value (per-query numbers stay reported)
    val value = if (failed > 0) "null" else total.toString
    val skipped = streamNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$value,"unit":"sec","queries":$qs,"sf":"$sfDir","mode":"steady-state","cold_sec":$coldSec,"failed":$failed,"skipped_stream_replays":$skipped}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    spark.stop()
  }
}
