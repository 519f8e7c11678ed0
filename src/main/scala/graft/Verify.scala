package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (debug a single query)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), not coalesce(1): coalesce folds the whole final
      // stage into one task; repartition keeps upstream parallel and only
      // the (tiny) verified output crosses a single-partition exchange
      Files.deleteIfExists(Paths.get(s"$outDir/$name.error")) // no stale tombstones
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Round-7 lesson: a silent stderr line made 45 failed queries
        // vanish from the driver's record entirely. Leave a tombstone so
        // every declared query produces a trace — an `err` row, never an
        // omission.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
        catch { case _: Throwable => () }
      }
      // centralized cache lifecycle: free any persist() a query made so
      // the 185-query dump holds storage flat (see Bench.runOne)
      spark.catalog.clearCache()
    }
    // Summary manifest: declared vs succeeded vs failed, so the record's
    // completeness is auditable without diffing directory listings.
    val declared = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val failedNames = declared.filter(n => Files.exists(Paths.get(s"$outDir/$n.error")))
    System.err.println(
      s"[verify] declared=${declared.size} ok=${declared.size - failedNames.size} " +
      s"failed=${failedNames.size}${if (failedNames.nonEmpty) " " + failedNames.mkString(",") else ""}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
