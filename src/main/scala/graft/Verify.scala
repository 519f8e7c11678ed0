package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-14 hardening — the round-13 official record came back `{}`
  * because a one-hour driver window expired mid-run on a ~4×-contended
  * host and the old Verify only became useful at the very end. Four
  * changes make a partial run a partial RECORD instead of an empty one,
  * and make the full run fit the window:
  *
  *   1. `oracle_sql.json` is written FIRST (it is static — derived from
  *      [[SparkEntry.oracleSql]], no Spark work): a run killed after k
  *      queries leaves k comparable parquet dirs + the oracle SQL, so the
  *      driver's DuckDB compare can still score everything that finished.
  *   2. Per-query verdict lines append to `progress.jsonl` as each query
  *      completes (`{"name":…,"status":"ok"|"err","sec":…}`), so
  *      wall-clock triage and partial-run accounting never depend on the
  *      final summary being reached.
  *   3. Batch queries run BEFORE the `*_stream` replays: the replays are
  *      the slow tail (49 × file-source micro-batch replay), so a timeout
  *      truncates the tail, not a random prefix. Replay scratch (chunk
  *      files + checkpoint) goes to /dev/shm when writable — the same
  *      fsync-tax fix Bench shipped in round 13 (measured ~4 ms/fsync
  *      under co-tenant I/O, 4× pass swing); scratch placement cannot
  *      change streaming semantics (checkpoint RECOVERY has its own
  *      real-disk specs in CheckpointRecoverySpec).
  *   4. Queries run `SPARK_GRAFT_VERIFY_PAR`-wide (default 4) in waves,
  *      each query on its own `spark.newSession()` (session-scoped conf +
  *      temp views, so e.g. the RocksDB-provider override a tws query
  *      sets cannot race a neighbour). `spark.catalog.clearCache()` runs
  *      at wave boundaries — between waves nothing is in flight, so the
  *      round-12 flat-storage discipline keeps holding without yanking a
  *      live query's persisted frames.
  *
  * Tiers (optional 3rd arg):
  *   - `--quick`: the reference-surface core only (`q_*`, no stream
  *     replays) — the always-landable smoke tier;
  *   - `--batch`: every non-replay query;
  *   - a comma-separated name list: debug selection (unchanged).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val (sfDir, outDir) = (args(0), args(1))
    val sel = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val par = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

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

    // (1) oracle SQL first: static content, must survive any timeout
    val oracleJson = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)

    // (3) replay scratch → tmpfs when available and not already chosen
    // by the caller (getOrElseUpdate: a user-set path is never replaced)
    val shm = Paths.get("/dev/shm")
    if (Files.isWritable(shm))
      sys.props.getOrElseUpdate("graft.replay.tmpdir", shm.toString)
    val scratch = sys.props.getOrElse("graft.replay.tmpdir", "default-tmp")

    val allQueries = SparkEntry.queries
    val selected: Set[String] = sel match {
      case None            => allQueries.keySet
      case Some("--quick") =>
        allQueries.keySet.filter(n => n.startsWith("q_") && !n.endsWith("_stream"))
      case Some("--batch") => allQueries.keySet.filterNot(_.endsWith("_stream"))
      case Some(list)      => list.split(",").toSet
    }
    // batch tier first, replay tail last: a killed run loses replays, not
    // a random prefix of the cheap batch record
    val (streamNames, batchNames) =
      selected.toSeq.sorted.partition(_.endsWith("_stream"))
    val ordered = batchNames ++ streamNames

    val progress = Paths.get(s"$outDir/progress.jsonl")
    Files.deleteIfExists(progress)
    val logLock = new Object
    def logLine(line: String): Unit = logLock.synchronized {
      Files.writeString(progress, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    logLine(s"""{"run":"start","sf":${q(sfDir)},"declared":${ordered.size},"par":$par,"replay_scratch":${q(scratch)}}""")

    // Stream replays run at a REDUCED state-partition count (default 8):
    // at gate scale every micro-batch pays a fixed per-partition state
    // store open/commit across each stateful op, and that fixed cost —
    // not row work — dominated the round-13 gate (per-batch profile:
    // 3-4 s/batch on 21-row batches at 32 partitions; the ingestGate
    // p32→p8 bench rows show the same knee). Partition count is a
    // deployment knob sized to state volume (docs/SCALE.md), results are
    // partition-count-invariant, and the oracle hash-compare is the
    // proof per query per run.
    val streamParts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")

    def runOne(name: String): Unit = {
      val sess = spark.newSession()
      sess.conf.set("spark.sql.shuffle.partitions",
        if (name.endsWith("_stream")) streamParts else cpus)
      sess.conf.set("spark.sql.session.timeZone", "UTC")
      Files.deleteIfExists(Paths.get(s"$outDir/$name.error")) // no stale tombstones
      val tq = System.nanoTime()
      // repartition(1), not coalesce(1): coalesce folds the whole final
      // stage into one task; repartition keeps upstream parallel and only
      // the (tiny) verified output crosses a single-partition exchange
      try {
        allQueries(name)(sess, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        logLine(f"""{"name":${q(name)},"status":"ok","sec":${(System.nanoTime() - tq) / 1e9}%.2f}""")
      } catch { case e: Throwable =>
        // Round-7 lesson: a silent stderr line made 45 failed queries
        // vanish from the driver's record entirely. Leave a tombstone so
        // every declared query produces a trace — an `err` row, never an
        // omission.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
        catch { case _: Throwable => () }
        logLine(f"""{"name":${q(name)},"status":"err","sec":${(System.nanoTime() - tq) / 1e9}%.2f,"error":${q(String.valueOf(e.getMessage))}}""")
      }
    }

    val pool = Executors.newFixedThreadPool(par)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try ordered.grouped(par).foreach { wave =>
      Await.result(Future.sequence(wave.map(n => Future(runOne(n)))), Duration.Inf)
      // centralized cache lifecycle: free any persist() a query made so
      // the 240-query dump holds storage flat (see Bench.runOne); safe
      // here because the wave barrier means nothing is in flight
      spark.catalog.clearCache()
    } finally pool.shutdown()

    // Summary manifest: declared vs succeeded vs failed, so the record's
    // completeness is auditable without diffing directory listings.
    val failedNames = ordered.filter(n => Files.exists(Paths.get(s"$outDir/$n.error")))
    val totalSec = (System.nanoTime() - t0) / 1e9
    System.err.println(
      s"[verify] declared=${ordered.size} ok=${ordered.size - failedNames.size} " +
      s"failed=${failedNames.size}${if (failedNames.nonEmpty) " " + failedNames.mkString(",") else ""} " +
      f"wall=$totalSec%.1fs par=$par scratch=$scratch")
    logLine(f"""{"run":"end","ok":${ordered.size - failedNames.size},"failed":${failedNames.size},"wall_sec":$totalSec%.1f}""")
    spark.stop()
  }
}
