package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The streaming MinHash-LSH index ([[StreamingDedup.lshIndex]]):
  * est-verify quality vs the at-rest exact-Jaccard op, state continuity
  * across micro-batches, and the prefix (earlier-doc) contract. The
  * oracle row (d_dedup_lsh_stream) pins the exact output; these gates pin
  * the properties the oracle can't express.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The declared d_dedup_lsh_stream pipeline over `dir`'s documents. */
  private def runStream(dir: String, nChunks: Int) = {
    val sigs = Dedup.minhashSignatures(
      graft.io.Tables(spark, dir).documents, col("doc_id"), col("text"),
      shingleLen = 3, k = 64, portableHash = true)
    def bandKey(j: Int) = concat_ws("|", lit(j),
      md5(concat_ws("|", (4 * j until 4 * j + 4).map(i => col(s"m$i").cast("string")): _*)))
    val events = sigs.select(
      col("doc_id"),
      explode(array((0 until 16).map(bandKey): _*)).as("key"),
      array((0 until 64).map(i => col(s"m$i")): _*).as("sig"))
      .select(
        col("key"),
        timestamp_seconds(col("doc_id")).as("ts"),
        col("doc_id").cast("string").as("id"),
        col("sig"))
    Replay.bandEvents(events, nChunks = nChunks) { stream =>
      StreamingDedup.lshIndex(stream, k = 64, thresholdNumer = 3, thresholdDenom = 5).toDF()
    }.collect().map(r => (r.getInt(0), r.getString(1).toLong, r.getString(2).toLong, r.getInt(3)))
  }

  test("signature-estimate verify tracks the exact-Jaccard batch op (precision/recall >= 0.9)") {
    spark.conf.set(ProviderConf, RocksDb)
    try {
      val dir = "/root/testdata/sf0.001"
      val stream = runStream(dir, nChunks = 10)
      val streamPairs = stream.map { case (_, a, b, _) => (a, b) }.toSet
      val exact = Dedup.minhashDedup(
          graft.io.Tables(spark, dir).documents, col("doc_id"), col("text"),
          shingleLen = 3, k = 64, bands = 16, threshold = 0.6, portableHash = true)
        .select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamPairs.nonEmpty && exact.nonEmpty, "vacuous fixture")
      val hit = (streamPairs & exact).size.toDouble
      assert(hit / streamPairs.size >= 0.9,
        s"precision ${hit / streamPairs.size} (measured 1.0 at both sf0.001 and sf0.01)")
      assert(hit / exact.size >= 0.9, s"recall ${hit / exact.size}")
    } finally spark.conf.unset(ProviderConf)
  }

  test("index state carries across micro-batches: chunking never changes the output") {
    spark.conf.set(ProviderConf, RocksDb)
    try {
      val dir = "/root/testdata/sf0.001"
      val a = runStream(dir, nChunks = 3).toSet
      val b = runStream(dir, nChunks = 10).toSet
      assert(a.nonEmpty && a == b,
        s"chunking changed the pair set (${a.size} vs ${b.size} rows)")
      // prefix contract: the indexed doc always precedes the arrival
      a.foreach { case (band, x, y, nAgree) =>
        assert(x < y, s"band $band emitted ($x, $y) out of arrival order")
        assert(nAgree >= 4 && nAgree * 5 >= 192, s"($x,$y) n_agree=$nAgree under threshold")
      }
    } finally spark.conf.unset(ProviderConf)
  }
}
