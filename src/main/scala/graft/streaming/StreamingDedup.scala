package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One banded-signature row of the document stream: `key` is the LSH
  * index shard (`"<band>|<band-hash>"`), `id` the doc id, `sig` the full
  * k-minima MinHash signature (carried so the in-bucket verify needs no
  * side lookup). */
case class BandEvent(key: String, ts: Timestamp, id: String, sig: Array[Long])

/** Near-duplicate hit from the streaming index: doc `b` arrived while
  * `a` was already indexed and their signatures agree on `n_agree` of k
  * positions in band `band` (one row per colliding band — cross-band
  * multiplicity is part of the deterministic contract, so no stateful
  * dedup stage is needed downstream). */
case class LshDupRow(band: Int, a: String, b: String, n_agree: Int)

/** One sign-bucketed embedding row: `key` is the index shard
  * (`"<table>|<bucket>"` from the sign-hyperplane hash), `vec` the full
  * embedding (carried for the exact-cosine in-bucket verify). */
case class VecEvent(key: String, ts: Timestamp, id: String, vec: Array[Double])

/** Embedding near-dup hit: vector `b` arrived while `a` was indexed in
  * sign-LSH table `tbl`; `sim` is the exact quantized cosine
  * (floor(cos·1e4), the repo's cross-engine similarity basis). */
case class VecDupRow(tbl: Int, a: String, b: String, sim: Long)

/** Streaming near-duplicate detection: an accumulating MinHash-LSH index
  * kept in keyed state — the ingest-time twin of the at-rest batch op
  * ([[graft.ops.Dedup.minhashDedup]]). Each arriving document is checked
  * against every PREVIOUSLY ingested document (prefix semantics) and
  * flagged when their signature-estimated Jaccard clears the threshold.
  *
  * This is the operator a 100 TB ingest pipeline actually runs: the
  * corpus-at-rest pair join is a daily batch job, but admission control
  * ("is this crawl shard already in the corpus?") needs the index ONLINE.
  * The index shards by (band, band-hash) — exactly the LSH bucket key —
  * so state distributes across the cluster like any keyed aggregation,
  * and a lookup touches only the `bands` buckets the new doc hashes to,
  * never the whole index.
  *
  * Verify is the SIGNATURE ESTIMATE (agreeing minima / k), not exact
  * shingle Jaccard: state then holds signatures only (k·8 bytes per doc
  * per band), no shingle sets, and the whole machine stays a pure
  * function of the portable hash family — which is what puts it on the
  * DuckDB record. Precision vs the batch op's exact-Jaccard verify is
  * gated in `StreamingDedupSpec`. The threshold compare is integer
  * arithmetic (`n_agree · denom ≥ k · numer`), bit-portable.
  *
  * Scale posture: state per bucket is the docs that ever hashed there —
  * bounded in production with the `ttl` knob (dedup-within-horizon, the
  * same posture as `dropDuplicatesWithinWatermark`) or by periodically
  * rebasing the index from the at-rest batch job. The declared
  * correctness query runs TTL-free so the replay is a pure function of
  * the input. Requires the RocksDB provider (`transformWithState`);
  * `appendValue` gives point-appends into the bucket's list — the new
  * doc's signature is MERGED into RocksDB, not rewritten with the whole
  * bucket.
  */
object StreamingDedup {

  /** In-bucket matcher: compare each arriving signature against the
    * bucket's stored docs (emit on estimate ≥ numer/denom), then append
    * it. Arrival order inside a batch is (ts, id); cross-batch order is
    * the replay/ingest order. */
  class LshIndexProcessor(k: Int, numer: Int, denom: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandEvent, LshDupRow] {

    @transient private var seen: ListState[(String, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(String, Array[Long])](
        "seen", Encoders.product[(String, Array[Long])], ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandEvent],
        timerValues: TimerValues): Iterator[LshDupRow] = {
      val band = key.substring(0, key.indexOf('|')).toInt
      // the bucket's index so far; newly arrived docs join it in order
      val stored = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Long])]
      if (seen.exists()) stored ++= seen.get()
      val out = Seq.newBuilder[LshDupRow]
      val batch = rows.toSeq.sortBy(e => (StateMachines.usOf(e.ts), e.id))
      for (e <- batch) {
        for ((aId, aSig) <- stored) {
          var agree = 0
          var i = 0
          while (i < k) { if (aSig(i) == e.sig(i)) agree += 1; i += 1 }
          if (agree * denom >= k * numer) out += LshDupRow(band, aId, e.id, agree)
        }
        stored += ((e.id, e.sig))
        seen.appendValue((e.id, e.sig))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[LshDupRow] = Iterator.empty
  }

  /** [[LshIndexProcessor]]'s embedding sibling: the bucket key comes from
    * the sign-hyperplane hash ([[graft.ops.Similarity.lshBucket]]) and the
    * in-bucket verify is EXACT cosine — state holds the full vectors, and
    * the accumulation replicates
    * [[org.apache.spark.sql.graft.CosineSim]]'s i=0..n fold exactly, so
    * the quantized similarity (floor(cos·1e4)) is bit-identical to the
    * batch op's and to the DuckDB oracle's `list_cosine_similarity`. */
  class VecIndexProcessor(simThresholdQ: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, VecEvent, VecDupRow] {

    @transient private var seen: ListState[(String, Array[Double])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(String, Array[Double])](
        "seen", Encoders.product[(String, Array[Double])], ttl)

    private def cosineQ(a: Array[Double], b: Array[Double]): Long = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = a(i); val yi = b(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      math.floor(sim * 10000).toLong
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[VecEvent],
        timerValues: TimerValues): Iterator[VecDupRow] = {
      val tbl = key.substring(0, key.indexOf('|')).toInt
      val stored = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Double])]
      if (seen.exists()) stored ++= seen.get()
      val out = Seq.newBuilder[VecDupRow]
      val batch = rows.toSeq.sortBy(e => (StateMachines.usOf(e.ts), e.id))
      for (e <- batch) {
        for ((aId, aVec) <- stored) {
          val q = cosineQ(aVec, e.vec)
          if (q >= simThresholdQ) out += VecDupRow(tbl, aId, e.id, q)
        }
        stored += ((e.id, e.vec))
        seen.appendValue((e.id, e.vec))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[VecDupRow] = Iterator.empty
  }

  /** Run the embedding index over a sign-bucketed vector stream (see the
    * `d_dedup_embed_lsh_stream` declaration). `simThresholdQ` is the
    * quantized cosine floor (e.g. 4000 ⇔ 0.40). */
  def vecIndex(
      events: Dataset[VecEvent],
      simThresholdQ: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[VecDupRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.key != Replay.Sentinel)
      .groupByKey(_.key)
      .transformWithState(
        new VecIndexProcessor(simThresholdQ, ttl),
        // state TTL is only legal under processing-time mode; the
        // declared (replay-pure) posture stays TimeMode.None
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Run the streaming index over a banded signature stream (build one
    * with [[graft.ops.Dedup.minhashSignatures]] + the portable band key;
    * see the `d_dedup_lsh_stream` declaration). `threshold` is
    * `numer/denom` of the k signature positions — pass it as a rational
    * so the compare stays integer-exact. */
  def lshIndex(
      events: Dataset[BandEvent],
      k: Int,
      thresholdNumer: Int,
      thresholdDenom: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[LshDupRow] = {
    require(k > 0 && thresholdDenom > 0 && thresholdNumer >= 0, "bad params")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.key != Replay.Sentinel)
      .groupByKey(_.key)
      .transformWithState(
        new LshIndexProcessor(k, thresholdNumer, thresholdDenom, ttl),
        // state TTL is only legal under processing-time mode; the
        // declared (replay-pure) posture stays TimeMode.None
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
