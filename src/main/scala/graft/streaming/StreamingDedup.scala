package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig}

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

/** One raw document arrival for the admission gate: `key` is the exact
  * fingerprint (the stage-1 dedup key), `text` the payload the later
  * stages re-derive everything from. */
case class DocEvent(key: String, ts: Timestamp, id: String, text: String)

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
  * rebasing the index from the at-rest batch job ([[indexState]] →
  * [[lshIndexResumed]]: the daily job re-derives compacted buckets, a
  * fresh query resumes admission on them via Spark's initial-state
  * channel). The declared
  * correctness query runs TTL-free so the replay is a pure function of
  * the input. Requires the RocksDB provider (`transformWithState`);
  * `appendValue` gives point-appends into the bucket's list — the new
  * doc's signature is MERGED into RocksDB, not rewritten with the whole
  * bucket.
  */
object StreamingDedup {

  /** Shared in-bucket match-then-append fold: compare each arriving
    * signature against the bucket's stored docs (emit on estimate ≥
    * numer/denom), then append it — the one matching discipline both the
    * fresh-index and the rebased-index processors run. Arrival order
    * inside a batch is (ts, id); cross-batch order is the replay/ingest
    * order. */
  private def matchAndAppend(
      seen: ListState[(String, Array[Long])],
      key: String,
      rows: Iterator[BandEvent],
      k: Int,
      numer: Int,
      denom: Int): Iterator[LshDupRow] = {
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

  /** In-bucket matcher over an empty starting index — see
    * [[matchAndAppend]]. */
  class LshIndexProcessor(k: Int, numer: Int, denom: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandEvent, LshDupRow] {

    @transient private var seen: ListState[(String, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(String, Array[Long])](
        "seen", Encoders.product[(String, Array[Long])], ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandEvent],
        timerValues: TimerValues): Iterator[LshDupRow] =
      matchAndAppend(seen, key, rows, k, numer, denom)

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[LshDupRow] = Iterator.empty
  }

  /** One LSH bucket's rebased contents: doc ids in admission (ts, id)
    * order and their signatures flattened at stride k (`flat.length ==
    * ids.length * k`) — the compact wire form the batch rebase hands to
    * [[LshIndexResumeProcessor.handleInitialState]]. */
  case class BucketInit(ids: Array[String], flat: Array[Long])

  /** [[LshIndexProcessor]] that starts from a REBASED index: Spark's
    * initial-state channel (`StatefulProcessorWithInitialState`) loads
    * each bucket's at-rest contents into the same `seen` ListState at
    * batch 0, co-partitioned with the stream — no per-event side lookup,
    * no driver loop. Matching after batch 0 is [[matchAndAppend]],
    * identical to the fresh index. */
  class LshIndexResumeProcessor(k: Int, numer: Int, denom: Int, ttl: TTLConfig)
      extends StatefulProcessorWithInitialState[String, BandEvent, LshDupRow, BucketInit] {

    @transient private var seen: ListState[(String, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(String, Array[Long])](
        "seen", Encoders.product[(String, Array[Long])], ttl)

    override def handleInitialState(
        key: String,
        state: BucketInit,
        timerValues: TimerValues): Unit = {
      var i = 0
      while (i < state.ids.length) {
        seen.appendValue((state.ids(i), java.util.Arrays.copyOfRange(state.flat, i * k, (i + 1) * k)))
        i += 1
      }
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[BandEvent],
        timerValues: TimerValues): Iterator[LshDupRow] =
      matchAndAppend(seen, key, rows, k, numer, denom)

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
  /** Admission-time exact dedup with a DETERMINISTIC winner: per key,
    * emit only the first arrival by (ts, id) — intra-batch rows are
    * sorted before the state check, so unlike `dropDuplicates` (which
    * keeps an arbitrary same-batch row per key) the kept row is a pure
    * function of the input order. State is one boolean per key
    * (`ValueState`), the cheapest admission ledger; bound it with `ttl`
    * when keys only recur within a horizon. */
  class FirstPerKeyProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, DocEvent, DocEvent] {

    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[DocEvent],
        timerValues: TimerValues): Iterator[DocEvent] = {
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.minBy(e => (StateMachines.usOf(e.ts), e.id))
        seen.update(true)
        Iterator.single(first)
      }
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DocEvent] = Iterator.empty
  }

  def firstPerKey(
      events: Dataset[DocEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[DocEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.key != Replay.Sentinel)
      .groupByKey(_.key)
      .transformWithState(
        new FirstPerKeyProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** The admission gate as ONE streaming dataflow — the ingest-time twin
    * of the batch flagship (`TrainingPipeline.buildCorpus`'s front half):
    *
    *   quality gate (stateless: ≥ `minTokens` whitespace tokens and the
    *   stopword language id says "en") →
    *   exact dedup ([[firstPerKey]] on the md5 fingerprint — first
    *   arrival wins, deterministically) →
    *   portable MinHash signature + band keys (stateless HOF projection,
    *   [[graft.ops.Dedup.portableMinhashSignature]] — no explode/agg, so
    *   it legally sits BETWEEN the two stateful operators) →
    *   accumulating LSH index ([[lshIndex]]) emitting a hit row per
    *   band where the arrival matches an earlier admitted-candidate.
    *
    * Two chained keyed state machines in one query: Spark reshuffles
    * from the fingerprint grouping to the (band, band-hash) grouping
    * between them — on a cluster each index shard lives where its keys
    * hash, the same distribution story as the standalone index. Output
    * is the hit stream; a doc with ≥ 1 hit is a near-duplicate of the
    * corpus-so-far, everything else that survived both gates is
    * admitted (the `p_ingest_stream` declaration assembles the
    * per-document verdicts and the oracle replays the whole chain). */
  def ingestGate(
      docs: DataFrame, // ts, id, text columns
      minTokens: Int = 5,
      langMinStopwords: Int = 2,
      k: Int = 64,
      bands: Int = 16,
      thresholdNumer: Int = 3,
      thresholdDenom: Int = 5,
      ttl: TTLConfig = TTLConfig.NONE,
      sigPartitions: Int = 0): Dataset[LshDupRow] = {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextOps}
    val spark = docs.sparkSession
    import spark.implicits._
    val gated = docs
      .filter(
        TextOps.tokenCount(col("text")) >= minTokens &&
          TextOps.langId(col("text"), langMinStopwords) === "en")
      .select(
        TextOps.fingerprint(col("text")).as("key"),
        col("ts"), col("id").cast("string").as("id"), col("text"))
      .as[DocEvent]
    val first = firstPerKey(gated, ttl).toDF()
    // sigPartitions > 0 decouples COMPUTE width from STATE width: the
    // k-hash shingling below is the pipeline's CPU (27M hash evals per
    // ~800-doc batch at k=64) but it inherits the fingerprint op's state
    // partitioning, which small-batch deployments size DOWN (state
    // open/commit fixed cost — the p32→p4 bench sweep). One text-grain
    // exchange here lets state partitions track state volume while the
    // shingling uses every core; 0 (the default, what the correctness
    // twins run) leaves the plan untouched.
    val sigInput =
      if (sigPartitions > 0) first.repartition(sigPartitions, col("id")) else first
    val sig = sigInput.withColumn("__sig", Dedup.portableMinhashSignature(col("text"), k = k))
    val events = sig
      .select(
        col("ts"), col("id"), col("__sig").as("sig"),
        explode(array((0 until bands).map(j =>
          Dedup.portableBandKey(col("__sig"), j, k / bands)): _*)).as("key"))
      .select(col("key"), col("ts"), col("id"), col("sig"))
      .as[BandEvent]
    lshIndex(events, k, thresholdNumer, thresholdDenom, ttl)
  }

  /** Static band table of a frozen eval benchmark for [[deconHits]]: one
    * row per (band key, eval doc), the doc's full portable signature
    * carried so the verify is map-side — benchmark-sized by definition,
    * so the stream side broadcasts it. */
  def evalBandTable(
      evalSet: DataFrame,
      id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      k: Int = 64,
      bands: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    evalSet
      .select(
        id.cast("string").as("eval_id"),
        Dedup.portableMinhashSignature(text, k = k).as("eval_sig"))
      .select(
        col("eval_id"), col("eval_sig"),
        explode(array((0 until bands).map(j =>
          Dedup.portableBandKey(col("eval_sig"), j, k / bands)): _*)).as("key"))
  }

  /** Static shingle-hash table of a frozen eval benchmark for
    * [[deconHitsExact]]: distinct (s, eval_id) portable 32-bit shingle
    * hashes — benchmark-sized, so the stream side broadcasts it. */
  def evalShingleTable(
      evalSet: DataFrame,
      id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      n: Int = 13): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ops.TextOps.portableShingleHashRows(evalSet, id, text, n)
      .distinct()
      .select(col("doc_id").as("eval_id"), col("s"))
  }

  /** The HARD decontamination screen riding the ingest stream — the
    * streaming twin of [[graft.ops.Dedup.exactNgramCollisions]] (GPT-3's
    * exact-13-gram rule): each arrival's distinct shingle-hash set comes
    * from a pure array projection ([[graft.ops.Dedup.portableShingleHashArray]]
    * — window `lead` is illegal on a stream), exploded and joined
    * stream-static against the broadcast benchmark table. Stateless: no
    * watermark, nothing accumulates; emits one row per shared shingle
    * (b, eval_id) — downstream assembly dedups, exactly the
    * [[LshDupRow]] multiplicity contract (a streaming `distinct` would
    * itself be a stateful op). */
  def deconHitsExact(
      docs: DataFrame, // ts, id, text columns (the DocEvent shape)
      evalShingles: DataFrame, // from [[evalShingleTable]]
      n: Int = 13): DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .select(
        col("id").cast("string").as("b"),
        explode(graft.ops.Dedup.portableShingleHashArray(col("text"), n)).as("s"))
      .join(broadcast(evalShingles), "s")
      .select(col("b"), col("eval_id"))
  }

  /** Streaming decontamination screen — the eval-benchmark counterpart
    * of [[ingestGate]]'s near-dup index, STATELESS by design: the
    * benchmark is frozen and tiny, so each arrival's contamination
    * decision is a pure function of (arrival text, static eval band
    * table). Same quality gate as the index branch (so both branches see
    * identical survivors), portable signature + band keys per arrival,
    * a stream-static BROADCAST join on the band key, then the integer
    * signature-agreement verify (`n_agree · denom ≥ k · numer`) computed
    * map-side from the two signatures in the row — one broadcast hash
    * join per micro-batch, no state, no watermark, nothing accumulates.
    * Emits one row per colliding (band, arrival, eval doc) like
    * [[LshDupRow]]; downstream assembly dedups (the cross-band
    * multiplicity contract). At 100 TB this is exactly how benchmark
    * decon rides an ingest stream: the eval side is broadcast once and
    * every executor screens its arrivals locally.
    */
  def deconHits(
      docs: DataFrame, // ts, id, text columns (the DocEvent shape)
      evalBands: DataFrame, // from [[evalBandTable]]
      minTokens: Int = 5,
      langMinStopwords: Int = 2,
      k: Int = 64,
      bands: Int = 16,
      thresholdNumer: Int = 3,
      thresholdDenom: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextOps}
    val gated = docs.filter(
      TextOps.tokenCount(col("text")) >= minTokens &&
        TextOps.langId(col("text"), langMinStopwords) === "en")
    val keyed = gated
      .withColumn("__sig", Dedup.portableMinhashSignature(col("text"), k = k))
      .select(
        col("id").cast("string").as("b"),
        col("__sig").as("sig"),
        explode(array((0 until bands).map(j =>
          Dedup.portableBandKey(col("__sig"), j, k / bands)): _*)).as("key"))
    keyed
      .join(broadcast(evalBands), "key")
      .withColumn("n_agree",
        aggregate(
          zip_with(col("sig"), col("eval_sig"),
            (a, b) => when(a === b, lit(1)).otherwise(lit(0))),
          lit(0), (acc, x) => acc + x))
      .filter(col("n_agree") * thresholdDenom >= k * thresholdNumer)
      .select(col("b"), col("eval_id"), col("n_agree").cast("int").as("n_agree"))
  }

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

  /** Collapse a BATCH frame of banded signature rows (key, ts, id, sig —
    * the same shape the stream side feeds [[lshIndex]], built by the same
    * signature + band-key projection over the at-rest corpus) into the
    * per-bucket initial state [[lshIndexResumed]] loads: ids in (ts, id)
    * admission order, signatures flattened at stride k.
    *
    * This is the REBASE half of the production state-bounding story: the
    * daily at-rest job (which already drops deleted / TTL-expired / purged
    * docs) re-derives the whole index as a batch dataflow — one
    * bucket-grain shuffle, state rows built where their keys hash — and a
    * fresh streaming query resumes admission on top of it. Bucket-grain
    * like the index itself, so it distributes exactly as the streaming
    * state does.
    */
  def indexState(banded: DataFrame): Dataset[(String, BucketInit)] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .select("key", "ts", "id", "sig").as[BandEvent]
      .groupByKey(_.key)
      .mapGroups { (key, it) =>
        val docs = it.toArray.sortBy(e => (StateMachines.usOf(e.ts), e.id))
        (key, BucketInit(docs.map(_.id), docs.flatMap(_.sig)))
      }
  }

  /** [[lshIndex]] resumed on a rebased index: every arrival is checked
    * against the at-rest corpus loaded via [[indexState]] AND every
    * earlier streamed arrival — the hit stream for post-rebase docs is
    * row-identical to an uninterrupted run's (StreamingDedupSpec pins
    * this). Start the resumed query on a FRESH checkpoint: Spark applies
    * the initial state at batch 0 only.
    */
  def lshIndexResumed(
      events: Dataset[BandEvent],
      initial: Dataset[(String, BucketInit)],
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
        new LshIndexResumeProcessor(k, thresholdNumer, thresholdDenom, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }
}
