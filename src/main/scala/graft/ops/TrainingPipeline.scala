package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus build — the composition the per-stage operators
  * exist to serve, declared as ONE dataflow: exact dedup → quality +
  * language gate → deterministic split → eval-leakage decontamination →
  * sqrt-temperature mixture → sharded epoch shuffle. Raw crawl in,
  * training-ready (shard, pos)-addressed corpus out.
  *
  * Every decision is md5-deterministic (no `rand()`), so the FULL
  * pipeline — not just each stage — reproduces bit-exactly on re-runs
  * and on other engines; the correctness record replays the whole chain
  * in DuckDB (`p_corpus_e2e`).
  *
  * Stage order is the cost order that survives 100 TB:
  *  1. exact collapse first (one 128-bit-fingerprint exchange) so
  *     duplicate clusters never reach the quadratic-prone near-dup join;
  *  2. per-row quality/language gates next (codegen'd scalar filters at
  *     the scan, no shuffle) so only keepable docs are shingled;
  *  3. the shingle equi-join decontamination sweep runs over the
  *     already-thinned corpus;
  *  4. mixture + shuffle touch only surviving ids (the text column can
  *     be re-attached by join at write time if the sink wants it).
  */
object TrainingPipeline {

  /** Build the training corpus. Output: the input row (minus helper
    * columns) plus `shard` and `pos` — reading shards in (shard, pos)
    * order is the reproducible epoch-0 training order.
    *
    * @param leakThreshold word-`shingleLen`-gram Jaccard at or above
    *   which a train doc is dropped for resembling an eval doc
    * @param mixtureC sqrt-smoothing constant: a source contributes
    *   ~`c·sqrt(n_s)` docs, sources with ≤ c² docs are kept whole
    */
  def buildCorpus(
      docs: DataFrame,
      id: Column,
      text: Column,
      source: Column,
      minTokens: Int = 5,
      langMinStopwords: Int = 2,
      trainFrac: Double = 0.9,
      shingleLen: Int = 3,
      leakThreshold: Double = 0.5,
      mixtureC: Double = 3.0,
      nShards: Int = 8): DataFrame = {
    val deduped = Dedup.exactRepresentatives(docs, id, text)
    val gated = deduped.filter(
      TextOps.tokenCount(text) >= minTokens &&
        TextOps.langId(text, langMinStopwords) === "en")
    val withSplit = Sampling.split(
      gated, id, Seq("train" -> trainFrac, "eval" -> (1.0 - trainFrac)))
    val train = withSplit.filter(col("split") === "train")
    val eval = withSplit.filter(col("split") === "eval")
    val leaked = Dedup
      .crossCorpusNearDups(train, eval, id, text, shingleLen, leakThreshold)
      .select(col("train_id"))
    val clean = train.join(leaked, id === col("train_id"), "left_anti")
    val mixed = Sampling.sampleSqrtSmoothed(clean, id, source, mixtureC)
    Sampling.shardedShuffle(mixed, id, nShards).drop("split")
  }

  /** Per-document admission verdicts for the STREAMING gate
    * ([[graft.streaming.StreamingDedup.ingestGate]] — [[buildCorpus]]'s
    * ingest-time front half): label every input doc `low_quality` /
    * `dup_exact` / `near_dup` / `admitted` given the hit rows the
    * streaming index emitted. Only the labeling is batch-side — the
    * stateful decisions (first-per-fingerprint, index collisions) are
    * `hits`'s; the stateless gates here are the same exprs the stream
    * evaluated.
    */
  def ingestVerdicts(
      docs: DataFrame, // doc_id, source, text
      hits: DataFrame, // the ingestGate output (b = near-dup arrivals)
      minTokens: Int = 5,
      langMinStopwords: Int = 2): DataFrame = {
    val near = hits.select(col("b").cast("long").as("doc_id")).distinct()
      .withColumn("__near", lit(true))
    val ok = TextOps.tokenCount(col("text")) >= minTokens &&
      TextOps.langId(col("text"), langMinStopwords) === "en"
    val flagged = docs.select(col("doc_id"), col("source"),
      TextOps.fingerprint(col("text")).as("fp"), ok.as("ok"))
    // Keeper per fingerprint via a map-side-combined aggregate, not
    // `min(...) over Window.partitionBy(fp)`: a text duplicated 10^9
    // times must not concentrate its copy set in one window-sort task.
    // The join back is fp → one keeper row (AQE splits a skewed probe).
    val keepers = flagged.filter(col("ok"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
    flagged
      .join(keepers, Seq("fp"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(!col("ok"), "low_quality")
          .when(col("doc_id") =!= col("keeper"), "dup_exact")
          .when(col("__near"), "near_dup")
          .otherwise("admitted").as("verdict"))
  }

  /** [[ingestVerdicts]] plus the streaming decontamination screen
    * ([[graft.streaming.StreamingDedup.deconHits]]): `contaminated` for
    * keepers that cleared the near-dup index but hit the frozen eval
    * benchmark — the [[dailyAdmission]] verdict ladder in its streaming
    * posture (low_quality | dup_exact | near_dup | contaminated |
    * admitted). As in [[ingestVerdicts]], only the labeling is
    * batch-side; both hit sets came off the stream.
    */
  def ingestVerdictsDecon(
      docs: DataFrame, // doc_id, source, text
      hits: DataFrame, // ingestGate output (b = near-dup arrivals)
      decon: DataFrame, // deconHits output (b = contaminated arrivals)
      minTokens: Int = 5,
      langMinStopwords: Int = 2): DataFrame = {
    val near = hits.select(col("b").cast("long").as("doc_id")).distinct()
      .withColumn("__near", lit(true))
    val cont = decon.select(col("b").cast("long").as("doc_id")).distinct()
      .withColumn("__cont", lit(true))
    val ok = TextOps.tokenCount(col("text")) >= minTokens &&
      TextOps.langId(col("text"), langMinStopwords) === "en"
    val flagged = docs.select(col("doc_id"), col("source"),
      TextOps.fingerprint(col("text")).as("fp"), ok.as("ok"))
    // Same de-skewed keeper election as [[ingestVerdicts]]: partial-agg
    // per fingerprint, join back, never a window sort on fp.
    val keepers = flagged.filter(col("ok"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
    flagged
      .join(keepers, Seq("fp"), "left")
      .join(near, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(!col("ok"), "low_quality")
          .when(col("doc_id") =!= col("keeper"), "dup_exact")
          .when(col("__near"), "near_dup")
          .when(col("__cont"), "contaminated")
          .otherwise("admitted").as("verdict"))
  }

  /** The full daily-admission decision — [[buildCorpus]]'s ingest-time
    * counterpart, one verdict per incoming doc against a standing corpus
    * and a frozen eval benchmark, declared as ONE dataflow:
    * Gopher quality gate → exact fingerprint dedup → MinHash-LSH
    * near-dup screen → eval-set decontamination. The first stage that
    * fires names the verdict:
    * `rejected_quality` | `dup_exact` | `near_dup_corpus` |
    * `near_dup_batch` | `contaminated` | `admitted`.
    *
    * Stage order is [[buildCorpus]]'s cost order applied to the
    * increment: the per-row codegen'd gate runs at the scan (no
    * shuffle), so junk never reaches the fingerprint exchange; exact
    * collapse next, so replica mass dies before any signature work
    * ([[Dedup.ingestIncrement]]); the LSH screen sees keepers only; and
    * the shingle decontamination sweep sees just the admitted sliver ×
    * the (tiny, by definition) benchmark — with
    * [[Dedup.crossCorpusNearDupsBloom]] as the drop-in when even that
    * explode is worth pruning. At 100 TB every stage's input is the
    * previous stage's survivors, so the increment's cost tracks the
    * admitted fraction, not the crawl size; the corpus side enters only
    * as its fingerprint set and its LSH band table, both maintained
    * across ingests (never rescanned at text grain).
    */
  def dailyAdmission(
      corpus: DataFrame,
      incoming: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      nearThreshold: Double = 0.6,
      deconShingleLen: Int = 3,
      deconThreshold: Double = 0.5,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    admissionLadder(incoming, evalSet, id, text, deconShingleLen, deconThreshold) { passed =>
      Dedup.ingestIncrement(
        corpus, passed, id, text, shingleLen, k, bands, nearThreshold, seed, portableHash)
    }

  /** [[dailyAdmission]] against STORED corpus artifacts only — what the
    * scheduled daily job actually runs at 100 TB: the corpus enters as
    * its fingerprint set and its two near-dup index tables (all three
    * appended per admitted batch, maintained by
    * [[Dedup.fingerprintSet]] / [[Dedup.nearDupIndex]] over each round's
    * admits); corpus TEXT is never read anywhere in the plan. Same
    * verdicts as [[dailyAdmission]] given artifacts derived from the
    * same corpus (PipelineSpec pins the equality), so both share one
    * oracle.
    */
  def dailyAdmissionIndexed(
      corpusFps: DataFrame, // (fp)
      corpusHashes: DataFrame, // (doc_id, s)
      corpusBands: DataFrame, // (doc_id, band, band_hash)
      incoming: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      nearThreshold: Double = 0.6,
      deconShingleLen: Int = 3,
      deconThreshold: Double = 0.5,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    admissionLadder(incoming, evalSet, id, text, deconShingleLen, deconThreshold) { passed =>
      Dedup.ingestIncrementIndexed(
        corpusFps, corpusHashes, corpusBands, passed, id, text,
        shingleLen, k, bands, nearThreshold, seed, portableHash)
    }

  /** [[dailyAdmission]] with the GPT-3 decontamination rule at admission
    * time: `contaminated` = the admitted sliver shares ANY verbatim
    * 13-token run with the frozen benchmark
    * ([[Dedup.exactNgramCollisions]] — one equi-join on portable 32-bit
    * shingle hashes), instead of the Jaccard near-dup sweep. This is the
    * batch twin of the streaming `deconHitsExact` screen: the hard rule
    * catches verbatim benchmark leakage that sits far below any
    * whole-document similarity bar.
    */
  def dailyAdmissionHard13(
      corpus: DataFrame,
      incoming: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      nearThreshold: Double = 0.6,
      deconNgram: Int = 13,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    admissionLadderWith(incoming)({ passed =>
      Dedup.ingestIncrement(
        corpus, passed, id, text, shingleLen, k, bands, nearThreshold, seed, portableHash)
    }, { admitted =>
      Dedup.exactNgramCollisions(admitted, evalSet, id, text, deconNgram, portableHash = true)
        .select(col("train_id").as("doc_id"))
    }, id, text)

  /** [[dailyAdmissionHard13]] against stored corpus artifacts, with the
    * 13-gram screen running through its bloom-pruned 100 TB form
    * ([[Dedup.exactNgramCollisionsBloom]] — codegen'd `might_contain`
    * kills almost every train shingle before any exchange; the exact
    * join behind it removes the false positives, so this twin shares
    * [[dailyAdmissionHard13]]'s oracle exactly).
    */
  def dailyAdmissionHard13Indexed(
      corpusFps: DataFrame,
      corpusHashes: DataFrame,
      corpusBands: DataFrame,
      incoming: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      nearThreshold: Double = 0.6,
      deconNgram: Int = 13,
      expectedEvalShingles: Long = 1000000L,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    admissionLadderWith(incoming)({ passed =>
      Dedup.ingestIncrementIndexed(
        corpusFps, corpusHashes, corpusBands, passed, id, text,
        shingleLen, k, bands, nearThreshold, seed, portableHash)
    }, { admitted =>
      Dedup.exactNgramCollisionsBloom(
          admitted, evalSet, id, text, deconNgram, expectedEvalShingles, portableHash = true)
        .select(col("train_id").as("doc_id"))
    }, id, text)

  /** The shared admission ladder: quality gate in, dedup screen via
    * `screen` (recompute or stored-index), decontamination of the
    * admitted sliver, verdict assembly with the declared precedence.
    * NULL quality signals (degenerate texts) reject on both engines:
    * coalesce(keep, false) here, COALESCE(cond, false) in the oracle.
    * The quality frame is deliberately NOT persisted: it feeds five
    * downstream subtrees, but caching it measured flat at sf0.1
    * (7.45 vs 7.49 s) — the d_cluster_sizes counter-lesson again (the
    * near-dup stage dominates; the regex re-runs are noise next to it).
    */
  private def admissionLadder(
      incoming: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      deconShingleLen: Int,
      deconThreshold: Double)(screen: DataFrame => DataFrame): DataFrame =
    admissionLadderWith(incoming)(screen, { admitted =>
      Dedup
        .crossCorpusNearDups(admitted, evalSet, id, text, deconShingleLen, deconThreshold)
        .select(col("train_id").as("doc_id"))
    }, id, text)

  /** The ladder with a pluggable decontamination screen: `contaminate`
    * maps the admitted sliver to the (doc_id) rows that hit the
    * benchmark — Jaccard sweep for [[dailyAdmission]], the exact-13-gram
    * rule for [[dailyAdmissionHard13]]. */
  private def admissionLadderWith(incoming: DataFrame)(
      screen: DataFrame => DataFrame,
      contaminate: DataFrame => DataFrame,
      id: Column,
      text: Column): DataFrame = {
    // quality and dedup are each read by TWO consumers (the stage filter
    // and the final verdict join). Both are one-row-per-doc verdict
    // frames — persisting them costs |incoming| tiny rows and stops the
    // regex quality gate and the ENTIRE dedup screen (fingerprint +
    // 64-hash MinHash + LSH joins) from executing twice per run (round-14
    // measured: the un-persisted screen re-ran whole; exchange reuse does
    // not cover it because the two consumers need different join keys).
    // Runner-scoped cache lifecycle as everywhere else (clearCache).
    val quality = TextOps.gopherSignals(incoming, id, text)
      .select(col("doc_id"), coalesce(col("keep"), lit(false)).as("keep"))
      .persist()
    val passed = incoming.join(
      quality.filter(col("keep")).select(col("doc_id").as("__q_id")),
      id === col("__q_id"), "left_semi")
    val dedup = screen(passed).withColumnRenamed("verdict", "__dedup_verdict")
      .persist()
    val admitted = passed.join(
      dedup.filter(col("__dedup_verdict") === "admitted").select(col("doc_id").as("__a_id")),
      id === col("__a_id"), "left_semi")
    val contaminated = contaminate(admitted)
      .distinct()
      .withColumn("__cont", lit(true))
    incoming
      .select(id.as("doc_id"))
      .join(quality, Seq("doc_id"), "left")
      .join(dedup, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(!col("keep"), lit("rejected_quality"))
          .when(col("__dedup_verdict") =!= "admitted", col("__dedup_verdict"))
          .when(col("__cont"), lit("contaminated"))
          .otherwise(lit("admitted"))
          .as("verdict"))
  }
}
