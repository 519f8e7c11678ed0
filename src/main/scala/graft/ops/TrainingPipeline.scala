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
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"), col("source"), col("text"),
        TextOps.fingerprint(col("text")).as("fp"), ok.as("ok"))
      .withColumn("keeper", min(when(col("ok"), col("doc_id"))).over(w))
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(!col("ok"), "low_quality")
          .when(col("doc_id") =!= col("keeper"), "dup_exact")
          .when(col("__near"), "near_dup")
          .otherwise("admitted").as("verdict"))
  }
}
