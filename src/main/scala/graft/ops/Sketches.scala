package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators. Completes the engine's sketch family:
  * HyperLogLog (approx distinct, A8), Bloom (membership, A8/P7),
  * Misra–Gries (heavy hitters, t_heavy_tokens) — and here Count–Min for
  * POINT frequency queries: "how often does token X occur in 100 TB"
  * without storing a 10⁸-row exact count table.
  */
object Sketches {

  /** Count–Min sketch over a token column, probed for `queryTokens`.
    *
    * Build is ONE distributed pass: Spark's `stat.countMinSketch`
    * treeAggregates per-partition sketches into a single d×w counter
    * grid (d = ⌈ln(1/(1−confidence))⌉ rows, w = ⌈e/eps⌉ columns) —
    * mergeable state, O(d·w) memory regardless of corpus size, the same
    * posture as the HLL/Bloom aggregates. Probes are driver-side O(d)
    * lookups on the finished sketch — the point of CMS: the corpus is
    * never rescanned per query.
    *
    * Guarantee (Cormode–Muthukrishnan): exact ≤ estimate, and
    * estimate ≤ exact + eps·N with probability ≥ confidence, where N =
    * total token count. The ApproxGatesSpec gate asserts both sides on
    * the real corpus.
    *
    * Returns (w, est) for each query token, in `queryTokens` order-
    * independent deterministic form (sorted), so the record row is
    * stable.
    */
  def cmsTokenEstimates(
      df: DataFrame,
      text: Column,
      queryTokens: Seq[String],
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(queryTokens.nonEmpty, "need at least one query token")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(TextOps.tokens(text)).as("w")).filter(col("w") =!= "")
    val cms = toks.stat.countMinSketch(col("w"), eps, confidence, seed)
    queryTokens.distinct.sorted
      .map(t => (t, cms.estimateCount(t)))
      .toDF("w", "est")
  }

  /** HLL sketch ROLLUP: pre-aggregate distinct-counting state at fine
    * (key, bucket) grain as mergeable DataSketches HLL sketches, then
    * answer the coarser per-key rollup by UNIONING sketches — the
    * sketch-store pattern that makes "distinct users per day / week /
    * month / all-time" one cheap merge each instead of one corpus rescan
    * each. This is what `approx_count_distinct` alone cannot do: its HLL
    * state dies inside the aggregate, while `hll_sketch_agg`'s binary
    * sketch column is a FIRST-CLASS table you write once at ingest and
    * re-merge forever.
    *
    * Returns (key, n_buckets, uv_est): bucket count and the estimated
    * distinct over the union of the key's bucket sketches. Estimates are
    * DETERMINISTIC (insertion- and merge-order independent) but
    * approximate → rows-only record; the ApproxGatesSpec gate bounds the
    * relative error vs exact `count_distinct` (HLL++ at lgK=12 ⇒ ~1.6 %
    * RSE; the gate allows 5 %).
    *
    * Scale: one map-side-combined exchange to (key, bucket) grain, one
    * |keys|-grain merge of O(2^lgK)-byte states — the corpus is read
    * once, every future rollup reads only the sketch table.
    */
  def hllRollup(
      df: DataFrame,
      key: Column,
      bucket: Column,
      distinctCol: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(key.as("key"), bucket.as("__b"))
      .agg(hll_sketch_agg(distinctCol, lit(lgK)).as("__sk"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_buckets"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false))).as("uv_est"))

  /** Deterministic bounded probe set for the declared query: the distinct
    * tokens of the `nDocs` lowest-id documents (sorted). Bounded by those
    * docs' vocabulary — never corpus-sized.
    */
  def probeTokens(df: DataFrame, id: Column, text: Column, nDocs: Int): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.orderBy(id)
      .limit(nDocs)
      .select(explode(TextOps.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .as[String]
      .collect()
      .toSeq
      .sorted
  }
}
