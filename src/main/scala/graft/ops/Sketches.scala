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
