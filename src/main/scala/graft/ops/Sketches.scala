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
    * The d×w counter grid is built as a DATAFRAME: explode tokens × d
    * hash rows, hash each (row, token) to one of w buckets, and count —
    * one map-side-combined exchange whose reduce side is at most d·w
    * cells no matter the corpus size (the grid IS the mergeable sketch
    * state, same posture as the HLL sketch store). Probes join the grid
    * at their d buckets and take the row-minimum.
    *
    * Bucket hash is the engine-portable md5→48-bit idiom (the same one
    * p_sample / d_winnow pin), NOT Spark's private murmur3 — which makes
    * the whole sketch REPLAYABLE IN SQL, so the declared t_cms_counts
    * query is oracle-checked rather than rows-only (round 9). A 64-bit
    * xxhash64 is the cheaper production swap; the structure and bounds
    * are hash-agnostic.
    *
    * Guarantee (Cormode–Muthukrishnan): exact ≤ estimate always, and
    * estimate ≤ exact + eps·N with probability ≥ confidence over the
    * hash draw (d = ⌈ln(1/(1−confidence))⌉ rows, w = ⌈e/eps⌉ columns;
    * N = total token count). The ApproxGatesSpec gate asserts both
    * sides on the real corpus.
    *
    * Returns (w, est) for each distinct query token.
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
    val width = math.ceil(math.E / eps).toLong
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - confidence))).toInt)
    def bucket(tok: Column, row: Column): Column =
      pmod(
        conv(substring(md5(
          concat(lit(s"$seed:"), row.cast("string"), lit("|"), tok)), 1, 12), 16, 10)
          .cast("long"),
        lit(width))
    val toks = df.select(explode(TextOps.tokens(text)).as("w")).filter(col("w") =!= "")
    // hash the VOCABULARY, not the occurrences: one count exchange at
    // token grain first (map-side combined), then d md5s per DISTINCT
    // token — at corpus scale occurrences ≫ vocabulary, so the md5 cost
    // is off the hot path (measured 2.4 s → token-grain at sf0.1);
    // summing counts into cells is the same grid, same oracle
    val grid = toks
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), col("wc"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("i"))
      .groupBy(col("i"), bucket(col("w"), col("i")).as("b"))
      .agg(sum(col("wc")).as("cnt"))
    val probes = queryTokens.distinct.sorted.toDF("w")
      .select(col("w"), explode(array((0 until depth).map(i => lit(i)): _*)).as("i"))
      .select(col("w"), col("i"), bucket(col("w"), col("i")).as("b"))
    probes
      .join(grid, Seq("i", "b"), "left")
      .groupBy(col("w"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
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
