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

  // ---- portable-register HLL (round 10) -------------------------------
  //
  // A HyperLogLog whose sketch state is a plain RELATION of
  // (bucket, max-rho) register rows in the md5→48-bit hash family — the
  // same "the sketch is a dataframe" posture as the CMS grid above, and
  // like it fully REPLAYABLE IN SQL: bucket = h48 mod 2^p, rho = count
  // of leading zero bits of the remaining 48−p bits + 1 (an integer
  // string-length computation both engines share), registers merge by
  // MAX (associative, order-free — the write-once/re-merge-forever
  // property), and the Flajolet harmonic estimate with the standard
  // linear-counting small-range correction is one fixed-order float
  // expression over exact integers. This is the ORACLE-ANCHOR twin of
  // the `hll_sketch_agg` store ([[hllRollup]] stays the engine-native
  // production path — Datasketches states are binary and engine-private,
  // the register relation is engine-neutral and hash-checkable).
  //
  // Scale: identical to hllRollup's — one map-side-combined exchange to
  // (keys, bucket) grain, ≤ 2^p register rows per group no matter the
  // cardinality, merges are a max-groupBy.

  /** Engine-portable 48-bit hash: first 12 hex digits of md5 (Spark
    * `conv` == DuckDB `concat('0x',…)::BIGINT` — the established
    * portable-bloom/CMS idiom). */
  private[graft] def md5h48(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 12), 16, 10).cast("long")

  /** HLL bucket index: low p bits of the 48-bit hash. */
  private[graft] def hllBucket(h: Column, p: Int): Column = h % (1 << p)

  /** HLL rank: leading-zero count of the top 48−p bits + 1, via binary
    * string length (Spark `conv(…,10,2)` == DuckDB `bin(…)`, neither
    * zero-pads). Range 1 .. 48−p+1. */
  private[graft] def hllRho(h: Column, p: Int): Column = {
    val maxRho = 48 - p + 1
    val w = shiftright(h, p)
    when(w === 0, lit(maxRho))
      .otherwise(lit(maxRho) - length(conv(w.cast("string"), 10, 2)))
  }

  /** Register relation: one row per (keys…, bucket) with the max rho —
    * THE mergeable sketch state (union = max-groupBy over bucket). */
  def portableHllRegisters(
      df: DataFrame,
      keys: Seq[Column],
      distinctCol: Column,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val keyed = df.select(keys :+ md5h48(distinctCol).as("__h"): _*)
    val keyNames = keyed.columns.dropRight(1).toSeq
    require(keyNames.distinct.size == keyNames.size,
      s"key expressions must have distinct names, got $keyNames — alias the duplicates")
    def quoted(n: String): Column = col("`" + n.replace("`", "``") + "`")
    keyed
      .groupBy(keyNames.map(quoted) :+ hllBucket(col("__h"), p).as("bucket"): _*)
      .agg(max(hllRho(col("__h"), p)).cast("long").as("register"))
  }

  /** Estimate from a register relation: alpha_m·m²/Σ2^-rho with the
    * standard linear-counting correction below 2.5m. All integer inputs
    * are exact (2^(maxRho−rho) BIGINT sums, total ≤ 2^49 < 2^53), and
    * the float expression is written in one fixed evaluation order, so
    * the floored estimate replays bit-equal in oracle SQL (the ln branch
    * sits ≥ 9.6e-5 from every floor boundary over the whole integer
    * domain of V — a 1-ulp libm divergence cannot flip it). */
  def portableHllEstimate(
      regs: DataFrame,
      keys: Seq[Column],
      p: Int = 10,
      estName: String = "uv_est"): DataFrame = {
    val m = 1 << p
    val maxRho = 48 - p + 1
    val scale = 1L << maxRho
    val alpha = s"0.7213 / (1.0 + 1.079 / $m.0)"
    regs
      .groupBy(keys: _*)
      .agg(
        sum(expr(s"shiftleft(1L, $maxRho - register)")).as("__s"),
        count(lit(1)).as("__nb"))
      .withColumn("__total", expr(s"__s + ($m - __nb) * ${scale}L"))
      .withColumn("__v", expr(s"$m - __nb"))
      .withColumn(estName, expr(
        s"""CAST(floor(CASE
           |  WHEN $alpha * ${m.toLong * m}.0 * $scale.0 / __total <= ${2.5 * m} AND __v > 0
           |  THEN $m.0 * ln($m.0 / __v)
           |  ELSE $alpha * ${m.toLong * m}.0 * $scale.0 / __total END) AS BIGINT)""".stripMargin))
      .drop("__s", "__nb", "__total", "__v")
  }

  /** Portable twin of [[hllRollup]]: per-(key, bucketCol) register
    * sketches unioned to a per-key estimate, with the stored-sketch
    * count. Same shuffle shape; hash-checkable record. */
  def portableHllRollup(
      df: DataFrame,
      key: Column,
      bucket: Column,
      distinctCol: Column,
      p: Int = 10): DataFrame = {
    val regs = portableHllRegisters(
      df.select(key.as("key"), bucket.as("__day"), distinctCol.as("__v")),
      Seq(col("key"), col("__day")), col("__v"), p)
      .persist() // feeds the merge AND the stored-sketch count
    val merged = regs.groupBy(col("key"), col("bucket"))
      .agg(max(col("register")).as("register"))
    val nb = regs.select(col("key"), col("__day")).distinct()
      .groupBy(col("key")).agg(count(lit(1)).as("n_buckets"))
    portableHllEstimate(merged, Seq(col("key")), p)
      .join(nb, "key")
      .select(col("key"), col("n_buckets"), col("uv_est"))
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
