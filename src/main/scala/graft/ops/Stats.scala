package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over corpus columns — the capacity-planning /
  * filter-threshold view of a corpus (token-length percentiles per
  * language, value distributions per source, ...).
  */
object Stats {

  /** Exact per-key quantiles with explicit type-1 (discrete) semantics:
    * for each probability p, the value at 1-based index ⌈p·N⌉ of the
    * key's sorted values. Returns one row per (key, p): (key, p, value).
    *
    * Discrete rather than interpolated on purpose: the result is an
    * actual data value (an integer for integer inputs), so the
    * cross-engine contract is exact — interpolated quantiles
    * (`quantile_cont` / Spark `percentile`) differ across engines in the
    * last ulp depending on how the lerp is associated.
    *
    * Scale posture: exact quantiles require a per-key sort — one
    * exchange on the key, and each key's values must sort within its
    * partitions (Spark's rank window spills to disk, so a skewed key
    * degrades to disk sort, not OOM). For dashboard-grade numbers at
    * 100 TB prefer `approx_percentile` (t-digest, one pass, mergeable);
    * this operator is the oracle-checkable exact path.
    */
  def quantilesByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "need 0 < p <= 1")
    val w = Window.partitionBy("__k").orderBy("__v")
    val ranked = df
      .select(key.as("__k"), value.as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("__k")))
    val pDf = df.sparkSession.createDataFrame(ps.map(Tuple1(_))).toDF("p")
    ranked
      .join(
        broadcast(pDf),
        col("__rn") === greatest(lit(1L), ceil(col("p") * col("__cnt"))),
        "inner")
      .select(col("__k").as("key"), col("p"), col("__v").as("value"))
  }

  /** The 100 TB path for [[quantilesByKey]]: `percentile_approx` (GK-style
    * mergeable sketch, one pass, no per-key sort — constant memory per
    * key at any N). Spark's contract — smallest value whose rank/N ≥ p —
    * IS the type-1 ⌈p·N⌉ value, so whenever a key's row count stays
    * within `accuracy` the sketch is loss-free and this returns exactly
    * [[quantilesByKey]]'s answer (which is how the t_len_quantiles_approx
    * correctness row can share the exact oracle at gate scale); past
    * that, rank error is bounded by N/accuracy.
    */
  def approxQuantilesByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "need 0 < p <= 1")
    df.groupBy(key.as("key"))
      .agg(percentile_approx(value, array(ps.map(lit): _*), lit(accuracy)).as("__qs"))
      .select(col("key"), posexplode(col("__qs")).as(Seq("__pos", "value")))
      .withColumn("p", element_at(typedlit(ps), col("__pos") + 1))
      .select(col("key"), col("p"), col("value"))
  }

  /** Per-key percent-rank calibration: map `value` to its [0,1] rank
    * position WITHIN its stratum — the cross-source score normalizer (a
    * raw quality score of 0.4 can be "good" for web text and "poor" for
    * curated reference text; calibrating to in-stratum rank makes one
    * global threshold meaningful). `(rank-1)/(n-1)` competition ranking,
    * identical on any engine: integer ranks, one IEEE division.
    *
    * Scale: one exchange on the key + per-key sort (the same posture as
    * [[quantilesByKey]], and the spill note there applies); the output
    * adds a column, never a second pass.
    */
  def percentRankByKey(df: DataFrame, key: Column, value: Column): DataFrame =
    df.withColumn(
      "pct_rank",
      percent_rank().over(Window.partitionBy(key).orderBy(value)))

  /** Quantile-band outlier filter: keep rows whose `value` lies within
    * the per-key [type-1 `loP`, `hiP`] quantile band — the corpus-
    * cleaning trim that drops truncated fragments and concatenation
    * monsters relative to each stratum's own distribution, not a global
    * threshold. Bounds come from [[quantilesByKey]] (oracle-exact); the
    * bounds table is |keys| rows and BROADCASTS back, so the corpus
    * itself is filtered in place — scan + broadcast-join + filter, no
    * corpus shuffle. At 100 TB swap the bounds source for
    * [[approxQuantilesByKey]] (`approx = true`): same contract within
    * sketch accuracy, no per-key sort anywhere.
    */
  def filterByKeyQuantiles(
      df: DataFrame,
      key: Column,
      value: Column,
      loP: Double,
      hiP: Double,
      approx: Boolean = false): DataFrame = {
    require(loP < hiP, "need loP < hiP")
    val qs = (if (approx) approxQuantilesByKey(df, key, value, Seq(loP, hiP))
              else quantilesByKey(df, key, value, Seq(loP, hiP)))
      .groupBy(col("key").as("__qk"))
      .agg(
        max(when(col("p") === loP, col("value"))).as("__lo"),
        max(when(col("p") === hiP, col("value"))).as("__hi"))
    df.join(broadcast(qs), key === col("__qk"))
      .filter(value >= col("__lo") && value <= col("__hi"))
      .drop("__qk", "__lo", "__hi")
  }

  /** Per-key z-score outlier detection: rows whose `value` sits more than
    * `threshold` standard deviations from its key's mean. Moments come
    * from DECIMAL sums (order-independent exact integers at the cast
    * scale), so mean/σ are the same doubles on any engine; the per-key
    * stats table is |keys| rows and BROADCASTS back — two scans of the
    * corpus, no corpus shuffle. A zero-variance stratum flags nothing
    * (guarded: ANSI double division by zero would otherwise throw —
    * and NaN/Inf z-scores are meaningless there anyway).
    *
    * Returns the input columns plus `z` (double). Callers floor to
    * micro-units for an engine-exact record (the q_zscore_outliers
    * pattern).
    */
  def zscoreOutliers(
      df: DataFrame,
      key: Column,
      value: Column,
      threshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vdec = value.cast(DecimalType(18, 6))
    val stats = df.groupBy(key.as("__zk")).agg(
      sum(vdec).as("__sv"), sum(vdec * vdec).as("__sv2"), count(lit(1)).as("__n"))
    df.join(broadcast(stats), key === col("__zk"))
      .withColumn("__mean", col("__sv").cast("double") / col("__n"))
      .withColumn(
        "__var",
        (col("__sv2").cast("double") -
          col("__sv").cast("double") * col("__sv").cast("double") / col("__n")) /
          col("__n"))
      .withColumn(
        "z",
        when(col("__var") > 0d, (value - col("__mean")) / sqrt(col("__var"))))
      .filter(abs(col("z")) > threshold)
      .drop("__zk", "__sv", "__sv2", "__n", "__mean", "__var")
  }

  /** Per-key MAD (median-absolute-deviation) outliers: rows whose value
    * deviates from its key's type-1 median by more than `threshold` ×
    * MAD, where MAD is the type-1 median of the absolute deviations —
    * the ROBUST counterpart of [[zscoreOutliers]] (a z-score's mean/σ
    * are themselves dragged by the outliers they are meant to flag; the
    * median/MAD pair has a 50 % breakdown point, so a corpus where 10 %
    * of rows are concatenation monsters still gets sane thresholds).
    *
    * Engine-exact record: both medians are type-1 (actual data values /
    * single IEEE subtractions), the filter compares one subtraction
    * against one multiplication — no accumulated float error anywhere.
    * Zero-MAD strata (≥ 50 % of the key at one value) flag nothing, same
    * guard as zscore's zero-variance rule.
    *
    * Scale: two [[quantilesByKey]] passes (each one exchange + per-key
    * sort over (key, value) pairs — the deviation pass re-derives from a
    * broadcast |keys|-row median table, so the corpus shuffles at most
    * twice and never at raw-text width). At 100 TB swap both passes for
    * `approx_percentile` exactly as in [[filterByKeyQuantiles]].
    */
  def madOutliers(
      df: DataFrame,
      key: Column,
      value: Column,
      threshold: Double = 3.5): DataFrame = {
    val med = quantilesByKey(df, key, value, Seq(0.5))
      .select(col("key").as("__mk"), col("value").as("med"))
    val withMed = df.join(broadcast(med), key === col("__mk"))
    val mad = quantilesByKey(withMed, key, abs(value - col("med")), Seq(0.5))
      .select(col("key").as("__dk"), col("value").as("mad"))
    withMed
      .join(broadcast(mad), key === col("__dk"))
      .filter(col("mad") > 0d && abs(value - col("med")) > lit(threshold) * col("mad"))
      .drop("__mk", "__dk")
  }

  /** Per-key winsorization: CLAMP values to the key's type-1
    * [`loP`, `hiP`] quantile band instead of dropping the tails — the
    * variance-taming transform for features/weights where every row must
    * survive (loss weighting, sampling temperatures) but extreme values
    * would dominate. The complement of [[filterByKeyQuantiles]] (which
    * drops); output = input columns + `value_w`.
    *
    * `value_w` is a pure SELECTION (least/greatest of actual data
    * values), so the record is engine-exact with no arithmetic at all.
    * Same plan shape as [[filterByKeyQuantiles]]: bounds at |keys| grain
    * broadcast back, corpus transformed in place, `approx = true` for
    * the sketch-bounds path at 100 TB.
    */
  def winsorizeByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      loP: Double = 0.05,
      hiP: Double = 0.95,
      approx: Boolean = false): DataFrame = {
    require(loP < hiP, "need loP < hiP")
    val qs = (if (approx) approxQuantilesByKey(df, key, value, Seq(loP, hiP))
              else quantilesByKey(df, key, value, Seq(loP, hiP)))
      .groupBy(col("key").as("__qk"))
      .agg(
        max(when(col("p") === loP, col("value"))).as("__lo"),
        max(when(col("p") === hiP, col("value"))).as("__hi"))
    df.join(broadcast(qs), key === col("__qk"))
      .withColumn("value_w", least(greatest(value, col("__lo")), col("__hi")))
      .drop("__qk", "__lo", "__hi")
  }

  /** Per-key inter-arrival gaps: for each key ordered by (ts, tieBreak),
    * the per-key count and the min/max/sum of consecutive event-time
    * gaps in MICROSECONDS — dwell-time / burstiness analytics (bot
    * detection: near-zero min gaps; churn signals: huge max gaps) and
    * the input to session-timeout calibration. Keys with a single event
    * carry n_gaps = 0 and null gap stats.
    *
    * All outputs are exact integers (µs differences of µs longs), so the
    * record hash-matches any engine; mean gap = sum/n is left to the
    * reader to avoid a float column.
    *
    * Scale: ONE exchange on the key + per-key sort (lag window), then a
    * map-side-combinable agg at key grain — the same posture as
    * [[percentRankByKey]]; nothing corpus-wide sorts.
    */
  def interArrivalGaps(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("__us"), col("__tb"))
    df.select(key.as("key"), unix_micros(ts).as("__us"), tieBreak.as("__tb"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"),
        sum(col("__gap")).as("sum_gap_us"))
  }

  /** Top day-over-day movers: the `topN` (key, day) cells with the
    * largest absolute change vs the key's PREVIOUS PRESENT day — the
    * "what jumped yesterday" anomaly shortlist, in exact micro integers.
    * Tie-break (|Δ| desc, key, day) is total, so the shortlist is
    * deterministic; a key's first day has no Δ and never ranks.
    *
    * Scale: corpus → (key, day) aggregate (map-side combined), lag
    * window per key over |days| rows, then TakeOrdered(topN) — no
    * global sort.
    */
  def topMovers(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(topN >= 1, "need topN >= 1")
    val w = Window.partitionBy("key").orderBy("day")
    df.groupBy(key.as("key"), to_date(ts).as("day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("rev_micro"))
      .withColumn("delta_micro", col("rev_micro") - lag(col("rev_micro"), 1).over(w))
      .filter(col("delta_micro").isNotNull)
      .orderBy(abs(col("delta_micro")).desc, col("key").asc, col("day").asc)
      .limit(topN)
  }

  /** Range-partition boundary planner: `k`-way split points for `value`
    * from a deterministic md5 sample — what a range-partitioned write
    * (global sort, z-order sweep) needs BEFORE it runs, computed the way
    * Spark's RangePartitioner does (sample → sort sample → pick
    * boundaries) but reproducibly (hash sample, not random) and as a
    * first-class query. Returns k−1 rows (p, value): the type-1 i/k
    * quantiles of the sample.
    *
    * Scale: the sample is `sampleFrac` of the corpus (scan + filter, no
    * shuffle), the boundary sort runs on the sample only — the classic
    * trade: boundaries are within sampling error of the true quantiles,
    * which range partitioning tolerates by design (it balances, it does
    * not promise exact splits).
    */
  def rangeBounds(
      df: DataFrame,
      id: Column,
      value: Column,
      k: Int,
      sampleFrac: Double = 0.5): DataFrame = {
    require(k >= 2, "need k >= 2")
    val sample = df
      .filter(Sampling.hashUnit(id) < sampleFrac)
      .select(lit(0).as("__k"), value.as("__v"))
    quantilesByKey(sample, col("__k"), col("__v"), (1 until k).map(_.toDouble / k))
      .select(col("p"), col("value"))
  }

  /** Per-key linear trend of the daily value series: the least-squares
    * slope over (epoch-day x, exact micro day-sum y), emitted as the
    * EXACT RATIONAL `slope_num / slope_den` in DECIMAL(38,0)
    * (num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² > 0 for ≥ 2 days) — "is
    * this source/feature growing and how fast" with no float anywhere
    * (integer division semantics differ across engines for negative
    * slopes — truncate vs floor — so the record carries the rational,
    * not a quotient; readers divide at display time). Single-day keys
    * emit null num/den (slope undefined).
    *
    * Scale: corpus aggregates once at (key, day) grain, then one
    * |keys|-grain moment aggregate — DECIMAL(38,0) sums are exact far
    * beyond any real span (y ≤ 1e15 µ, x ≤ 1e5 days ⇒ Σxy ≤ 1e25 ≪
    * 1e38) and order-free, so the record is engine-exact.
    */
  def trendSlopeByKey(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("__day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("__y"))
      .withColumn("__x", datediff(col("__day"), lit("1970-01-01")).cast("long"))
    daily
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("__x").cast(d38)).as("__sx"),
        sum(col("__y").cast(d38)).as("__sy"),
        // cast operands BEFORE the product: long·long would overflow at
        // int64 first; (10,0)·(27,0) → precision 38, exact
        sum((col("__x").cast(DecimalType(10, 0)) * col("__y").cast(DecimalType(27, 0)))
          .cast(d38)).as("__sxy"),
        sum((col("__x").cast(DecimalType(10, 0)) * col("__x").cast(DecimalType(10, 0)))
          .cast(d38)).as("__sxx"))
      .select(
        col("key"),
        col("n_days"),
        // record type is VARCHAR: DECIMAL(38,0) moments exceed 2^53, so any
        // engine that canonicalizes through float64 (or int64) corrupts
        // them — exact integer rendering is the only type-faithful record
        when(col("n_days") >= 2,
          (col("n_days").cast(d38) * col("__sxy") - col("__sx") * col("__sy")).cast(d38)
            .cast("string"))
          .as("slope_num"),
        when(col("n_days") >= 2,
          (col("n_days").cast(d38) * col("__sxx") - col("__sx") * col("__sx")).cast(d38)
            .cast("string"))
          .as("slope_den"))
  }

  /** Population-stability-index drift report: per key, PSI between the
    * value distributions of slice A (`inA` true) and slice B over
    * fixed-width bins — THE standard "did the feature/score distribution
    * move" monitor (rule of thumb: < 0.1 stable, > 0.25 drifted; here in
    * exact micro-units, psi_micro > 250000 ⇒ drifted). Add-1 smoothing
    * over the key's observed bin set keeps every term finite (the LM
    * discipline), and each bin's `(pA−pB)·ln(pA/pB)` term floors to
    * micro-units BEFORE the sum — the engine-exact record pattern of
    * t_unigram_lm/t_entropy. Returns (key, n_bins, psi_micro).
    *
    * Scale: one map-side-combined exchange at (key, bin) grain with BOTH
    * slice counts in one pass (conditional sums — the corpus is scanned
    * once, not once per slice); per-key totals broadcast back onto the
    * |keys|·|bins| frame. Nothing corpus-sized moves twice.
    */
  def psiByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      inA: Column,
      width: Double): DataFrame = {
    require(width > 0, "need width > 0")
    // persisted: the bin-count frame feeds both the totals and the term
    // join — unpersisted, Catalyst would specialize each use into its own
    // corpus scan (the gapFillHourly lesson). |keys|·|bins| rows: the
    // cache is O(output), never O(corpus).
    val counts = df
      .select(key.as("key"), floor(value / width).cast("long").as("bin"), inA.as("__a"))
      .groupBy(col("key"), col("bin"))
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__cb"))
      .persist()
    val totals = counts
      .groupBy(col("key").as("__tk"))
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
        count(lit(1)).as("n_bins"))
    counts
      .join(broadcast(totals), col("key") === col("__tk"))
      .withColumn("__pa",
        (col("__ca") + 1).cast("double") / (col("__na") + col("n_bins")).cast("double"))
      .withColumn("__pb",
        (col("__cb") + 1).cast("double") / (col("__nb") + col("n_bins")).cast("double"))
      .withColumn("__t",
        floor((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")) * 1e6)
          .cast("long"))
      .groupBy(col("key"), col("n_bins"))
      .agg(sum(col("__t")).as("psi_micro"))
      .select(col("key"), col("n_bins"), col("psi_micro"))
  }

  /** Fixed-width histogram per key: `(key, bin, bin_lo, cnt)` with
    * `bin = ⌊value / width⌋` — the distribution view behind filter
    * thresholds and range-partition planning. One map-side-combined
    * exchange at (key, bin) grain; bin arithmetic is one double division
    * + floor, engine-exact.
    */
  def histogram(df: DataFrame, key: Column, value: Column, width: Double): DataFrame = {
    require(width > 0, "need width > 0")
    df.select(key.as("key"), floor(value / width).cast("long").as("bin"))
      .groupBy(col("key"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bin_lo", col("bin") * width)
  }

  /** Per-key daily EWMA control chart with α = 1/2: the drift/anomaly
    * baseline over the daily value series (ingest-volume monitoring,
    * revenue trend smoothing). Emits (key, day, rev_micro, ewma_micro)
    * where `rev_micro` is the EXACT decimal day sum in micro-units and
    * `ewma_micro` the integer recursion
    * `s₁ = v₁; sₜ = (vₜ + sₜ₋₁) >> 1` — integer-floored halving-weight
    * EWMA, so the record is engine-exact (a float EWMA accumulates
    * rounding that diverges across engines; the floor loses < 1 µ-unit
    * per step).
    *
    * Scale: the corpus aggregates ONCE at (key, day) grain (map-side
    * combined); the fold then runs per key over the |days| array inside
    * one more aggregated-grain exchange — a year is 365 elements, so the
    * sequential recursion (inherently order-dependent) costs O(|days|)
    * per key with no corpus-sized sort anywhere.
    */
  def ewmaDaily(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("rev_micro"))
    daily
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("day"), col("rev_micro")))).as("__s"))
      .withColumn(
        "__e",
        aggregate(
          col("__s"),
          array().cast("array<bigint>"),
          (acc, x) =>
            concat(
              acc,
              array(
                when(size(acc) === 0, x.getField("rev_micro"))
                  .otherwise(
                    shiftright(x.getField("rev_micro") + element_at(acc, -1), 1))))))
      .select(col("key"), explode(arrays_zip(col("__s"), col("__e"))).as("__z"))
      .select(
        col("key"),
        col("__z.__s.day").as("day"),
        col("__z.__s.rev_micro").as("rev_micro"),
        col("__z.__e").as("ewma_micro"))
  }

  /** Per-key daily one-sided (upper) CUSUM control chart — the
    * change-point detector next to [[ewmaDaily]]'s smoother and
    * [[psiByKey]]'s distribution drift: `s₀ = 0;
    * sₜ = max(0, sₜ₋₁ + (xₜ − μ − k))`, alarm when `sₜ > h`, where μ is
    * the key's own series mean (the fitted in-control baseline),
    * `k = μ·slackPermille/1000` the slack and `h = μ·hPermille/1000` the
    * decision interval — every quantity an exact integer in micro-units,
    * so the inherently order-dependent recursion is engine-exact (the
    * [[ewmaDaily]] discipline). Division semantics: μ and the permille
    * scalings use integer `div`; on the NON-NEGATIVE daily series this
    * op is for (volumes, revenue), truncation equals the floor division
    * a SQL oracle's `//` computes.
    *
    * Returns (key, day, rev_micro, cusum_micro, alarm).
    *
    * Scale: identical shape to [[ewmaDaily]] — ONE corpus aggregation at
    * (key, day) grain (map-side combined), then the fold runs per key
    * over the |days| array; μ comes from the same array, so no second
    * pass and no broadcast join anywhere.
    */
  def cusumDaily(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      slackPermille: Long = 0L,
      hPermille: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("rev_micro"))
    daily
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("day"), col("rev_micro")))).as("__s"))
      .withColumn("__mu",
        expr("aggregate(__s, 0L, (a, x) -> a + x.rev_micro) div size(__s)"))
      .withColumn("__ref", col("__mu") + expr(s"(__mu * ${slackPermille}L) div 1000L"))
      .withColumn("__h", expr(s"(__mu * ${hPermille}L) div 1000L"))
      .withColumn(
        "__c",
        aggregate(
          col("__s"),
          array().cast("array<bigint>"),
          (acc, x) =>
            concat(
              acc,
              array(greatest(
                lit(0L),
                coalesce(try_element_at(acc, lit(-1)), lit(0L))
                  + x.getField("rev_micro") - col("__ref"))))))
      .select(col("key"), col("__h"),
        explode(arrays_zip(col("__s"), col("__c"))).as("__z"))
      .select(
        col("key"),
        col("__z.__s.day").as("day"),
        col("__z.__s.rev_micro").as("rev_micro"),
        col("__z.__c").as("cusum_micro"),
        (col("__z.__c") > col("__h")).as("alarm"))
  }

  /** Day-of-week seasonal baseline residuals: each day's value minus the
    * key's mean for THAT weekday — the seasonality-aware anomaly view the
    * drift family (EWMA/CUSUM/z-score) lacks: a quiet Sunday is normal,
    * the same volume on a Tuesday is an incident. Weekday ids are
    * engine-neutral `(epoch-day) % 7` (0 = Thursday — an id, not a
    * locale), means use integer `div` (floor ≡ truncation on the
    * non-negative series this is for), everything stays exact micro
    * integers.
    *
    * Returns (key, day, dow, rev_micro, dow_mean_micro, residual_micro).
    *
    * Scale: one (key, day)-grain map-side-combined exchange; the
    * |keys|·7 weekday-mean table broadcasts back onto it. Nothing
    * corpus-sized moves twice.
    */
  def seasonalResiduals(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("rev_micro"))
      .withColumn("dow", pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).cast("long"))
      // the weekday-mean aggregate and the join-back both read this
      // frame (the psiByKey persist discipline); |keys|·|days| rows
      .persist()
    val mu = daily
      .groupBy(col("key").as("__mk"), col("dow").as("__md"))
      .agg(expr("sum(rev_micro) div count(1)").as("dow_mean_micro"))
    daily
      .join(broadcast(mu), col("key") === col("__mk") && col("dow") === col("__md"))
      .select(
        col("key"), col("day"), col("dow"), col("rev_micro"),
        col("dow_mean_micro"),
        (col("rev_micro") - col("dow_mean_micro")).as("residual_micro"))
  }

  /** Exact rational Pearson correlation between every PAIR of keys' daily
    * series — "do clicks and purchases move together?" The record carries
    * the integer moment combination (corr_num, den_a, den_b) with
    * corr = corr_num / √(den_a·den_b): no square root, no float division,
    * so the record is engine-exact where a double `corr()` is not
    * (the [[trendSlopeByKey]] rational discipline). Pairs are ordered
    * key_a < key_b over days BOTH keys have (inner join on day).
    *
    * Scale: the corpus aggregates ONCE at (key, day) grain; the pair
    * stage self-joins the |keys|·|days| AGGREGATED frame on day (hash
    * equi-join, never corpus-sized) and re-aggregates at (key_a, key_b)
    * grain — with k keys and d days that is k²·d/2 join rows, the
    * pair-grain cost any pairwise statistic pays, independent of corpus
    * row count.
    */
  def seriesCorrByKeyPair(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val daily = df
      .groupBy(key.as("key"), to_date(ts).as("day"))
      .agg((sum(value.cast(DecimalType(18, 6))) * lit(1000000)).cast("long").as("y"))
      // persisted: both sides of the pair join read this frame —
      // unpersisted, each side re-scans the corpus (the psiByKey lesson);
      // the cache is |keys|·|days| rows, O(output-grain) not O(corpus)
      .persist()
    val a = daily.select(col("key").as("key_a"), col("day"), col("y").as("__xa"))
    val b = daily.select(col("key").as("key_b"), col("day"), col("y").as("__xb"))
    val d19 = DecimalType(19, 0)
    val d18 = DecimalType(18, 0)
    a.join(b, Seq("day"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("__xa").cast(d38)).as("__sx"),
        sum(col("__xb").cast(d38)).as("__sy"),
        // cast operands BEFORE the product (trendSlopeByKey): long·long
        // would overflow int64 first; (19,0)·(18,0) → precision 38, exact
        // for |x·y| < 1e38 (micro² products of ≤1e13-micro day sums)
        sum((col("__xa").cast(d19) * col("__xb").cast(d18)).cast(d38)).as("__sxy"),
        sum((col("__xa").cast(d19) * col("__xa").cast(d18)).cast(d38)).as("__sxx"),
        sum((col("__xb").cast(d19) * col("__xb").cast(d18)).cast(d38)).as("__syy"))
      .select(
        col("key_a"), col("key_b"), col("n_days"),
        // VARCHAR record for the same reason as [[trendSlopeByKey]]: the
        // moments reach ~1e20 > 2^53, so only exact integer rendering
        // survives every engine's canonicalization type-faithfully
        (col("n_days").cast(d38) * col("__sxy") - col("__sx") * col("__sy"))
          .cast(d38).cast("string").as("corr_num"),
        (col("n_days").cast(d38) * col("__sxx") - col("__sx") * col("__sx"))
          .cast(d38).cast("string").as("den_a"),
        (col("n_days").cast(d38) * col("__syy") - col("__sy") * col("__sy"))
          .cast(d38).cast("string").as("den_b"))
  }

  /** Pareto concentration: per-key totals ranked descending with the
    * RUNNING share of the grand total — "which fraction of keys carries
    * 80 % of the value" (revenue concentration, token-budget planning).
    * The running sum stays DECIMAL (exact at any prefix) and the grand
    * total broadcasts, so `cum_share_micro = ⌊1e6·cum/total⌋` is
    * engine-exact; ranking ties break key-asc.
    *
    * Scale: one aggregated exchange at key grain, then ONE global sort
    * over |keys| rows (keys, not raw rows — fine up to hundreds of
    * millions of keys; range-partitioned sort beyond).
    */
  def paretoShare(df: DataFrame, key: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perKey = df
      .groupBy(key.as("key"))
      .agg(sum(value.cast(DecimalType(18, 6))).as("__rev"))
    val total = perKey.agg(sum(col("__rev")).as("__tot"))
    val w = Window.orderBy(col("__rev").desc, col("key").asc)
    perKey
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum",
        sum(col("__rev")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("key"),
        col("rank"),
        col("__rev").cast("double").as("rev"),
        floor(col("__cum").cast("double") / col("__tot").cast("double") * 1e6)
          .cast("long").as("cum_share_micro"))
  }

  /** Key-skew diagnostic report: the topN heaviest keys with their row
    * counts and corpus share, each row annotated with the global totals
    * (n_rows, n_keys) — the first thing to run before sizing a shuffle
    * on a 100 TB join/agg key (a key with share ≳ 1/shufflePartitions is
    * the one that needs salting or AQE skew splitting; the reference's
    * hand-salting P5/A4 is exactly this diagnosis done blind).
    *
    * Share is `floor(cnt · 1e6 / total)` — an exact integer, so the row
    * hash-matches any engine (no double division in the record).
    *
    * Scale shape: one map-side-combined count exchange at key grain,
    * then a TakeOrdered for the topN (no global sort) and a broadcast of
    * the two scalar totals — nothing corpus-sized moves twice.
    * Tie-break: (cnt desc, key asc), deterministic.
    */
  def keySkewReport(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    require(topN >= 1, "need topN >= 1")
    val counts = df.groupBy(key.cast("string").as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    counts
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
      .crossJoin(broadcast(totals))
      .select(
        col("key"),
        col("cnt"),
        floor(col("cnt") * 1000000L / col("n_rows")).cast("long").as("share_ppm"),
        col("n_rows"),
        col("n_keys"))
  }

  /** Pre-join profile: the one-row diagnostic to read BEFORE shipping a
    * 100 TB join — row/key counts per side, shared-key count, the EXACT
    * join output cardinality (Σ over shared keys of leftCnt·rightCnt —
    * the number a fan-out bug inflates by orders of magnitude), and
    * orphan rows per side (referential-integrity violations for a
    * foreign-key join; expected population for an outer join).
    *
    * Scale: each side aggregates to key grain (map-side combined), then
    * one key-grain full-outer join of the two |keys|-sized count tables
    * — the corpus is scanned once per side and never joined row-level.
    * All outputs exact integers.
    */
  def joinProfile(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column): DataFrame = {
    val l = left.groupBy(leftKey.as("__k")).agg(count(lit(1)).as("__cl"))
    val r = right.groupBy(rightKey.as("__k")).agg(count(lit(1)).as("__cr"))
    l.join(r, Seq("__k"), "full_outer")
      .agg(
        sum(col("__cl")).as("n_left"),
        sum(col("__cr")).as("n_right"),
        count(col("__cl")).as("n_left_keys"),
        count(col("__cr")).as("n_right_keys"),
        count(when(col("__cl").isNotNull && col("__cr").isNotNull, 1)).as("n_shared_keys"),
        coalesce(sum(col("__cl") * col("__cr")), lit(0L)).as("join_rows"),
        coalesce(sum(when(col("__cr").isNull, col("__cl"))), lit(0L)).as("left_orphan_rows"),
        coalesce(sum(when(col("__cl").isNull, col("__cr"))), lit(0L)).as("right_orphan_rows"))
  }

  /** Time-series densification + gap fill: the hourly per-key series with
    * every hour of the observed global span present — missing (key, hour)
    * cells emitted with `rev = 0` and `rev_locf` carried forward from the
    * last observed hour (null until a key's first observation). The
    * dashboard/feature-engineering primitive Flink jobs get "for free"
    * from continuously firing windows and a batch engine must construct.
    *
    * Returns (key, hr, rev, rev_locf); `rev` aggregates in DECIMAL
    * (order-free) before the double cast, so the record is engine-exact.
    *
    * Plan shape: the raw stream aggregates ONCE at (key, hour) grain
    * (map-side combined); the dense grid is |keys| × |hours| built from a
    * broadcast 1-row global [min,max] bound `sequence()`-exploded per key
    * — never a raw-event crossjoin. The left join back to actuals and the
    * LOCF window both run at grid grain, partitioned by key and ordered
    * by hour: partitions are |hours|-sized (≈ 9k rows per key-year), so
    * the window never sees corpus-scale data regardless of input size.
    */
  def gapFillHourly(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // bounds and the key list both derive from `hourly`, not the raw
    // input, and `hourly` is persisted: column pruning would otherwise
    // specialize each of the three uses into its own corpus scan (Catalyst
    // can't exchange-reuse subtrees it has pruned differently). The
    // persisted frame is |keys|·|hours| rows — tiny at ANY corpus scale
    // (it is the fully aggregated series), so the cache is O(output),
    // never O(input), and the corpus is scanned exactly once.
    val hourly = df
      .groupBy(key.as("key"), date_trunc("hour", ts).as("hr"))
      .agg(sum(value.cast(DecimalType(18, 6))).as("__rev"))
      .persist()
    val bounds = hourly.agg(min(col("hr")).as("__h0"), max(col("hr")).as("__h1"))
    val grid = hourly
      .select(col("key")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("key"),
        explode(sequence(col("__h0"), col("__h1"), expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy("key").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq("key", "hr"), "left")
      .select(
        col("key"), col("hr"),
        coalesce(col("__rev"), lit(0)).cast("double").as("rev"),
        last(col("__rev"), ignoreNulls = true).over(w).cast("double").as("rev_locf"))
  }
}
