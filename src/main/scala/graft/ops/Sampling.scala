package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * All decisions hash the row's stable key (never `rand()`): re-running
  * the pipeline — or running it on another engine — assigns every row the
  * same way, which is what makes train/eval splits reproducible and
  * leakage-auditable. md5 (bit-specified everywhere) is the hash so
  * external systems can replicate the assignment; per-row, shuffle-free.
  */
object Sampling {

  /** Uniform [0,1) from the first 12 hex chars of md5(key) — 48 bits. */
  def hashUnit(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("double") /
      lit(281474976710656.0d) // 2^48

  /** Deterministic Bernoulli sample: keep rows with hashUnit < fraction. */
  def sample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashUnit(key) < fraction)

  /** Importance-weighted deterministic Bernoulli: keep each row with
    * probability `min(1, prob)` where `prob` is any per-row expression
    * (length- or quality-proportional — the corpus-reweighting
    * primitive: upsample the documents a mixture wants more of). Same
    * md5 decision as [[sample]]: per-row, shuffle-free, and the exact
    * keep-set is reproducible on any engine that can evaluate `prob`.
    */
  def sampleWeighted(df: DataFrame, key: Column, prob: Column): DataFrame =
    df.filter(hashUnit(key) < least(lit(1.0), prob.cast("double")))

  /** Stratified deterministic sample: a per-stratum keep fraction
    * (rebalancing a corpus by language/source/quality tier). `strata` is
    * any string expression; unlisted strata fall back to
    * `defaultFraction`. Same md5 decision as [[sample]] — per-row,
    * shuffle-free, reproducible on any engine.
    */
  def sampleStratified(
      df: DataFrame,
      key: Column,
      strata: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (s, f)) => when(strata === s, f).otherwise(acc)
    }
    df.filter(hashUnit(key) < frac)
  }

  /** Temperature-style mixture rebalancing: keep each row of stratum `s`
    * with probability `min(1, c / sqrt(n_s))`, so a stratum's EXPECTED
    * contribution is `c·sqrt(n_s)` — the square-root smoothing used to
    * rebalance multilingual / multi-source corpora (big sources
    * down-sampled, small sources kept whole once `n_s <= c²`). This is
    * `p_s ∝ n_s^α` mixture sampling at α = 1/2 with the normalizer
    * folded into `c`; α = 1/2 specifically because IEEE `sqrt` is
    * correctly rounded on every engine, so the keep-set (decided by the
    * same md5 unit hash as [[sample]]) reproduces bit-exactly where a
    * `pow(n, α)` would be library-dependent.
    *
    * Scale: the stratum-count aggregate is one partial-agg scan whose
    * output is |strata| rows, broadcast back — no shuffle of `df` itself.
    */
  def sampleSqrtSmoothed(df: DataFrame, key: Column, strata: Column, c: Double): DataFrame = {
    val counts = df.groupBy(strata.as("__stratum")).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), strata === col("__stratum"))
      .filter(hashUnit(key) < least(lit(1.0), lit(c) / sqrt(col("__n").cast("double"))))
      .drop("__stratum", "__n")
  }

  /** Deterministic global shuffle — a reproducible random training order
    * per epoch (`seed` = epoch). Sorting by `md5(seed-key)` is a
    * range-partitioned distributed sort: Spark samples the key space so
    * output partitions stay balanced at any corpus size; there is no
    * single-partition stage. The md5 key makes the permutation
    * engine-portable: any system can recompute the same order.
    */
  def shuffle(df: DataFrame, key: Column, seed: Long = 0L): DataFrame = {
    val k = shuffleKey(key, seed)
    df.orderBy(k, key) // key tiebreak: total order even on md5 collision
  }

  /** The sort key [[shuffle]] orders by, exposed for cross-engine checks:
    * `md5('<seed>-' || key)`.
    */
  def shuffleKey(key: Column, seed: Long = 0L): Column =
    md5(concat(lit(s"$seed-"), key.cast("string")))

  /** Distributed form of [[shuffle]] for epoch ordering at scale: rows
    * land in `nShards` shards by their shuffle key's leading 48 hash bits
    * and are ranked within the shard — (shard, pos) read in shard order
    * is a deterministic global permutation, reproducible on any engine.
    * The plan is ONE hash exchange + a per-shard sort; [[shuffle]]'s
    * global `orderBy` is a range sort whose final order lives in however
    * many output partitions Spark chose, with no addressable position. A
    * training job sizes `nShards` to its reader parallelism (thousands at
    * 100 TB) and streams shard files in index order.
    */
  def shardedShuffle(
      df: DataFrame, key: Column, nShards: Int = 32, seed: Long = 0L): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__sk"), col("__kt"))
    df.withColumn("__sk", shuffleKey(key, seed))
      .withColumn("__kt", key.cast("string"))
      .withColumn(
        "shard",
        pmod(conv(substring(col("__sk"), 1, 12), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__sk", "__kt")
  }

  /** Cap each key's contribution at `n` rows (e.g. at most n docs per
    * domain — source-balance capping). Deterministic: rows are ranked by
    * `order` (include a unique tiebreaker). A thin alias over
    * [[TopN.perPartition]] — same WindowGroupLimit-pruned plan.
    */
  def capPerKey(df: DataFrame, key: Column, order: Seq[Column], n: Int): DataFrame =
    TopN.perPartition(df, Seq(key), order, n).drop("rank")

  /** Token-budget quota sampling — the corpus-MIXING primitive: keep each
    * key's (source's) documents, in deterministic md5-hash order, until
    * the key's token budget is exhausted (a doc is kept iff its FIRST
    * token fits, so one doc may straddle the budget line — block-packing
    * boundary semantics, same rule as [[Chunking.packByBudget]]).
    * Feeding per-source budgets proportional to a target mix turns a
    * raw crawl into a mixture-weighted corpus reproducibly: re-runs and
    * other engines keep exactly the same documents.
    *
    * Plan shape: one hash exchange on the key, a per-key running sum
    * window, a filter — no global order, parallelism = #keys (shard
    * within a giant source by salting the key upstream if one source
    * dominates).
    */
  def capTokensPerKey(
      df: DataFrame,
      key: Column,
      id: Column,
      tokenCount: Column,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "need a positive token budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy(col("__h"), col("__id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__k", key)
      .withColumn("__id", id)
      .withColumn("__h", md5(id.cast("string")))
      .withColumn("__tok", tokenCount.cast("long"))
      .withColumn("__cum", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .filter(col("__cum") < budgetTokens)
      .drop("__k", "__id", "__h", "__tok", "__cum")
  }

  /** Mixture-allocation plan: given per-source available token counts, a
    * token `budget`, and target mixture weights in exact micro-units,
    * the per-source sampling plan — target tokens, what is actually
    * attainable (capped at availability), and the Bernoulli keep
    * fraction to feed [[sample]]/[[capTokensPerKey]]. The corpus-mixing
    * planner (e.g. "30 % web, 40 % code, 30 % books of a 1 T-token
    * budget") as one engine query; all integer division, engine-exact.
    *
    * Returns (key, avail_tokens, target_tokens, alloc_tokens,
    * keep_frac_micro); sources absent from `targetsMicro` get target 0,
    * targets without corpus rows are absent (they have no avail row —
    * surface them by full-outer-joining the plan with the target list if
    * needed).
    *
    * Scale: one map-side-combined aggregate to |sources| rows, then a
    * broadcast join against the constant target list — nothing else
    * moves.
    */
  def mixtureAllocation(
      df: DataFrame,
      key: Column,
      tokenCount: Column,
      targetsMicro: Seq[(String, Long)],
      budget: Long): DataFrame = {
    require(budget > 0 && targetsMicro.nonEmpty, "need budget > 0 and targets")
    require(targetsMicro.map(_._2).sum <= 1000000L, "target weights exceed 1")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetsMicro.toDF("__tk", "__wMicro")
    df.groupBy(key.cast("string").as("key"))
      .agg(sum(tokenCount.cast("long")).as("avail_tokens"))
      .join(broadcast(targets), col("key") === col("__tk"), "left")
      .withColumn("target_tokens",
        expr(s"coalesce(__wMicro, 0L) * ${budget}L div 1000000L"))
      .withColumn("alloc_tokens", least(col("target_tokens"), col("avail_tokens")))
      .withColumn("keep_frac_micro",
        expr("alloc_tokens * 1000000L div avail_tokens"))
      .select(col("key"), col("avail_tokens"), col("target_tokens"),
        col("alloc_tokens"), col("keep_frac_micro"))
  }

  /** Deterministic negative sampling for contrastive training: `k`
    * pseudo-random OTHER rows per anchor, from the md5 hash ring — the
    * (anchor, negative) pair generator behind contrastive embedding /
    * reranker training. Each anchor's j-th negative is the row at rank
    * `(r + 1 + (h(id,j) mod (N−1))) mod N` — the +1/mod(N−1) offset
    * guarantees negative ≠ anchor, md5 makes the draw reproducible and
    * engine-portable. Returns (doc_id, j, neg_id).
    *
    * Scale: ranks come from [[Ranks.zeroBasedRank]]'s two-phase rank
    * (equi-depth bucket + literal offsets + per-bucket row_number) — no
    * single-partition window anywhere; the only corpus-width exchange is
    * the bucket hash partitioning, parallel across all buckets (reuse a
    * persisted rank table across epochs/variants at 100 TB; with dense
    * ids skip it entirely). The probe is then a rank-grain equi-join, and
    * uniformity of the hash ring needs no global shuffle of the data
    * itself. The rank frame persists: it is consumed twice (anchor ranks
    * + the negative-id probe side).
    */
  def negativeSamples(df: DataFrame, id: Column, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val ranked = Ranks
      .zeroBasedRank(df.select(id.as("doc_id")), col("doc_id"), "__r")
      .persist()
    val tot = ranked.agg(count(lit(1)).as("__n"))
    ranked
      .crossJoin(broadcast(tot))
      // a 0/1-row corpus has no possible negative (and n-1 would be a
      // zero modulus under ANSI): emit nothing rather than erroring
      .filter(col("__n") > 1)
      .select(col("doc_id"), col("__r"), col("__n"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__h",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("_"), col("j"))), 1, 12),
          16, 10).cast("long"))
      .withColumn("__nr",
        pmod(col("__r") + 1 + pmod(col("__h"), col("__n") - 1), col("__n")))
      .join(
        ranked.select(col("__r").as("__nr"), col("doc_id").as("neg_id")),
        Seq("__nr"))
      .select(col("doc_id"), col("j").cast("long").as("j"), col("neg_id"))
  }

  /** Deterministic split label over cumulative weight buckets, e.g.
    * `split(df, $"doc_id", Seq("train" -> 0.9, "eval" -> 0.1))`.
    */
  def split(df: DataFrame, key: Column, buckets: Seq[(String, Double)]): DataFrame = {
    val total = buckets.map(_._2).sum
    val cuts = buckets.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = hashUnit(key)
    val label = buckets.map(_._1).zip(cuts).reverse
      .foldLeft(lit(buckets.last._1)) { case (acc, (name, cut)) =>
        when(u < cut, name).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Leakage-SAFE split: the unit of assignment is a GROUP (a near-dup
    * cluster, a source domain, a user), not the row — every member
    * inherits its group key's md5 split decision, so correlated rows can
    * never straddle the train/eval boundary. This is the constructive
    * complement to the p_split_leakage AUDIT: a per-row split leaks
    * whenever near-duplicates hash to different sides; splitting on the
    * cluster label leaks zero BY CONSTRUCTION (and the audit then
    * verifies the empty set).
    *
    * `groups` is an (id, group label) frame — [[graft.ops.Dedup]]'s
    * `connectedComponents` output, typically. Rows absent from it form
    * singleton groups keyed by their own id (pair generators only emit
    * docs that HAVE a near-dup). Plan: one left equi-join (the label
    * table is cluster-count-sized; AQE broadcasts it when small) and the
    * same per-row md5 bucketing as [[split]] — no new shuffle grain.
    */
  def splitByGroup(
      df: DataFrame,
      id: Column,
      groups: DataFrame,
      idCol: String,
      groupCol: String,
      buckets: Seq[(String, Double)]): DataFrame =
    split(
      df.join(
          groups.select(col(idCol).as("__gid"), col(groupCol).as("__grp")),
          id === col("__gid"), "left_outer")
        .drop("__gid"),
      coalesce(col("__grp"), id),
      buckets)
      .drop("__grp")

  /** Per-group integrity manifest: (group, n_rows, total_weight,
    * ids_md5) where `ids_md5` digests the NUMERICALLY-sorted id list —
    * the dataset-card / reproducibility artifact: two corpus builds (or
    * two engines) produced the same membership iff the digests match,
    * without shipping or diffing the ids themselves. Complements
    * p_corpus_report's statistics with set-identity.
    *
    * Scale: one map-side-combined aggregate at group grain; the digest
    * runs over each group's collected id array. At groups whose
    * membership exceeds a task's memory, digest fold-sized sub-groups
    * ([[kfold]]) and treat the manifest of fold digests as the identity
    * — same guarantee, bounded rows.
    */
  def groupManifest(df: DataFrame, group: Column, id: Column, weight: Column): DataFrame =
    df.groupBy(group.as("group"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(weight).as("total_weight"),
        // sort as LONGS first (lexical string order would diverge from
        // any SQL oracle's ORDER BY id), then render
        md5(concat_ws(",",
          sort_array(collect_list(id.cast("long"))).cast("array<string>")))
          .as("ids_md5"))

  /** Deterministic k-fold assignment: `fold = md5-48-bit(key) mod k` —
    * the cross-validation companion of [[split]]: every engine and every
    * run derives the SAME fold for a given id, so CV training jobs,
    * eval harnesses, and the decontamination audit all agree on fold
    * membership without a materialized assignment table (though the
    * assignment IS trivially materializable — it's one projection).
    * Integer mod of the 48-bit hash: folds are exchangeable and
    * balanced to binomial noise. Per-row, shuffle-free.
    */
  def kfold(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, "need k >= 2 folds")
    df.withColumn("fold",
      pmod(conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long"),
        lit(k.toLong)))
  }
}
