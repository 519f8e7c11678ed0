package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch formulations of the reference's per-key event-sequence state
  * machines (SURVEY §2.7). The streaming formulations live in
  * [[graft.streaming.StateMachines]]; these window-function versions are
  * the oracle-checkable batch semantics of the same operators.
  *
  * Scale note: every op here is a single hash exchange on the key followed
  * by a per-key sort — the minimal plan for order-dependent per-key logic.
  * `lag` chains stay inside one `WindowExec`, so adding pattern length
  * does not add shuffles.
  */
object Sequences {

  /** SCD Type-2 history build: turn an append-only per-key change log
    * into warehouse-style VALIDITY INTERVALS — each event's row carries
    * `valid_from` = its own timestamp and `valid_to` = the key's next
    * change (null on the current version), so "state of the key at time
    * T" becomes a range predicate instead of an as-of scan. The
    * batch-materialization counterpart of [[graft.ops.Dedup.keepLatest]]
    * (which keeps only the final version) and of the as-of join (which
    * probes the same history point-wise).
    *
    * `tieBreak` must totally order same-timestamp changes (an event/LSN
    * id). One exchange on the key + per-key sort, output = input rows +
    * two columns; nothing corpus-sized moves twice.
    */
  def scdHistory(df: DataFrame, key: Column, ts: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    df.withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
  }

  /** N consecutive matching events per key, all within `maxGapSec` of the
    * first, with no non-matching event in between (a non-match resets the
    * run). Reference C3/C4/C5: consecutive login failures within a bound —
    * `gmall-login-fail/.../app/LoginFailWithState2.java:52-79` (n=2),
    * `LoginFailwithStateCEP.java:48-58` (strict `next` contiguity),
    * `LoginFailwithStateCEP_More.java:46-53` (`times(n).consecutive()`).
    *
    * Emits one row per run-completing event: (key, first_ts, last_ts).
    * `tie` must make the per-key ordering total (unique per key) for
    * deterministic results.
    */
  def consecutiveMatches(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      pred: Column,
      n: Int,
      maxGapSec: Long): DataFrame = {
    require(n >= 2, "a run needs at least 2 events")
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val withFlags = df
      .withColumn("__key", key)
      .withColumn("__ts", ts)
      .withColumn("__m", pred.cast("int"))
    val allMatch = (1 until n)
      .map(i => lag(col("__m"), i).over(w) === 1)
      .foldLeft(col("__m") === 1)(_ && _)
    val firstTs = lag(col("__ts"), n - 1).over(w)
    // exact µs arithmetic (oracle-parity: DuckDB epoch_us)
    val gapUs = unix_micros(col("__ts")) - unix_micros(firstTs)
    withFlags
      .withColumn("__ok", allMatch && gapUs <= maxGapSec * 1000000L)
      .withColumn("__first", firstTs)
      .filter(col("__ok"))
      .select(col("__key").as("key"), col("__first").as("first_ts"), col("__ts").as("last_ts"))
  }

  /** Per-key daily threshold counter — reference C2/A9, the click-fraud
    * blacklist (`gmall-market/.../app/AdClickApp.java:112-168`: ValueState
    * count per (userId,adId), >threshold within one day → warn, state reset
    * at midnight W8). Batch semantics: count matching events per (key, day)
    * and keep groups at/over the threshold.
    */
  def dailyThreshold(
      df: DataFrame,
      key: Column,
      ts: Column,
      pred: Column,
      minCount: Long): DataFrame =
    df.filter(pred)
      .groupBy(key.as("key"), date_trunc("day", ts).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Request→response matching with timeout — reference C6/C7, the order
    * create→pay monitor (`gmall-order-pay/.../app/OrderTimeOutStateApp.java:57-112`:
    * create starts a 15-min event-time timer; pay in time → matched, else
    * timeout side-output; CEP flavor `OrderTimeOutWithCepApp.java:53-76`).
    *
    * Batch semantics: for each request row, the earliest response with the
    * same key in (req_ts, req_ts + timeoutSec] → status 'matched', else
    * 'timeout' (the reference's "No Pay" side output collapses into a
    * status column — the tagged-union encoding of Flink side outputs).
    *
    * Semantics note: this SQL-tractable batch form lets one response
    * satisfy several requests on the same key; the streaming form
    * ([[graft.streaming.StateMachines.matchWithTimeout]]) consumes a
    * response on match — the reference's exact state-machine behavior.
    * With at most one open request per key (the reference's orderId keying)
    * the two coincide.
    *
    * `requests`/`responses` need columns: key, id, ts (pre-projected by the
    * caller). The join is a key-equi join with a range predicate — at scale
    * a plain shuffled hash join on key; the range prunes inside.
    */
  def matchWithTimeout(
      requests: DataFrame,
      responses: DataFrame,
      timeoutSec: Long): DataFrame = {
    val req = requests.select(
      col("key").as("r_key"), col("id").as("req_id"), col("ts").as("req_ts"))
    val resp = responses.select(
      col("key").as("p_key"), col("ts").as("resp_ts"))
    req
      .join(
        resp,
        col("r_key") === col("p_key") &&
          col("resp_ts") > col("req_ts") &&
          unix_micros(col("resp_ts")) <= unix_micros(col("req_ts")) + timeoutSec * 1000000L,
        "left_outer")
      .groupBy(col("r_key").as("key"), col("req_id"), col("req_ts"))
      .agg(min(col("resp_ts")).as("resp_ts"))
      .withColumn("status", when(col("resp_ts").isNotNull, "matched").otherwise("timeout"))
  }

  /** Conversion funnel — the batch CEP companion to [[consecutiveMatches]]
    * for ORDERED multi-step patterns: per key, the greedy earliest chain
    * through `steps` (step i+1 must be strictly after step i, and every
    * step within `windowSec` of step 1). Greedy-earliest over the
    * time-sorted events equals the sequential min-chain (each accepted
    * step is the earliest candidate given the previous one), which is the
    * SQL the oracle runs. Returns one row per key holding ≥ 1 event of
    * ANY step kind: (key, n_reached, ts_first, ts_reached).
    *
    * Shape: filter to step kinds at the scan (corpus prune), ONE hash
    * exchange on the key, then the chain folds inside each key's sorted
    * array — no per-step self-joins (k-step funnels via joins pay k
    * scans + k shuffles and rescan the fact table per step; this pays
    * one of each at any k). Memory is O(step-kind events per key).
    */
  def funnel(
      df: DataFrame,
      key: Column,
      ts: Column,
      kind: Column,
      steps: Seq[String],
      windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepArr = array(steps.map(lit): _*)
    val horizon = lit(windowSec * 1000000L)
    val folded = aggregate(
      array_sort(col("__seq")),
      expr("cast(array() as array<timestamp>)"),
      (acc, e) => {
        val t = e.getField("ts")
        val accepts = size(acc) < steps.size &&
          e.getField("kind") === element_at(stepArr, size(acc) + 1) &&
          (size(acc) === 0 ||
            (unix_micros(t) > unix_micros(element_at(acc, -1)) &&
              unix_micros(t) <= unix_micros(element_at(acc, 1)) + horizon))
        when(accepts, concat(acc, array(t))).otherwise(acc)
      })
    df.select(key.as("key"), struct(ts.as("ts"), kind.as("kind")).as("__e"))
      .filter(col("__e.kind").isin(steps: _*))
      .groupBy(col("key"))
      .agg(collect_list(col("__e")).as("__seq"))
      .withColumn("__chain", folded)
      .select(
        col("key"),
        size(col("__chain")).as("n_reached"),
        // try_: an empty chain (key never reached step 1) is null, not an
        // ANSI index error
        try_element_at(col("__chain"), lit(1)).as("ts_first"),
        try_element_at(col("__chain"), lit(-1)).as("ts_reached"))
  }

  /** Per-key chronological event-sequence construction — building
    * behavioral training sequences from an event log: each key's events
    * sorted by (ts, tiebreak id), truncated to `maxLen` (every real
    * pipeline caps sequence length), serialized as a '|'-joined kind
    * string next to the UNtruncated event count (so downstream can see
    * what the cap dropped).
    *
    * One hash exchange on the key; the sort happens inside the aggregated
    * array (collect_list + array_sort), never as a corpus-wide sort. The
    * struct sort key is (ts, id) — a total order, so the sequence string
    * is deterministic on any engine. Memory is O(events per key) before
    * the cap: for keys that can exceed executor memory, pre-trim with
    * [[Sampling.capPerKey]] (same (ts, id) order) — the composition keeps
    * the exchange count at one.
    */
  def eventSequences(
      df: DataFrame,
      key: Column,
      ts: Column,
      id: Column,
      kind: Column,
      maxLen: Int): DataFrame =
    df.select(
        key.as("key"),
        struct(ts.as("ts"), id.as("id"), kind.as("kind")).as("__e"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"), collect_list(col("__e")).as("__seq"))
      .withColumn(
        "sequence",
        concat_ws(
          "|",
          transform(
            slice(array_sort(col("__seq")), 1, maxLen),
            e => e.getField("kind"))))
      .drop("__seq")
}
