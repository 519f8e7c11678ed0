package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale properties the engine depends
  * on (pushdown, broadcast placement, partial aggregation, windowed top-N
  * pruning) must survive refactors. These read `executedPlan`, not timings —
  * deterministic at any scale factor.
  */
class PlanQualitySpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df: DataFrame = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("filter and column pruning reach the parquet scan (q_pv_hourly)") {
    val p = plan("q_pv_hourly")
    assert(p.contains("EqualTo(event_type,view)") && p.contains("PushedFilters"),
      s"filter not pushed:\n$p")
    // only the needed 2 of 6 columns are read. The ts physical type is
    // whatever the testdata generation produced (bigint under the nanos
    // layout, timestamp/timestamp_ntz under micros — see Tables.events);
    // the pin is the COLUMN SET, not the layout.
    assert(
      "ReadSchema: struct<ts:(bigint|timestamp(_ntz)?),event_type:string>".r
        .findFirstIn(p).isDefined, p)
  }

  test("gopher filter reads only (doc_id, text); t_normalize and e_truncate shuffle nothing") {
    val p = plan("p_gopher_filter")
    assert(
      "ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(p).isDefined,
      s"per-row filter must prune to the two needed columns:\n$p")
    for (q <- Seq("t_normalize", "e_truncate", "t_entropy")) {
      val pq = plan(q)
      assert(!pq.contains("Exchange"),
        s"$q is a pure projection — any exchange is a regression:\n$pq")
    }
  }

  test("naive bayes: term/prior tables broadcast; corpus shuffles only at token grain") {
    val p = plan("t_nb_classify")
    assert(p.contains("BroadcastHashJoin"), s"term table must broadcast:\n$p")
    // the corpus-side exchanges: tf agg, ltc agg (+ their reuse); the score
    // join must NOT add a corpus-side exchange beyond the aggregates
    assert(!p.contains("SortMergeJoin"), s"no corpus-vs-corpus sort-merge join:\n$p")
  }

  test("winnowing: gram window and min window share one doc_id exchange") {
    val p = plan("d_winnow")
    val n = "(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(n == 1, s"expected exactly one doc_id exchange (windows must share it):\n$p")
  }

  test("saltedJoin: shuffled hash join keyed on (key, salt), no broadcast") {
    val p = plan("q_salted_join")
    assert(p.contains("ShuffledHashJoin"), s"salted join must shuffle:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"broadcast defeats the salting:\n$p")
    assert(p.contains("__salt"), s"join keys must include the salt column:\n$p")
  }

  test("q5 keeps the fact table unshuffled: dims broadcast, one agg exchange") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, p)
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle exchange (final agg):\n$p")
  }

  test("q_min_cost_supplier: part slice broadcast into the fact scan, rank-1 pruned pre-shuffle") {
    val p = plan("q_min_cost_supplier")
    // part/supplier/nation all broadcast — the fact side never shuffles
    // for a dimension
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    // the per-part argmin must plan WindowGroupLimit so each map task
    // keeps only its local top-1 BEFORE the exchange
    assert(p.contains("WindowGroupLimit"),
      s"rank<=1 must prune per-map-task before the shuffle:\n$p")
    // two shuffles by design: the (part,supplier) aggregate and the
    // per-part rank partition
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected agg + rank exchanges only:\n$p")
  }

  test("q_nation_flows: one fact-fact shuffle pair, every dimension broadcast") {
    val p = plan("q_nation_flows")
    // supplier+nation and customer+nation collapse into broadcast builds
    // (nation broadcasts into each, each result broadcasts onto the fact
    // join): >= 4 broadcast joins, and no dimension ever shuffles. At
    // sf0.001 stats let even ORDERS broadcast (5th BHJ, zero join
    // exchanges — the stats-adaptive ideal); at scale the orderkey join
    // becomes the one shuffle pair. Pin the invariant, not the flavor:
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"at most the orderkey pair + final agg may shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no dimension may fall back to a sort-merge join at this scale:\n$p")
  }

  test("rollup is one Expand + one partial-final agg pair, not a pass per level") {
    val p = plan("q_rollup_revenue")
    assert("Expand".r.findAllIn(p).size == 1,
      s"rollup must plan exactly one Expand (3 grouping sets in one scan):\n$p")
    // three exchanges by design: the order-grain pre-aggregation of
    // lineitem, the (region, nation)-grain pre-aggregation (round 14 —
    // so the Expand triples 25 dim-grain rows, never order-grain rows),
    // and the grouping-set agg itself
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 3,
      s"expected exactly three shuffle exchanges (order pre-agg + dim-grain pre-agg + grouping-set agg):\n$p")
    // the dim-grain pre-agg must survive into the final plan (not be
    // optimized away): the Expand consumes nat_rev/nat_items partials
    assert(p.contains("nat_rev"),
      s"Expand must consume the (region, nation)-grain pre-aggregate:\n$p")
  }

  test("pivot with pinned values: map-side partials, no Expand, no distinct-scan job") {
    val p = plan("q_pivot_daily")
    assert(!p.contains("Expand"), s"pinned-value pivot must not Expand:\n$p")
    // PivotFirst path: count pre-combines at (day,type) grain BEFORE its
    // exchange, then the pivot agg runs on day-grain rows only — both
    // exchanges carry aggregated rows, never event-grain data
    assert(p.contains("partial_count"), s"count must pre-combine map-side:\n$p")
    assert(p.contains("partial_pivotfirst"), s"pivot agg must pre-combine too:\n$p")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly the two post-aggregation exchanges:\n$p")
  }

  test("sqrt-smoothed mixture broadcasts the stratum counts: corpus never shuffles") {
    val p = plan("p_mixture_sqrt")
    assert(p.contains("BroadcastHashJoin"), s"stratum counts must broadcast:\n$p")
    assert(!"(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning.*doc_id".r.findAllIn(p).hasNext,
      s"document corpus must not shuffle:\n$p")
  }

  test("semi/anti joins: hash joins on the key with the priority filter pushed down") {
    val anti = plan("q_anti_join")
    val semi = plan("q_semi_join")
    assert(anti.contains("LeftAnti") && semi.contains("LeftSemi"), s"$anti\n$semi")
    for (p <- Seq(anti, semi)) {
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"membership join must stay a hash/merge join:\n$p")
      assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
        s"priority filter must reach the orders scan:\n$p")
    }
  }

  test("funnel: step filter pushed to the scan, one exchange at any depth") {
    val p = plan("q_funnel")
    assert(p.contains("PushedFilters") && p.contains("In(event_type"),
      s"step-kind prune must reach the parquet scan:\n$p")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"the chain folds inside the per-key array — exactly one exchange:\n$p")
  }

  test("retention: two exchanges — per-user day set, then the cohort matrix") {
    val p = plan("q_retention")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"collect_set carries the day set through ONE user exchange:\n$p")
  }

  test("eventSequences: one exchange; the sort lives inside the aggregated array") {
    val p = plan("t_user_sequences")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Sort ["), s"no corpus-wide or per-key WindowExec sort:\n$p")
  }

  test("windowed counts pre-aggregate before the shuffle (q_hot_items)") {
    val p = plan("q_hot_items")
    // map-side combine: a partial count below the agg exchange
    assert(p.contains("functions=[partial_count(1)]"), s"no map-side combine:\n$p")
    // rank<=N pruned on BOTH sides of the rank shuffle (Partial+Final)
    assert(p.contains("row_number(), 5, Partial") && p.contains("row_number(), 5, Final"), p)
  }

  test("q_hot_items keeps the pane shape: no event-grain window Expand") {
    // the pane formulation's whole point: events aggregate once per 5m pane
    // (tumbling), then panes explode 12x — never a 12-way Expand of raw
    // events before the first aggregate (what slidingCount would plan)
    val p = plan("q_hot_items")
    assert(!p.contains("Expand"), s"event-grain window expand crept back in:\n$p")
    // the pane->window explode (Generate) must sit ABOVE the first
    // (partial) aggregate, i.e. appear before it in the top-down print
    assert(p.indexOf("Generate explode") >= 0, p)
    assert(p.indexOf("Generate explode") < p.lastIndexOf("partial_count"), p)
  }

  test("asOfJoin is a single-pass merge scan: no join operator in the plan") {
    // the whole point of the union+window formulation: the point-in-time
    // lookup costs ONE sort per key partition, not a range join
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), s"asOfJoin must not plan a join:\n$p")
    // one exchange for the as-of window itself; the click pre-collapse
    // (groupBy user,ts) reuses that hash partitioning or adds its own —
    // allow at most 2, never a per-probe rescan
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("unigram LM scores from one corpus scan: tf aggregate reused at runtime") {
    val df = SparkEntry.queries("t_unigram_lm")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // vocab totals derive from the tf aggregate; since round 14 tf is
    // persisted within-query (its consumers prune different columns, so
    // AQE exchange reuse could not always fire) — runtime reuse shows as
    // InMemoryTableScan; ReusedExchange stays acceptable
    assert(p.contains("InMemoryTableScan") || p.contains("ReusedExchange"),
      s"tf aggregate recomputed:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    spark.catalog.clearCache()
  }

  test("int8 quantization is a pure projection: no exchange") {
    val p = plan("e_quantize_int8")
    assert(!p.contains("Exchange"), s"projection-only op shuffled:\n$p")
  }

  test("substring-dedup stats never emit pairs: equi-joins on hashes only") {
    val p = plan("d_substring_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // doc_id window, shingle-hash agg, join back, final agg — bounded exchanges
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4, p)
  }

  test("sessionization is one exchange on the grouping keys") {
    val p = plan("q_sessions")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("SessionWindow") || p.contains("session_window"), p)
  }

  test("deterministic sampling stays a scan + filter (no shuffle)") {
    val p = plan("p_sample")
    assert(!p.contains("Exchange"), p)
  }

  test("chunking is scan + generate: no shuffle at any width") {
    val p = plan("d_chunk")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate explode"), p) // per-row chunk starts, not a join
  }

  test("packing is exactly one exchange, on the shard key") {
    val p = plan("p_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(shard"), s"window not partitioned by shard:\n$p")
  }

  test("greedy packing is one hash exchange, never a global sort") {
    val p = plan("p_pack_greedy")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange rangepartitioning"), s"global sort leaked in:\n$p")
  }

  test("stratified sampling stays a scan + filter (no shuffle)") {
    val p = plan("p_sample_stratified")
    assert(!p.contains("Exchange"), p)
  }

  test("interval join is an equi-join on the key, not a cross product") {
    val p = plan("q_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ngram dedup joins on hashed long keys, not shingle strings") {
    val p = plan("d_dedup_ngram")
    assert(!p.contains("Sort [s#"), "") // cheap sanity: key is the hashed col
    assert(p.contains("xxhash64"), p)
  }

  test("image-header metadata is a pure projection: no exchange, codegen'd parse") {
    val p = plan("m_image_meta")
    assert(!p.contains("Exchange"), p)
    // the native expression, not a UDF
    assert(p.contains("image_meta") && !p.toLowerCase.contains("batchevalpython"), p)
  }

  test("audio-header metadata is a pure projection: no exchange, codegen'd parse") {
    val p = plan("m_audio_meta")
    assert(!p.contains("Exchange"), p)
    // the native expression, not a UDF
    assert(p.contains("audio_meta") && !p.toLowerCase.contains("batchevalpython"), p)
  }

  test("video-header metadata is a pure projection: no exchange, codegen'd parse") {
    val p = plan("m_video_meta")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("video_meta") && !p.toLowerCase.contains("batchevalpython"), p)
  }

  test("vocab signals: two pre-combined aggregates, no corpus window sort") {
    val p = plan("t_vocab")
    // top-token election is a min_by aggregate, never a per-doc window sort
    assert(!p.contains("Window"), s"window sort crept into vocabSignals:\n$p")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly two shuffles ((doc,token) agg + doc agg):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("enrichment join broadcasts the dimension; fact stream never pre-shuffles") {
    val p = plan("q_enrich")
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast:\n$p")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle (final agg):\n$p")
  }

  test("epoch shuffle is one shard exchange + local rank, never a global sort") {
    val p = plan("p_shuffle")
    assert("(?m)^\\s*\\+?-?\\s*Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange (on shard):\n$p")
    assert(!p.contains("rangepartitioning"), s"global range sort crept in:\n$p")
  }

  test("frame sampling is scan + generate: no shuffle") {
    val p = plan("m_frames")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("langid model: profile table broadcasts into the vote join") {
    val p = plan("t_langid_model")
    // the langs×50 profile must broadcast — a shuffled vote join would
    // move every (doc, trigram) row by trigram
    assert(p.contains("BroadcastHashJoin"), s"profile not broadcast:\n$p")
  }

  test("capPerKey prunes to n per key on both sides of the rank shuffle") {
    val p = plan("p_cap_per_key")
    assert(p.contains("row_number(), 20, Partial") && p.contains("row_number(), 20, Final"),
      s"WindowGroupLimit pruning missing:\n$p")
  }

  test("bloom join: fact side filters through codegen'd might_contain before any join") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"),
      s"bloom prune missing from the fact scan:\n$p")
  }

  test("bloom decontamination: train explode prunes through might_contain before any join") {
    val p = plan("d_decontaminate_bloom")
    assert(p.contains("might_contain"),
      s"bloom prune missing from the train side:\n$p")
    // the denominator counts come from map-side-combined aggregates
    // (partial_count), not the anchor's count-over-window — shingling's
    // own lead() windows run per doc BEFORE the explode and are fine
    assert(p.contains("partial_count"),
      s"per-doc counts must pre-combine map-side:\n$p")
    assert(!"windowexec \\[count".r.findAllIn(p.toLowerCase).hasNext &&
      !"window \\[count".r.findAllIn(p.toLowerCase).hasNext,
      s"per-doc counts must not plan a count-over-window on the explode:\n$p")
  }

  test("hard-decon bloom twin: train 13-gram explode prunes through might_contain") {
    val p = plan("d_decontaminate_hard13_bloom")
    assert(p.contains("might_contain"),
      s"bloom prune missing from the train side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the collision join must stay a hash equi-join:\n$p")
  }

  test("chunk dedup accounting: no window sort on the chunk fingerprint") {
    // A boilerplate chunk duplicated across the corpus must never land
    // its whole copy set in one task: the owner election has to be a
    // map-side-combined aggregate (partial min per task), not a
    // row_number/min over Window.partitionBy(fp).
    val p = plan("d_chunk_dedup")
    assert(!p.contains("Window ["), s"fingerprint-grain window sort crept back:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"owner election must partial-aggregate before the fp exchange:\n$p")
  }

  test("ingest verdict labeling: keeper election is a partial aggregate, not a window") {
    for (q <- Seq("p_ingest_stream", "p_ingest_decon_stream")) {
      val p = plan(q)
      assert(!p.contains("Window ["),
        s"$q: keeper-per-fingerprint must not plan a window sort on fp:\n$p")
    }
  }

  test("latest snapshot: WindowGroupLimit prunes per-key history before the exchange") {
    val p = plan("q_latest_snapshot")
    assert(p.contains("WindowGroupLimit"),
      s"keep-latest must plan a group-limit, not a full per-key sort:\n$p")
  }

  test("psi: the corpus scans once — totals and terms reuse the persisted bin counts") {
    // the raw plan string expands InMemoryRelation internals (which
    // re-print the cached FileScan), so the pin is cache USE, not a
    // scan count: both consumers must read the persisted bin counts
    val df = SparkEntry.queries("q_psi")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2,
      s"totals and term join must both reuse the persisted bin counts:\n$p")
  }

  test("trend slope: aggregated exchanges only, no corpus-wide window or sort") {
    val p = plan("q_trend_slope")
    assert(!p.contains("WindowExec") && !p.toLowerCase.contains("sortmergejoin"),
      s"moment sums must stay pure aggregates:\n$p")
  }

  test("scd2 history: one key exchange, the lead window sorts within partitions") {
    val p = plan("q_scd2")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"scd2 is one exchange on the key:\n$p")
  }

  test("containment pairs join on hashed long shingles, not strings") {
    val p = plan("d_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"containment must stay an equi-join:\n$p")
  }

  test("blocked containment: rarest-prefix probe side, smaller-set join condition") {
    val p = plan("d_containment_blocked")
    // the probe side must be the row_number prefix rank (rarest shingles
    // first) — without it the candidate join degenerates to full × full
    assert(p.contains("row_number()") && p.contains("__rn"),
      s"prefix rank missing from the probe side:\n$p")
    // the candidate join must enforce probe = smaller (n_sh, doc_id) side
    assert(p.contains("n_sh"), s"smaller-side condition missing:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocked containment must stay an equi-join:\n$p")
  }

  test("q10: R-filter pushed to the fact scan, nation broadcast, take-ordered top-20") {
    val p = plan("q10_returned_revenue")
    assert(p.contains("EqualTo(l_returnflag,R)") && p.contains("PushedFilters"),
      s"returnflag filter must reach the scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation must broadcast:\n$p")
  }

  test("q12: orders projected to 2 columns before the fact-fact join, one agg pair") {
    val p = plan("q12_priority_shipping")
    // the orders scan must read only the join key + priority — a wider
    // read means the projection didn't push past the join
    assert(
      "ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>".r.findFirstIn(p).isDefined,
      s"orders side must prune to (o_orderkey, o_orderpriority):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q6: every predicate pushed to the scan, 4-column read, no exchange but the 1-row agg") {
    val df = SparkEntry.queries("q6_banded_revenue")(spark, dir)
    val exec = df.queryExecution.executedPlan
    // plan.toString truncates long PushedFilters lists — read the scan
    // node's metadata directly so every pushed predicate is visible
    val pushed = collectLeaves(exec).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString("\n")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(pushed.contains(f), s"$f must push to the scan:\n$pushed")
    val p = exec.toString
    assert(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp".r
        .findFirstIn(p).isDefined,
      s"scan must prune to the 4 needed columns:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("q14: part broadcasts into the fact scan; ship-month bounds pushed") {
    val p = plan("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      s"ship-month bounds must reach the fact scan:\n$p")
    assert(
      "ReadSchema: struct<p_partkey:bigint,p_type:string>".r.findFirstIn(p).isDefined,
      s"part side must prune to (p_partkey, p_type):\n$p")
  }

  test("q18: HAVING collapses fact grain before any join; top-100 take-ordered") {
    val p = plan("q18_large_orders")
    // the quantity rollup must partial-aggregate (map-side combine) —
    // at 100 TB the order-grain collapse is what keeps the join small
    assert(p.contains("partial_sum(l_quantity"),
      s"per-order quantity sum must have a partial phase:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
    // lineitem reads exactly its 2 needed columns
    assert(
      "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>".r.findFirstIn(p).isDefined,
      s"fact scan must prune to (l_orderkey, l_quantity):\n$p")
  }

  test("q19: bracket union prunes the part build side; disjunction stays in one codegen stage") {
    val p = plan("q19_bracket_revenue")
    assert(p.contains("BroadcastHashJoin"), s"bracket parts must broadcast:\n$p")
    // the part-side union-of-brackets must reach the part scan as an Or
    // pushdown (brand/size only — the quantity half is join-dependent)
    assert(p.contains("Or(And(EqualTo(p_brand,Brand#12)"),
      s"part bracket disjunction must push to the part scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q4: correlated EXISTS plans as one left-semi join; order window pushed; 2-column fact read") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS must decorrelate to a semi join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") || p.contains("o_orderdate"),
      s"order-date window must reach the orders scan:\n$p")
    assert(
      "ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp".r.findFirstIn(p).isDefined,
      s"lineitem must prune to (l_orderkey, l_shipdate):\n$p")
  }

  test("q17: per-part average pre-aggregates (partial phase); brand slice broadcasts") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("partial_sum(l_quantity") || p.contains("partial_avg"),
      s"per-part average must map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"brand slice must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21: double correlation decorrelates to one order-grain aggregate; top-50 take-ordered") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("TakeOrderedAndProject"), s"top-50 must not global-sort:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the supplier dim broadcasts onto the culprit aggregate
    assert(p.contains("BroadcastHashJoin"), s"supplier must broadcast:\n$p")
    // round 14: the fact stream collapses to (order, supplier) grain once
    // — no count_distinct Expand, and the persisted pair frame serves
    // both consumers (culprit filter + order-grain aggregate)
    assert(!p.contains("Expand"),
      s"pair-grain collapse must not plan a distinct Expand:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the (order, supplier) pair frame must be computed once and reused:\n$p")
    spark.catalog.clearCache()
  }

  test("q8: every dimension broadcasts; the share is one agg exchange over the pruned fact") {
    val p = plan("q8_market_share")
    // part slice, customer(region-filtered), supplier→nation all
    // broadcast; at sf0.001 stats may broadcast orders too. The fact
    // table never shuffles for a dimension.
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"at most the orderkey pair + the year agg may shuffle:\n$p")
  }

  test("q9: full-range profit join keeps dims broadcast and sums both measures in one agg") {
    val p = plan("q9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // revenue and cost are two partial sums of ONE aggregate — a second
    // agg pass over the join tree would double the fact work
    assert("partial_sum".r.findAllIn(p).size >= 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q11: the nation total broadcasts through a 1-row cross join; grouped scan reused") {
    val df = SparkEntry.queries("q11_important_parts")(spark, dir)
    df.collect() // finalize AQE: exchange reuse is a runtime rule
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"),
      s"the 1-row total must broadcast-cross onto the per-part rows:\n$p")
    // the per-part aggregate feeds both the HAVING side and its own
    // global total: one exchange, reused — never two scans
    assert(p.contains("ReusedExchange") ||
      "Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"per-part aggregate not reused for the global total:\n$p")
  }

  test("q13: zero-order customers survive — the exclusion stays on the join's orders side") {
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"the outer join must survive planning (a WHERE would drop no-match rows):\n$p")
    assert(p.contains("partial_count"), s"both aggregates must pre-combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q15: the max joins back as a broadcast equi-join; the revenue view is scanned once") {
    val df = SparkEntry.queries("q15_top_supplier")(spark, dir)
    df.collect() // finalize AQE: exchange reuse is a runtime rule
    val p = df.queryExecution.executedPlan.toString
    // Catalyst converts crossJoin + (total_revenue === max) into a
    // broadcast HASH join keyed on the normalized double — strictly
    // better than the nested-loop cross q22's inequality needs
    assert(p.contains("Cross") &&
      (p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin")),
      s"the scalar max must broadcast back onto the view:\n$p")
    assert(p.contains("ReusedExchange"),
      s"revenue view not reused for its own max (fact slice scanned twice):\n$p")
  }

  test("q16: NOT IN plans as a broadcast anti join; distinct pairs collapse inside the agg") {
    val p = plan("q16_supplier_counts")
    assert(p.contains("LeftAnti"),
      s"the exclusion set must plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the part slice must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q20: part slice pushes below both aggregates; the pair frame is scanned once") {
    val df = SparkEntry.queries("q20_part_promotion")(spark, dir)
    df.collect() // finalize AQE: exchange reuse is a runtime rule
    // negative asserts must see only the FINAL plan — the toString keeps
    // the pre-adaptive "Initial Plan" section, where the SMJ AQE then
    // converts to a broadcast join still appears
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"the part slice must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // shipped feeds both the pair rows and the per-part total: its
    // aggregate exchange must be reused, not recomputed
    assert(p.contains("ReusedExchange"),
      s"pair aggregate not reused for the part totals (fact slice scanned twice):\n$p")
  }

  test("e_cluster_sample: the balanced draw is one rank exchange with group-limit pruning") {
    // the k-means fit itself runs driver-loop jobs at construction time;
    // the RETURNED plan (assignment + per-cluster capped draw) is what
    // executes per call and must stay one exchange
    val p = plan("e_cluster_sample")
    assert(p.contains("WindowGroupLimit"),
      s"per-cluster top-n must prune per map task before the rank exchange:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the list_id rank exchange:\n$p")
    assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("batchevalpython"), p)
  }

  test("q22: scalar average broadcasts through a 1-row cross join; recent orders anti-join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("Cross"),
      s"the 1-row average must broadcast-cross onto customers:\n$p")
    assert(p.contains("LeftAnti"), s"recent-order exclusion must plan as an anti join:\n$p")
  }

  test("CMS grid hashes the vocabulary, not the occurrences") {
    val p = plan("t_cms_counts")
    // the d-row explode must ride ON the token-count aggregate (cells sum
    // per-token counts); an occurrence-grain grid would count(1) instead
    assert(p.contains("partial_sum(wc") || p.contains("sum(wc"),
      s"grid cells must sum vocabulary counts:\n$p")
    assert(!p.contains("WindowExec") && !p.toLowerCase.contains("sortmergejoin"),
      s"the grid build is pure hash aggregates:\n$p")
  }

  test("pii audit is a pure projection: no exchange, no UDF") {
    val p = plan("t_pii")
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
  }

  test("doc-frequency top-100 plans as TakeOrderedAndProject, never a vocab-wide window") {
    val df = SparkEntry.queries("t_doc_freq")(spark, dir)
    df.collect() // finalize the AQE plan: exchange reuse is a runtime rule
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"global top-k not take-ordered:\n$p")
    // the corpus is scanned + token-aggregated ONCE: the rank self-join's
    // broadcast side reuses the canonically-identical exchange at runtime
    // (the initial plan prints it twice; AQE dedupes the stages)
    assert(p.contains("ReusedExchange") ||
      "Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"token aggregate not reused for the rank join:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("tfidf: both aggregates pre-combine, doc-count broadcasts, rank is group-limit pruned") {
    val p = plan("t_tfidf")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("row_number(), 5, Partial") && p.contains("row_number(), 5, Final"),
      s"WindowGroupLimit pruning missing:\n$p")
  }

  test("bow LSH dedup plans NO nested-loop join: bucket equi-join only") {
    // d_dedup_bow's N² self-join is the declared exact baseline; the scale
    // twin must never regress to it — candidates come from the (table,
    // bucket) equi-join, vectors only join back by id for verification
    val p = plan("d_dedup_bow_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"N² join crept into the LSH scale path:\n$p")
  }

  test("brute-force knn broadcasts the probe side; only pruned top-k crosses the shuffle") {
    val p = plan("s_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // probe broadcast x corpus scan
    // exactly one shuffle, and it sits between the Final and Partial
    // group-limits (top-down print): the N x Q pair stream is pruned to
    // top-k per partition BEFORE crossing the exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.indexOf("row_number(), 5, Final") < p.indexOf("Exchange hashpartitioning") &&
      p.indexOf("Exchange hashpartitioning") < p.indexOf("row_number(), 5, Partial"), p)
  }

  test("duplicate-substring removal: hash equi-joins only, no pair output anywhere") {
    val p = plan("d_remove_dup_substrings")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"scrub must stay equi-join shaped:\n$p")
    // the duplicated-shingle membership check and the covered-position
    // anti-join are both hash joins; the per-doc rebuild aggregates
    assert(p.contains("LeftAnti"), s"kept-token filter must be an anti join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_finalmerge"),
      s"shingle doc-frequency must pre-combine map-side:\n$p")
  }

  test("incremental near-dup ingest: every join is a hash equi-join — no pair space, no nested loop") {
    val p = plan("d_near_ingest")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"admission must stay blocked — corpus x batch must never materialize:\n$p")
    // signature minima pre-combine map-side before the doc_id exchange
    assert(p.contains("partial_min"), s"minhash minima must pre-combine:\n$p")
  }

  test("cross-corpus embed decon LSH twin: bucket equi-join, never the anchor's cross product") {
    val p = plan("d_decon_embed_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocked twin must not cross-join:\n$p")
  }

  test("LM band filter: corpus LM aggregates pre-combine; only the stratum sort shuffles docs") {
    val p = plan("p_lm_filter")
    assert(!p.contains("CartesianProduct"), p)
    // the token-count aggregates combine map-side before their exchanges
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"LM aggregates must pre-combine:\n$p")
    // exactly one WindowExec (the per-source percent_rank) — no second
    // corpus-wide sort sneaks in
    assert("Window \\[percent_rank".r.findAllIn(p).size == 1, p)
  }

  test("range join builds the tier dim as a broadcast nested loop, fact side never shuffles for it") {
    val p = plan("q_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"3-row band dim must broadcast (BNLJ is the right plan for a range predicate):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      s"fact side must not sort/shuffle for a constant-sized band table:\n$p")
  }

  test("gap fill: events aggregate once — bounds/keys reuse the hourly exchange") {
    // AQE finalizes stage reuse at runtime, so execute before inspecting
    val df = SparkEntry.queries("q_gap_fill")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the (key, hour) aggregate is persisted, so the grid, the bounds and
    // the left join ALL read the cached frame — the corpus scans once at
    // cache build. (FileScan strings appear per-InMemoryRelation in the
    // plan text as the cached plan's description, not as live scans.)
    // 3 uses × (Final + Initial plan sections in the AQE string) = 6
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"all three uses must read the cached hourly aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("boolean search prunes the token stream to query terms before any exchange") {
    val p = plan("s_boolean_search")
    // the isin filter runs in the scan/project stage under the explode;
    // after it, only matching postings shuffle (tf agg pre-combines)
    assert(p.contains("partial_count"), s"tf aggregate must pre-combine:\n$p")
    assert("ReadSchema: struct<doc_id:bigint,text:string>".r.findFirstIn(p).isDefined,
      s"scan must prune to (doc_id, text):\n$p")
  }

  test("dsir: one corpus scan — vocab and totals derive from the tf aggregate") {
    val df = SparkEntry.queries("p_dsir")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).size == 1 ||
      p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"both LMs must come from ONE tf aggregate over one scan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"(N,V) totals and the vocab join build side must broadcast:\n$p")
  }

  test("chunk dedup: chunk text never crosses an exchange") {
    val df = SparkEntry.queries("d_chunk_dedup")(spark, dir)
    val exchanges = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, df.queryExecution.executedPlan.toString)
    // the fingerprint exchange carries (ids, length, 16-byte md5) only;
    // a `chunk` attribute in any exchange's output means the text itself
    // is shuffling — the regression this pin exists to catch
    for (e <- exchanges)
      assert(!e.output.exists(_.name == "chunk"), s"chunk text must not shuffle:\n$e")
  }

  test("p_negatives / q_vocab_growth: no single-partition window over the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // the rank frame persist()s, so the window lives inside the cached
    // relation's plan — traverse into InMemoryTableScan subtrees too
    def allWindows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
      collect(p) { case w: WindowExec => w } ++
        collect(p) { case s: InMemoryTableScanExec => s }
          .flatMap(s => allWindows(s.relation.cachedPlan))
    // p_negatives: every window in the plan must be partitioned — the
    // round-13 defect was `row_number().over(Window.orderBy(id))` moving
    // the whole corpus to ONE task (WindowExec: No Partition Defined)
    val dfN = SparkEntry.queries("p_negatives")(spark, dir)
    val winsN = allWindows(dfN.queryExecution.executedPlan)
    assert(winsN.nonEmpty, "expected the bucket-partitioned rank window in p_negatives")
    for (w <- winsN)
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-task) window in p_negatives:\n$w")
    // q_vocab_growth: the id-rank window must be partitioned; the ONE
    // allowed unpartitioned window is the cumulative sum over the curve's
    // own bucket-grain output (its subtree contains the bucket aggregate,
    // never the raw corpus scan alone)
    val dfV = SparkEntry.queries("q_vocab_growth")(spark, dir)
    val winsV = collect(dfV.queryExecution.executedPlan) { case w: WindowExec => w }
    val unpart = winsV.filter(_.partitionSpec.isEmpty)
    assert(unpart.size <= 1, s"more than one unpartitioned window:\n${unpart.mkString("\n")}")
    for (w <- unpart)
      assert(
        w.find {
          case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
          case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
          case _ => false
        }.isDefined,
        s"the unpartitioned window must consume the bucket-grain aggregate, not the corpus:\n$w")
  }

  test("streaming decon screen: the benchmark band table broadcasts (stream-static shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docsDf = Seq(("1", "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val evalBands = graft.streaming.StreamingDedup.evalBandTable(
      Seq((2L, "we walked to the store and bought a loaf of bread")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val p = graft.streaming.StreamingDedup.deconHits(docsDf, evalBands)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark side must broadcast — per micro-batch this is the whole point:\n$p")
  }
}
