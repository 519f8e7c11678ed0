package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. Designed so nothing ever materializes
  * the O(N²) pair space: candidate pairs always come from an equi-join on
  * a blocking key (shared shingle / LSH band / SimHash band), which is a
  * plain hash-partitioned shuffle at scale.
  */
object Dedup {

  /** Exact dedup: group rows by content fingerprint, keep the minimum id
    * per group. One hash exchange on the 128-bit fingerprint — never on
    * the full text.
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextOps.fingerprint(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** CDC / changelog compaction: keep each key's LATEST version — the
    * upsert-materialization dedup (snapshot of a mutable table from its
    * append-only change stream; also the "newest crawl wins" dedup for
    * re-crawled URLs). `version` columns are compared in order, highest
    * wins; include a unique tie-breaker (an event/LSN id) so the winner
    * is deterministic.
    *
    * Plan: `row_number` over (key / version desc) — Spark plans a
    * WindowGroupLimit, so each map task keeps only its own top-1 rows
    * per key BEFORE the exchange: the shuffle carries ≤ one row per
    * (key, input-partition), not the full history. One exchange, no
    * second scan; the streaming counterpart at day grain is
    * q_latest_snapshot_stream's watermark-final max(struct) machine.
    */
  def keepLatest(df: DataFrame, key: Seq[Column], version: Seq[Column]): DataFrame =
    TopN
      .perPartition(df, key, version.map(_.desc), 1)
      .drop("rank")

  /** Incremental-ingest exact dedup: which `incoming` docs to ADMIT
    * against an existing `corpus` — not already present (by content
    * fingerprint) AND the min-id representative among incoming copies of
    * the same content. The every-snapshot ingest shape: the corpus side
    * collapses to a DISTINCT fingerprint set (16 bytes/doc — text never
    * crosses the wire), the batch dedups internally in the same pass.
    * Returns (fp, doc_id).
    *
    * Scale: one fingerprint-grain anti-join + one fingerprint-grain agg;
    * at 100 TB the corpus fingerprint set is a materialized table
    * maintained across ingests (append admitted fps each round), so each
    * increment costs O(batch) — the corpus is never rescanned.
    */
  def incrementalIngest(
      corpus: DataFrame,
      incoming: DataFrame,
      id: Column,
      text: Column): DataFrame =
    incrementalIngestIndexed(fingerprintSet(corpus, text), incoming, id, text)

  /** The stored fingerprint set of a corpus (or of an admitted batch —
    * the per-increment append): the 16-byte-per-doc exact-dedup side
    * table [[incrementalIngestIndexed]] screens against. At 100 TB this
    * is a materialized table maintained across ingests, exactly the
    * [[nearDupIndex]] discipline at fingerprint grain. */
  def fingerprintSet(df: DataFrame, text: Column): DataFrame =
    df.select(TextOps.fingerprint(text).as("fp")).distinct()

  /** [[incrementalIngest]] against a STORED fingerprint set — the corpus
    * enters as its (fp) table, never as text. */
  def incrementalIngestIndexed(
      seenFps: DataFrame, // (fp)
      incoming: DataFrame,
      id: Column,
      text: Column): DataFrame =
    incoming
      .select(TextOps.fingerprint(text).as("fp"), id.as("doc_id"))
      .join(seenFps, Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))

  /** Cluster-size distribution of the near-dup graph: for each component
    * size ≥ 2, how many clusters have that size — the dedup QA view that
    * catches both failure modes at a glance (a giant component ⇒ the
    * similarity threshold is too loose / a boilerplate shingle is
    * bridging everything; all-pairs-size-2 ⇒ too tight to matter).
    * Returns (cluster_size, n_clusters), exact integers.
    *
    * Scale: reuses [[connectedComponents]]'s label table (|member| rows,
    * already corpus-dwarfing-ly small) and aggregates it twice — first
    * to cluster grain, then to size grain; both exchanges carry
    * aggregated rows only.
    */
  def clusterSizeDistribution(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** [[clusterSizeDistribution]] over the COMPOSED dedup family — the
    * duplication-heavy-corpus scale path (measured 61 s → ~7 s at the
    * adversarial 10×, docs/SCALE.md): exact copies collapse to
    * representatives FIRST ([[exact]]'s (keep_id, n_copies) groups), the
    * pair stage and one shared CC run on reps only, and each component's
    * member count is Σ n_copies of its reps (byte-identical copies share
    * their rep's whole neighborhood, so the expansion reproduces the
    * full-graph components; the fingerprint's case/whitespace
    * normalization can in principle group copies whose RAW token sets
    * differ — fingerprint on raw text if that distinction matters).
    * A rep with no near-dup pair
    * but n_copies ≥ 2 is its own clique-component; true singletons drop,
    * matching the pairs-graph semantics.
    *
    * `groups` = [[exact]]'s output; `clusters` = [[connectedComponents]]
    * over rep pairs (share it with the other `FromClusters` consumers).
    */
  def clusterSizeDistributionFromClusters(
      groups: DataFrame,
      clusters: DataFrame): DataFrame =
    groups
      .join(clusters, groups("keep_id") === clusters("id"), "left")
      .select(
        coalesce(col("cluster_id"), col("keep_id")).as("cluster_id"),
        col("n_copies"))
      .groupBy(col("cluster_id"))
      .agg(sum(col("n_copies")).as("cluster_size"))
      .filter(col("cluster_size") >= 2)
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** All pairs (a < b) with word-`n`-gram Jaccard ≥ `threshold`.
    *
    * Candidate generation: explode distinct shingles, self-equi-join on the
    * shingle — lossless for threshold > 0 (any pair with J > 0 shares ≥ 1
    * shingle), so the result equals brute-force N². Verification computes
    * exact Jaccard on the deduped candidate pairs via array intersection.
    *
    * Scale path: the only shuffles are (shingle) and (pair) hash exchanges.
    * For web-scale corpora, raise `n` or switch to [[minhashCandidates]]
    * to cut candidate volume.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double): DataFrame = {
    // Join key is the 64-bit shingle hash, not the shingle string: ~4×
    // smaller shuffle and a long-typed hash join. A cross-doc 64-bit
    // collision would need two distinct shingles sharing a hash inside one
    // candidate pair (~2⁻⁶⁴ per shingle pair) — negligible.
    // distinct + per-doc count reuse the shingle stage's doc_id
    // partitioning — one exchange total before the pair join.
    // persisted: the self-join reads this frame twice, and only the
    // doc_id exchange below the window is subject to exchange reuse —
    // the distinct + window + per-side s-exchange re-ran per side
    // (round-14 measure). One materialization, both sides stream it.
    val exploded = TextOps
      .shingleHashRows(df, id, text, n)
      .distinct()
      .withColumn(
        "n_sh",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .persist()
    // |A∩B| falls straight out of the candidate join: shingle arrays are
    // distinct, so the number of joined rows per (a,b) pair IS the
    // intersection size — no per-pair array re-comparison ever runs.
    exploded
      .as("l")
      .join(exploded.as("r"), col("l.s") === col("r.s") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(
        col("l.doc_id").as("a"),
        col("r.doc_id").as("b"),
        col("l.n_sh").as("na"),
        col("r.n_sh").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** All pairs (a < b) with character edit distance ≤ `t` — the record-
    * linkage / typo-grade near-dup metric (one transposed word flips a
    * shingle but costs 2 edits; Jaccard and Levenshtein see DIFFERENT
    * neighborhoods, which is why both ship). Restricted to docs of
    * length ≥ (t+1)·q, the prefix-filter validity domain (shorter docs
    * are a caller-side all-pairs residual: below that length the q-gram
    * bound max(|Gₐ|,|G_b|) − t·q can reach 0 and NO gram-based blocking
    * is lossless).
    *
    * Candidate generation is the classic prefix-filtered positional
    * q-gram join (Gravano et al. 2001 / ppjoin family), LOSSLESS by two
    * theorems: (1) d(a,b) ≤ t ⇒ the (gram, occurrence-index) sets share
    * ≥ max(|Gₐ|,|G_b|) − t·q elements (each edit destroys ≤ q grams);
    * (2) two sets overlapping that much must collide within their
    * t·q + 1 FIRST elements under any shared total order. Ordering
    * occurrences by (global gram frequency asc, gram, occurrence) makes
    * each doc's prefix its RAREST grams, so the equi-join fans out on
    * rare keys only — the common-gram (' the') skew that sinks naive
    * gram joins never reaches the exchange. Candidates then verify with
    * exact `levenshtein` (definitive — the count filter is only a
    * cheaper pre-verify and is skipped; prefix candidates are already
    * near-true).
    *
    * Returns (a, b, dist) with dist ≤ t exact.
    *
    * Scale: shuffles at gram grain (DF aggregate + join), doc grain
    * (prefix rank, ≤ t·q+1 rows per doc out), and candidate-pair grain
    * (text join + verify) — never all-pairs; the length-window prune
    * |len_a − len_b| ≤ t applies inside the candidate join.
    *
    * Cache lifecycle: the doc and gram-occurrence frames `persist()` for
    * the plan's lifetime (each has two consumers — unpersisting eagerly
    * would force a materializing action inside a lazy builder). In a
    * long-lived session that calls this repeatedly, free them between
    * calls (`spark.catalog.clearCache()`, as Bench does per query) or
    * accept LRU eviction as the bound.
    */
  def editDistancePairs(
      df: DataFrame,
      id: Column,
      text: Column,
      t: Int,
      q: Int = 4): DataFrame = {
    require(t >= 1 && q >= 2, "need t >= 1 and q >= 2")
    val prefixLen = t * q + 1
    val docs = df
      .select(id.cast("long").as("doc_id"), text.as("__t"))
      .filter(length(col("__t")) >= (t + 1) * q)
      // both the gram stage and the verify join read this frame; cache
      // it or the corpus scans twice (the pair-frame lesson)
      .persist()
    // positional q-gram occurrences as (hash, occurrence-index): the
    // multiset view that makes min(ca,cb) an equi-join row count
    val occ = docs
      .select(
        col("doc_id"),
        length(col("__t")).as("__len"),
        explode(expr(
          s"transform(sequence(1, length(__t) - ${q - 1}), i -> xxhash64(substring(__t, i, $q)))"))
          .as("g"))
      .groupBy(col("doc_id"), col("__len"), col("g"))
      .agg(count(lit(1)).as("__c"))
      .select(col("doc_id"), col("__len"), col("g"),
        explode(expr("sequence(1L, __c)")).as("oi"))
      // two consumers (the global gram-frequency table and the ranked
      // prefix) — persist or the explode+agg runs twice (round-11 probe:
      // the double compute was ~half the prefix-stage cost)
      .persist()
    val gramDf = occ.groupBy(col("g")).agg(count(lit(1)).as("__df"))
    val pref = occ
      .join(gramDf, "g")
      .withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("__df"), col("g"), col("oi"))))
      .filter(col("__rn") <= prefixLen)
      // length band of width t+1: any pair with |len_a − len_b| ≤ t has
      // band distance ≤ 1, so banding the join key is LOSSLESS when the
      // probe side fans to {band−1, band, band+1}. This pushes the
      // length-window prune INTO the equi-join key: on low-diversity
      // (template/synthetic) corpora even each doc's rarest grams are
      // corpus-common, and the (g, oi) buckets alone fan out ~20×
      // beyond the length-compatible pairs (round-11 probe at sf0.1:
      // 18.1M joined rows → 0.9M after the length filter; banding keeps
      // the incompatible 17M out of the join entirely)
      .withColumn("__band", floor(col("__len") / (t + 1)))
      .select(col("doc_id"), col("__len"), col("g"), col("oi"), col("__band"))
      // persisted (round-14): the candidate join reads the prefix frame
      // on BOTH sides (probe explode + build), and each unpersisted
      // reference re-ran the gram-frequency join + per-doc rank window
      // above the occ cache; ≤ t·q+1 rows per doc, tiny to hold
      .persist()
    val probes = pref.withColumn(
      "__pb", explode(array(col("__band") - 1, col("__band"), col("__band") + 1)))
    val cand = probes.as("l")
      .join(pref.as("r"),
        col("l.g") === col("r.g") && col("l.oi") === col("r.oi")
          && col("l.__pb") === col("r.__band")
          && col("l.doc_id") < col("r.doc_id")
          && abs(col("l.__len") - col("r.__len")) <= t)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    cand
      // no broadcast hint on the text joins: at corpus scale the text
      // table is as unbroadcastable as the pair stream — AQE converts to
      // broadcast at runtime when the corpus actually is small
      .join(docs.select(col("doc_id").as("a"), col("__t").as("__ta")), "a")
      .join(docs.select(col("doc_id").as("b"), col("__t").as("__tb")), "b")
      // threshold form: banded DP early-exits in O(t·n) instead of the
      // O(n·m) full matrix (returns -1 past the threshold) — on template
      // corpora where prefixes still fan out, the verify is the cost
      // (measured 76 s → threshold form cuts the DP ~n/t-fold)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), t).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a"), col("b"), col("dist"))
  }

  /** [[editDistancePairs]] composed behind exact-duplicate collapse —
    * the 100 TB anchor (round-10 swap, the d_cluster_sizes precedent).
    * Byte-identical copies have edit distance 0 ≤ any threshold and
    * identical distances to every other doc, so the pair relation
    * factors exactly through content-fingerprint groups: run the q-gram
    * blocking + levenshtein verify over the min-id REPRESENTATIVES only,
    * then expand each rep pair to its members' cross product and append
    * the within-group pairs at distance 0. LOSSLESS — output is
    * set-identical to the raw form (the oracle is unchanged); what
    * changes is where the duplication cost lands: the raw form pays it
    * quadratically inside the prefix join's candidate explosion (killed
    * at 25 min on the duplication-heavy 10× corpus), the composed form
    * pays only the true output pairs in a final member equi-join
    * (docs/SCALE.md).
    *
    * Shuffles: one fingerprint agg, the rep-only editDistancePairs
    * (gram/doc/candidate grain over the collapsed corpus), and two
    * member equi-joins on rep_id — never all-pairs on raw doc_ids.
    */
  def editDistancePairsViaReps(
      df: DataFrame,
      id: Column,
      text: Column,
      t: Int,
      q: Int = 4): DataFrame = {
    require(t >= 1 && q >= 2, "need t >= 1 and q >= 2")
    val mem0 = df
      .select(id.cast("long").as("doc_id"), text.as("__t"))
      .filter(length(col("__t")) >= (t + 1) * q)
      .withColumn("__fp", TextOps.fingerprint(col("__t")))
    val groups = mem0.groupBy(col("__fp"))
      .agg(min(col("doc_id")).as("rep_id"))
    // (doc_id, rep_id) membership feeds three joins: persist, or the
    // fingerprint stage recomputes per consumer
    val mem = mem0.join(groups, "__fp")
      .select(col("doc_id"), col("rep_id"), col("__t"))
      .persist()
    val reps = mem.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("__t").as("__rt"))
    val repPairs = editDistancePairs(reps, col("doc_id"), col("__rt"), t, q)
    val m = mem.select(col("rep_id"), col("doc_id"))
    val cross = repPairs
      .join(m.as("ma"), col("a") === col("ma.rep_id"))
      .join(m.as("mb"), col("b") === col("mb.rep_id"))
      .select(
        least(col("ma.doc_id"), col("mb.doc_id")).as("a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("b"),
        col("dist"))
    val within = m.as("x")
      .join(m.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), lit(0L).as("dist"))
    cross.unionByName(within)
  }

  /** Asymmetric CONTAINMENT pairs: (a < b) where the smaller shingle
    * set's containment `|A∩B| / min(|A|,|B|)` ≥ `threshold` — catches a
    * short document quoted/embedded inside a long one, which Jaccard
    * structurally cannot (a 50-shingle doc fully inside a 5000-shingle
    * doc has J ≈ 0.01 but containment 1.0). Same lossless shingle-hash
    * equi-join plan as [[ngramJaccardPairs]] (any pair with containment
    * > 0 shares a shingle; intersection size falls out of the join
    * row count), so the oracle replays it exactly.
    *
    * Emits (a, b, c_micro) with containment floored to 1e-6 ints (one
    * integer division — the record carries no doubles).
    */
  def containmentPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double): DataFrame = {
    // persisted for the same two-sided self-join reason as
    // [[ngramJaccardPairs]] (round-14): exchange reuse covers only the
    // doc_id exchange, not the distinct+window recompute per side
    val exploded = TextOps
      .shingleHashRows(df, id, text, n)
      .distinct()
      .withColumn(
        "n_sh",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .persist()
    exploded
      .as("l")
      .join(exploded.as("r"), col("l.s") === col("r.s") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(
        col("l.doc_id").as("a"),
        col("r.doc_id").as("b"),
        col("l.n_sh").as("na"),
        col("r.n_sh").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("c_micro", expr("c * 1000000L div least(na, nb)"))
      .filter(col("c_micro") >= (threshold * 1e6).toLong)
      .select(col("a"), col("b"), col("c_micro"))
  }

  /** [[containmentPairs]] with PREFIX-FILTERED candidate generation —
    * LOSSLESS (same output, same oracle as the unblocked form),
    * replacing the shared-shingle self-join whose fan-out is m² rows per
    * shingle shared by m docs (universal boilerplate shingles hit the
    * exchange directly — the d_containment weakness flagged in round 8's
    * plan audit). Measured: 3.0 s vs killed-at-18-min on a 50k-doc
    * corpus sharing one boilerplate sentence (docs/SCALE.md). Scope: the
    * win is for BOILERPLATE skew (hot shingles across non-duplicate
    * docs); on duplication-heavy corpora the blow-up is true pairs —
    * both forms are output-bound, blocking adds overhead, and the right
    * plan is exact-collapse to representatives first ([[exact]] /
    * [[exactRepresentatives]]), then containment over reps.
    *
    * Pigeonhole bound: containment ≥ t means the SMALLER set S (|S| = m)
    * has at most ⌊(1−t)·m⌋ shingles outside the intersection, so under
    * any global total order at least one of S's first ⌊(1−t)·m⌋+1
    * elements is shared. Ordering by (global shingle frequency asc,
    * hash) makes each probe prefix its RAREST shingles — so the
    * candidate equi-join is (rare prefix occurrences) × (full index)
    * instead of (full × full): a boilerplate shingle present in every
    * doc sits in almost no prefixes, and the m² blow-up never forms
    * (docs/SCALE.md carries the measured win). The probe is always the
    * smaller side ((n_sh, doc_id) order), which the join enforces, and
    * candidates verify with the exact shared-shingle count — precision
    * AND recall 1 by construction.
    *
    * At t = 0.8 the probe side carries ~20% of shingle rows; the full
    * side streams once as the build input of a hash join. Shuffles:
    * shingle grain (df agg + join), doc grain (prefix rank), candidate
    * pair grain — never all-pairs on hot keys.
    */
  def containmentPairsBlocked(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "containment threshold in (0, 1]")
    // the shingle frame feeds 5 plan branches (probe, index, verify ×2,
    // sizes): persist, or the tokenize+window+hash stage recomputes 5×
    // (cache lifecycle: queries()-level persists are freed by the
    // runner's clearCache between queries — see Verify/Bench)
    val tMicro = (threshold * 1e6).toLong
    val ex = TextOps.shingleHashRows(df, id, text, n).distinct().persist()
    val sized = ex.withColumn(
      "n_sh",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val shingleDf = ex.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    val pref = sized
      .join(shingleDf, "s")
      .withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("__df"), col("s"))))
      // pigeonhole bound in INTEGER arithmetic, derived from the same
      // micro-threshold the verify filter applies: a pair passes verify
      // iff c*1e6 ≥ tMicro·m (m = probe n_sh), i.e. c ≥ minShared =
      // ⌈tMicro·m / 1e6⌉, so ≤ m − minShared shingles sit outside the
      // intersection and a prefix of m − minShared + 1 must hit a shared
      // one. Floating (1−t) undercounts by 1 whenever (1−t)·m is exact
      // (e.g. t=0.8, m≡0 mod 5: 1.0−0.8 = 0.19999…96) — silently lossy.
      .filter(col("__rn") <=
        col("n_sh") - expr(s"(n_sh * ${tMicro}L + 999999L) div 1000000L") + 1)
      .select(col("doc_id"), col("n_sh"), col("s"))
    val cand = pref.as("l")
      .join(
        sized.as("r"),
        col("l.s") === col("r.s") &&
          (col("l.n_sh") < col("r.n_sh") ||
            (col("l.n_sh") === col("r.n_sh") && col("l.doc_id") < col("r.doc_id"))))
      .select(
        least(col("l.doc_id"), col("r.doc_id")).as("a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("b"))
      .distinct()
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(ex.select(col("doc_id").as("a"), col("s")), "a")
      .join(ex.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("c_micro", expr("c * 1000000L div least(na, nb)"))
      .filter(col("c_micro") >= tMicro)
      .select(col("a"), col("b"), col("c_micro"))
  }

  // ---- MinHash + LSH ----

  /** Prime modulus > 2^32 for the universal-hash family. */
  private[graft] val MinhashPrime = 4294967311L

  /** The portable MinHash signature as ONE pure-projection column
    * (array<long> of the k permutation minima) — the STREAM-SAFE form:
    * no explode, no window, no aggregation, so it can sit inside a
    * streaming query between stateful operators (the admission-gate
    * composition, [[graft.streaming.StreamingDedup.ingestGate]]).
    *
    * Math is identical to `minhashSignatures(portableHash = true)`:
    * same whitespace tokens → trigram (whole-text under 3 tokens) →
    * md5-32 shingle hash → splitmix (a,b) universal family mod
    * [[MinhashPrime]] — so signatures, band keys and the SQL oracle all
    * agree bit-for-bit. Cost shape differs: the batch explode+groupBy
    * hashes each shingle once and takes k mins in one hash aggregate
    * (measured ~6× cheaper per corpus pass — see the note above
    * [[minhashSignatures]]); this HOF form re-walks the per-doc hash
    * array k times, the right trade only at admission grain.
    */
  // let-binding for the HOF subtrees below — see [[Cols.bindOnce]] for
  // why (interpreted lambdas get no cross-lambda CSE; the un-bound
  // signature re-tokenized + re-md5'd every doc per permutation × per
  // shingle and 5k docs did not finish in 5 min)
  private def bindOnce(e: Column)(f: Column => Column): Column =
    Cols.bindOnce(e)(f)

  def portableMinhashSignature(
      text: Column, shingleLen: Int = 3, k: Int = 64, seed: Long = 42L): Column = {
    require(shingleLen == 3, "portable signature column is pinned to the trigram family")
    bindOnce(TextOps.tokens(text)) { w =>
      val sh = when(
        size(w) >= shingleLen,
        transform(
          sequence(lit(0), size(w) - shingleLen),
          i => concat_ws(" ",
            element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
        .otherwise(array(array_join(w, " ")))
      bindOnce(transform(sh, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))) { hh =>
        array(hashParams(k, seed).map { case (a, b) =>
          array_min(transform(hh, h => pmod(h * a + b, lit(MinhashPrime))))
        }: _*)
      }
    }
  }

  /** The distinct portable shingle-hash SET of one document as a pure
    * array projection — the streaming-legal equivalent of
    * [[graft.ops.TextOps.portableShingleHashRows]] (whose window `lead`
    * is illegal on a stream): same tokens, same n-gram join, same
    * md5→32-bit hash, same whole-text fallback for docs shorter than
    * `n`; OpsSpec pins set equality. Powers the stream-static exact
    * n-gram decontamination screen. */
  def portableShingleHashArray(text: Column, n: Int): Column = {
    require(n >= 1, "shingle length must be >= 1")
    bindOnce(TextOps.tokens(text)) { w =>
      val sh = when(
        size(w) >= n,
        transform(
          sequence(lit(0), size(w) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
        .otherwise(array(array_join(w, " ")))
      array_distinct(transform(sh, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")))
    }
  }

  /** The portable LSH band key over a [[portableMinhashSignature]]
    * column: md5 of the '|'-joined decimal minima of band `j` — the same
    * key `minhashDedup(portableHash = true)` buckets on, prefixed with
    * the band index so it doubles as the streaming index's shard key. */
  def portableBandKey(sig: Column, j: Int, rowsPerBand: Int): Column =
    concat_ws("|", lit(j),
      md5(concat_ws("|",
        (j * rowsPerBand until (j + 1) * rowsPerBand)
          .map(i => element_at(sig, i + 1).cast("string")): _*)))

  /** Deterministic (a, b) parameters for the k minhash permutations —
    * splitmix64-expanded from a fixed seed so results are reproducible
    * across runs and engines.
    */
  private[graft] def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // a ≤ 2^31-1 keeps a * x32 < 2^63 (no 64-bit overflow under ANSI mode)
    (0 until k).map { _ =>
      (math.abs(next()) % (Int.MaxValue.toLong - 1) + 1, math.abs(next()) % Int.MaxValue.toLong)
    }
  }

  /** MinHash signatures as one row per doc with k `min` columns m0..m{k-1}.
    *
    * Shape matters for throughput: explode the shingles, hash each ONCE
    * (`xxhash64` → 32-bit), then take the k permutation minima as k plain
    * `min` aggregates in a single hash aggregate. This keeps every
    * expression scalar (whole-stage codegen'd; measured ~6× faster than
    * nesting k `array_min(transform(...))` passes over the shingle array,
    * which re-hashes every shingle k times and overflows codegen).
    * One shuffle on doc_id; partial aggregation halves it map-side.
    */
  /** (doc_id, s) shingle-hash rows in the chosen family, 32-bit reduced
    * to `h32`. Shared seam: signatures and the exact-Jaccard verify both
    * read this frame ([[minhashDedup]] persists it once). The portable
    * family ([[graft.ops.TextOps.portableShingleHashRows]]: md5→32-bit,
    * SQL-replayable) shares the xxhash path's window-lead plan shape;
    * 32-bit collisions merge a shingle pair identically on BOTH engines,
    * so the verify stays record-exact.
    */
  private def minhashRows(
      df: DataFrame, id: Column, text: Column, shingleLen: Int,
      portableHash: Boolean): DataFrame =
    if (portableHash) TextOps.portableShingleHashRows(df, id, text, shingleLen)
    else TextOps.shingleHashRows(df, id, text, shingleLen)

  private def h32Of(portableHash: Boolean): Column =
    if (portableHash) col("s") // md5-48→8-hex path is already 32-bit
    else pmod(col("s"), lit(4294967296L))

  private def signaturesFromRows(rows: DataFrame, k: Int, seed: Long): DataFrame = {
    val params = hashParams(k, seed)
    rows
      .groupBy(col("doc_id"))
      .agg(
        min(pmod(col("h32") * params.head._1 + params.head._2, lit(MinhashPrime))).as("m0"),
        params.tail.zipWithIndex.map { case ((a, b), i) =>
          min(pmod(col("h32") * a + b, lit(MinhashPrime))).as(s"m${i + 1}")
        }: _*)
  }

  def minhashSignatures(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    signaturesFromRows(
      minhashRows(df, id, text, shingleLen, portableHash)
        .withColumn("h32", h32Of(portableHash)),
      k, seed)

  /** LSH candidate pairs: band the k-length signature into `bands` bands of
    * k/bands minima, bucket-join on (band index, 64-bit band hash) — a
    * compact long join key instead of array equality. Pairs sharing ≥1 band
    * are candidates; verification (exact Jaccard) is the caller's choice —
    * [[minhashDedup]] wires both.
    */
  /** (doc_id, band, band_hash) rows from a k-minima signature frame —
    * the LSH bucket table. Shared seam: [[candidatesFromSignatures]]
    * self-joins it for at-rest pair dedup; [[incrementalNearIngest]]
    * joins a batch's band rows against a corpus's (at 100 TB the corpus
    * side IS this frame, materialized once and bucketed by
    * (band, band_hash) so each ingest joins without re-shuffling it).
    */
  private def bandedFromSignatures(
      sigs: DataFrame, k: Int, bands: Int, portableHash: Boolean): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // portable band key: md5 of the '|'-joined minima (decimal-rendered,
    // so `md5(m0 || '|' || ...)` replays in SQL); production default
    // stays the cheaper 64-bit xxhash64 long key
    def bandKey(j: Int): Column =
      if (portableHash)
        md5(concat_ws("|", (j * r until (j + 1) * r).map(i => col(s"m$i").cast("string")): _*))
      else xxhash64((j * r until (j + 1) * r).map(i => col(s"m$i")): _*)
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(bandKey): _*)).as(Seq("band", "band_hash")))
  }

  private def candidatesFromSignatures(
      sigs: DataFrame, k: Int, bands: Int, portableHash: Boolean): DataFrame = {
    // persisted (round-14): the bucket self-join reads the band table on
    // both sides, and each unpersisted side re-ran the k-minima signature
    // aggregate upstream; `bands` small rows per doc
    val banded = bandedFromSignatures(sigs, k, bands, portableHash).persist()
    banded
      .as("l")
      .join(
        banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  def minhashCandidates(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame =
    candidatesFromSignatures(
      minhashSignatures(df, id, text, shingleLen, k, seed, portableHash),
      k, bands, portableHash)

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification: candidates
    * from banding, then true n-gram Jaccard ≥ threshold on candidates only.
    * Probabilistic recall (standard LSH guarantee), exact precision.
    */
  def minhashDedup(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame = {
    // Verification over exploded shingle-hash rows, not per-doc arrays:
    // joining the candidate pairs through (doc, shingle) rows counts
    // |A∩B| with codegen'd hash joins, where array_intersect over
    // wordShingles arrays re-entered interpreted higher-order territory
    // (measured: verification fell from ~2.5 s to ~0.5 s at sf0.1).
    // A candidate pair sharing zero shingles simply drops out (J = 0).
    // ONE persisted hash-row frame feeds BOTH the signature build and the
    // verify joins (the minima over the distinct set equal the minima
    // over the multiset) — previously the tokenize+shingle+hash stage ran
    // twice, which doubled the md5 cost of the portable family (round 9;
    // freed by the runner's clearCache).
    val ex = minhashRows(df, id, text, shingleLen, portableHash).distinct().persist()
    val nsh = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sigs = signaturesFromRows(ex.withColumn("h32", h32Of(portableHash)), k, seed)
    candidatesFromSignatures(sigs, k, bands, portableHash)
      .join(ex.select(col("doc_id").as("a"), col("s")), "a")
      .join(ex.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(nsh.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(nsh.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      // one IEEE division of exact ints — hash-stable on every engine
      // (the d_dedup_ngram discipline; the old round(·, 4) was LESS
      // stable: decimal re-rounding differs across engines)
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Batch-incremental NEAR-dup admission — the near-dup counterpart of
    * [[incrementalIngest]] and the at-rest twin of the streaming
    * admission index ([[graft.streaming.StreamingDedup.lshIndexResumed]]):
    * which `incoming` docs to ADMIT against an existing `corpus`, where
    * "already present" means MinHash-LSH candidate + exact n-gram
    * Jaccard ≥ `threshold` (not just byte equality). The daily-crawl
    * shape: each batch is screened against everything ingested so far
    * AND against earlier docs of its own batch (earlier = smaller id,
    * the arrival-order rule the streaming index uses — a doc that
    * near-dups ANY smaller-id batch doc drops, matching
    * `lshIndex`'s every-arrival-indexes semantics).
    *
    * Returns one row per incoming doc: (doc_id, verdict) with verdict ∈
    * 'near_dup_corpus' (corpus hit wins) | 'near_dup_batch' | 'admitted'.
    *
    * Scale: signatures/bands for the corpus are recomputed here for the
    * self-contained form, but at 100 TB they are a STORED index — the
    * (doc_id, band, band_hash) table and the per-doc shingle-hash sets
    * are materialized once at first ingest and appended with each
    * admitted batch (the [[incrementalIngest]] fingerprint-set
    * discipline), so an increment costs O(batch) band hashing + one
    * bucket join against a corpus table bucketed by (band, band_hash) —
    * no corpus re-scan, no corpus shuffle. The batch side is the small
    * one by assumption; AQE broadcasts its band rows when they fit
    * (the [[crossCorpusNearDups]] asymmetry note). Verification joins
    * carry only 32-bit shingle hashes and doc ids, never text.
    *
    * Cache lifecycle: the two shingle-hash frames persist() for the
    * plan's lifetime (each feeds signatures AND verify) — the
    * [[editDistancePairs]] note applies: free between repeated calls
    * with `spark.catalog.clearCache()` or accept LRU eviction.
    */
  def incrementalNearIngest(
      corpus: DataFrame,
      incoming: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame = {
    // one persisted hash-row frame per side feeds signatures AND the
    // exact-Jaccard verify (the minhashDedup seam)
    val exC = minhashRows(corpus, id, text, shingleLen, portableHash).distinct().persist()
    val exB = minhashRows(incoming, id, text, shingleLen, portableHash).distinct().persist()
    def banded(ex: DataFrame): DataFrame =
      bandedFromSignatures(
        signaturesFromRows(ex.withColumn("h32", h32Of(portableHash)), k, seed),
        k, bands, portableHash)
    val bndC = banded(exC)
    val bndB = banded(exB)
    assembleNearIngestVerdicts(incoming, id, exC, bndC, exB, bndB, threshold)
  }

  /** [[incrementalNearIngest]] against a STORED corpus index — the plan
    * an actual 100 TB deployment runs every increment: the corpus enters
    * as its two materialized index tables, never as text.
    *
    *  - `corpusHashes` (doc_id, s): distinct shingle hashes per corpus
    *    doc (the exact-Jaccard verify side).
    *  - `corpusBands` (doc_id, band, band_hash): the LSH bucket table.
    *
    * Both come from [[nearDupIndex]] — built once at first ingest,
    * appended with each admitted batch's [[nearDupIndex]] rows (the
    * [[incrementalIngest]] fingerprint-set discipline at near-dup
    * grain). Output is row-for-row [[incrementalNearIngest]]'s (equality
    * pinned in OpsSpec); only the corpus side's provenance differs.
    * Batch-side frames persist here (each feeds banding AND verify);
    * the stored tables stream through their single consumer each.
    */
  def incrementalNearIngestIndexed(
      corpusHashes: DataFrame,
      corpusBands: DataFrame,
      incoming: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame = {
    val exB = minhashRows(incoming, id, text, shingleLen, portableHash).distinct().persist()
    val bndB = bandedFromSignatures(
      signaturesFromRows(exB.withColumn("h32", h32Of(portableHash)), k, seed),
      k, bands, portableHash)
    assembleNearIngestVerdicts(incoming, id, corpusHashes, corpusBands, exB, bndB, threshold)
  }

  /** The stored near-dup index of a corpus (or of an admitted batch — the
    * per-increment append): (hashRows (doc_id, s), bandRows (doc_id,
    * band, band_hash)) for [[incrementalNearIngestIndexed]]. At 100 TB
    * both are materialized tables — bandRows bucketed by (band,
    * band_hash) so each ingest's bucket join never re-shuffles the
    * corpus; hashRows clustered by doc_id for the verify join.
    *
    * The hash-row frame is persisted here: when the pair is consumed
    * in-memory instead of from storage, hashRows feeds the band
    * derivation above PLUS (downstream in
    * [[incrementalNearIngestIndexed]]) the per-doc shingle counts and
    * the intersect join — three consumers that would each re-run the
    * tokenize→shingle→minhash scan. Deployments that materialize the
    * index read parquet and never hit this cache; in-memory callers get
    * the scan once.
    */
  def nearDupIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      seed: Long = 42L,
      portableHash: Boolean = false): (DataFrame, DataFrame) = {
    val ex = minhashRows(df, id, text, shingleLen, portableHash).distinct().persist()
    val bnd = bandedFromSignatures(
      signaturesFromRows(ex.withColumn("h32", h32Of(portableHash)), k, seed),
      k, bands, portableHash)
    (ex, bnd)
  }

  /** Shared back half of the two ingest-screen forms: candidate bucket
    * joins (corpus→batch, earlier-batch→batch), exact-Jaccard verify
    * through the shingle-hash rows (|A∩B| = joined row count — the
    * minhashDedup shape), and the verdict assembly with corpus hits
    * outranking batch hits.
    */
  private def assembleNearIngestVerdicts(
      incoming: DataFrame,
      id: Column,
      exC: DataFrame,
      bndC: DataFrame,
      exB: DataFrame,
      bndB0: DataFrame,
      threshold: Double): DataFrame = {
    // the batch band table feeds THREE join sides (corpus-candidates
    // probe, both sides of the in-batch self-join) and each reference
    // re-runs the k-minima signature aggregate (64 pmod-min columns)
    // above the persisted hash rows — persist the (doc_id, band, hash)
    // rows instead: 16 small rows per batch doc, one signature pass
    val bndB = bndB0.persist()
    val candCorpus = bndC
      .as("l")
      .join(bndB.as("r"),
        col("l.band") === col("r.band") && col("l.band_hash") === col("r.band_hash"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    val candBatch = bndB
      .as("l")
      .join(bndB.as("r"),
        col("l.band") === col("r.band") && col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    def hits(cand: DataFrame, exA: DataFrame): DataFrame = {
      val na = exA.groupBy(col("doc_id").as("a")).agg(count(lit(1)).as("na"))
      val nb = exB.groupBy(col("doc_id").as("b")).agg(count(lit(1)).as("nb"))
      cand
        .join(exA.select(col("doc_id").as("a"), col("s")), "a")
        .join(exB.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
        .join(na, "a")
        .join(nb, "b")
        .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= threshold)
        .select(col("b")).distinct()
    }
    incoming
      .select(id.as("doc_id"))
      .join(hits(candCorpus, exC).withColumn("__corpus_hit", lit(1)),
        col("doc_id") === col("b"), "left")
      .drop("b")
      .join(hits(candBatch, exB).withColumn("__batch_hit", lit(1)),
        col("doc_id") === col("b"), "left")
      .drop("b")
      .select(
        col("doc_id"),
        when(col("__corpus_hit").isNotNull, lit("near_dup_corpus"))
          .when(col("__batch_hit").isNotNull, lit("near_dup_batch"))
          .otherwise(lit("admitted"))
          .as("verdict"))
  }

  /** The composed daily-ingest increment — cheap stage first: exact
    * fingerprint dedup ([[incrementalIngest]]: corpus anti-join +
    * in-batch min-id keeper, collapsing replica mass BEFORE any
    * signature work — the exact-collapse-first lesson), then the
    * near-dup screen ([[incrementalNearIngest]]) over keepers only.
    * One row per incoming doc: exact hits verdict 'dup_exact' (exact
    * stage wins even when the copy would also near-dup the corpus);
    * keepers carry the near stage's verdict.
    */
  def ingestIncrement(
      corpus: DataFrame,
      incoming: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame = {
    val keepers = incrementalIngest(corpus, incoming, id, text)
      .select(col("doc_id").as("__keep_id"))
    val kept = incoming.join(keepers, id === col("__keep_id"), "left_semi")
    val near = incrementalNearIngest(
      corpus, kept, id, text, shingleLen, k, bands, threshold, seed, portableHash)
    incoming
      .select(id.as("doc_id"))
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("verdict"), lit("dup_exact")).as("verdict"))
  }

  /** [[ingestIncrement]] against STORED corpus artifacts only — the form
    * a deployment actually schedules daily: the corpus enters as its
    * fingerprint set ([[fingerprintSet]]) and its two near-dup index
    * tables ([[nearDupIndex]]), all three maintained across ingests by
    * appending each admitted batch's rows; corpus text is never read.
    * Output is row-for-row [[ingestIncrement]]'s (PipelineSpec pins the
    * composed equality through [[TrainingPipeline.dailyAdmissionIndexed]]).
    */
  def ingestIncrementIndexed(
      corpusFps: DataFrame, // (fp)
      corpusHashes: DataFrame, // (doc_id, s)
      corpusBands: DataFrame, // (doc_id, band, band_hash)
      incoming: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      threshold: Double,
      seed: Long = 42L,
      portableHash: Boolean = false): DataFrame = {
    val keepers = incrementalIngestIndexed(corpusFps, incoming, id, text)
      .select(col("doc_id").as("__keep_id"))
    val kept = incoming.join(keepers, id === col("__keep_id"), "left_semi")
    val near = incrementalNearIngestIndexed(
      corpusHashes, corpusBands, kept, id, text,
      shingleLen, k, bands, threshold, seed, portableHash)
    incoming
      .select(id.as("doc_id"))
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("verdict"), lit("dup_exact")).as("verdict"))
  }

  /** Cross-corpus contamination check: pairs (train doc, eval doc) with
    * word-n-gram Jaccard ≥ threshold — the decontamination sweep run
    * before training to catch eval examples leaked into the corpus. Same
    * lossless shared-shingle blocking as [[ngramJaccardPairs]], but across
    * two frames: the shuffle keys are shingle hashes, so corpus sizes can
    * be wildly asymmetric (huge train, small eval) without a plan change —
    * AQE will broadcast the eval side's exploded shingles when small.
    */
  def crossCorpusNearDups(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double): DataFrame = {
    def exploded(df: DataFrame) = TextOps
      .shingleHashRows(df, id, text, n)
      .distinct()
      .withColumn(
        "n_sh",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    exploded(train)
      .as("l")
      .join(exploded(eval).as("r"), col("l.s") === col("r.s"))
      .groupBy(
        col("l.doc_id").as("train_id"),
        col("r.doc_id").as("eval_id"),
        col("l.n_sh").as("na"),
        col("r.n_sh").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("train_id"), col("eval_id"), col("jaccard"))
  }

  /** Hard decontamination at exact n-gram grain — the GPT-3 discipline
    * (Brown et al. 2020, Appendix C uses n = 13): a train doc is flagged
    * if it shares ANY exact word n-gram with the eval benchmark. No
    * Jaccard, no threshold, no signature — ONE equi-join on shingle
    * hashes, so it catches verbatim leaked spans that sit inside an
    * otherwise-different document (the case a similarity threshold
    * misses by construction). Complements [[crossCorpusNearDups]]
    * (paraphrase-grade overlap) and the per-doc overlap score
    * (`d_contamination_frac`). Docs shorter than n collapse to one
    * whole-text shingle (the [[graft.ops.TextOps.shingleHashRows]]
    * fallback), so short eval items still screen.
    *
    * Returns distinct (train_id, eval_id) collision pairs; semi-join the
    * train side against it to drop.
    *
    * Scale: shuffle keys are 32/64-bit shingle hashes — the benchmark
    * side is tiny, so AQE broadcasts its explode and the train corpus
    * never shuffles (the [[crossCorpusNearDups]] asymmetry note); the
    * bloom-pruned variant composes the same way when even that join is
    * worth pruning.
    */
  def exactNgramCollisions(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      portableHash: Boolean = false): DataFrame = {
    def rows(df: DataFrame) =
      (if (portableHash) TextOps.portableShingleHashRows(df, id, text, n)
       else TextOps.shingleHashRows(df, id, text, n)).distinct()
    rows(train)
      .as("l")
      .join(rows(eval).as("r"), col("l.s") === col("r.s"))
      .select(col("l.doc_id").as("train_id"), col("r.doc_id").as("eval_id"))
      .distinct()
  }

  /** [[exactNgramCollisions]]'s 100 TB plan — the same bloom-prune
    * discipline as [[crossCorpusNearDupsBloom]]: the train explode
    * filters through a codegen'd `might_contain` over the benchmark's
    * shingle bloom BEFORE any exchange, so at decontamination scale
    * virtually every train shingle misses and never reaches the join.
    * Output is EXACTLY the plain sweep's (one shared oracle): the bloom
    * admits false positives only and the exact hash equi-join behind it
    * removes them. Driver holds one bloom of `expectedEvalShingles` keys
    * at `fpp` (the [[graft.ops.Joins.bloomPrunedSemiJoin]] sizing rule);
    * the eval explode persists for its two consumers (bloom build,
    * join).
    */
  def exactNgramCollisionsBloom(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      expectedEvalShingles: Long,
      fpp: Double = 0.01,
      portableHash: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.BloomJoinExpressions
    import org.apache.spark.util.sketch.BloomFilter
    def rows(df: DataFrame) =
      (if (portableHash) TextOps.portableShingleHashRows(df, id, text, n)
       else TextOps.shingleHashRows(df, id, text, n)).distinct()
    val evalEx = rows(eval).persist()
    val numBits = BloomFilter.optimalNumOfBits(expectedEvalShingles, fpp)
    val bits = evalEx
      .agg(BloomJoinExpressions.bloomAgg(col("s"), expectedEvalShingles, numBits).as("__bf"))
      .head.getAs[Array[Byte]](0)
    // An empty eval side aggregates to a null bloom; no shingle can
    // collide with an empty benchmark, so prune everything rather than
    // hand might_contain a null filter (the plain sweep's empty-join
    // behavior, kept oracle-identical).
    val prune =
      if (bits == null) lit(false) else BloomJoinExpressions.mightContain(bits, col("s"))
    rows(train)
      .filter(prune)
      .as("l")
      .join(evalEx.as("r"), col("l.s") === col("r.s"))
      .select(col("l.doc_id").as("train_id"), col("r.doc_id").as("eval_id"))
      .distinct()
  }

  /** WHERE the leaks are, not just which docs leak: every exact n-gram
    * collision with the benchmark located at its token offset, padded by
    * `padTokens` on each side, and overlapping/touching hit windows
    * merged into maximal spans — (train_id, span_start, span_end),
    * 0-based token offsets, end-exclusive, clamped to the doc. This is
    * the span report behind redaction-grain decontamination
    * ([[decontaminateByRedaction]]): GPT-3's actual cleanup (Brown et
    * al. 2020, App. C) removes a window AROUND each leaked 13-gram and
    * keeps the rest of the document — doc-grain dropping
    * ([[exactNgramCollisions]] + anti-join) throws away an entire long
    * document for one quoted benchmark sentence.
    *
    * Scale: the hit join is [[exactNgramCollisions]]'s (32-bit shingle
    * hashes; tiny benchmark side broadcasts, the train explode never
    * shuffles on anything wider). The span merge is a per-DOC
    * gaps-and-islands window — partitioned by train doc, so the sort is
    * bounded by a single document's hit count, never corpus-wide (the
    * chunk-accounting skew lesson does not apply: doc_id is the
    * partition key, and a doc is a bounded object).
    */
  def contaminatedSpans(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int = 13,
      padTokens: Int = 0,
      portableHash: Boolean = true): DataFrame = {
    require(portableHash, "span decontamination is declared on the portable hash")
    val trainPos = TextOps.portableShingleHashPosRows(train, id, text, n)
    val evalH = TextOps.portableShingleHashRows(eval, id, text, n)
      .select(col("s")).distinct()
    val hits = trainPos
      .join(evalH, Seq("s"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    // hit at pos covers raw tokens [pos - pad, pos + n + pad); with every
    // window the same width, a gap-with-previous test merges exactly:
    // new island iff this start clears the previous window's end
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val width = n + 2L * padTokens
    val spansRaw = hits
      .withColumn("__prev", lag(col("pos"), 1).over(w))
      .withColumn(
        "__new",
        when(col("__prev").isNull || col("pos") - col("__prev") > width, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(w))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(
        (min(col("pos")) - padTokens).as("__raw_start"),
        (max(col("pos")) + n + padTokens).as("__raw_end"))
    spansRaw
      .join(
        train.select(id.cast("long").as("doc_id"), TextOps.tokenCount(text).cast("long").as("__len")),
        Seq("doc_id"))
      .select(
        col("doc_id").as("train_id"),
        greatest(col("__raw_start"), lit(0L)).as("span_start"),
        least(col("__raw_end"), col("__len")).as("span_end"))
  }

  /** Redaction-grain decontamination — keep the CLEAN pieces: cut every
    * [[contaminatedSpans]] window out of each train doc and emit the
    * surviving complement intervals of at least `minPieceTokens` tokens
    * as (train_id, piece_id, piece_start, piece_end, piece_tokens);
    * piece_id is the 0-based index among a doc's surviving pieces in
    * offset order. A doc with no hits survives as one whole piece (iff
    * long enough); a doc blanketed by spans emits nothing — exactly the
    * GPT-3 discipline (remove a window around each collision, discard
    * fragments too short to train on) at token grain.
    *
    * Scale: spans collapse to one array per contaminated doc (bounded by
    * the doc, like every per-doc aggregate here); the complement is a
    * pure array expression (zip of span ends with next span starts) — no
    * additional shuffle beyond the span merge, and the final explode is
    * output-bound.
    */
  def decontaminateByRedaction(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int = 13,
      padTokens: Int = 0,
      minPieceTokens: Int = 1,
      portableHash: Boolean = true): DataFrame = {
    val spans = contaminatedSpans(train, eval, id, text, n, padTokens, portableHash)
      .groupBy(col("train_id"))
      .agg(array_sort(collect_list(struct(col("span_start"), col("span_end")))).as("__sp"))
    val empty = array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    val docs = train.select(
      id.cast("long").as("train_id"), TextOps.tokenCount(text).cast("long").as("__len"))
    val pieces = docs
      .join(spans, Seq("train_id"), "left")
      .withColumn("__sp", coalesce(col("__sp"), empty))
      .withColumn(
        "__pieces",
        filter(
          zip_with(
            concat(array(lit(0L)), transform(col("__sp"), s => s.getField("span_end"))),
            concat(transform(col("__sp"), s => s.getField("span_start")), array(col("__len"))),
            (a, b) => struct(a.as("s"), b.as("e"))),
          p => p.getField("e") - p.getField("s") >= minPieceTokens))
    pieces
      .select(col("train_id"), posexplode(col("__pieces")).as(Seq("piece_id", "__p")))
      .select(
        col("train_id"),
        col("piece_id").cast("long").as("piece_id"),
        col("__p.s").as("piece_start"),
        col("__p.e").as("piece_end"),
        (col("__p.e") - col("__p.s")).as("piece_tokens"))
  }

  /** [[crossCorpusNearDups]]'s 100 TB plan: prune the TRAIN explode
    * through a bloom filter of the eval corpus's distinct shingle hashes
    * BEFORE any join — the benchmark side is tiny (that's what makes it
    * a benchmark), so at decontamination scale virtually every train
    * shingle misses and never reaches an exchange. Output is EXACTLY the
    * plain sweep's (same oracle): the bloom admits false positives only,
    * and the exact shingle equi-join behind it removes them.
    *
    * Two structural differences from the anchor, both scale-motivated:
    * the bloom prune runs straight off the scan (codegen'd
    * `might_contain`, no pre-prune shuffle), and the per-doc shingle
    * counts the Jaccard denominator needs come from a map-side-combined
    * aggregate JOINED AFTER the candidate grouping — the anchor's
    * count-over-window would force a full train-explode shuffle before
    * the prune could act. The eval frame persists for its three
    * consumers (bloom build, join, counts) — benchmark-sized by
    * assumption, freed by the runner's clearCache like the minhash
    * frames. Driver holds one bloom of `expectedEvalShingles` keys at
    * `fpp` (the [[graft.ops.Joins.bloomPrunedSemiJoin]] sizing rule).
    */
  def crossCorpusNearDupsBloom(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double,
      expectedEvalShingles: Long,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.BloomJoinExpressions
    import org.apache.spark.util.sketch.BloomFilter
    def rows(df: DataFrame) = TextOps.shingleHashRows(df, id, text, n).distinct()
    val evalEx = rows(eval).persist()
    val numBits = BloomFilter.optimalNumOfBits(expectedEvalShingles, fpp)
    val bits = evalEx
      .agg(BloomJoinExpressions.bloomAgg(col("s"), expectedEvalShingles, numBits).as("__bf"))
      .head.getAs[Array[Byte]](0)
    val trainEx = rows(train)
    val na = trainEx.groupBy(col("doc_id").as("train_id")).agg(count(lit(1)).as("na"))
    val nb = evalEx.groupBy(col("doc_id").as("eval_id")).agg(count(lit(1)).as("nb"))
    // empty eval → null bloom → nothing can collide (see
    // exactNgramCollisionsBloom): prune all instead of a null filter
    val prune =
      if (bits == null) lit(false) else BloomJoinExpressions.mightContain(bits, col("s"))
    trainEx
      .filter(prune)
      .as("l")
      .join(evalEx.as("r"), col("l.s") === col("r.s"))
      .groupBy(col("l.doc_id").as("train_id"), col("r.doc_id").as("eval_id"))
      .agg(count(lit(1)).as("c"))
      .join(na, "train_id")
      .join(broadcast(nb), "eval_id")
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("train_id"), col("eval_id"), col("jaccard"))
  }

  /** Per-document contamination FRACTION — the graded companion to
    * [[crossCorpusNearDups]]'s pair sweep: for every eval doc, what share
    * of its distinct word-n-gram shingles occurs ANYWHERE in the train
    * corpus. This is the per-example n-gram-overlap score used to grade
    * benchmark leakage (GPT-3/PaLM-style decontamination reports) — a
    * doc can be contaminated by many train docs jointly without any
    * single pair clearing a Jaccard bar, which the pair sweep misses.
    *
    * Plan: train collapses to a distinct shingle-hash SET (no doc ids —
    * the aggregate is corpus-size-bound, not pair-bound), eval explodes
    * to distinct (doc, shingle) rows, one left equi-join on the 64-bit
    * hash, one per-doc count aggregate. Shuffle keys are hashes and doc
    * ids only; text never crosses the wire, output is |eval docs| rows.
    * Asymmetric corpora (huge train, small eval) need no plan change.
    * The fraction is one IEEE division of exact integer counts —
    * engine-portable.
    */
  def contaminationFraction(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int): DataFrame = {
    val trainSh = TextOps.shingleHashRows(train, id, text, n).select(col("s")).distinct()
    TextOps
      .shingleHashRows(eval, id, text, n)
      .distinct()
      .join(trainSh.withColumn("__hit", lit(1)), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_hits"))
      .withColumn(
        "contamination",
        col("n_hits").cast("double") / col("n_shingles").cast("double"))
  }

  /** Cross-document repeated-substring detection — the distributed
    * stand-in for suffix-array exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * `shingleLen`-token shingle occurring in more than one document IS a
    * repeated substring of ≥ shingleLen tokens, and the per-doc count of
    * such shingles is the signal substring-dedup pipelines threshold on
    * (drop/trim docs that are mostly copied boilerplate).
    *
    * Returns (doc_id, n_shingles, n_shared): distinct shingles in the
    * doc, and how many of them also occur in ≥ 1 OTHER doc. Docs shorter
    * than `shingleLen` tokens count as one whole-text shingle (short
    * exact dups still register).
    *
    * Plan shape: shingles travel as 64-bit hashes, never text. One
    * exchange on doc_id (the shingle window + final agg reuse it), one
    * on the shingle hash (document frequency), one hash join back — the
    * same shapes as [[ngramJaccardPairs]] but with NO pair output, so
    * unlike pair generation it is never output-bound on dup-heavy
    * corpora. Scales to the full corpus.
    */
  def sharedShingleStats(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 16): DataFrame = {
    // persisted (round-14): sh feeds the doc-frequency aggregate AND the
    // join probe — unpersisted, the tokenize→window→hash→distinct stage
    // ran twice per query
    val sh = TextOps.shingleHashRows(df, id, text, shingleLen).distinct().persist()
    val docFreq = sh.groupBy("s").agg(count(lit(1)).as("nd"))
    sh.join(docFreq, "s")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
  }

  /** Cross-document duplicate-SUBSTRING REMOVAL — the scrub counterpart of
    * [[sharedShingleStats]]'s audit (Lee et al. 2022, arXiv:2107.06499,
    * "ExactSubstr" at token-shingle granularity): every token covered by a
    * full `shingleLen`-token run that also appears in at least one OTHER
    * document is dropped, and the survivors are reassembled in order.
    * Returns (doc_id, n_tokens, n_kept, cleaned_md5) — the md5 pins the
    * cleaned text element-exactly while keeping the record row small.
    *
    * Plan shape, all corpus-grain stages equi-joined — no pair output, so
    * never output-bound on dup-heavy corpora:
    *   1. positioned tokens (one exchange on doc_id for the shingle
    *      window; reused by the final per-doc reassembly);
    *   2. full shingles as (doc_id, pos, hash) — hashes travel, never
    *      16-token strings (xxhash64 like the rest of the shingle family;
    *      a collision needs ~2³² distinct shingles, document the 128-bit
    *      upgrade path for 100 TB);
    *   3. duplicated shingles = distinct-doc count > 1 (partial-agg
    *      count, broadcast back when small);
    *   4. covered positions: explode each duplicated occurrence into its
    *      `shingleLen` positions, distinct at (doc, pos) grain —
    *      O(shingleLen · dup occurrences), not O(corpus);
    *   5. anti-join tokens against covered, reassemble per doc.
    *
    * Docs shorter than `shingleLen` tokens contain no full run and pass
    * through unchanged (deliberately different from the stats op's
    * whole-text shingle for short docs: a doc that cannot contain a full
    * run cannot be scrubbed by this rule). A fully-covered doc yields
    * n_kept = 0 and md5("").
    */
  def removeDuplicateShingles(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 16): DataFrame = {
    require(shingleLen >= 2, "shingleLen must be >= 2")
    // toks persists (round-14): it feeds the shingle window AND the
    // kept anti-join — unpersisted, the corpus tokenized + exploded twice
    val toks = df.select(
      id.as("doc_id"), posexplode(TextOps.tokens(text)).as(Seq("pos", "w")))
      .persist()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until shingleLen).map(i => lead(col("w"), i).over(w))
    // sh persists too: read by the dup-shingle aggregate and the covered
    // join — each re-run pays the per-doc sort + 16-token concat + hash
    val sh = toks
      .withColumn(
        "s",
        when(leads.last.isNotNull, xxhash64(concat_ws(" ", (col("w") +: leads): _*))))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("pos"), col("s"))
      .persist()
    val dup = sh
      .select(col("doc_id"), col("s")).distinct()
      .groupBy(col("s")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("s"))
    val covered = sh
      .join(dup, "s")
      .select(
        col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(shingleLen - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            e => e.getField("w"))).as("__cleaned"))
    df.select(id.as("doc_id"), size(TextOps.tokens(text)).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("__cleaned"), lit(""))).as("cleaned_md5"))
  }

  // ---- near-dup clustering ----

  /** Connected components over a near-dup pair list: every doc in a
    * component gets the component's minimum doc id as `cluster_id` — the
    * canonical-representative step a dedup pipeline runs after pair
    * generation (keep cluster_id == doc_id, drop the rest).
    *
    * Algorithm: hash-min label propagation with pointer jumping — each
    * round every node takes the min of its own and its neighbors' labels
    * (one edge join + aggregate), then the label map is composed with
    * itself twice (two node-sized self-joins), so the distance a label
    * travels per round multiplies instead of incrementing: O(log diameter)
    * rounds, not O(diameter). No driver-side graph; per-round work is
    * hash-partitioned joins only.
    *
    * Fault tolerance: when the SparkContext has a checkpoint dir
    * configured (`sc.setCheckpointDir`), per-round materialization uses
    * reliable `checkpoint()` — executor loss mid-loop replays from the
    * checkpoint store. Without one (local test mode) it falls back to
    * `localCheckpoint()`. The convergence flag is computed inside the
    * round's plan and read off the materialized result, so no extra join
    * or recompute per round.
    *
    * @throws IllegalStateException if maxIter rounds pass without
    *         convergence — a silent non-minimal labeling would corrupt
    *         downstream dedup, so this fails loudly instead.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponentsWithStats(pairs, maxIter)._1

  /** [[connectedComponents]] plus (rounds used, converged) — the stats the
    * convergence spec and capacity planning read.
    */
  def connectedComponentsWithStats(
      pairs: DataFrame,
      maxIter: Int = 20): (DataFrame, Int, Boolean) = {
    val sc = pairs.sparkSession.sparkContext
    def materialize(df: DataFrame): DataFrame =
      if (sc.getCheckpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // materialize the edge list once — it is re-joined every round, and
    // leaving it lazy would re-run the whole upstream pair generation
    // per iteration
    val edges = materialize(
      pairs
        .select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // 1 propagation hop: min over neighborhood labels
      val nbrMin = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      var stepped = labels
        .join(nbrMin, labels("id") === col("id2"), "left_outer")
        .select(
          col("id"),
          col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("lbl"))
      // 2 pointer jumps: lbl := lbl(lbl) — labels only decrease and stay
      // inside the component, so composing the map with itself is safe and
      // roughly doubles how far a min has spread, per jump
      for (_ <- 0 until 2) {
        val m = stepped.select(col("id").as("jid"), col("lbl").as("jl"))
        stepped = stepped
          .join(m, stepped("lbl") === m("jid"), "left_outer")
          .select(
            stepped("id"),
            stepped("old"),
            least(stepped("lbl"), coalesce(col("jl"), stepped("lbl"))).as("lbl"))
      }
      val next = materialize(
        stepped.select(
          col("id"),
          col("lbl").as("cluster_id"),
          (col("lbl") < col("old")).as("__changed")))
      // read convergence off the already-materialized round — a limit-1
      // scan of checkpointed data, not a recompute
      converged = next.filter(col("__changed")).limit(1).isEmpty
      labels = next.drop("__changed")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — labels would be " +
          "non-minimal; raise maxIter")
    (labels, iter, converged)
  }

  /** End-to-end near-dup removal: near-dup pairs → connected components →
    * keep only each cluster's canonical (minimum-id) doc. Docs in no
    * near-dup pair pass through untouched (left-anti join against the
    * non-canonical cluster members).
    *
    * `losslessPairs = false` (default, the scale path) blocks candidates
    * with MinHash-LSH — probabilistic recall, gated in ApproxGatesSpec.
    * `losslessPairs = true` uses the shared-shingle blocking of
    * [[ngramJaccardPairs]] instead: exact result (every J ≥ threshold pair
    * found), more candidates — the right mode when the corpus fits it or
    * when an exact keep-list is required (it is what the d_drop_near_dups
    * oracle checks).
    */
  def dropNearDuplicates(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L,
      losslessPairs: Boolean = false): DataFrame = {
    val reps = exactRepresentatives(df, id, text)
    dropNearDuplicates(reps, id,
      nearDupPairs(reps, id, text, shingleLen, k, bands, threshold, seed, losslessPairs))
  }

  /** Stage-1 of the dedup pipeline, exposed for composition: collapse
    * exact duplicates first (one cheap fingerprint aggregate). Exact dups
    * have J = 1 ≥ any threshold, so removing the non-minimal copies up
    * front changes nothing semantically — but on duplication-heavy corpora
    * it removes the quadratic pair blow-up before the expensive near-dup
    * stage (measured 10×-replicated corpus: near-dup pair count drops from
    * ~250k to the true cross-doc pairs).
    */
  def exactRepresentatives(df: DataFrame, id: Column, text: Column): DataFrame =
    df.join(
      exact(df, id, text).select(col("keep_id").as("__keep")),
      id === col("__keep"),
      "left_semi")

  /** Stage-2 pair generation, exposed for composition: the (a, b) near-dup
    * candidate pairs over the stage-1 representatives, lossless
    * (shared-shingle blocking, every J ≥ threshold pair found) or
    * MinHash-LSH (probabilistic recall, the scale default).
    *
    * This is THE frame to compute once and share: a pipeline that wants
    * clusters AND a keep-list AND a drop-list should derive all three from
    * one pair frame ([[connectedComponents]], [[dropNearDuplicates]],
    * [[dropNearDuplicatesKeepBest]] all accept it) instead of re-running
    * shingle-explode + self-join per consumer. Pair generation is lazy —
    * `persist()` (or checkpoint) the result before fanning out, or each
    * consumer's internal materialization re-runs the upstream.
    */
  def nearDupPairs(
      reps: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L,
      losslessPairs: Boolean = false): DataFrame =
    if (losslessPairs) ngramJaccardPairs(reps, id, text, shingleLen, threshold)
    else minhashDedup(reps, id, text, shingleLen, k, bands, threshold, seed)

  /** Keep-canonical consumer over a SHARED pair frame: drops every
    * non-minimal member of each pair component from `reps` (the stage-1
    * representatives the pairs were generated over — see
    * [[exactRepresentatives]] / [[nearDupPairs]]). A pipeline that also
    * wants keep-best or the clusters themselves should run
    * [[connectedComponents]] once and use the `FromClusters` variants —
    * CC is iterative and worth sharing just like the pair frame.
    */
  def dropNearDuplicates(reps: DataFrame, id: Column, pairs: DataFrame): DataFrame =
    dropNearDuplicatesFromClusters(reps, id, connectedComponents(pairs))

  /** [[dropNearDuplicates]] over a precomputed `(id, cluster_id)` label
    * table (one [[connectedComponents]] run shared across consumers).
    */
  def dropNearDuplicatesFromClusters(
      reps: DataFrame,
      id: Column,
      clusters: DataFrame): DataFrame = {
    val losers = clusters.filter(col("id") =!= col("cluster_id"))
    reps.join(losers, id === losers("id"), "left_anti")
  }

  /** [[dropNearDuplicates]] with production keep semantics: per near-dup
    * cluster, keep the HIGHEST-`quality` document (tie → smallest id),
    * not the smallest-id one — dedup should retain the best copy, not an
    * arbitrary one. `quality` is any per-row expression over `df`'s
    * columns (token count, an LM score column, …). Exact duplicates share
    * text and therefore quality, so the stage-1 exact collapse still
    * keeps the smallest id — unchanged semantics there.
    *
    * Cost shape: clusters are tiny relative to the corpus, so the winner
    * election runs on the CC label table only — one `min_by` aggregate
    * over (-quality, id) per cluster — and the corpus-sized table sees
    * nothing but the same AQE-broadcast anti-join as
    * [[dropNearDuplicates]]. No corpus-wide window sort.
    */
  def dropNearDuplicatesKeepBest(
      df: DataFrame,
      id: Column,
      text: Column,
      quality: Column,
      shingleLen: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L,
      losslessPairs: Boolean = false): DataFrame = {
    val reps = exactRepresentatives(df, id, text)
    dropNearDuplicatesKeepBest(reps, id, quality,
      nearDupPairs(reps, id, text, shingleLen, k, bands, threshold, seed, losslessPairs))
  }

  /** Keep-best consumer over a SHARED pair frame (see
    * [[dropNearDuplicates]]'s pair-frame overload for the composition
    * contract): per component, keep the highest-`quality` member
    * (tie → smallest id) of `reps` and drop the rest.
    */
  def dropNearDuplicatesKeepBest(
      reps: DataFrame,
      id: Column,
      quality: Column,
      pairs: DataFrame): DataFrame =
    dropNearDuplicatesKeepBestFromClusters(reps, id, quality, connectedComponents(pairs))

  /** [[dropNearDuplicatesKeepBest]] over a precomputed `(id, cluster_id)`
    * label table (one [[connectedComponents]] run shared across
    * consumers).
    */
  def dropNearDuplicatesKeepBestFromClusters(
      reps: DataFrame,
      id: Column,
      quality: Column,
      cc: DataFrame): DataFrame = {
    val qual = reps.select(id.as("__qid"), quality.cast("double").as("__q"))
    val winners = cc
      .join(qual, col("id") === col("__qid"))
      .groupBy(col("cluster_id"))
      .agg(min_by(col("id"), struct((-col("__q")).as("nq"), col("id").as("i")))
        .as("__winner"))
    val losers = cc
      .join(winners, "cluster_id")
      .filter(col("id") =!= col("__winner"))
      .select(col("id"))
    reps.join(losers, id === losers("id"), "left_anti")
  }

  // ---- SimHash ----

  /** 64-bit SimHash per doc: per bit, sum ±1 votes weighted by token-hash
    * bit, sign → bit. Exploded-aggregate shape for the same codegen reason
    * as [[minhashSignatures]]: one xxhash64 per distinct token, 64 scalar
    * conditional sums in a single hash aggregate (vs 64 interpreter passes
    * over a per-row array), then OR the sign bits back into one long.
    */
  def simhashDocs(
      df: DataFrame, id: Column, text: Column, portableHash: Boolean = false): DataFrame = {
    // Lane-packed vote counting: 16 sums of 4×16-bit lanes instead of 64
    // single-bit sums (4× fewer aggregate updates). Lane j of sum g counts
    // tokens whose hash bit (g + 16·j) is set; no cross-lane carry while a
    // doc has < 2^16 distinct tokens (far beyond any real document —
    // tokens are distinct'd first). Bit set in the final hash iff set-count
    // · 2 > n, identical to the ±1-vote sign rule.
    //
    // portableHash: token-hash bit b = bit (b % 4) of the md5 hex
    // nibble b/4 — a convention a SQL oracle replays verbatim
    // (`('0x' || substr(md5(t), b//4 + 1, 1))::BIGINT >> (b % 4) & 1`);
    // xxhash64 stays the cheaper production default.
    val base0 = df.select(id.as("doc_id"), explode(array_distinct(TextOps.tokens(text))).as("t"))
    val (base, bitOf) =
      if (portableHash) {
        val b0 = base0.withColumn("__hex", md5(col("t")))
        def nib(n: Int): Column =
          conv(substring(col("__hex"), n + 1, 1), 16, 10).cast("long")
        (b0, (b: Int) => shiftright(nib(b / 4), b % 4).bitwiseAND(1L))
      } else {
        val b0 = base0.withColumn("h", xxhash64(col("t")))
        (b0, (b: Int) => shiftrightunsigned(col("h"), b).bitwiseAND(1L))
      }
    val votes = base
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n"),
        (0 until 16).map { g =>
          sum(
            (0 until 4)
              .map(j => bitOf(g + 16 * j) * lit(1L << (16 * j)))
              .reduce(_ + _)).as(s"p$g")
        }: _*)
    votes.select(
      col("doc_id"),
      (0 until 64)
        .map { bit =>
          val setCnt = shiftrightunsigned(col(s"p${bit % 16}"), 16 * (bit / 16))
            .bitwiseAND(0xffffL)
          when(setCnt * 2 > col("n"), lit(1L << bit)).otherwise(0L)
        }
        .reduce(_.bitwiseOR(_))
        .as("sh"))
  }

  /** SimHash near-dup candidate pairs: block on 4 16-bit bands (any pair
    * with Hamming distance ≤ 3 shares an exact band), verify Hamming
    * distance ≤ maxHamming via popcount of XOR.
    */
  def simhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxHamming: Int,
      portableHash: Boolean = false): DataFrame = {
    // persisted (round-14): one (doc_id, sh) row per doc, read by both
    // sides of the band self-join — unpersisted, the 64-bit-vote
    // aggregation (16 packed sums over every token) executed twice
    val docs = simhashDocs(df, id, text, portableHash).persist()
    val banded = docs.select(
      col("doc_id"),
      col("sh"),
      posexplode(
        array((0 until 4).map(b =>
          shiftrightunsigned(col("sh"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "band_val")))
    banded
      .as("l")
      .join(
        banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("a"),
        col("r.doc_id").as("b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): per
    * document, the distinct set of per-window minimum k-gram hashes —
    * the GUARANTEED-coverage local sampling that plain "keep hashes
    * ≡ 0 mod p" selection lacks (every shared substring of ≥ w+k−1
    * tokens is certain to contribute at least one common fingerprint, so
    * matching on fingerprints can't miss long overlaps). The standard
    * code/document-overlap detector; fingerprints equi-join downstream
    * exactly like shingle hashes in [[sharedShingleStats]].
    *
    * Hash = md5 hex of the space-joined k-gram (engine-identical, so the
    * lexicographic window-min — and hence the fingerprint SET — is
    * oracle-exact; a 64-bit xxhash is the cheaper production swap).
    * Documents shorter than k tokens contribute their whole text as one
    * gram; fewer than w grams → one window over what exists.
    *
    * Shape: posexplode + lead window (one doc_id exchange, the
    * [[graft.ops.TextOps.shingleHashRows]] cost model), then a second
    * windowed min over gram positions REUSING the same partitioning —
    * Catalyst inserts no extra exchange; the distinct adds the only
    * other shuffle, at fingerprint grain.
    */
  def winnowFingerprints(
      df: DataFrame,
      id: Column,
      text: Column,
      k: Int = 4,
      w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(id.as("doc_id"), posexplode(TextOps.tokens(text)).as(Seq("pos", "t")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until k).map(i => lead(col("t"), i).over(byPos))
    val grams = toks
      .withColumn(
        "h",
        when(
          (if (k == 1) lit(true) else leads.last.isNotNull) || col("pos") === 0,
          md5(concat_ws(" ", (col("t") +: leads): _*))))
      .filter(col("h").isNotNull)
    val nGrams = count(lit(1)).over(Window.partitionBy("doc_id"))
    val winMin = min(col("h")).over(byPos.rowsBetween(0, w - 1))
    grams
      .withColumn("n_grams", nGrams)
      .withColumn("fp", winMin)
      .filter(col("pos") <= greatest(lit(0), col("n_grams") - w))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }
}
