package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stream join operators (SURVEY §2.4).
  *
  * Batch formulations; the watermark-driven streaming versions live in
  * [[graft.streaming.StreamJoins]].
  */
object Joins {

  /** Interval (range) equi-join — reference J1
    * (`gmall-order-pay/.../app/PayReceiptWithJoinApp.java:50-70`:
    * `orders.intervalJoin(receipts).between(-3s, +5s)` on txId).
    *
    * Inner join on `key` with `rightTs` ∈ [leftTs + lowerSec, leftTs +
    * upperSec]. Left/right frames must already have disjoint column names;
    * `leftTs`/`rightTs` are column names, `key` the shared equi-key pair.
    * Plan shape: hash exchange both sides on the equi-key, range predicate
    * evaluated inside the join — no cross product.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      rightTs: Column,
      lowerSec: Long,
      upperSec: Long): DataFrame =
    left.join(
      right,
      leftKey === rightKey &&
        unix_micros(rightTs) >= unix_micros(leftTs) + lowerSec * 1000000L &&
        unix_micros(rightTs) <= unix_micros(leftTs) + upperSec * 1000000L,
      "inner")

  /** As-of join: each probe row paired with the LATEST build row whose
    * timestamp is ≤ the probe's, per key (left-join semantics — probes
    * with no prior build survive with null build columns). The classic
    * point-in-time lookup (feature-store reads, "state of X when Y
    * happened") that the reference approximates with its keyed connect +
    * ValueState pattern (`gmall-order-pay/.../app/
    * PayReceiptWithConnectApp.java:91-112`: latest pay retained in state,
    * consulted when the other side arrives).
    *
    * Spark-first shape: NOT a join. Union the two inputs as a tagged
    * event stream, then `last(build, ignoreNulls) over (partition by key
    * order by ts, side rows unbounded preceding..current)` — at equal
    * timestamps builds sort before probes, so a same-instant build is
    * visible (inclusive ≤). ONE hash exchange on the key plus one sort;
    * the naive formulation (range join + per-probe max + re-join) pays
    * three shuffles and rescans the build side per probe. This is the
    * merge-scan plan a native engine's ASOF JOIN runs, expressed with
    * stock operators.
    *
    * Determinism: several builds can share (key, ts). `buildTieBreak`
    * names build columns appended to the window ordering so the winner
    * is well-defined — the GREATEST tie-break value wins (pass e.g. the
    * build's id; or pre-dedupe to one build per (key, ts)).
    *
    * Inputs must have disjoint column names; output = probe columns ++
    * build columns.
    */
  def asOfJoin(
      probes: DataFrame,
      builds: DataFrame,
      probeKey: Column,
      buildKey: Column,
      probeTs: Column,
      buildTs: Column,
      buildTieBreak: Seq[String] = Nil): DataFrame = {
    val pCols = probes.columns.toSeq
    val bCols = builds.columns.toSeq
    require(pCols.intersect(bCols).isEmpty, "probe/build column names must be disjoint")
    val pStruct = struct(pCols.map(probes(_)): _*)
    val bStruct = struct(bCols.map(builds(_)): _*)
    val b = builds.select(
      buildKey.as("__k"), buildTs.as("__t"), lit(0).as("__side"),
      lit(null).cast(probes.select(pStruct).schema.head.dataType).as("__p"),
      bStruct.as("__b"))
    val p = probes.select(
      probeKey.as("__k"), probeTs.as("__t"), lit(1).as("__side"),
      pStruct.as("__p"),
      lit(null).cast(builds.select(bStruct).schema.head.dataType).as("__b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k")
      .orderBy((col("__t").asc +: col("__side").asc +:
        buildTieBreak.map(f => col("__b").getField(f).asc)): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    b.unionByName(p)
      .withColumn("__m", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        pCols.map(f => col("__p").getField(f).as(f)) ++
          bCols.map(f => col("__m").getField(f).as(f)): _*)
  }

  /** Two-stream reconciliation — reference J2
    * (`gmall-order-pay/.../app/PayReceiptWithConnectApp.java:62-157`:
    * keyed connect of pays and receipts, matched → "Payed And Receipt",
    * unmatched after a timeout → side outputs "Payed No Receipt" /
    * "No Payed But Receipt").
    *
    * Batch semantics: full-outer key-equi join with a time-proximity bound;
    * the three Flink outputs collapse into a `status` column (tagged-union
    * encoding of side outputs — split downstream with `filter`).
    */
  def reconcile(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      rightTs: Column,
      toleranceSec: Long,
      matchedStatus: String = "matched",
      leftOnlyStatus: String = "left_only",
      rightOnlyStatus: String = "right_only"): DataFrame =
    left
      .join(
        right,
        leftKey === rightKey &&
          abs(unix_micros(rightTs) - unix_micros(leftTs)) <= toleranceSec * 1000000L,
        "full_outer")
      .withColumn(
        "status",
        when(leftTs.isNotNull && rightTs.isNotNull, matchedStatus)
          .when(leftTs.isNotNull, leftOnlyStatus)
          .otherwise(rightOnlyStatus))

  /** Bloom-pruned semi-join: filter the FACT side through a Bloom filter
    * of the dimension's keys BEFORE the exact `left_semi` shuffle — the
    * standard 100 TB pattern when the dim's row set is too big to
    * broadcast as a hash table but its KEY SET fits a few megabytes of
    * bloom bits (Spark's own InjectRuntimeFilter plays this trick for
    * selective joins; this operator is the explicit, plannable form with
    * a guaranteed prune regardless of the optimizer's selectivity
    * estimate). Semantics are EXACTLY the plain semi-join's: the bloom
    * admits false positives only, and the exact semi-join behind it
    * removes them — so the query shares a plain `IN`-subquery oracle.
    *
    * Mechanics: one aggregation job builds the dim-key bloom
    * (`BloomFilterAggregate` over xxhash64 of the key — mergeable
    * per-partition sketches, O(numBits) memory), the finished bits land
    * in the plan as a LITERAL (required by `BloomFilterMightContain`'s
    * type check, and what Spark's runtime filter does with its subquery
    * result too), and the fact scan filters through codegen'd
    * `might_contain` before any exchange. Driver holds one bloom of
    * `expectedItems` keys at `fpp` — e.g. 10⁸ keys @ 1 % ≈ 120 MB bits
    * is the practical ceiling; beyond that fall back to the plain
    * shuffle semi-join.
    */
  def bloomPrunedSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.BloomJoinExpressions
    import org.apache.spark.util.sketch.BloomFilter
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bits = dim
      .agg(BloomJoinExpressions.bloomAgg(dimKey, expectedItems, numBits).as("__bf"))
      .head.getAs[Array[Byte]](0)
    fact
      .filter(BloomJoinExpressions.mightContain(bits, factKey))
      .join(dim.select(dimKey.as("__dk")).distinct(), factKey === col("__dk"), "left_semi")
  }

  /** Skew-immune shuffle equi-join: SALT the fact side, REPLICATE the
    * dimension side — the classic fix when one fact key is hot enough to
    * overflow its shuffle partition AND the dim side is too big to
    * broadcast (when it isn't, broadcast and no salting is needed; when
    * AQE's skew-join kicks in it does this adaptively — this operator is
    * the deterministic, planner-independent form, the working version of
    * the reference's hand-salting P5/A4 which salted an AGGREGATE where
    * Spark's partial agg already makes it a no-op).
    *
    * Each fact row gets `__salt = pmod(xxhash64(rowDisc), buckets)` — a
    * deterministic spread from any high-cardinality discriminator column
    * (an event id, a row offset) — and the dim side is exploded
    * `buckets`-ways, so the join key becomes (key, salt): the hot key's
    * rows land on `buckets` different reducers instead of one. Inner-join
    * semantics are EXACTLY the plain join's (each fact row meets its dim
    * row in exactly one bucket); cost is a `buckets`× dim-side
    * replication, the standard trade. Result column set = fact ⊎ dim
    * (salt dropped).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      rowDisc: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "need buckets >= 1")
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(rowDisc), lit(buckets)))
    val repDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
      // shuffle_hash: pin the shuffled-join shape this operator exists
      // for (broadcast would defeat the demonstration AND the salting)
      .hint("shuffle_hash")
    saltedFact
      .join(repDim, factKey === dimKey && saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
