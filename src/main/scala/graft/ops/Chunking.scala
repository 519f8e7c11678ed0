package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document → training-sequence shaping: overlapping token-window chunking
  * and deterministic token-budget packing. Both are per-row / per-shard
  * column pipelines — no driver loops, no global ordering — and both are
  * engine-portable (the only hash is md5, the arithmetic is integer), so
  * a DuckDB oracle replays them bit-for-bit.
  */
object Chunking {

  /** Split each document into overlapping chunks of `chunkTokens`
    * whitespace tokens with `overlap` tokens shared between neighbors
    * (the RAG/pretraining windowing shape).
    *
    * Chunk starts are `0, stride, 2·stride, …` (stride = chunkTokens −
    * overlap) while `start + overlap < n`: the final chunk is the only
    * one shorter than `chunkTokens`, and a trailing window that would
    * carry no new content beyond the overlap is never emitted. Every doc
    * yields ≥ 1 chunk (a short doc is its own chunk).
    *
    * Scale: `explode` over a per-row `sequence` — output rows ≈ input
    * tokens / stride, no shuffle at all; the chunk slice is computed from
    * the doc's token array in place.
    */
  def chunk(
      df: DataFrame,
      id: Column,
      text: Column,
      chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    df.select(id.as("doc_id"), TextOps.tokens(text).as("__w"))
      .withColumn("__n", size(col("__w")))
      .select(
        col("doc_id"),
        col("__w"),
        col("__n"),
        explode(
          sequence(
            lit(0),
            greatest(lit(0), col("__n") - lit(overlap + 1)),
            lit(stride))).as("__start"))
      .select(
        col("doc_id"),
        (col("__start") / lit(stride)).cast("long").as("chunk_id"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long").as("n_tokens"),
        array_join(slice(col("__w"), col("__start") + lit(1), lit(chunkTokens)), " ")
          .as("chunk"))
  }

  /** Deterministic token-budget packing: shard documents by a stable
    * md5-derived key, concatenate each shard's docs in hash order, and
    * assign every doc to the `budgetTokens`-sized pack in which it STARTS
    * (block-packing semantics: pack boundaries may split a document; a
    * pack holds every doc whose first token falls inside it).
    *
    * Returns (doc_id, shard, pack_id, offset_tokens) — offset_tokens is
    * the doc's start position within its pack, so a writer can lay out
    * the pack without re-deriving the order.
    *
    * Scale: ONE hash exchange on `shard`; the running sum is a window
    * per shard, so parallelism = `nShards` — set it to a small multiple
    * of the cluster's cores (the default 64 is sized for local[32]).
    * No global ordering exists anywhere: this is the scalable
    * approximation of bin packing used by block-packed training datasets
    * (first-fit packing is inherently sequential; per-shard streaming
    * concat is within `docTokens/budget` of optimal occupancy and fully
    * parallel).
    */
  def packByBudget(
      df: DataFrame,
      id: Column,
      tokenCount: Column,
      budgetTokens: Long,
      nShards: Int = 64): DataFrame = {
    require(budgetTokens > 0 && nShards > 0, "need positive budget and shards")
    val h = conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(
        id.as("doc_id"),
        tokenCount.cast("long").as("__tok"),
        h.as("__h"),
        pmod(h, lit(nShards.toLong)).as("shard"))
      .withColumn("__cum", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .select(
        col("doc_id"),
        col("shard"),
        // `div`, not `/`: exact integer division (no double rounding)
        expr(s"__cum div ${budgetTokens}L").as("pack_id"),
        (col("__cum") % lit(budgetTokens)).as("offset_tokens"))
  }

  /** Output row of [[packGreedy]] — `doc_id` as string (callers restore
    * the source type); `offset_tokens` is the doc's start inside its
    * pack. */
  case class GreedyPacked(doc_id: String, shard: Long, pack_id: Long, offset_tokens: Long)

  /** ATOMIC-document greedy packing: like [[packByBudget]] but a document
    * never straddles a pack boundary — the SFT/instruction-tuning posture,
    * where each training sequence holds whole samples and a doc that
    * would overflow the current pack opens the next one (first-fit on the
    * per-shard stream; an oversize doc occupies a pack alone).
    *
    * Same deterministic layout as [[packByBudget]]: md5-derived shard,
    * docs consumed in (hash, id) order within the shard. The fold is
    * genuinely sequential per shard (each doc's pack depends on every
    * predecessor's), so it runs as `flatMapSortedGroups` — Spark sorts
    * each shard's rows for us and the fold streams the iterator, O(1)
    * state, never materializing the group.
    *
    * Scale: ONE hash exchange on `shard`, parallelism = `nShards` (size
    * it to a small multiple of the cluster's cores, exactly like
    * [[packByBudget]]); the sequential scan per shard is the price of
    * exact first-fit semantics — the relaxation that removes it is
    * [[packByBudget]]'s block packing.
    */
  def packGreedy(
      df: DataFrame,
      id: Column,
      tokenCount: Column,
      budgetTokens: Long,
      nShards: Int = 64): DataFrame = {
    require(budgetTokens > 0 && nShards > 0, "need positive budget and shards")
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long")
    df.select(
        pmod(h, lit(nShards.toLong)).as("shard"),
        h.as("__h"),
        id.cast("string").as("doc_id"),
        tokenCount.cast("long").as("__tok"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("__h"), col("doc_id")) { (shard, it) =>
        var fill = 0L
        var pack = 0L
        it.map { case (_, _, docId, tok) =>
          if (fill > 0L && fill + tok > budgetTokens) { pack += 1L; fill = 0L }
          val off = fill
          fill += tok
          GreedyPacked(docId, shard, pack, off)
        }
      }
      .toDF()
  }

  /** Content-defined chunking (rsync/CDC family: boundaries from a
    * rolling hash, not fixed offsets): cut after token `i` whenever the
    * polynomial hash of the `window` tokens ending at `i` lands in the
    * zero residue class mod `2^maskBits` — expected chunk length
    * `2^maskBits` tokens. Because a cut depends only on the `window`
    * tokens before it, an insertion re-chunks at most the text within
    * `window` tokens of the edit and every later chunk is IDENTICAL —
    * the invariant that makes chunk-grain exact dedup stable across
    * corpus versions/snapshots where [[chunk]]'s fixed-stride windows
    * all shift. Over-long gaps are force-split at `maxChunk` offsets
    * from the preceding content cut (those splits are content-local
    * too: anchored to a cut, not to position 0).
    *
    * Determinism/portability: the only hash is md5 (40-bit per-token
    * ints; the 31-ary Horner fold is reduced mod 2^40 each step so both
    * engines stay in exact int64 range) — a DuckDB oracle replays the
    * whole pipeline bit-for-bit. Empty/whitespace-only docs yield no
    * chunks; every other doc yields ≥ 1.
    *
    * Scale: per-row array expressions only — the rolling fold is
    * O(tokens · window) inside one codegen'd projection, output rows ≈
    * tokens / 2^maskBits via one `posexplode`, no shuffle anywhere.
    */
  def contentDefinedChunks(
      df: DataFrame,
      id: Column,
      text: Column,
      window: Int = 8,
      maskBits: Int = 5,
      maxChunk: Int = 128): DataFrame = {
    require(window >= 1 && maskBits >= 1 && maxChunk >= 2,
      "need window >= 1, maskBits >= 1, maxChunk >= 2")
    val mod = lit(1L << 40)
    val emptyInts = array().cast("array<integer>")

    val withCuts = df
      .select(id.as("doc_id"), TextOps.tokens(text).as("__w"))
      .withColumn("__n", size(col("__w")))
      .filter(col("__n") > 0 && (col("__w") =!= array(lit(""))))
      .withColumn(
        "__h",
        transform(col("__w"), t => conv(substring(md5(t), 1, 10), 16, 10).cast("long")))
      .withColumn(
        "__cuts",
        filter(
          when(col("__n") >= window, sequence(lit(window), col("__n"))).otherwise(emptyInts),
          i =>
            aggregate(
              slice(col("__h"), i - lit(window - 1), lit(window)),
              lit(0L),
              (a, x) => pmod(a * lit(31L) + x, mod)) % lit(1L << maskBits) === lit(0L)))
      .withColumn(
        "__b1",
        array_distinct(array_sort(
          concat(array(lit(0)), col("__cuts"), array(col("__n"))))))
      .withColumn(
        "__b",
        array_distinct(array_sort(concat(
          col("__b1"),
          flatten(transform(
            sequence(lit(1), size(col("__b1")) - 1),
            j => {
              val s = element_at(col("__b1"), j)
              val e = element_at(col("__b1"), j + 1)
              when(e - s > maxChunk, sequence(s + lit(maxChunk), e - lit(1), lit(maxChunk)))
                .otherwise(emptyInts)
            }))))))
    withCuts
      .select(
        col("doc_id"),
        col("__w"),
        posexplode(transform(
          sequence(lit(1), size(col("__b")) - 1),
          j => struct(
            element_at(col("__b"), j).as("s"),
            element_at(col("__b"), j + 1).as("e")))).as(Seq("chunk_id", "__c")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("__c.e") - col("__c.s")).cast("long").as("n_tokens"),
        array_join(slice(col("__w"), col("__c.s") + 1, col("__c.e") - col("__c.s")), " ")
          .as("chunk"))
  }

  /** Chunk-grain dedup over a chunk frame ([[contentDefinedChunks]]'s
    * output shape: doc_id, chunk_id, n_tokens, chunk) — the
    * dedup-storage / RAG-ingest accounting CDC boundaries exist for:
    * fingerprint every chunk, first owner in (doc_id, chunk_id) order
    * keeps it, and each doc reports how much of its chunk/token mass is
    * already stored elsewhere. Because the boundaries are
    * content-defined, an upstream edit re-chunks only the edited region,
    * so unchanged chunks keep their fingerprints and keep deduping
    * across corpus snapshots.
    *
    * Returns (doc_id, n_chunks, dup_chunks, n_tokens, dup_tokens) in
    * exact integers (ratios are the consumer's division — keeps the row
    * hash-portable across engines).
    *
    * Scale: every exchange is partial-aggregated. The owner election is
    * `groupBy(__fp).agg(min(struct(doc_id, chunk_id, n_tokens)))` — the
    * map-side combine collapses a boilerplate chunk duplicated a
    * billion times to one partial row per task BEFORE the fingerprint
    * exchange, so no task ever materializes (let alone sorts) the full
    * copy set of a hot fingerprint (the `row_number over
    * partitionBy(fp)` formulation this replaced did exactly that). The
    * per-doc totals and the per-doc owner counts each reduce at doc
    * grain, and the final join matches one row to at most one row per
    * doc. Chunk text never shuffles — only its 16-byte md5 and its
    * length ride any exchange.
    */
  def chunkDedupStats(chunks: DataFrame): DataFrame = {
    val fpRows = chunks.select(
      col("doc_id"), col("chunk_id"), col("n_tokens"), md5(col("chunk")).as("__fp"))
    // One owner per distinct fingerprint: first (doc_id, chunk_id) in
    // order. n_tokens rides in the struct tail (identical across copies
    // of a fingerprint anyway) so the owner's token mass needs no join
    // back to the chunk frame.
    val ownersPerDoc = fpRows
      .groupBy(col("__fp"))
      .agg(min(struct(col("doc_id"), col("chunk_id"), col("n_tokens"))).as("__own"))
      .groupBy(col("__own.doc_id").as("doc_id"))
      .agg(
        count(lit(1)).as("__own_chunks"),
        sum(col("__own.n_tokens")).as("__own_tokens"))
    fpRows
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"))
      .join(ownersPerDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_chunks"),
        (col("n_chunks") - coalesce(col("__own_chunks"), lit(0L))).as("dup_chunks"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__own_tokens"), lit(0L))).as("dup_tokens"))
  }
}
