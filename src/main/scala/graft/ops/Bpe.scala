package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the actual merge-learning loop
  * (Sennrich et al. 2016, arXiv:1508.07909), not the regex approximation in
  * [[TextOps.bpeishTokenCount]].
  *
  * Scale design (the classic one): the corpus is collapsed ONCE into a
  * (word, freq) table — a single shuffle over the corpus — and every merge
  * round after that runs over the DISTINCT-WORD table only, so a round
  * costs O(vocab), not O(corpus). At 100 TB the word table is ~10⁸ rows
  * where the corpus is ~10¹¹; the loop never touches the corpus again.
  * Each round:
  *
  *   1. pair counts: per word, zip the symbol array with its tail and
  *      explode — `zip_with`/`slice`/`explode`, all codegen'd HOFs; a
  *      freq-weighted partial-aggregated sum per (left, right) pair (the
  *      pre-aggregation makes the shuffle carry pair-grain rows, immune to
  *      hot pairs);
  *   2. argmax on the driver: one `orderBy(...).limit(1)` over the tiny
  *      pair-count result — deterministic tie-break (highest count, then
  *      lexicographic (left, right)), so training is reproducible on any
  *      engine/partitioning;
  *   3. apply the merge to the symbol arrays with a left fold
  *      (`aggregate` HOF): greedy left-to-right non-overlapping pairing,
  *      exactly the sequential BPE semantics (the fold's "merge with the
  *      accumulator's last element" step reproduces greedy pairing because
  *      a merged symbol is never string-equal to the left symbol it
  *      replaced).
  *
  * The driver holds only the k merges (bounded, tiny); per-round results
  * are persisted and the previous round unpersisted, with a periodic
  * `localCheckpoint` to truncate the k-deep HOF lineage — on a cluster
  * you'd spill the word table to parquet every ~50 rounds instead.
  *
  * End-of-word handling: the Sennrich `</w>` marker is appended as its own
  * initial symbol, so merges can learn word-final units.
  */
object Bpe {

  /** Marker appended to each word's symbol sequence. */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String)

  /** (word, freq) table for `docs` — the one corpus-grain shuffle.
    * Lowercased whitespace tokenization, matching [[TextOps.tokens]].
    */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs
      .select(explode(TextOps.tokens(lower(text))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol array of a word: its characters plus [[EndOfWord]].
    * The filter guards against `split`'s empty-string edge elements.
    */
  private def initialSymbols(word: Column): Column =
    concat(
      filter(split(word, ""), x => x =!= ""),
      array(lit(EndOfWord)))

  /** Greedy left-to-right application of one merge (left, right) to a
    * symbol array, as a codegen'd `aggregate` fold: append each symbol,
    * except when the accumulator ends with `left` and the incoming symbol
    * is `right` — then replace the tail element with the merged symbol.
    */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(
      syms,
      expr("cast(array() as array<string>)"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
          concat(
            slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x))))

  /** Freq-weighted adjacent-pair counts over a (syms, freq) frame. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(
        explode(
          zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"),
        col("freq"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right merge application, driver-side form (same
    * semantics as the codegen'd [[applyMerge]] fold).
    */
  private def applyMergeSeq(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Driver-side merge loop over a COLLECTED (syms, freq) table — the
    * fast path when the vocabulary fits the bounded driver budget.
    * Identical semantics to the distributed rounds (same deterministic
    * tie-break); BpeSpec pins the two paths equal on the real corpus.
    */
  private def trainDriver(
      words0: Seq[(Seq[String], Long)],
      nMerges: Int,
      minPairFreq: Long): Seq[Merge] = {
    var words = words0
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      val eligible = counts.filter(_._2 >= minPairFreq)
      if (eligible.isEmpty) done = true
      else {
        val ((l, r), _) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(rank, l, r)
        words = words.map { case (s, f) => (applyMergeSeq(s, l, r), f) }
        rank += 1
      }
    }
    out.result()
  }

  /** Train `nMerges` BPE merges over `docs`. Returns the learned merge
    * table as a local Seq — THE tokenizer artifact (bounded: k rows).
    * Stops early if no pair occurs at least `minPairFreq` times.
    *
    * When the distinct-word table has at most `driverVocabLimit` rows the
    * merge loop runs on the driver over the collected (symbols, freq)
    * table — a BOUNDED collect (O(limit · word length), the same posture
    * as PQ codebook training) that replaces k collect-barrier rounds
    * with one, exactly what sentencepiece-style trainers do. Above the
    * limit the loop stays fully distributed (the 100 TB path); both
    * paths share the deterministic tie-break and BpeSpec pins them
    * equal. Set `driverVocabLimit = 0` to force the distributed loop.
    */
  def train(
      docs: DataFrame,
      text: Column,
      nMerges: Int,
      minPairFreq: Long = 2L,
      driverVocabLimit: Long = 100000L): Seq[Merge] = {
    var words = wordFreq(docs, text)
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .persist()
    val vocabN = words.count()
    if (vocabN <= driverVocabLimit) {
      val local = words
        .collect()
        .map(r => (r.getSeq[String](0).toSeq, r.getLong(1)))
        .toSeq
      words.unpersist()
      return trainDriver(local, nMerges, minPairFreq)
    }
    // ONE job per round: the round's pair-count collect() materializes the
    // persisted frame as a side effect, so the parent stays cached until
    // the round after its child is materialized (no explicit count() job,
    // no recompute-from-root on unpersist)
    var parent: DataFrame = null
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = pairCounts(words)
        .filter(col("cnt") >= minPairFreq)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1)
        .collect() // `words` is now materialized in the cache
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, l, r)
        parent = words
        words = parent
          .select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
          .persist()
        // truncate the HOF lineage periodically: each round nests another
        // aggregate() expression; 10-deep is fine, 100-deep is not
        if ((rank + 1) % 10 == 0) words = words.localCheckpoint()
        rank += 1
      }
    }
    if (parent != null) parent.unpersist()
    words.unpersist()
    merges.result()
  }

  /** The trained tokenizer as a DataFrame — the `queries` surface:
    * (rank, left, right, merged). Deterministic given the corpus.
    */
  def trainTable(docs: DataFrame, text: Column, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, text, nMerges)
      .map(m => (m.rank, m.left, m.right, m.left + m.right))
      .toDF("rank", "left", "right", "merged")
  }

  /** Encode under trained merges: apply the k merges in rank order to the
    * DISTINCT-WORD table (k × O(vocab) work, corpus untouched), then map
    * each document's words through the resulting word→n_tokens dictionary
    * with one equi-join. Returns (id, n_tokens) per document — the token
    * count a trained BPE tokenizer would produce.
    *
    * The join is broadcast when the vocab fits (Spark's threshold decides;
    * at 100 TB vocab-scale it becomes a shuffle equi-join on the word —
    * both sides word-grain, never corpus-grain on the build side).
    */
  def encodeTokenCounts(
      docs: DataFrame,
      id: Column,
      text: Column,
      merges: Seq[Merge],
      driverVocabLimit: Long = 100000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = wordFreq(docs, text)
      .select(col("word"), initialSymbols(col("word")).as("syms"))
      .persist()
    val sorted = merges.sortBy(_.rank)
    val encoded =
      if (vocab0.count() <= driverVocabLimit) {
        // bounded driver path (same budget rationale as train): apply the
        // merges to the collected vocab, ship back a (word, n) dictionary
        val dict = vocab0
          .collect()
          .map { r =>
            val syms = sorted.foldLeft(r.getSeq[String](1).toSeq)((s, m) =>
              applyMergeSeq(s, m.left, m.right))
            (r.getString(0), syms.length.toLong)
          }
          .toSeq
        vocab0.unpersist()
        dict.toDF("word", "n_word_tokens")
      } else {
        // distributed fold path (the 100 TB shape): the persist only
        // served the size probe — drop it, the plan recomputes the
        // word-freq aggregate once at action time
        vocab0.unpersist()
        sorted.zipWithIndex
          .foldLeft(vocab0.toDF()) { case (v, (m, i)) =>
            val next =
              v.select(col("word"), applyMerge(col("syms"), m.left, m.right).as("syms"))
            if ((i + 1) % 10 == 0) next.localCheckpoint() else next
          }
          .select(col("word"), size(col("syms")).cast("long").as("n_word_tokens"))
      }
    docs
      .select(id.as("id"), explode(TextOps.tokens(lower(text))).as("word"))
      .filter(col("word") =!= "")
      .join(encoded, "word")
      .groupBy(col("id"))
      .agg(sum(col("n_word_tokens")).as("n_tokens"))
  }
}
