package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactness gate for distributed BPE training: the Spark merge loop must
  * equal a straightforward sequential implementation of Sennrich BPE
  * (greedy left-to-right merge application, highest-count pair first,
  * lexicographic tie-break) on the same word-frequency table. Training is
  * deterministic by construction, so the gate is strict equality — this
  * is the oracle for the non-SQL-expressible t_bpe_train query.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference implementation ----

  private def seqWordFreq(docs: Seq[String]): Map[Seq[String], Long] =
    docs
      .flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, ws) =>
        (w.map(_.toString) :+ Bpe.EndOfWord, ws.size.toLong)
      }

  private def seqApplyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def seqTrain(
      docs: Seq[String], nMerges: Int, minPairFreq: Long): Seq[(Int, String, String)] = {
    var words = seqWordFreq(docs)
    val merges = Seq.newBuilder[(Int, String, String)]
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
        merges += ((rank, l, r))
        words = words
          .toSeq
          .map { case (syms, f) => (seqApplyMerge(syms, l, r), f) }
          .groupBy(_._1)
          .map { case (s, g) => (s, g.map(_._2).sum) }
        rank += 1
      }
    }
    merges.result()
  }

  private def seqEncodeLen(word: String, merges: Seq[(Int, String, String)]): Int = {
    var syms: Seq[String] = word.map(_.toString) :+ Bpe.EndOfWord
    for ((_, l, r) <- merges.sortBy(_._1)) syms = seqApplyMerge(syms, l, r)
    syms.length
  }

  // ---- gates ----

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quicker brown foxes jump over lazy dogs",
    "low lower lowest newer newest wider widest",
    "low lower newer newer newest the the the")

  test("trainTable equals the sequential Sennrich reference, merge by merge") {
    val docs = corpus.toDF("text")
    val got = Bpe.trainTable(docs, col("text"), nMerges = 20)
      .select("rank", "left", "right")
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    val want = seqTrain(corpus, 20, 2L)
    assert(got == want, s"\nspark: $got\nseq:   $want")
    assert(got.size == 20, "corpus is rich enough for all 20 merges")
  }

  test("train stops early when no pair reaches minPairFreq") {
    val docs = Seq("ab cd ef").toDF("text") // every pair occurs once
    assert(Bpe.train(docs, col("text"), nMerges = 5, minPairFreq = 2L).isEmpty)
  }

  test("driver and distributed merge loops learn identical merges (real corpus)") {
    val docs = graft.io.Tables(spark, "/root/testdata/sf0.001").documents
    val fast = Bpe.train(docs, col("text"), nMerges = 12) // vocab << limit: driver path
    val dist = Bpe.train(docs, col("text"), nMerges = 12, driverVocabLimit = 0L)
    assert(fast == dist, s"\ndriver: $fast\ndistributed: $dist")
    val encFast = Bpe.encodeTokenCounts(docs, col("doc_id"), col("text"), fast)
      .as[(Long, Long)].collect().toMap
    val encDist = Bpe
      .encodeTokenCounts(docs, col("doc_id"), col("text"), fast, driverVocabLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(encFast == encDist)
  }

  test("encodeTokenCounts equals per-word sequential encoding under the trained merges") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, col("text"), nMerges = 12)
    val got = Bpe.encodeTokenCounts(docs, col("doc_id"), col("text"), merges)
      .as[(Long, Long)].collect().toMap
    val seqM = merges.map(m => (m.rank, m.left, m.right))
    val want = corpus.zipWithIndex.map { case (t, i) =>
      (i.toLong,
        t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
          .map(w => seqEncodeLen(w, seqM).toLong).sum)
    }.toMap
    assert(got == want)
  }

  test("real corpus sf0.001: 16 merges train, all ranks distinct, encode covers every doc") {
    val docs = graft.io.Tables(spark, "/root/testdata/sf0.001").documents
    val merges = Bpe.train(docs, col("text"), nMerges = 16)
    assert(merges.size == 16)
    assert(merges.map(m => (m.left, m.right)).distinct.size == 16)
    val enc = Bpe.encodeTokenCounts(docs, col("doc_id"), col("text"), merges)
    assert(enc.count() == docs.count())
    // merged tokenization is strictly coarser than character-grain
    val charGrain = docs.select(
      sum(size(filter(split(lower(col("text")), ""), x => x =!= ""))).cast("long"))
      .head.getLong(0)
    val bpeGrain = enc.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(bpeGrain < charGrain)
  }
}
