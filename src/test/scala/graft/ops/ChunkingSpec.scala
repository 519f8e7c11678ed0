package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge cases for chunking/packing/stratified sampling beyond what the
  * DuckDB oracle replays (d_chunk / p_pack / p_sample_stratified).
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("chunk: boundary sizes — exactly chunkTokens is one chunk, +1 token is two") {
    val words = (1 to 65).map(i => s"w$i")
    val df = docs(
      "exact" -> words.take(64).mkString(" "),
      "plus1" -> words.mkString(" "),
      "short" -> "just three words",
      "blank" -> "   ")
    val out = Chunking.chunk(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(out("exact").length == 1 && out("exact").head._3 == 64)
    assert(out("plus1").length == 2)
    // second chunk = last 16 tokens of chunk 1 + the 1 new token
    assert(out("plus1").sortBy(_._2).last._4 == words.slice(48, 65).mkString(" "))
    assert(out("short") sameElements Array(("short", 0L, 3L, "just three words")))
    assert(out("blank").length == 1) // whitespace-only doc: one (empty) chunk
  }

  test("chunk: stride coverage — dropping each chunk's overlap reconstructs the doc") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val chunks = Chunking.chunk(docs("d" -> text), col("doc_id"), col("text"))
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
    val rebuilt = chunks.flatMap { case (cid, toks) =>
      if (cid == 0) toks else toks.drop(16)
    }
    assert(rebuilt.toSeq == text.split(" ").toSeq)
    // every non-final chunk is full-size; neighbors share the 16-token overlap
    chunks.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a.length == 64 && a.takeRight(16) == b.take(16))
    case _ => ()
    }
  }

  test("packByBudget: offsets stay inside the budget, packs fill monotonically per shard") {
    val df = (1 to 200).map(i => (s"doc$i", (i % 97) + 1)).toDF("doc_id", "tok")
    val out = Chunking.packByBudget(df, col("doc_id"), col("tok"), 256L, nShards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 200)
    assert(out.forall { case (_, _, pack, off) => pack >= 0 && off >= 0 && off < 256 })
    // all doc sizes < budget here, so no pack index can be skipped: each
    // shard's packs are contiguous 0..max
    out.groupBy(_._2).foreach { case (_, rows) =>
      val packs = rows.map(_._3).toSet
      assert(packs == (0L to packs.max).toSet)
    }
    // deterministic: a re-run assigns identically
    val again = Chunking.packByBudget(df, col("doc_id"), col("tok"), 256L, nShards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1) sameElements again.sortBy(_._1))
  }

  test("packByBudget: a doc larger than the budget spans packs without breaking successors") {
    val df = Seq(("big", 1000), ("a", 10), ("b", 10)).toDF("doc_id", "tok")
    // (pack, offset) is lexicographically the assignment order: cum strictly
    // increases per shard, so this sort recovers the concatenation stream
    val out = Chunking.packByBudget(df, col("doc_id"), col("tok"), 256L, nShards = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._2, r._3))
    // docs after the big one start in the pack where the stream cursor landed
    val cum = out.map(_._1).foldLeft(Map.empty[String, Long] -> 0L) {
      case ((m, acc), id) =>
        val tok = Map("big" -> 1000L, "a" -> 10L, "b" -> 10L)(id)
        (m + (id -> acc), acc + tok)
    }._1
    out.foreach { case (id, pack, off) =>
      assert(pack == cum(id) / 256 && off == cum(id) % 256, s"$id")
    }
  }

  test("packGreedy: equals a driver-side first-fit fold over the md5 stream order") {
    val sizes = (1 to 200).map(i => s"doc$i" -> ((i * 37) % 300 + 1).toLong).toMap
    val df = sizes.toSeq.toDF("doc_id", "tok")
    val out = Chunking.packGreedy(df, col("doc_id"), col("tok"), 256L, nShards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def h(id: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = sizes.keys.toSeq
      .groupBy(id => ((h(id) % 4) + 4) % 4)
      .flatMap { case (shard, ids) =>
        var fill = 0L; var pack = 0L
        ids.sortBy(id => (h(id), id)).map { id =>
          val tok = sizes(id)
          if (fill > 0 && fill + tok > 256L) { pack += 1; fill = 0L }
          val off = fill; fill += tok
          (id, shard, pack, off)
        }
      }.toSet
    assert(out.toSet == want)
    // atomicity: no doc's span crosses its pack boundary (oversize docs
    // excepted — they sit alone at offset 0)
    out.foreach { case (id, _, _, off) =>
      assert(off + sizes(id) <= 256L || off == 0L, s"$id straddles")
    }
  }

  test("packGreedy: oversize doc sits alone; successors open a fresh pack") {
    val df = Seq(("big", 1000L), ("a", 10L), ("b", 250L), ("c", 10L)).toDF("doc_id", "tok")
    val out = Chunking.packGreedy(df, col("doc_id"), col("tok"), 256L, nShards = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._2, r._3))
    // stream order is md5 order; whatever it is, the invariants hold:
    val byPack = out.groupBy(_._2)
    byPack.values.foreach { docs =>
      val toks = docs.map(d => Map("big" -> 1000L, "a" -> 10L, "b" -> 250L, "c" -> 10L)(d._1))
      if (docs.exists(_._1 == "big")) assert(docs.length == 1) // oversize alone
      else assert(toks.sum <= 256L)
    }
    // packs are contiguous from 0
    assert(byPack.keySet == (0L until byPack.size).toSet)
  }

  test("sampleStratified: fraction 0 removes a stratum, fraction 1 keeps it whole") {
    val df = (1 to 100).map(i => (s"d$i", if (i % 2 == 0) "en" else "und"))
      .toDF("doc_id", "lang")
    val kept = Sampling
      .sampleStratified(df, col("doc_id"), col("lang"), Map("en" -> 0.0, "und" -> 1.0))
      .select("lang").as[String].collect()
    assert(kept.length == 50 && kept.forall(_ == "und"))
    // and a mid fraction is a strict, deterministic subset of the stratum
    val some = Sampling
      .sampleStratified(df, col("doc_id"), col("lang"), Map("en" -> 0.3), defaultFraction = 0.0)
      .select("doc_id").as[String].collect().toSet
    val again = Sampling
      .sampleStratified(df, col("doc_id"), col("lang"), Map("en" -> 0.3), defaultFraction = 0.0)
      .select("doc_id").as[String].collect().toSet
    assert(some == again && some.nonEmpty && some.size < 50)
  }

  // ---- content-defined chunking ----

  /** Driver-side reference CDC, same spec as contentDefinedChunks:
    * 40-bit md5 token hashes, 31-ary Horner fold mod 2^40 over the
    * trailing `w` tokens, cut where the fold ≡ 0 mod 2^maskBits,
    * force-split gaps > maxChunk at maxChunk offsets from the prior cut.
    */
  private def refCdcBounds(
      hs: IndexedSeq[Long], w: Int = 8, maskBits: Int = 5, maxChunk: Int = 128): Seq[Int] = {
    val mod = 1L << 40
    val n = hs.size
    val cuts = (w to n).filter { i =>
      hs.slice(i - w, i).foldLeft(0L)((a, x) => (a * 31 + x) % mod) % (1L << maskBits) == 0
    }
    val b1 = (Seq(0) ++ cuts ++ Seq(n)).distinct.sorted
    val forced = b1.zip(b1.tail).flatMap { case (s, e) =>
      if (e - s > maxChunk) (s + maxChunk) until e by maxChunk else Seq.empty
    }
    (b1 ++ forced).distinct.sorted
  }

  private def h40(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(5).map("%02x".format(_)).mkString, 16)
  }

  private def refCdc(tokens: IndexedSeq[String]): Seq[(Long, Long, String)] = {
    val b = refCdcBounds(tokens.map(h40))
    b.zip(b.tail).zipWithIndex.map { case ((s, e), j) =>
      (j.toLong, (e - s).toLong, tokens.slice(s, e).mkString(" "))
    }
  }

  test("chunkDedupStats: repeated chunks dedupe to the first (doc, chunk) owner; integers exact") {
    // doc 1 and doc 2 are byte-identical (every doc-2 chunk is a dup of
    // doc-1's under the shared fingerprint); doc 3 shares no token
    val t = (0 until 200).map(i => s"alpha$i").mkString(" ")
    val u = (0 until 90).map(i => s"omega$i").mkString(" ")
    val df = Seq((1L, t), (2L, t), (3L, u)).toDF("doc_id", "text")
    val got = Chunking
      .chunkDedupStats(Chunking.contentDefinedChunks(df, col("doc_id"), col("text")))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (n1, d1, t1, dt1) = got(1L)
    val (n2, d2, t2, dt2) = got(2L)
    val (n3, d3, t3, dt3) = got(3L)
    assert(d1 == 0 && dt1 == 0 && t1 == 200) // distinct tokens -> no internal repeats
    assert((n2, t2) == ((n1, t1)) && d2 == n2 && dt2 == t2) // all of doc 2 already stored
    assert(d3 == 0 && dt3 == 0 && t3 == 90)
  }

  test("contentDefinedChunks matches the per-token reference on real docs (sf0.001)") {
    val docs = graft.io.Tables(spark, "/root/testdata/sf0.001").documents
    val got = Chunking.contentDefinedChunks(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> refCdc(r.getString(1).trim.split("\\s+").toIndexedSeq))
      .toMap
    assert(got.keySet == want.keySet)
    for ((id, chunks) <- want) assert(got(id) == chunks, s"doc $id")
    // and chunk concatenation reconstructs every doc exactly
    for ((id, chunks) <- got)
      assert(chunks.map(_._3).mkString(" ") ==
        want(id).map(_._3).mkString(" "), s"doc $id reconstruction")
  }

  test("contentDefinedChunks: boundaries are content-local (shift resistance)") {
    val toks = (0 until 2000).map(i => s"tok${(i * 2654435761L) % 9973}")
    val prefix = (0 until 17).map(i => s"new$i")
    val c1 = Chunking.contentDefinedChunks(
      docs("d1" -> toks.mkString(" ")), col("doc_id"), col("text"))
      .orderBy("chunk_id").collect().map(_.getString(3)).toSeq
    val c2 = Chunking.contentDefinedChunks(
      docs("d2" -> (prefix ++ toks).mkString(" ")), col("doc_id"), col("text"))
      .orderBy("chunk_id").collect().map(_.getString(3)).toSeq
    // every boundary at/after the first content cut is shared, so the
    // chunk lists agree from that cut onward — fixed-stride chunking
    // (Chunking.chunk) shares NOTHING after a 17-token prepend
    val bounds = refCdcBounds(toks.map(h40).toIndexedSeq)
    val firstCut = bounds.find(b => b > 0 && b < toks.size).getOrElse(toks.size)
    val expectShared = c1.size - c1.scanLeft(0)((acc, c) =>
      acc + c.split(" ").length).tail.count(_ <= firstCut)
    val lcs = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.size
    assert(lcs >= expectShared && expectShared > 10,
      s"lcs=$lcs expectShared=$expectShared c1=${c1.size} c2=${c2.size}")
  }
}
