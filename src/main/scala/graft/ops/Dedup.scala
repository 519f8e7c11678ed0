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
    val docs = df
      .select(id.as("doc_id"), TextOps.wordShingles(text, n).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val exploded = docs.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
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

  // ---- MinHash + LSH ----

  /** Prime modulus > 2^32 for the universal-hash family. */
  private val MinhashPrime = 4294967311L

  /** Deterministic (a, b) parameters for the k minhash permutations —
    * splitmix64-expanded from a fixed seed so results are reproducible
    * across runs and engines.
    */
  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
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

  /** MinHash signature column: for each of k permutations
    * h_i(x) = (a_i * x32 + b_i) mod p over the xxhash64-derived 32-bit
    * shingle hashes, take the min. Pure column expressions (aggregate over
    * the shingle array) — codegen'd, no UDF.
    */
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column = {
    val params = hashParams(k, seed)
    val h32 = transform(shingles, s => pmod(xxhash64(s), lit(4294967296L)))
    array(params.map { case (a, b) =>
      array_min(transform(h32, x => pmod(x * a + b, lit(MinhashPrime))))
    }: _*)
  }

  /** LSH candidate pairs: band the k-length signature into `bands` bands of
    * k/bands rows, bucket-join on (band index, band content). Pairs sharing
    * ≥1 band are candidates; verification (exact Jaccard) is the caller's
    * choice — [[minhashDedup]] wires both.
    */
  def minhashCandidates(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleLen: Int,
      k: Int,
      bands: Int,
      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val docs = df.select(
      id.as("doc_id"),
      minhashSignature(TextOps.wordShingles(text, shingleLen), k, seed).as("sig"))
    val banded = docs.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * r + 1, lit(r)))).as(Seq("band", "band_sig")))
    banded
      .as("l")
      .join(
        banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_sig") === col("r.band_sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

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
      seed: Long = 42L): DataFrame = {
    val docs = df.select(id.as("doc_id"), TextOps.wordShingles(text, shingleLen).as("sh"))
    minhashCandidates(df, id, text, shingleLen, k, bands, seed)
      .join(docs.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
      .join(docs.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash over word tokens: per bit, sum ±1 weighted by token
    * hash bit, sign → bit. Expressed as column aggregates over the token
    * array — per-row, shuffle-free.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(TextOps.tokens(text))
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64)
      .map { bit =>
        val votes = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(votes > 0, lit(1L << bit)).otherwise(0L)
      }
      .reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidate pairs: block on 4 16-bit bands (any pair
    * with Hamming distance ≤ 3 shares an exact band), verify Hamming
    * distance ≤ maxHamming via popcount of XOR.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxHamming: Int): DataFrame = {
    val docs = df.select(id.as("doc_id"), simhash(text).as("sh"))
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
}
