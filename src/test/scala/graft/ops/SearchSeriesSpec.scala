package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics specs for the retrieval / time-series / importance-weight
  * operators added in round 8: conjunctive boolean search, hourly gap
  * fill with LOCF, and DSIR importance weights. Oracle equality on the
  * real tables is the driver gate's job; these pin the edge semantics
  * (leading nulls, exclusion rules, weight signs) on crafted rows.
  */
class SearchSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("conjunctiveSearch returns only docs containing EVERY term, with summed tf") {
    val docs = Seq(
      (1L, "x y z"),       // has both x and z
      (2L, "x y"),         // missing z -> excluded
      (3L, "x y z z x"),   // tf_total = 2 + 2? x:2 z:2 -> 4
      (4L, "q q q"))       // neither -> excluded
      .toDF("doc_id", "text")
    val got = TextOps
      .conjunctiveSearch(docs, col("doc_id"), col("text"), Seq("x", "z"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 3L -> 4L))
  }

  test("phraseSearch: adjacency required, multi-space tolerated, overlaps counted, boundaries hit") {
    val docs = Seq(
      (1L, "fast spark runs"),           // match at pos 1 (phrase at start)
      (2L, "runs fast  spark"),          // double space: still adjacent tokens, pos 2 (end)
      (3L, "fast code spark"),           // words present but apart -> no match
      (4L, "fast spark fast spark"),     // two occurrences
      (5L, "a fast sparkly thing"),      // 'sparkly' != 'spark' (token equality, not prefix)
      (6L, "spark fast"))                // wrong order -> no match
      .toDF("doc_id", "text")
    val got = TextOps
      .phraseSearch(docs, col("doc_id"), col("text"), Seq("fast", "spark"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (2L, 1L, 2L), (4L, 2L, 1L)))
    // overlapping self-phrase: "x x x" contains "x x" at positions 1 AND 2
    val self = TextOps
      .phraseSearch(Seq((7L, "x x x")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), Seq("x", "x"))
      .as[(Long, Long, Long)].collect().toSet
    assert(self == Set((7L, 2L, 1L)))
  }

  test("gapFillHourly densifies the global span, zero-fills, and carries LOCF per key") {
    val events = Seq(
      ("a", "2020-01-01 10:10:00", 5.0),
      ("a", "2020-01-01 13:20:00", 7.0), // gap at 11:00, 12:00
      ("b", "2020-01-01 11:00:00", 3.0)) // b missing 10, 12, 13
      .toDF("k", "t", "v")
      .withColumn("t", col("t").cast("timestamp"))
    val got = Stats
      .gapFillHourly(events, col("k"), col("t"), col("v"))
      .orderBy("key", "hr")
      .select(col("key"), col("hr").cast("string"),
        col("rev"), col("rev_locf"))
      .as[(String, String, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", "2020-01-01 10:00:00", 5.0, Some(5.0)),
      ("a", "2020-01-01 11:00:00", 0.0, Some(5.0)), // zero-filled, LOCF carries
      ("a", "2020-01-01 12:00:00", 0.0, Some(5.0)),
      ("a", "2020-01-01 13:00:00", 7.0, Some(7.0)),
      ("b", "2020-01-01 10:00:00", 0.0, None), // before b's first obs: null LOCF
      ("b", "2020-01-01 11:00:00", 3.0, Some(3.0)),
      ("b", "2020-01-01 12:00:00", 0.0, Some(3.0)),
      ("b", "2020-01-01 13:00:00", 0.0, Some(3.0))))
  }

  test("dsirWeights scores target-like docs positive, off-target docs negative") {
    val docs = Seq(
      (1L, "a a b", true),  // the target slice
      (2L, "c c", false),   // off-target vocabulary
      (3L, "a b", false))   // raw doc made of target-ish words
      .toDF("doc_id", "text", "is_t")
    val got = TextOps
      .dsirWeights(docs, col("doc_id"), col("text"), col("is_t"))
      .select(col("doc_id"), col("llr_1e6"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // vocab: a -> (c_r=3, c_t=2), b -> (2, 1), c -> (2, 0); N_r=7, N_t=3, V=3
    // dlp(a) = ln(3/6) - ln(4/10) > 0; dlp(c) = ln(1/6) - ln(3/10) < 0
    assert(got(1L)._1 > 0, s"target doc must score positive: ${got(1L)}")
    assert(got(2L)._1 < 0, s"off-target doc must score negative: ${got(2L)}")
    assert(got(3L)._1 > 0, s"target-like raw doc must score positive: ${got(3L)}")
    assert(got.values.map(_._2).toSeq.sorted == Seq(2L, 2L, 3L))
    // exact integer check for doc 2: tf(c)=2,
    // dlp(c) = floor(1e6·ln((0+1)/(3+3))) - floor(1e6·ln((2+1)/(7+3)))
    val dlpC = math.floor(math.log(1.0 / 6.0) * 1e6).toLong -
      math.floor(math.log(3.0 / 10.0) * 1e6).toLong
    assert(got(2L)._1 == 2 * dlpC)
  }

  test("dsirWeights with an empty target slice still scores (pure smoothing)") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps
      .dsirWeights(docs, col("doc_id"), col("text"), lit(false))
      .select(col("doc_id"), col("llr_1e6"))
      .as[(Long, Long)].collect().toMap
    // every word: c_t=0, N_t=0 -> dlp = floor(1e6·ln(1/V)) - floor(1e6·ln((c_r+1)/(N_r+V)))
    assert(got.size == 2) // no NaN/zero-division; deterministic integers
  }
}
