package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (whole-stage codegen'd, no UDFs) — per-row work with no
  * shuffle, so they scale linearly with input and pipeline into any
  * downstream op.
  */
object TextOps {

  /** English function words for the n-gram/stopword heuristics. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with", "as", "by", "at", "or")

  /** Whitespace tokenization (normalized: leading/trailing space trimmed). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens that are English stopwords. */
  def stopwordCount(text: Column): Column = {
    val stop = EnStopwords
    size(filter(tokens(text), t => t.isInCollection(stop)))
  }

  /** Heuristic quality signals: token count, chars-per-token, stopword
    * ratio. Ratios are single IEEE-754 divisions of exact integers —
    * bit-deterministic across engines.
    */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val n = tokenCount(text)
    df.withColumn("n_tokens", n)
      .withColumn("n_alpha_chars", length(regexp_replace(trim(text), "\\s+", "")))
      .withColumn("avg_token_len", col("n_alpha_chars").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio", stopwordCount(text).cast("double") / col("n_tokens"))
  }

  /** Stopword-density language ID: enough English function words → 'en'.
    * The classic cheap n-gram-family heuristic — a per-row expression, no
    * model, no shuffle.
    */
  def langId(text: Column, minStopwords: Int = 2): Column =
    when(stopwordCount(text) >= minStopwords, "en").otherwise("und")

  /** Canonical document fingerprint: md5 of the case/whitespace-normalized
    * text. Stable across engines (md5 is bit-specified), used as the exact
    * dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-hash-style shingle fingerprints: distinct word n-grams.
    * Building block for Jaccard / MinHash dedup.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array_distinct(array(concat_ws(" ", toks))))
  }
}
