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

  /** BPE-ish subword token estimate: alphanumeric runs and individual
    * punctuation marks each count as one token — the usual cheap proxy for
    * a byte-pair tokenizer's output length (run-splitting is where most
    * BPE merges saturate). Pure regex count, codegen'd, engine-portable.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

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
      .withColumn(
        "punct_ratio",
        // null (not ANSI divide-by-zero) for whitespace-only docs
        when(
          col("n_alpha_chars") > 0,
          length(regexp_replace(trim(text), "[A-Za-z0-9\\s]+", "")).cast("double") /
            col("n_alpha_chars").cast("double")))
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

  /** One row per (doc, 64-bit word-n-gram hash), NOT deduplicated.
    *
    * Shape matters: `posexplode` the tokens, then form each n-gram with
    * `lead()` window functions — every expression is a codegen'd scalar.
    * The array formulation ([[wordShingles]] + `explode`) pays twice: the
    * higher-order `transform` is interpreted (CodegenFallback), and
    * `InferFiltersFromGenerate` duplicates the whole shingle expression
    * into pushed-down filters (measured 6× slower end-to-end at sf0.1).
    *
    * Cost model at scale: ONE hash exchange on doc_id (the lead window);
    * downstream per-doc aggregates (`groupBy(doc_id)`, distinct over
    * (doc_id, s), per-doc counts) all reuse that partitioning — Catalyst
    * inserts no further exchange.
    *
    * Docs shorter than `n` tokens yield one shingle (the whole text),
    * matching [[wordShingles]] semantics.
    */
  def shingleHashRows(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    require(n >= 1, "shingle length must be >= 1")
    val toks = df.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "w")))
    if (n == 1) toks.select(col("doc_id"), xxhash64(col("w")).as("s"))
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
      val leads = (1 until n).map(i => lead(col("w"), i).over(w))
      // full n-gram where the last lead exists; at pos 0 of a short doc,
      // concat_ws skips the null leads, yielding the whole-text shingle
      toks
        .withColumn(
          "s",
          when(
            leads.last.isNotNull || col("pos") === 0,
            xxhash64(concat_ws(" ", (col("w") +: leads): _*))))
        .filter(col("s").isNotNull)
        .select(col("doc_id"), col("s"))
    }
  }

  /** Fraction of repeated word n-grams within the document — the
    * Gopher-style self-repetition signal: ~0 for fresh prose, → 1 for
    * looping boilerplate/spam. `1 − distinct/total` over n-gram windows
    * (docs shorter than `n` tokens count as one whole-text shingle, ratio
    * 0). A pure per-row projection: two array expressions and one IEEE
    * division of exact integers — no shuffle, engine-portable.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(lit(1), size(tokens(text)) - lit(n - 1))
    lit(1.0) - size(wordShingles(text, n)).cast("double") / total.cast("double")
  }

  /** Corpus-scale form of [[repetitionRatio]]: (doc_id, n_shingles,
    * repetition_ratio) via [[shingleHashRows]] + one aggregate. The array
    * formulation's higher-order `transform` is interpreted
    * (CodegenFallback — measured 15× slower at sf0.1); this one is fully
    * codegen'd and its single doc_id exchange is the same one every
    * per-doc text aggregate reuses.
    */
  def repetitionSignals(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    shingleHashRows(df, id, text, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), countDistinct(col("s")).as("__d"))
      .withColumn(
        "repetition_ratio",
        lit(1.0) - col("__d").cast("double") / col("n_shingles").cast("double"))
      .drop("__d")

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
