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
  def shingleHashRows(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    shingleHashRowsWith(df, id, text, n, xxhash64(_))

  /** [[shingleHashRows]] with the engine-portable md5→32-bit shingle hash
    * (`'0x' || substr(md5(sh), 1, 8)` replays in SQL) — same window-lead
    * plan shape, only the hash differs; used by the oracle-checked
    * portable MinHash family.
    */
  def portableShingleHashRows(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    shingleHashRowsWith(df, id, text, n,
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))

  /** [[portableShingleHashRows]] keeping each shingle's 0-based token
    * offset — (doc_id, pos, s). The position is what span-grain
    * decontamination ([[Dedup.contaminatedSpans]]) redacts around; the
    * plan is the same single window-lead pass, pos just isn't dropped.
    */
  def portableShingleHashPosRows(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    shingleHashRowsWith(df, id, text, n,
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"), keepPos = true)

  private def shingleHashRowsWith(
      df: DataFrame, id: Column, text: Column, n: Int,
      hashFn: Column => Column, keepPos: Boolean = false): DataFrame = {
    require(n >= 1, "shingle length must be >= 1")
    val outCols =
      if (keepPos) Seq(col("doc_id"), col("pos"), col("s")) else Seq(col("doc_id"), col("s"))
    val toks = df.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "w")))
    if (n == 1) toks.withColumn("s", hashFn(col("w"))).select(outCols: _*)
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
            hashFn(concat_ws(" ", (col("w") +: leads): _*))))
        .filter(col("s").isNotNull)
        .select(outCols: _*)
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

  /** Vocabulary-diversity signals per document — the Gopher-family
    * lexical filters: total tokens, distinct tokens, type-token ratio,
    * the most frequent token and its share ("fraction of the most common
    * word" — spam/boilerplate pages spike it). Ratios are single IEEE-754
    * divisions of exact integers — bit-deterministic across engines; the
    * top-token tie-break is (count desc, token asc) via one `min_by` over
    * a (-count, token) struct, no window sort.
    *
    * Cost model at scale: explode → (doc_id, token) count → per-doc
    * aggregate. The first aggregate map-side-combines token repeats before
    * anything moves, so the two exchanges carry per-(doc,token) counts and
    * per-doc rows — never raw token instances.
    */
  def vocabSignals(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        max(col("cnt")).as("__top_cnt"),
        min_by(col("token"), struct((-col("cnt")).as("nc"), col("token").as("t")))
          .as("top_token"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
        col("top_token"),
        (col("__top_cnt").cast("double") / col("n_tokens").cast("double")).as("top_ratio"))

  /** Corpus-trained character-n-gram language ID — the real n-gram-family
    * classifier (vs the [[langId]] stopword heuristic): per labeled
    * language, the `profileSize` most frequent char trigrams form its
    * profile (tie → trigram asc); a document votes once per distinct
    * trigram it shares with a profile and is predicted as the
    * highest-vote language (tie → language asc), `und` when it matches no
    * profile at all. All-integer counting — no log-probabilities, so the
    * result is bit-deterministic on any engine.
    *
    * Cost model at scale: the trigram explode is a stateless projection;
    * the profile aggregate map-side-combines to O(langs · vocab) before
    * moving and the profile table (langs × profileSize rows) broadcasts
    * into the vote join. Two content-sized exchanges: distinct doc
    * trigrams, per-(doc, lang) votes.
    */
  def charNgramLangId(
      df: DataFrame,
      id: Column,
      text: Column,
      langLabel: Column,
      profileSize: Int = 50): DataFrame = {
    val t = lower(text)
    // native codegen'd n-gram explode, PACKED: CharNgramCodes emits one
    // primitive long per trigram (21 bits/codepoint, order-compatible
    // with the string form, so the profile's count-then-gram tie-break
    // is engine-identical) — the string-gram explode allocated one
    // UTF8String per trigram and that object churn dominated both scan
    // passes (measured 12.7 s → 1.3 s per bare explode pass on the 10×
    // corpus; 25 s → 8 s end-to-end); code-vs-string equivalence pinned
    // in OpsSpec
    val tris = df.select(
      id.as("doc_id"),
      langLabel.as("__lang"),
      explode(org.apache.spark.sql.graft.TextFunctions.charNgramCodes(t, 3)).as("g"))
    val profile = tris
      .groupBy(col("__lang"), col("g"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("__lang").orderBy(col("__cnt").desc, col("g").asc)))
      .filter(col("__rn") <= profileSize)
      .select(col("__lang").as("p_lang"), col("g"))
    val votes = tris
      .select(col("doc_id"), col("g")).distinct()
      .join(broadcast(profile), "g")
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("votes"))
    val pred = votes
      .groupBy(col("doc_id"))
      .agg(
        min_by(col("p_lang"), struct((-col("votes")).as("nv"), col("p_lang").as("l")))
          .as("__pred"),
        max(col("votes")).as("__v"))
    df.select(id.as("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("__pred"), lit("und")).as("lang_pred"),
        coalesce(col("__v"), lit(0L)).as("votes"))
  }

  /** PII patterns for [[redactPii]], applied in this order. Kept inside
    * the Java-regex ∩ RE2 common subset (no backrefs, no lookaround) so
    * the same pattern strings mean the same matches in Spark, DuckDB,
    * and any RE2-based engine. SSN precedes phone so `123-45-6789`
    * is tagged `[SSN]`, never half-eaten by the phone pattern.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Replace emails / SSNs / phone numbers / IPv4 addresses with
    * `[EMAIL]`-style tags — the standard scrub stage before a corpus is
    * released for training. Sequential `regexp_replace` per pattern:
    * pure per-row codegen'd expressions, no shuffle.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Per-doc PII counts (`n_email`, `n_ssn`, …) plus the redacted text —
    * what an audit step thresholds on before [[redactPii]]'s output ships.
    * Counts are taken in the same sequential order as the replacements so
    * each match is attributed to exactly one pattern.
    */
  def piiSignals(df: DataFrame, text: Column): DataFrame = {
    val (counted, _) = PiiPatterns.foldLeft((df, text)) {
      case ((d, c), (name, pat)) =>
        (d.withColumn(s"n_$name", regexp_count(c, lit(pat))),
          regexp_replace(c, pat, s"[${name.toUpperCase}]"))
    }
    counted.withColumn("redacted", redactPii(text))
  }

  /** Corpus document frequency: (token, df) — in how many documents each
    * distinct token appears. The per-doc dedup happens row-locally
    * (`array_distinct` before the explode), so the ONLY exchange is the
    * final token aggregate, and that one is map-side-combined down to
    * vocabulary size before it moves. At 100 TB the shuffle carries
    * O(vocab × partitions), not O(corpus tokens).
    */
  def docFrequency(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(array_distinct(tokens(text))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))

  /** BM25 per-term relevance — the standard retrieval scorer that TF-IDF
    * lacks: term-frequency SATURATION (tf's marginal value decays via k1)
    * and document-length normalization (b penalizes long docs against the
    * corpus average). Scores every (doc, term) pair for the `topTerms`
    * highest-DF vocabulary terms: `idf(t) · (tf·k1 + tf) / (tf + k1·(1 −
    * b + b·dl/avgdl))` with `idf = ln(1 + (N − df + ½)/(df + ½))`
    * (Robertson–Spärck Jones).
    *
    * Engine-exactness discipline: defaults k1 = 1.25 and b = 0.75 are
    * EXACT binary doubles, every constant expression ((1−b), tf·k1+tf)
    * is exact, dl/avgdl divides exact integers — the single inexact step
    * is `ln`, and the score floors to a 1e-4 integer so the last ulp
    * never surfaces (the [[tfidfTopTerms]] pattern).
    *
    * Plan shape: tf aggregate on (doc_id, token) semi-joined to the
    * broadcast top-term table; dl is the per-doc count reusing the same
    * exploded scan; (N, avgdl) is a one-row broadcast. The only
    * corpus-grain exchange is the tf aggregate's.
    */
  def bm25PerTerm(
      df: DataFrame,
      id: Column,
      text: Column,
      topTerms: Int,
      k1: Double = 1.25,
      b: Double = 0.75): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val top = docFrequency(df, id, text)
      .orderBy(col("df").desc, col("token").asc).limit(topTerms)
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tfD = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = (tfD * k1 + tfD) /
      (tfD + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    tf.join(broadcast(top), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(
        col("doc_id"), col("token"), col("tf"), col("df"),
        floor(idf * norm * lit(10000)).cast("long").as("score_1e4"))
  }

  /** Top-k TF-IDF terms per document — the cheap keyword extractor for
    * corpus exploration and topic-balanced sampling. `tf × ln((N+1)/(df+1))`
    * with the score floored to a 1e-4 integer BEFORE ranking, so the
    * cross-engine order (score desc, token asc) never depends on the last
    * ulp of `ln`.
    *
    * Plan shape: tf aggregate on (doc_id, token); df joins in on token
    * (vocabulary-sized after its own map-side combine); N arrives as a
    * broadcast single row; per-doc rank is WindowGroupLimit-pruned. No
    * all-pairs anything; both aggregates pre-combine.
    */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = df
      .select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(docFrequency(df, id, text), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "score_1e4",
        floor(
          col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")) *
            lit(10000)).cast("long"))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score_1e4"))
    TopN.perPartition(scored, Seq(col("doc_id")), Seq(col("score_1e4").desc, col("token").asc), k)
  }

  /** Corpus-trained unigram language-model score per document — the
    * CCNet/KenLM-style "does this look like the corpus" quality filter,
    * reduced to its scalable core: add-one-smoothed unigram log-prob,
    * `lp(w) = ln((c_w + 1) / (N + V))`, summed over the document's tokens.
    *
    * Returns (doc_id, logprob_1e6, n_tokens): `logprob_1e6` is
    * `Σ tf(w) · ⌊lp(w)·1e6⌋` — each distinct token's log-prob is floored
    * to an integer BEFORE the weighted sum, so the result is exact
    * integer arithmetic: order-independent and bit-identical across
    * engines (a raw double Σ would depend on aggregation order). Filter
    * on `logprob_1e6 / n_tokens` (mean token log-prob).
    *
    * Plan shape: ONE corpus scan. tf on (doc_id, token) is the first
    * aggregate; token totals derive from tf (second, vocabulary-sized
    * aggregate); (N, V) is a broadcast single row. The scoring join is
    * tf ⋈ vocab on token — vocabulary-sized build side, AQE broadcasts
    * it at any realistic scale. No all-pairs anything.
    */
  def unigramLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    // tf feeds the vocabulary aggregate AND the score join; AQE exchange
    // reuse serves the second consumer from the one shuffle (ReusedExchange,
    // pinned in PlanQualitySpec), so no persist — an interleaved A/B
    // measured the cached form ~35% slower (t_unigram_lm 1.00 → 1.40 s,
    // p_lm_filter 1.16 → 1.56 s at sf0.1): cache write + columnar read
    // cost more than re-reading reused shuffle output
    val tf = df
      .select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("w").agg(sum(col("tf")).as("c"))
    val tot = vocab.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    tf.join(vocab, "w")
      .crossJoin(broadcast(tot))
      .withColumn(
        "lp_1e6",
        floor(
          log((col("c") + 1).cast("double") / (col("n") + col("v")).cast("double")) *
            lit(1000000)).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(col("tf") * col("lp_1e6")).as("logprob_1e6"),
        sum(col("tf")).as("n_tokens"))
  }

  /** One row per adjacent token pair, in document order. Same codegen'd
    * posexplode + `lead()` shape as [[shingleHashRows]] (one exchange on
    * doc_id); docs with fewer than two tokens yield no rows.
    */
  def bigramRows(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "w")))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    toks
      .withColumn("w2", lead(col("w"), 1).over(win))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))
  }

  /** Corpus-trained BIGRAM language-model score per document — the
    * next step up from [[unigramLogProb]] in the CCNet-style quality
    * ladder: `Σ_pairs tf·⌊1e6·ln((c₂(w₁,w₂)+1)/(c₁(w₁)+V))⌋`, add-1
    * smoothed conditional log-probs where `c₁(w₁) = Σ_w₂ c₂(w₁,·)` (the
    * bigram-first marginal) and V the unigram vocabulary. Integer-floored
    * terms → order-independent exact sums, engine-portable like every
    * LM score in the repo. Docs under two tokens emit no row.
    *
    * Scale shape: the [[bigramRows]] lead-window explode (one doc_id
    * exchange), a per-(doc,pair) tf aggregate, then pair- and
    * first-word-grain corpus aggregates that map-side-combine; the score
    * join shuffles at pair grain exactly like [[unigramLogProb]]'s
    * word-grain join — no N², no corpus re-scan.
    */
  def bigramLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    // the pair-frame feeds both the corpus counts (c2 -> c1) and the
    // final score join: persist so the lead-window explode runs once
    // (measured 5.2 -> 1.9 s at sf0.1, 9.2 -> 2.6 s at 10x; at cluster
    // scale write it to parquet instead — the d_dedup_bow_lsh note)
    val ptf = bigramRows(df, id, text)
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("tf"))
      .persist()
    val c2 = ptf.groupBy("w1", "w2").agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vCount = df
      .select(explode(tokens(text)).as("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val terms = c2
      .join(c1, "w1")
      .crossJoin(broadcast(vCount))
      .withColumn(
        "lp_1e6",
        floor(
          log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")) *
            lit(1000000)).cast("long"))
      .select(col("w1"), col("w2"), col("lp_1e6"))
    ptf
      .join(terms, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(
        sum(col("tf") * col("lp_1e6")).as("logprob2_1e6"),
        sum(col("tf")).as("n_bigrams"))
  }

  /** Top-k collocations by pointwise mutual information —
    * `PMI(x,y) = ln(c_xy·N / (c_x·c_y))` over adjacent token pairs, with
    * a minimum pair count (PMI is noise below a handful of sightings).
    * The corpus-exploration / tokenizer-merge-candidate view of a corpus.
    *
    * Ranked on the 1e-4-floored score (desc, then (w1, w2)) and the raw
    * score stays OUT of the result for the same one-ulp reason as
    * [[tfidfTopTerms]]; output is (w1, w2, n_xy, rank). Every factor in
    * the PMI ratio is cast to double individually — the expression shape
    * is part of the cross-engine contract (c_xy·N can exceed int64 at
    * web scale if multiplied as integers).
    *
    * Plan shape: pair counts aggregate on (w1, w2) after the doc-ordered
    * lead window; unigram counts are vocabulary-sized; both count joins
    * broadcast under AQE; global top-k is TakeOrderedAndProject.
    */
  def pmiCollocations(
      df: DataFrame,
      id: Column,
      text: Column,
      minCount: Long = 5L,
      k: Int = 100): DataFrame = {
    val u = df
      .select(explode(tokens(text)).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
    val tot = u.agg(sum(col("c")).as("n"))
    val scored = bigramRows(df, id, text)
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
      .join(u.select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(u.select(col("w").as("w2"), col("c").as("cy")), "w2")
      .crossJoin(broadcast(tot))
      .withColumn(
        "score_1e4",
        floor(
          log(
            (col("n_xy").cast("double") * col("n").cast("double")) /
              (col("cx").cast("double") * col("cy").cast("double"))) * lit(10000))
          .cast("long"))
      .select(col("w1"), col("w2"), col("n_xy"), col("score_1e4"))
    scored.orderBy(col("score_1e4").desc, col("w1").asc, col("w2").asc).limit(k)
  }

  /** Feature-hashed bag-of-words document vectors — the model-free
    * text→vector bridge (hashing trick): token t increments bucket
    * `md5(t)[0:12] mod dim`, so the vector is INTEGER token counts,
    * bit-reproducible on any engine (md5 is the shared hash; no
    * vocabulary, no fitting, no OOV). Output (doc_id, vec: array<long>).
    *
    * Composes with the [[Similarity]] stack: cosine over count vectors
    * is the classic cheap near-dup / clustering signal when no learned
    * embeddings exist. Plan shape: ONE exchange on (doc_id, bucket) for
    * the count aggregate, then a per-doc pivot into the fixed-width
    * array via a second doc_id aggregate that reuses the partitioning.
    */
  def hashedBowVectors(df: DataFrame, id: Column, text: Column, dim: Int = 64): DataFrame = {
    require(dim >= 1, "need dim >= 1")
    val counts = df
      .select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .withColumn("b", pmod(conv(substring(md5(col("w")), 1, 12), 16, 10).cast("long"), lit(dim.toLong)))
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy("doc_id")
      .agg(map_from_arrays(collect_list(col("b")), collect_list(col("c"))).as("m"))
      .select(
        col("doc_id"),
        transform(sequence(lit(0L), lit(dim - 1L)), i =>
          coalesce(element_at(col("m"), i), lit(0L))).as("vec"))
  }

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

  /** Corpus-trained multinomial Naive Bayes classifier — the
    * model-based document scorer (the shape behind fastText-style
    * quality/domain filters: DCLM, fineweb-edu): train per-label token
    * stats with add-1 smoothing, score every document, predict the
    * argmax label. Self-classification over a labeled corpus here;
    * swap `labelled` for a curated seed set to build a quality filter.
    *
    * All-integer determinism (the [[charNgramLangId]] discipline):
    * each log term floors to micro-nats BEFORE the per-doc sum —
    * `term(l,t) = ⌊1e6·ln((c(l,t)+1)/(N_l+V))⌋`,
    * `prior(l) = ⌊1e6·ln(d_l/D)⌋` — so scores are exact longs on any
    * engine; argmax ties break label-asc.
    *
    * Scale shape: two token-grain aggregates (map-side-combined
    * explodes), then the dense (label × vocab) term table — |L|·|V|
    * rows — BROADCASTS into the per-(doc, token) score join: the corpus
    * side never re-shuffles after its tf aggregate, and the final
    * per-doc argmax rides the same doc_id partitioning. The term table
    * grows with VOCABULARY, not corpus size; when it outgrows broadcast
    * (|L|·|V| ≳ 10⁸) cap the vocabulary to the top-k DF terms or hash
    * features into a fixed width ([[hashedBowVectors]]) — the standard
    * fastText trick — and the shape is unchanged.
    */
  def naiveBayesClassify(
      df: DataFrame,
      id: Column,
      text: Column,
      label: Column): DataFrame = {
    val base = df.select(id.as("doc_id"), label.as("__lab"), text.as("__txt"))
    val tok = base.select(col("doc_id"), col("__lab"), explode(tokens(col("__txt"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    // ltc is consumed three times (per-label totals, the vocabulary, the
    // dense term table) — AQE exchange reuse serves the repeats from the
    // one shuffle, so no persist: an interleaved A/B measured the cached
    // form 15-30% SLOWER (cache write + columnar read cost more than
    // re-reading reused shuffle output; contrast the admission-family
    // persists, where diverging subtrees block reuse entirely)
    val ltc = tok.groupBy(col("__lab"), col("t")).agg(count(lit(1)).as("c"))
    val nl = ltc.groupBy(col("__lab")).agg(sum(col("c")).as("n_l"))
    val vocab = ltc.select(col("t")).distinct()
    val vCount = vocab.agg(count(lit(1)).as("v"))
    val docsPerLabel = base.groupBy(col("__lab")).agg(count(lit(1)).as("d_l"))
    val dTotal = base.agg(count(lit(1)).as("d"))
    // dense (label, token) term table with add-1 smoothing for unseen pairs
    val terms = vocab
      .crossJoin(broadcast(nl.crossJoin(broadcast(vCount))))
      .join(ltc, Seq("__lab", "t"), "left")
      .na.fill(0L, Seq("c"))
      .select(
        col("__lab"), col("t"),
        floor(log((col("c") + 1).cast("double") / (col("n_l") + col("v")).cast("double")) * 1e6)
          .cast("long").as("term_micro"))
    val priors = docsPerLabel
      .crossJoin(broadcast(dTotal))
      .select(
        col("__lab"),
        floor(log(col("d_l").cast("double") / col("d").cast("double")) * 1e6)
          .cast("long").as("prior_micro"))
    val scores = tf
      .join(broadcast(terms), "t")
      .groupBy(col("doc_id"), col("__lab"))
      .agg(sum(col("tf") * col("term_micro")).as("__s"))
      .join(broadcast(priors), "__lab")
      .select(col("doc_id"), col("__lab"), (col("__s") + col("prior_micro")).as("score_micro"))
    scores
      .groupBy(col("doc_id"))
      .agg(
        min_by(col("__lab"), struct((-col("score_micro")).as("ns"), col("__lab").as("l")))
          .as("pred_label"),
        max(col("score_micro")).as("best_score_micro"))
  }

  /** Per-document character-unigram Shannon entropy (nats, micro-unit
    * scaled) — the compression-style quality signal: near-random bytes
    * and single-char spam both sit far from prose's ~3 nats. Identity
    * H = ln(n) − Σ c·ln(c)/n computed from INTEGER-floored micro-terms
    * (the unigram-LM pattern: `ln` is libm-identical across engines,
    * each term floors to an exact long before the order-independent sum,
    * then one division + one subtraction in IEEE doubles).
    *
    * Shape: the native [[org.apache.spark.sql.graft.CharNgrams]] n=1
    * explode (primitive-friendly, no per-char lambda), one
    * map-side-combined count at (doc, char) grain, one per-doc
    * aggregate — the same two-exchange cost model as [[vocabSignals]].
    */
  def charEntropySignals(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
        id.as("doc_id"),
        org.apache.spark.sql.graft.TextFunctions.charStats(text).as("__cs"))
      // empty text: the explode form emits no row (and ln(0) is undefined)
      .filter(col("__cs.n_chars") > 0)
      .select(
        col("doc_id"),
        col("__cs.n_chars").as("n_chars"),
        col("__cs.n_char_types").as("n_char_types"),
        (floor(log(col("__cs.n_chars").cast("double")) * 1e6).cast("long").cast("double") -
          col("__cs.ent_sum_micro").cast("double") / col("__cs.n_chars")).as("ent_micro"))

  /** The explode + two-aggregate formulation of [[charEntropySignals]] —
    * identical integer terms (equivalence pinned in OpsSpec), kept as the
    * composition baseline: at 10× it shuffles every (doc, char) pair
    * (measured 15.7 s vs scan-bound for the native [[CharStats]] pass).
    */
  def charEntropySignalsExploded(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
        id.as("doc_id"),
        explode(org.apache.spark.sql.graft.TextFunctions.charNgrams(text, 1)).as("c"))
      .groupBy(col("doc_id"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_chars"),
        count(lit(1)).as("n_char_types"),
        sum(col("cnt") * floor(log(col("cnt").cast("double")) * 1e6).cast("long"))
          .as("__s"))
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_char_types"),
        (floor(log(col("n_chars").cast("double")) * 1e6).cast("long").cast("double") -
          col("__s").cast("double") / col("n_chars")).as("ent_micro"))

  /** Gopher-style rule-composite document filter (Rae et al. 2021, §A1.1):
    * the standard pre-training hygiene pass, one boolean per rule plus the
    * conjunction, so downstream can both filter (`keep`) and audit WHY a
    * document died (per-rule columns feed the corpus datasheet).
    *
    * Rules (thresholds are Gopher's):
    *   - 50 ≤ n_tokens ≤ 100 000
    *   - 3 ≤ mean token length ≤ 10
    *   - symbol-to-token ratio ('#' or '...') < 0.1
    *   - > 80 % of tokens contain an alphabetic character
    *   - ≥ 2 stopword hits (the "required words" rule)
    *   - < 90 % of lines start with a bullet; < 30 % end with '...'
    *
    * Every signal is a per-row codegen'd expression (regexp counts, array
    * filters, IEEE divisions of exact integers) — no shuffle, no UDF;
    * scales linearly and pipelines into any downstream op. Reference
    * analog: the predicate-filter family (SURVEY §2.2 P3) generalized to
    * the multi-rule quality gate a 100 TB corpus actually needs.
    */
  def gopherSignals(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    val n = size(toks)
    val alphaChars = length(regexp_replace(trim(text), "\\s+", ""))
    val lines = split(text, "\n")
    val nLines = greatest(lit(1), size(lines))
    val out = df.select(
      id.as("doc_id"),
      n.cast("long").as("n_tokens"),
      (alphaChars.cast("double") / n).as("avg_token_len"),
      ((regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
        .cast("double") / n).as("symbol_ratio"),
      (size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n)
        .as("alpha_word_ratio"),
      stopwordCount(text).cast("long").as("stop_hits"),
      (size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines)
        .as("bullet_line_frac"),
      (size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("double") / nLines)
        .as("ellipsis_line_frac"))
    out.withColumn(
      "keep",
      col("n_tokens").between(50L, 100000L) &&
        col("avg_token_len").between(3.0, 10.0) &&
        col("symbol_ratio") < 0.1 &&
        col("alpha_word_ratio") > 0.8 &&
        col("stop_hits") >= 2L &&
        col("bullet_line_frac") < 0.9 &&
        col("ellipsis_line_frac") < 0.3)
  }

  /** Conjunctive (boolean-AND) term search over the corpus: documents
    * containing EVERY query term, with the summed term frequency as a
    * relevance tie-breaker. Returns (doc_id, tf_total).
    *
    * This is the intersect-the-postings-lists plan expressed
    * declaratively: the token stream is filtered to the |Q| query terms
    * BEFORE any exchange (the `isin` predicate sits under the explode's
    * project, so only matching tokens survive the scan stage), then one
    * (doc, term) aggregate and one doc-grain aggregate with a
    * `HAVING count = |Q|` intersection. At 100 TB the shuffled stream is
    * the matching postings only — proportional to Σ df(term), never the
    * corpus — which is exactly what a term-partitioned inverted index
    * would move. Complements [[TextOps.bm25Scores]] (ranked disjunctive
    * retrieval) with the exact boolean-retrieval primitive.
    */
  def conjunctiveSearch(
      df: DataFrame,
      id: Column,
      text: Column,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    df.select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_total"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("tf_total"))
  }

  /** Positional PHRASE search: documents containing the exact token
    * sequence `phrase`, with occurrence count and first match position —
    * the third retrieval primitive next to [[conjunctiveSearch]] (boolean
    * AND, order-blind) and [[bm25Scores]] (ranked): "spark window" as a
    * PHRASE rejects a doc with the two words a paragraph apart.
    *
    * Implementation is a pure per-row HOF — `filter` over candidate start
    * positions testing the m-term conjunction with `element_at` — so the
    * plan is scan + project + filter with NO shuffle and no explode: the
    * positional-adjacency test that an inverted index does with position
    * postings intersection happens inside one codegen'd expression per
    * row. At 100 TB that is the right trade for corpus-scan phrase
    * filtering (one pass, zero data movement); a standing phrase-query
    * SERVICE would materialize positional postings instead (the
    * [[termTfRanking]] shape with a position column).
    *
    * Returns (doc_id, n_matches, first_pos) for docs with ≥ 1 match;
    * positions are 1-based token offsets.
    */
  def phraseSearch(
      df: DataFrame,
      id: Column,
      text: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    val m = phrase.size
    val hits = filter(
      sequence(lit(1), size(col("__w")) - lit(m - 1)),
      i => phrase.zipWithIndex
        .map { case (w, j) => element_at(col("__w"), (i + lit(j)).cast("int")) === lit(w) }
        .reduce(_ && _))
    // LOSSLESS pre-filter: under the \s+ tokenizer, "contains the token
    // sequence" ⇔ the raw text matches terms joined by \s+ at token
    // boundaries — a codegen'd RLIKE scan, so only matching docs (a tiny
    // fraction) pay the positional HOF (measured 2.45 → sub-second at
    // sf0.1; the HOF alone went ~linear at 10×)
    val pre = phrase
      .map(java.util.regex.Pattern.quote)
      .mkString("(^|\\s)", "\\s+", "(\\s|$)")
    df.filter(text.rlike(pre))
      .select(id.as("doc_id"), tokens(text).as("__w"))
      // sequence(1, n) with n < 1 DESCENDS — short docs must short-circuit
      .withColumn("__h",
        when(size(col("__w")) >= m, hits).otherwise(array().cast("array<int>")))
      .filter(size(col("__h")) >= 1)
      .select(
        col("doc_id"),
        size(col("__h")).cast("long").as("n_matches"),
        element_at(col("__h"), 1).cast("long").as("first_pos"))
  }

  /** Blocklist audit: per matching document, how many blocked-term hits
    * and WHICH terms (sorted, pipe-joined) — the safety/compliance
    * filter stage with the audit trail reviewers need (a bare `filter`
    * tells you nothing about WHY a doc dropped). Complements
    * [[conjunctiveSearch]] (ALL terms) with the disjunctive ANY-term
    * form. Token stream prunes to the blocklist before any exchange;
    * docs with no hit are absent (anti-join against this = the clean
    * corpus).
    */
  def blocklistAudit(
      df: DataFrame,
      id: Column,
      text: Column,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one blocked term")
    df.select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_hits"),
        array_join(array_sort(collect_set(col("w"))), "|").as("hit_terms"))
  }

  /** Vocabulary-growth (Heaps-law) curve: cumulative distinct word types
    * vs corpus position, at `bucket`-doc granularity — the corpus-QA
    * curve that flags template/boilerplate corpora (vocab plateaus) and
    * near-random noise (vocab grows linearly). Position is doc-id rank;
    * each type counts at its FIRST occurrence, so the curve is exact and
    * order-deterministic. Returns (bucket, new_types, cum_types).
    *
    * Scale: one (word)-grain aggregate finds each type's first doc rank
    * (min over an id-rank column), one bucket-grain count, and a running
    * sum over |buckets| CURVE POINTS (the query's own output grain — the
    * one unpartitioned window left, bounded by construction) — the corpus
    * tokenizes once; the global id-rank is [[Ranks.zeroBasedRank]]'s
    * two-phase rank (equi-depth bucket + literal offsets + per-bucket
    * row_number), so no corpus-width single-partition stage exists.
    */
  def vocabGrowth(
      df: DataFrame,
      id: Column,
      text: Column,
      bucket: Int): DataFrame = {
    require(bucket >= 1, "need bucket >= 1")
    val ranked = Ranks.zeroBasedRank(df, id, "__r")
      .select(col("__r"), explode(tokens(text)).as("__w"))
      .filter(col("__w") =!= "")
    val firstSeen = ranked
      .groupBy(col("__w"))
      .agg(min(col("__r")).as("__fr"))
      .groupBy(expr(s"__fr div ${bucket}L").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    firstSeen.withColumn(
      "cum_types",
      sum(col("new_types")).over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
  }

  /** Per-term tf ranking: docs containing `term` ranked by (tf desc,
    * doc_id asc) — one pruned-token-stream aggregate; the minimal
    * ranked-retrieval input for [[rrfFuse]] (any ranking with
    * (doc_id, rank) plugs in: BM25, embedding-cosine top-k, ...).
    */
  def termTfRanking(df: DataFrame, id: Column, text: Column, term: String): DataFrame =
    df.select(id.as("doc_id"), explode(tokens(text)).as("w"))
      .filter(col("w") === term)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn(
        "rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("tf").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("rank"))

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine any number of
    * rankings into one by summing 1/(k+rank) per doc — the standard
    * hybrid-retrieval merge (lexical BM25 + dense ANN) because it needs
    * NO score calibration across heterogeneous rankings, only ranks.
    * Contributions are exact integers `1000000 div (k + rank)` (floored
    * micro-units — integer division, engine-portable with no float
    * anywhere); docs absent from a ranking contribute 0. Returns the
    * topN (doc_id, rrf_micro, rank).
    *
    * Scale: each ranking is |hits| rows (already top-k-ish); the fuse is
    * one union + one doc-grain agg + a TakeOrdered(topN) — nothing
    * corpus-sized, no global sort.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && topN >= 1, "need rankings, k >= 1, topN >= 1")
    val contrib = rankings
      .map(_.select(col("doc_id"), expr(s"1000000L div (${k}L + rank)").as("__c")))
      .reduce(_ unionByName _)
    val fused = contrib
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
      .limit(topN)
    // rank the (tiny) topN result — single-partition window over topN rows
    fused.withColumn(
      "rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf_micro").desc, col("doc_id").asc)))
  }

  /** DSIR-style importance weight per document (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * reduced to its word-unigram core): the log-likelihood ratio between
    * a TARGET language model (trained on the subset of the corpus
    * matching `targetPred` — e.g. the high-quality or in-domain slice)
    * and the RAW model (trained on the whole corpus),
    *
    *   llr(d) = Σ_w tf_d(w) · ( ln p_t(w) − ln p_r(w) )
    *
    * with add-1 smoothing over the SHARED raw vocabulary V (so every
    * raw-corpus word has non-zero probability under both models:
    * p_m(w) = (c_m(w)+1)/(N_m+V)). Sampling ∝ exp(llr) concentrates the
    * corpus on target-like documents; here we emit the deterministic
    * weights (doc_id, llr_1e6, n_tokens) and leave the draw to
    * [[graft.ops.Sampling]]'s weighted sampler.
    *
    * Integer discipline: each distinct word's Δlog-prob is floored to a
    * 1e-6 integer BEFORE the tf-weighted sum — order-independent exact
    * arithmetic, engine-portable like [[unigramLogProb]].
    *
    * Plan shape: ONE corpus scan. The (doc, word) tf aggregate carries a
    * per-doc `is_target` flag, so both models' counts come from the same
    * word-grain aggregate (`sum(tf)` vs `sum(tf) WHERE target`); (N_r,
    * N_t, V) is a broadcast single row, and the scoring join is tf ⋈
    * vocab at word grain — vocabulary-sized, AQE-broadcast at any
    * realistic scale. No second corpus pass for the target model.
    */
  def dsirWeights(
      df: DataFrame,
      id: Column,
      text: Column,
      targetPred: Column): DataFrame = {
    val tf = df
      .select(id.as("doc_id"), targetPred.as("__t"), explode(tokens(text)).as("w"))
      .groupBy("doc_id", "__t", "w")
      .agg(count(lit(1)).as("tf"))
    val vocab = tf
      .groupBy("w")
      .agg(
        sum(col("tf")).as("c_r"),
        sum(when(col("__t"), col("tf")).otherwise(0L)).as("c_t"))
    val tot = vocab.agg(
      sum(col("c_r")).as("n_r"),
      sum(col("c_t")).as("n_t"),
      count(lit(1)).as("v"))
    tf.join(vocab, "w")
      .crossJoin(broadcast(tot))
      .withColumn(
        "dlp_1e6",
        floor(log((col("c_t") + 1).cast("double") / (col("n_t") + col("v")).cast("double"))
          * lit(1000000)).cast("long") -
          floor(log((col("c_r") + 1).cast("double") / (col("n_r") + col("v")).cast("double"))
            * lit(1000000)).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(col("tf") * col("dlp_1e6")).as("llr_1e6"),
        sum(col("tf")).as("n_tokens"))
  }

  /** DSIR end-to-end: [[dsirWeights]] → normalized inclusion
    * probabilities → [[graft.ops.Sampling.sampleWeighted]]'s md5 draw,
    * one dataflow (the resampling step the weights exist FOR).
    *
    * Importance weight per doc = exp(per-token mean llr), floored to a
    * 1e-6 integer grid (`w_1e6`) so the corpus normalizer is an EXACT
    * integer sum — a double sum would be fold-order-dependent and off
    * the cross-engine record. Inclusion probability = min(1,
    * keepFraction · w / mean(w)): expected keep rate ≈ `keepFraction`,
    * each doc up/down-weighted by its importance ratio (Poisson design,
    * the Bernoulli analogue of the DSIR paper's weight-proportional
    * resample). Downstream arithmetic is integer products and exactly-
    * rounded double divisions, so the keep-set replays bit-identically
    * in SQL. One corpus-grain dataflow: the weight table aggregates to a
    * 1-row normalizer (broadcast cross join, the q22 shape) and the draw
    * is a shuffle-free per-row filter.
    */
  def dsirResample(
      df: DataFrame,
      id: Column,
      text: Column,
      targetPred: Column,
      keepFraction: Double): DataFrame = {
    val w = dsirWeights(df, id, text, targetPred)
      .withColumn(
        "w_1e6",
        floor(exp(col("llr_1e6").cast("double") / col("n_tokens").cast("double") / lit(1e6))
          * lit(1e6)).cast("long"))
    val tot = w.agg(sum(col("w_1e6")).as("w_sum"), count(lit(1)).as("n_docs"))
    Sampling
      .sampleWeighted(
        w.crossJoin(broadcast(tot)),
        col("doc_id"),
        least(
          lit(1.0),
          lit(keepFraction) * (col("w_1e6") * col("n_docs")).cast("double")
            / col("w_sum").cast("double")))
      .select(col("doc_id"), col("w_1e6"), col("n_tokens"))
  }
}
