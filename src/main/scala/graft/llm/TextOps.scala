package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, language ID, quality scoring, fingerprinting.
  * Everything is composed from `org.apache.spark.sql.functions` (no UDFs), so
  * the whole column pipeline stays inside whole-stage codegen and scales
  * linearly with no shuffle.
  */
object TextOps {

  /** ftfy-style corpus cleanup, fully columnar: Unicode NFC composition
    * (via the codegen'd [[graft.functions.NfcNormalize]] — decomposed
    * `e`+COMBINING ACUTE must shingle/hash/dedup like composed `é`), strip
    * C0/C1-ish control characters (tab and newline get collapsed instead
    * of dropped), collapse whitespace runs to single spaces, trim. The
    * character classes are spelled explicitly so a DuckDB oracle's RE2
    * matches Java regex byte-for-byte. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.NfcNormalize(text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\r]+", " "))

  /** Whitespace tokens (empty-string safe: 0 tokens). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-chars runs, digits, and single punctuation
    * each count as a token (a cheap deterministic stand-in for a real BPE). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0))

  // --- language ID ---------------------------------------------------------

  /** Tiny per-language stopword lists (public knowledge). Scoring = number of
    * stopword hits among the document's tokens; argmax wins, ties broken by
    * language order; no hits ⇒ "und". */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "que", "es", "un", "para"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "una", "per", "non", "sono"))

  def langScore(text: Column, lang: String): Column = {
    val toks = transform(tokens(text), lower _)
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(toks, t => array_contains(sw, t)))
  }

  /** All five language counts packed into one DECIMAL(38,0): each stopword
    * maps to Σ 10^(7·langIndex) over the languages listing it, so one
    * map-lookup-and-add per token accumulates every count at once. */
  private lazy val langIncrements: Column = {
    val langs = stopwords.keys.toSeq.sorted
    val incr = langs.zipWithIndex.flatMap { case (l, i) =>
      stopwords(l).map(w => (w, BigDecimal(10).pow(7 * i)))
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
    map(incr.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(lit(k), lit(v.bigDecimal).cast("decimal(38,0)")) }: _*)
  }

  /** Heuristic language ID over the stopword lists; deterministic.
    *
    * Round 13: one native byte-pass expression
    * ([[graft.functions.LangIdExpr]]) — the round-12 packed-DECIMAL
    * `aggregate` still paid a LINEAR 50-string-compare `element_at` map
    * probe plus a BigDecimal add PER TOKEN (measured 17 s of the sf10
    * funnel's stage 1); the scanner does one hash-packed binary-search
    * lookup per token into primitive int counters. Semantics pinned
    * byte-exact against [[langIdCols]] by TextScanDifferentialSpec: exact
    * hit counts per language, argmax with ties broken by sorted language
    * order, zero hits ⇒ "und"; exact to 2^31−1 tokens (the DECIMAL form
    * needed a 10^7 raise_error guard). */
  def langId(text: Column): Column = graft.functions.LangIdExpr(text)

  /** The round-12 Column-formula twin of [[langId]], kept as the
    * differential-spec reference (and as the shape the DuckDB oracles
    * replay). CSE note that still applies to any Column-composed fold:
    * wrapping the aggregate in a `when` guard defeats Catalyst's
    * subexpression elimination (conditional branches are not CSE'd) —
    * measured 3.3 s → 47 s. */
  private[graft] def langIdCols(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val lowToks = transform(tokens(text), lower _)
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
    val packed = aggregate(lowToks, zero, (acc, t) =>
      (acc + coalesce(element_at(langIncrements, t), zero))
        .cast("decimal(38,0)"))
    val counts: Seq[Column] = langs.indices.map(i =>
      floor(packed / lit(BigDecimal(10).pow(7 * i).bigDecimal)) % 10000000L)
    val mx = greatest(counts: _*)
    // overflow guard: only CHEAP exprs may sit inside the conditional (see
    // the CSE note above); fires on a >10^7-token document
    val guard = when(size(lowToks) >= 10000000,
      raise_error(lit("langId: document exceeds 10^7 tokens")).cast("int"))
      .otherwise(lit(0))
    when(mx > 0,
      element_at(array(langs.map(lit): _*),
        array_position(array(counts: _*), mx).cast(IntegerType) + guard))
      .otherwise(lit("und"))
  }

  // --- quality scoring -----------------------------------------------------

  /** Document-quality features: char/token counts, mean word length,
    * punctuation & uppercase & digit ratios, stopword ratio. A composite
    * `quality` in [0,1] combines them with fixed weights. */
  def qualityFeatures(text: Column): DataFrameCols = {
    val nChars = length(text)
    val toks = tokens(text)
    val nTokens = size(toks)
    val meanWordLen = when(nTokens > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / nTokens)
      .otherwise(lit(0d))
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", ""))
    val punctRatio = when(nChars > 0, punct.cast(DoubleType) / nChars).otherwise(0d)
    val uppers = length(regexp_replace(text, "[^A-Z]", ""))
    val upperRatio = when(nChars > 0, uppers.cast(DoubleType) / nChars).otherwise(0d)
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val digitRatio = when(nChars > 0, digits.cast(DoubleType) / nChars).otherwise(0d)
    val enSw = array(stopwords("en").map(lit): _*)
    val swHits = size(filter(transform(toks, lower _), t => array_contains(enSw, t)))
    val swRatio = when(nTokens > 0, swHits.cast(DoubleType) / nTokens).otherwise(0d)
    DataFrameCols(nChars, nTokens, meanWordLen, punctRatio, upperRatio, digitRatio, swRatio)
  }

  final case class DataFrameCols(nChars: Column, nTokens: Column, meanWordLen: Column,
      punctRatio: Column, upperRatio: Column, digitRatio: Column, stopwordRatio: Column) {
    /** Composite score in [0,1]: rewards length & stopword presence, penalizes
      * punctuation/digit/uppercase excess. Fixed public heuristic. */
    def quality: Column = {
      val lenScore = least(nTokens.cast(DoubleType) / 100d, lit(1d))
      val clean = greatest(lit(0d), lit(1d) - (punctRatio + digitRatio + upperRatio))
      val sw = least(stopwordRatio * 4d, lit(1d))
      round(lenScore * 0.3 + clean * 0.4 + sw * 0.3, 6)
    }
  }

  /** Apply all quality features as columns on a documents DataFrame. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val f = qualityFeatures(col(textCol))
    df.withColumn("n_tokens", f.nTokens)
      .withColumn("mean_word_len", round(f.meanWordLen, 6))
      .withColumn("punct_ratio", round(f.punctRatio, 6))
      .withColumn("upper_ratio", round(f.upperRatio, 6))
      .withColumn("digit_ratio", round(f.digitRatio, 6))
      .withColumn("stopword_ratio", round(f.stopwordRatio, 6))
      .withColumn("quality", f.quality)
  }

  // --- fingerprinting ------------------------------------------------------

  /** Canonical-text fingerprint: lowercase, collapse whitespace, md5.
    * Identical up to whitespace/case ⇒ identical fingerprint. (md5 so the
    * DuckDB oracle can replicate it.) */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling polynomial hash over tokens (order-sensitive), base 31.
    * xxhash64 per token keeps it cheap and well-mixed. */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc * 31L + xxhash64(t))

  // --- repetition signals --------------------------------------------------

  /** Gopher-style within-document repetition signals (Rae et al. 2021,
    * "Scaling Language Models", table A1 — public): duplicate-word fraction
    * and most-frequent-bigram fraction. Returns a struct column
    * `{n_words, n_distinct_words, n_bigrams, top_bigram_count}` computed
    * per document with NO shuffle: the bigram mode is found by sorting the
    * per-doc bigram array and scanning runs in one `aggregate` fold
    * (O(n log n) per doc), so the signal scales embarrassingly-parallel.
    * The token array is let-bound once per row (see DedupOps.shingles). */
  def repetitionFeatures(text: Column): Column =
    element_at(transform(array(tokens(lower(text))), { ws =>
      val n = size(ws)
      val len = greatest(n - 1, lit(0))
      val bigrams = zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b))
      val sorted = array_sort(bigrams)
      val top = aggregate(sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (st, x) => {
          val run = when(x === st.getField("prev"), st.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(st.getField("best"), run).as("best"))
        },
        st => st.getField("best"))
      struct(n.as("n_words"),
        size(array_distinct(ws)).as("n_distinct_words"),
        size(bigrams).as("n_bigrams"),
        top.as("top_bigram_count"))
    }), 1)

  // --- published rule-based corpus filters (C4 + Gopher) -------------------

  /** Gopher's required-word list (Rae et al. 2021, appendix A1: a document
    * must contain at least two of these). */
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published C4 (Raffel et al. 2020 §2.2) and Gopher (Rae et al.
    * 2021, appendix A1) rule filters as ONE columnar pass — per-document
    * named rule verdicts plus the conjunction, entirely
    * `org.apache.spark.sql.functions` (no UDFs, whole-stage codegen, zero
    * shuffle; at 100 TB this is a map-only scan):
    *
    *  - C4: ≥3 sentences; no "lorem ipsum"; no curly brace; fraction of
    *    lines under 5 words (C4 drops such lines — reported as a fraction
    *    so the caller picks the drop/keep policy);
    *  - Gopher: word count in [50, 100k]; mean word length in [3, 10];
    *    symbol-to-word ratio (# or ...) ≤ 0.1; ≤90% of lines starting
    *    with a bullet; ≤30% of lines ending in an ellipsis; ≥80% of words
    *    with an alphabetic character; ≥2 distinct required words.
    *
    * Regex classes are spelled ASCII ([A-Za-z], explicit bullet chars) so
    * a DuckDB/RE2 oracle matches Java byte-for-byte. */
  /** Flesch Reading Ease + Flesch-Kincaid grade (Kincaid et al. 1975) —
    * the classic readability features a quality pipeline scores alongside
    * the Gopher ratios. Syllables are the standard vowel-group heuristic:
    * `[aeiouy]+` runs per lowercased word, floored at 1 per word;
    * sentences are non-empty `[.!?]` splits floored at 1 for any non-empty
    * doc. Pure shuffle-free column math; term order is fixed
    * (left-associated) and outputs round at 4 so any engine replays the
    * scores. Empty docs yield NULL scores. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val nw = size(toks)
    val nsRaw = size(filter(split(col(textCol), "[.!?]"),
      s => length(trim(s)) > 0))
    val ns = greatest(nsRaw, lit(1))
    val syl = aggregate(toks, lit(0L), (a, w) =>
      a + greatest(size(filter(split(w, "[^aeiouy]+"),
        p => length(p) > 0)), lit(1)).cast(LongType))
    df.select(col(idCol), nw.as("n_words"), ns.as("n_sentences"),
        syl.as("n_syllables"))
      .withColumn("fre", when(col("n_words") > 0, round(
        lit(206.835) -
          lit(1.015) * (col("n_words").cast(DoubleType) / col("n_sentences")) -
          lit(84.6) * (col("n_syllables").cast(DoubleType) / col("n_words")),
        4)))
      .withColumn("fk_grade", when(col("n_words") > 0, round(
        lit(0.39) * (col("n_words").cast(DoubleType) / col("n_sentences")) +
          lit(11.8) * (col("n_syllables").cast(DoubleType) / col("n_words")) -
          lit(15.59), 4)))
  }

  def gopherC4Rules(df: DataFrame, textCol: String): DataFrame = {
    // Round 13: the raw statistics come from ONE byte pass
    // ([[graft.functions.GopherStatsExpr]]; the Column-composed form below,
    // kept as gopherC4RulesCols for the differential spec, paid a regex
    // token split, a line split, two per-line rlikes, a per-token rlike and
    // two whole-text regexp_replaces — measured 20 s of the sf10 funnel's
    // stage 1). The ratio/round/threshold math stays HERE in Column form,
    // so the emitted doubles/booleans are bit-identical to the old columns
    // (pinned by TextScanDifferentialSpec).
    val st = graft.functions.GopherStatsExpr(col(textCol))
    val nWords = st.getField("n_words")
    val nLines = st.getField("n_lines")
    val mwl = when(nWords > 0,
      st.getField("sum_word_chars").cast(DoubleType) / nWords).otherwise(0d)
    val symbolRatio = when(nWords > 0,
      (st.getField("hash_count") + st.getField("ellipsis_count"))
        .cast(DoubleType) / nWords).otherwise(0d)
    val lineFrac = (c: Column) =>
      when(nLines > 0, c.cast(DoubleType) / nLines).otherwise(0d)
    val out = df
      .withColumn("n_words", nWords)
      .withColumn("n_lines", nLines)
      .withColumn("n_sentences", st.getField("n_sentences"))
      .withColumn("mean_word_len", round(mwl, 6))
      .withColumn("c4_short_line_frac",
        round(lineFrac(st.getField("short_lines")), 6))
      .withColumn("c4_sentences_ok", st.getField("n_sentences") >= 3)
      .withColumn("c4_no_lorem", !st.getField("has_lorem"))
      .withColumn("c4_no_brace", !st.getField("has_brace"))
      .withColumn("g_wordcount_ok", nWords >= 50 && nWords <= 100000)
      .withColumn("g_mwl_ok", mwl >= 3d && mwl <= 10d)
      .withColumn("g_symbol_ok", symbolRatio <= 0.1)
      .withColumn("g_bullet_ok", lineFrac(st.getField("bullet_lines")) <= 0.9)
      .withColumn("g_ellipsis_ok",
        lineFrac(st.getField("ellipsis_lines")) <= 0.3)
      .withColumn("g_alpha_ok",
        when(nWords > 0,
          st.getField("alpha_words").cast(DoubleType) / nWords >= 0.8)
          .otherwise(lit(false)))
      .withColumn("g_stopwords_ok", st.getField("required_hits") >= 2)
    out.withColumn("keep",
      Seq("c4_sentences_ok", "c4_no_lorem", "c4_no_brace", "g_wordcount_ok",
        "g_mwl_ok", "g_symbol_ok", "g_bullet_ok", "g_ellipsis_ok",
        "g_alpha_ok", "g_stopwords_ok").map(col).reduce(_ && _))
  }

  /** Column-formula twin of [[gopherC4Rules]] (round-12 form), kept as the
    * differential-spec reference and as the shape the DuckDB oracles
    * replay. */
  private[graft] def gopherC4RulesCols(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks)
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val mwl = when(nWords > 0, sumLen.cast(DoubleType) / nWords).otherwise(0d)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines)
    val shortLines = size(filter(lines, l => size(tokens(l)) < 5))
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    val nSentences =
      size(filter(split(text, "[.!?]"), s => length(trim(s)) > 0))
    val hashCount = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisCount =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = when(nWords > 0,
      (hashCount + ellipsisCount).cast(DoubleType) / nWords).otherwise(0d)
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val lowToks = transform(toks, lower _)
    val requiredHits = gopherRequiredWords
      .map(w => array_contains(lowToks, w).cast(IntegerType))
      .reduce(_ + _)
    val lineFrac = (c: Column) =>
      when(nLines > 0, c.cast(DoubleType) / nLines).otherwise(0d)
    val out = df
      .withColumn("n_words", nWords)
      .withColumn("n_lines", nLines)
      .withColumn("n_sentences", nSentences)
      .withColumn("mean_word_len", round(mwl, 6))
      .withColumn("c4_short_line_frac", round(lineFrac(shortLines), 6))
      .withColumn("c4_sentences_ok", nSentences >= 3)
      .withColumn("c4_no_lorem", !lower(text).contains("lorem ipsum"))
      .withColumn("c4_no_brace", !text.contains("{"))
      .withColumn("g_wordcount_ok", nWords >= 50 && nWords <= 100000)
      .withColumn("g_mwl_ok", mwl >= 3d && mwl <= 10d)
      .withColumn("g_symbol_ok", symbolRatio <= 0.1)
      .withColumn("g_bullet_ok", lineFrac(bulletLines) <= 0.9)
      .withColumn("g_ellipsis_ok", lineFrac(ellipsisLines) <= 0.3)
      .withColumn("g_alpha_ok",
        when(nWords > 0, alphaWords.cast(DoubleType) / nWords >= 0.8)
          .otherwise(lit(false)))
      .withColumn("g_stopwords_ok", requiredHits >= 2)
    out.withColumn("keep",
      Seq("c4_sentences_ok", "c4_no_lorem", "c4_no_brace", "g_wordcount_ok",
        "g_mwl_ok", "g_symbol_ok", "g_bullet_ok", "g_ellipsis_ok",
        "g_alpha_ok", "g_stopwords_ok").map(col).reduce(_ && _))
  }

  // --- PII scrubbing -------------------------------------------------------

  /** Replace common PII shapes with typed placeholders (training-data
    * hygiene). Regexes stay within the RE2-compatible subset so external
    * engines (and the DuckDB oracle) agree byte-for-byte. Order matters:
    * emails before bare domains, URLs before IPs. */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^ ]+"
    val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    var c = regexp_replace(text, email, "<EMAIL>")
    c = regexp_replace(c, url, "<URL>")
    c = regexp_replace(c, ssn, "<SSN>")
    c = regexp_replace(c, ip, "<IP>")
    c = regexp_replace(c, phone, "<PHONE>")
    c
  }

  // --- deterministic sampling & packing ------------------------------------

  /** Stratified sample: first `perStratum` docs per stratum, ordered by
    * md5(text) (a deterministic uniform-ish shuffle that any engine can
    * reproduce) with id tiebreak. One shuffle on the stratum key. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, stratumCol: String,
      textCol: String, idCol: String, perStratum: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(md5(col(textCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Greedy token packing: assign docs (in `idCol` order) to fixed-size
    * context windows by cumulative token count. Deterministic.
    *
    * With `shardCol` (the 100 TB path) each shard packs independently and in
    * parallel — one window-function partition per shard, windows never span
    * shards, exactly how a production packer assigns one packing worker per
    * shard. `window_id` is then shard-local; (shard, window_id) is the
    * global window key. Without a shard the plan is a single global
    * cumulative sum — one reducer; fine for small corpora and verification,
    * never for a full corpus. */
  /** Overlapping token-window chunking (RAG / context-window preparation):
    * doc → chunks of `chunkTokens` whitespace tokens, consecutive chunks
    * sharing `overlap` tokens. A pure projection (tokenize once,
    * `posexplode` a chunk-index sequence, slice) — no shuffle, no UDF,
    * scales linearly. Output: input columns + `chunk_id` (0-based),
    * `chunk` (re-joined text), `n_chunk_tokens` (last chunk may be short);
    * empty docs yield no chunks. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      "chunkWindows needs 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    // chunks cover positions [i*stride, i*stride + chunkTokens); the last
    // chunk starts before n - overlap so every token lands in some chunk
    val nChunks = when(n <= chunkTokens, when(n > 0, lit(1)).otherwise(lit(0)))
      .otherwise(ceil((n - lit(overlap)).cast(DoubleType) / stride).cast(IntegerType))
    df.withColumn("__toks", toks)
      .withColumn("chunk_id", explode(
        when(n > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .withColumn("chunk",
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)), " "))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens), size(col("__toks")) - col("chunk_id") * stride))
      .drop("__toks")
  }

  /** Sentence-aligned chunking for retrieval corpora: sentences (maximal
    * runs between terminal punctuation, trimmed) pack into chunks of
    * ≈ `maxTokens` whitespace tokens — sentence i joins chunk
    * ⌊tokensBefore(i)/maxTokens⌋, so no sentence is ever split and each
    * chunk overflows by at most one sentence. The assignment rule is a
    * pure prefix-sum (no greedy state), which keeps the whole op one
    * doc-local column expression — shuffle-free, embarrassingly parallel,
    * and exactly replayable in SQL. Token-budget chunking with overlap is
    * [[chunkWindows]]; this is the boundary-respecting variant. */
  def chunkSentences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val sents = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    // let-bind via single-element array + transform (the DedupOps.shingles
    // trick) so sentences/counts evaluate once per row
    val packed = element_at(transform(array(sents), { ss =>
      val stoks = transform(ss, s => size(tokens(s)))
      val cumB = aggregate(stoks,
        struct(array().cast(ArrayType(IntegerType)).as("c"), lit(0).as("t")),
        (st, x) => struct(
          concat(st.getField("c"), array(st.getField("t"))).as("c"),
          (st.getField("t") + x).as("t")),
        st => st.getField("c"))
      val assign = transform(cumB, cb => floor(cb / maxTokens).cast(IntegerType))
      struct(ss.as("sents"), stoks.as("stoks"), assign.as("assign"))
    }), 1)
    df.withColumn("__p", packed)
      .withColumn("chunk_id", explode(
        when(size(col("__p.sents")) > 0,
          sequence(lit(0), element_at(col("__p.assign"), -1)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .withColumn("chunk", array_join(
        zip_with(col("__p.sents"), col("__p.assign"),
          (s, a) => when(a === col("chunk_id"), s)), " "))
      .withColumn("n_sentences",
        size(filter(col("__p.assign"), a => a === col("chunk_id"))))
      .withColumn("n_chunk_tokens",
        aggregate(zip_with(col("__p.stoks"), col("__p.assign"),
          (t, a) => when(a === col("chunk_id"), t).otherwise(lit(0))),
          lit(0), (acc, x) => acc + x))
      .select(col(idCol), col("chunk_id"), col("chunk"),
        col("n_sentences"), col("n_chunk_tokens"))
  }

  /** Deterministic synthetic URL for a doc — four messiness variants
    * (chosen by `id % 4`, with `id / 4` as the shared page id) that all
    * canonicalize to the SAME url, so [[canonicalizeUrl]] oracles get
    * real dup groups out of the `documents` table without new testdata
    * (the [[graft.llm.MultimodalOps.synthPng]] pattern applied to URLs;
    * host derives from the PAGE id so the four variant docs share it):
    * upper-cased scheme/host, `www.` prefix, explicit default port,
    * shuffled query params, tracking params (`utm_*`/`gclid`/`ref`),
    * and a `#fragment`. */
  def synthUrl(id: Column): Column = {
    val page = (id / 4).cast(LongType).cast(StringType)
    val host = concat(lit("site"),
      pmod((id / 4).cast(LongType), lit(50)).cast(StringType),
      lit(".example.com"))
    val v = pmod(id, lit(4))
    when(v === 0, concat(lit("https://WWW."), upper(host),
        lit("/articles/"), page, lit("?id="), page,
        lit("&utm_source=feed&utm_medium=rss")))
      .when(v === 1, concat(lit("https://www."), host, lit(":443/articles/"),
        page, lit("?ref=hp&id="), page))
      .when(v === 2, concat(lit("HTTPS://"), host, lit("/articles/"), page,
        lit("?utm_campaign=x&id="), page, lit("#section-2")))
      .otherwise(concat(lit("https://"), host, lit("/articles/"), page,
        lit("?id="), page, lit("&gclid=abc123")))
  }

  /** URL canonicalization — the CommonCrawl/C4-style URL dedup key.
    * Conventions (each spelled so a DuckDB RE2 oracle matches Java regex
    * exactly; no percent-decoding — that can CHANGE the resource):
    *  1. drop the `#fragment`;
    *  2. lower-case scheme and authority;
    *  3. strip the scheme's default port (`:80` http, `:443` https) and a
    *     leading `www.`;
    *  4. empty path becomes `/`;
    *  5. drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`), sort
    *     the survivors byte-wise, rejoin with `&` (param ORDER never
    *     distinguishes resources; tracking params never should).
    * Pure codegen-able column expressions — a shuffle-free scan at any
    * corpus size; dedup then groups the md5 of the canonical form
    * ([[urlDedup]]) so only 16-byte digests cross the exchange. */
  def canonicalizeUrl(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nf, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(nf,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val host = regexp_replace(noPort, "^www\\.", "")
    val path0 = regexp_extract(nf,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q0 = regexp_extract(nf, "\\?([^#]*)", 1)
    val kept = filter(split(q0, "&"), p => length(p) > 0 &&
      !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)(=|$)"))
    val q = array_join(sort_array(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** URL-level dedup over canonical forms: one row per distinct canonical
    * url with the lowest carrying doc id and the dup count. The group key
    * crossing the shuffle is `md5(canon)` (16 bytes), not the url string —
    * the [[graft.llm.DedupOps.exact]] digest-shuffle shape. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("__c"))
      .groupBy(md5(col("__c")).as("url_md5"))
      .agg(min(col("__c")).as("canon_url"), min(col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count"))

  /** Sequence-packing SEGMENT BOUNDARIES: the per-doc token spans that
    * packed pretraining needs to build block-diagonal attention masks
    * (each doc must not attend across its neighbors in the packed
    * window). Same assignment rule as [[packIntoWindows]] (`window_id =
    * floor(cum_start / windowTokens)` over an id-ordered running token
    * count); emits GLOBAL token offsets `[seg_start, seg_end)` per doc —
    * consumers slice `seg - window_id*windowTokens` for within-window
    * positions. With `shardCol` the running count is per-shard (the
    * scale path — one exchange on the shard key, no global window). */
  def packSegments(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, windowTokens: Int,
      shardCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = shardCol.fold(W.orderBy(col(idCol)))(s =>
        W.partitionBy(col(s)).orderBy(col(idCol)))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__n", tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .select(col(idCol) +: shardCol.map(col).toSeq :+
        floor((col("__cum") - col("__n")) / windowTokens).as("window_id") :+
        (col("__cum") - col("__n")).as("seg_start") :+
        col("__cum").as("seg_end") :+ col("__n").as("n_tokens"): _*)
  }

  def packIntoWindows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, windowTokens: Int,
      shardCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = shardCol.fold(W.orderBy(col(idCol)))(s =>
        W.partitionBy(col(s)).orderBy(col(idCol)))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__n", tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("window_id", floor((col("__cum") - col("__n")) / windowTokens))
      .drop("__cum")
      .withColumnRenamed("__n", "n_tokens")
  }
}
