package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: language
  * ID, quality scoring, token counting, document fingerprinting. All
  * pure Column expressions (codegen'd, no UDFs) so they survive a
  * 100 TB scan inside whole-stage codegen.
  */
object TextOps {

  /** Normalized text: lowercase, collapse whitespace, trim — the
    * canonical form used by fingerprints and exact dedup.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic document fingerprint: 128-bit md5 of the normalized
    * text (hex). Stable across engines — DuckDB's md5() agrees.
    */
  def fingerprint(c: Column): Column = md5(normalize(c).cast("binary"))

  /** 64-bit rolling-hash fingerprint (xxhash64 of normalized text) for
    * cheap joins; engine-internal (not portable across engines).
    */
  def fingerprint64(c: Column): Column = xxhash64(normalize(c))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(Analyzer.whitespace(c))

  /** BPE-ish subword count approximation: word-piece regex splitting
    * words, numbers, and punctuation runs — the usual ~chars/4 heuristic
    * is replaced by counting actual segments.
    */
  def subwordCount(c: Column): Column =
    size(filter(
      split(c, "(?<=[\\p{L}\\p{N}])(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}\\s])(?=[\\p{L}\\p{N}])|\\s+"),
      t => t =!= ""))

  // --- language ID -------------------------------------------------------

  /** Tiny per-language stopword profiles (top function words). Public
    * knowledge; enough for a coarse n-gram/stopword heuristic.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
  )

  /** Heuristic language ID: CJK character ratio decides "zh"; otherwise
    * the language whose stopword profile overlaps the token set most.
    * Returns "und" (undetermined) when nothing matches.
    */
  def langId(c: Column): Column = {
    val toks = Analyzer.standard(c)
    val cjk = size(filter(split(c, ""), ch => ch.rlike("[\\u4e00-\\u9fff]")))
    val total = greatest(length(c), lit(1))
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, lit(words.toArray))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(cjk * 5 > total, lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // --- quality scoring ---------------------------------------------------

  private val enStopwords =
    Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
      "on", "are", "as", "with", "at", "be", "this", "have", "from", "or")

  /** Length / punctuation / stopword-ratio quality features
    * (the standard pre-training quality-filter feature set).
    */
  def qualityFeatures(c: Column): Column = {
    val toks = Analyzer.whitespace(c)
    val n = greatest(size(toks), lit(1))
    val punct = size(filter(split(c, ""), ch => ch.rlike("[\\p{Punct}]")))
    val stop = size(array_intersect(
      transform(toks, t => lower(t)), lit(enStopwords.toArray)))
    struct(
      length(c).as("n_chars"),
      size(toks).as("n_tokens"),
      round(length(c).cast("double") / n, 4).as("mean_token_len"),
      round(punct.cast("double") / greatest(length(c), lit(1)), 4).as("punct_ratio"),
      round(stop.cast("double") / n, 4).as("stopword_ratio"),
      round(size(array_distinct(toks)).cast("double") / n, 4).as("distinct_ratio"))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * vocabulary diversity, penalizes extreme punctuation and degenerate
    * token lengths.
    */
  def qualityScore(c: Column): Column = qualityScoreFrom(qualityFeatures(c))

  /** The score as pure arithmetic over an ALREADY-COMPUTED
    * [[qualityFeatures]] struct — callers that materialize the
    * features (e.g. [[Signals.annotate]]) reuse them instead of
    * re-running the HOF-heavy feature pass (lambda subtrees are
    * excluded from Catalyst subexpression elimination, so the
    * per-char/per-token scans would genuinely run twice).
    */
  def qualityScoreFrom(f: Column): Column = {
    val lenOk = when(f.getField("n_tokens").between(5, 100000), 1.0).otherwise(0.2)
    val punctOk = when(f.getField("punct_ratio") <= 0.2, 1.0)
      .when(f.getField("punct_ratio") <= 0.5, 0.5)
      .otherwise(0.0)
    val stopOk = least(f.getField("stopword_ratio") * 5.0, lit(1.0))
    val divOk = least(f.getField("distinct_ratio") * 1.25, lit(1.0))
    round((lenOk * 0.3 + punctOk * 0.2 + stopOk * 0.2 + divOk * 0.3), 4)
  }

  /** Word n-gram shingles of the normalized text (for MinHash/Jaccard).
    *
    * The token array is bound to a lambda variable (via a 1-element
    * array + transform) so tokenization runs ONCE per row: referencing
    * the tokenize expression directly inside the shingle lambda would
    * re-run the regex split per shingle — Catalyst does no
    * common-subexpression elimination across lambda bodies (measured
    * ~9x slower on the sf0.1 corpus).
    */
  /** Multi-word phrase tagging at corpus scale — the topic/safety
    * tagging stage of curation pipelines (phrase blocklists, taxonomy
    * keyword lists): which of `phrases` occur in each document, as
    * token sequences under the standard analyzer (so punctuation and
    * case differences don't break matches, same rule as PHRASE_MATCH).
    *
    * Scale shape: the phrase list is grouped by word count on the
    * driver, the document generates its token n-grams ONLY for the
    * lengths that actually occur in the list, and membership is an
    * `isin` against the driver-constant phrase set per length — pure
    * codegen projection, no join, no shuffle, corpus read once. Fits
    * phrase lists up to the usual blocklist/taxonomy sizes (thousands);
    * a list too big to inline belongs in [[C4Filters.blocklistFilter]]
    * -style broadcast-join territory.
    *
    * @return ARRAY<STRING> of the distinct matched phrases (normalized
    *         form), sorted — empty array when nothing matches
    */
  def tagPhrases(c: Column, phrases: Seq[String]): Column = {
    val normalized = phrases.map(_.toLowerCase
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty).distinct
    require(normalized.nonEmpty, "phrase list must contain a non-empty phrase")
    val byLen = normalized.groupBy(_.length)
    val toks = Analyzer.standard(c)
    val perLen = byLen.toSeq.sortBy(_._1).map { case (n, ps) =>
      val set = ps.map(_.mkString(" "))
      val grams =
        if (n == 1) toks
        else {
          // n-grams via index transform: join tokens i..i+n-1. The
          // short-doc guard matters: sequence(0, negative) counts DOWN
          // in Spark, it is not empty.
          val idx = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
            .otherwise(array().cast("array<int>"))
          transform(idx, i =>
            concat_ws(" ", (0 until n).map(j =>
              element_at(toks, (i + j + 1).cast("int"))): _*))
        }
      array_distinct(filter(grams, g => g.isin(set: _*)))
    }
    // null text tags as empty, not null — taggers feed filters
    coalesce(array_sort(array_distinct(
      perLen.reduce((a, b) => concat(a, b)))), array().cast("array<string>"))
  }

  def shingles(c: Column, n: Int): Column =
    element_at(
      transform(array(Analyzer.standard(c)), t => {
        val idxs = sequence(lit(0), greatest(size(t) - n, lit(0)))
        when(size(t) < n, array(concat_ws(" ", t)))
          .otherwise(transform(idxs, i =>
            concat_ws(" ", slice(t, i + 1, lit(n)))))
      }),
      1)
}
