package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text highlighting + analyzer introspection — the 3.0 text surface
  * (feature-inventory plan §3: "BM25 text highlighter", "highlighter
  * fragment 配置", "query term highlighter", "highlighter score",
  * "run_analyzer"; exercised by the proposed `text_highlight_matrix` /
  * `run_analyzer_request` bricks).
  *
  * Everything is Column-level (codegen'd regex/array built-ins): the
  * highlighter is a projection over whatever row set the caller
  * already narrowed (typically BM25 top-k), so its cost is per-result,
  * never per-corpus.
  */
object Highlight {

  final case class FragmentConfig(
      preTag: String = "<em>",
      postTag: String = "</em>",
      fragmentContext: Int = 40, // chars kept either side of a match
      numFragments: Int = 3)

  /** Query terms under the analyzer, deduped, match-order preserved. */
  private def queryTerms(query: String, analyzer: String): Seq[String] =
    Bm25.tokenizeQuery(query, analyzer)

  private def termAlternation(terms: Seq[String]): String =
    terms.map(java.util.regex.Pattern.quote).mkString("|")

  /** Query-term highlighter: every analyzer token of the query wrapped
    * in pre/post tags, case-insensitive, on token boundaries.
    */
  def highlightTerms(text: Column, query: String,
      cfg: FragmentConfig = FragmentConfig(),
      analyzer: String = "standard"): Column = {
    val terms = queryTerms(query, analyzer)
    if (terms.isEmpty) text
    else regexp_replace(text,
      s"(?i)\\b(${termAlternation(terms)})\\b",
      s"${cfg.preTag}$$1${cfg.postTag}")
  }

  /** Highlight fragments: up to `numFragments` windows of
    * `fragmentContext` chars around (non-overlapping, left-to-right)
    * tagged matches — the simple-fragmenter contract of the reference's
    * fragment config.
    */
  def fragments(text: Column, query: String,
      cfg: FragmentConfig = FragmentConfig(),
      analyzer: String = "standard"): Column = {
    val terms = queryTerms(query, analyzer)
    if (terms.isEmpty) array().cast("array<string>")
    else {
      val tagged = highlightTerms(text, query, cfg, analyzer)
      val pre = java.util.regex.Pattern.quote(cfg.preTag)
      val post = java.util.regex.Pattern.quote(cfg.postTag)
      val frag = s".{0,${cfg.fragmentContext}}$pre(?:${termAlternation(terms)})" +
        s"$post.{0,${cfg.fragmentContext}}"
      slice(regexp_extract_all(tagged, lit(s"(?i)$frag"), lit(0)),
        1, cfg.numFragments)
    }
  }

  /** Highlighter score: fraction of distinct query terms present in the
    * text (0.0–1.0) — the per-result relevance the highlight carries
    * alongside the BM25 score.
    */
  def highlightScore(text: Column, query: String,
      analyzer: String = "standard"): Column = {
    val terms = queryTerms(query, analyzer)
    if (terms.isEmpty) lit(0.0)
    else
      size(array_intersect(
        array_distinct(Analyzer.byName(analyzer)(text)),
        typedlit(terms))).cast("double") / terms.length
  }

  /** Attach highlight columns to a result set (e.g. BM25 top-k):
    * `highlight` (tagged text), `fragments`, `highlight_score`.
    */
  def withHighlights(results: DataFrame, textCol: String, query: String,
      cfg: FragmentConfig = FragmentConfig(),
      analyzer: String = "standard"): DataFrame =
    results
      .withColumn("highlight", highlightTerms(col(textCol), query, cfg, analyzer))
      .withColumn("fragments", fragments(col(textCol), query, cfg, analyzer))
      .withColumn("highlight_score",
        highlightScore(col(textCol), query, analyzer))

  /** Deterministic feature-hashed bag-of-words embedding, L2-normalized
    * (the sandbox stand-in for a model encoder — same contract: text →
    * fixed-dim normalized vector; swap in a real encoder column for
    * production semantic highlighting). dims large vs the vocabulary ⇒
    * cosine equals term-frequency cosine, which is what the oracle
    * recomputes.
    */
  def hashedBow(text: Column, dims: Int): Column = {
    val toks = Analyzer.standard(text)
    val counts = transform(sequence(lit(0), lit(dims - 1)), d =>
      size(filter(toks,
        t => pmod(xxhash64(t), lit(dims.toLong)) === d.cast("long")))
        .cast("double"))
    // Bind counts AND the norm through single-element transforms:
    // Catalyst does no CSE across lambda bodies, so an inline norm
    // aggregate would re-run its O(dims) fold twice per ELEMENT —
    // O(dims²) per row (measured: 18s for a 3-doc fixture at 4096).
    element_at(transform(array(counts), cs =>
      element_at(transform(
        array(sqrt(aggregate(cs, lit(0.0), (a, y) => a + y * y))), norm =>
        transform(cs, x =>
          when(norm > 0, x / norm).otherwise(lit(0.0)))), 1)), 1)
  }

  /** Semantic highlighter (feature-inventory §3): sentences ranked by
    * embedding cosine against the query, best first — up to `topK`
    * `(score, sentence)` structs. The sentence rule `[.!?]+\s*` is
    * lookbehind-free so independent engines can reproduce it.
    */
  def semanticFragments(text: Column, query: String, dims: Int = 256,
      topK: Int = 3): Column = {
    val qv = hashedBow(lit(query), dims)
    val sentences =
      filter(transform(split(text, "[.!?]+\\s*"), s => trim(s)),
        s => s =!= "")
    val scored = transform(sentences, sEl =>
      struct(
        (lit(0.0) - aggregate(
          zip_with(hashedBow(sEl, dims), qv, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)).as("neg"),
        sEl.as("sentence")))
    transform(slice(array_sort(scored), 1, topK), x =>
      struct((lit(0.0) - x.getField("neg")).as("score"),
        x.getField("sentence").as("sentence")))
  }

  /** run_analyzer: the token stream an analyzer produces for each row
    * — (row id, position, token), the inspection API the reference
    * plan gates text features on.
    */
  def runAnalyzer(df: DataFrame, textCol: String, idCol: String,
      analyzer: String = "standard"): DataFrame =
    df.select(col(idCol),
        posexplode(Analyzer.byName(analyzer)(col(textCol)))
          .as(Seq("pos", "token")))
}
