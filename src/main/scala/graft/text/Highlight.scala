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
