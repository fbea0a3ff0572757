package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic cleaning (Raffel et al., "Exploring the Limits
  * of Transfer Learning…", §2.2 — public rules): line-level keep rules
  * (terminal punctuation, minimum word count) plus document-level
  * drops (brace/code marker, "lorem ipsum", minimum surviving lines).
  * Everything is a per-row Column expression — no shuffle at all; the
  * filter runs inside the scan at any corpus size.
  */
object C4Filters {

  /** Lines that survive the C4 line rules: trimmed, ending in terminal
    * punctuation (. ! ? or a closing double quote) and carrying at
    * least `minWords` whitespace words.
    */
  def keptLines(c: Column, minWords: Int = 3): Column =
    filter(transform(split(c, "\n"), l => trim(l)), l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= minWords)

  /** Cleaned text: surviving lines re-joined in order. */
  def cleanText(c: Column, minWords: Int = 3): Column =
    concat_ws("\n", keptLines(c, minWords))

  /** Document keep decision: at least `minLines` surviving lines, no
    * curly brace (code marker), no "lorem ipsum" placeholder text.
    */
  def docKeep(c: Column, minWords: Int = 3, minLines: Int = 1): Column =
    size(keptLines(c, minWords)) >= minLines &&
      !c.contains("{") &&
      !lower(c).contains("lorem ipsum")

  /** Number of DISTINCT blocklisted words present in the document —
    * the C4 "bad words" stage (Raffel et al. 2020 §2.2 drops any page
    * containing a listed word). The list rides as a literal array in
    * the expression: a pure codegen'd projection, no shuffle, no
    * broadcast round-trip — blocklists are hundreds of words, not
    * data.
    */
  def blocklistHits(c: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must name at least one word")
    size(array_intersect(Analyzer.standard(c),
      array(words.map(w => lit(w.toLowerCase)): _*)))
  }

  /** Documents carrying NO blocklisted word (the C4 drop policy). */
  def blocklistFilter(docs: DataFrame, textCol: String,
      words: Seq[String]): DataFrame =
    docs.filter(blocklistHits(col(textCol), words) === 0)

  /** Apply the full C4 pass: adds `keep` and `clean_text` columns;
    * callers filter on `keep` and swap in `clean_text` downstream.
    */
  def c4(docs: DataFrame, textCol: String,
      minWords: Int = 3, minLines: Int = 1): DataFrame =
    docs
      .withColumn("keep", docKeep(col(textCol), minWords, minLines))
      .withColumn("clean_text", cleanText(col(textCol), minWords))
}
