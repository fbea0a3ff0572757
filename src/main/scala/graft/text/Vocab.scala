package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: per-token term frequency and document
  * frequency, and the top-k heavy hitters. One explode plus one hash
  * aggregation keyed by token — map-side partial aggregation absorbs
  * the Zipf head before the shuffle, and the final top-k is a
  * TakeOrdered (no global sort materialization). 100 TB-safe: shuffle
  * volume is O(distinct tokens per partition), not O(corpus tokens).
  */
object Vocab {

  /** (token, term_freq, doc_freq) over the standard-analyzer tokens.
    * `doc_freq` counts distinct documents via an exact two-level agg
    * (distinct (token, doc) pairs first), not count_distinct inside
    * one agg — the pair-distinct shape keeps both counts in plain
    * hash aggregations.
    */
  def stats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(Analyzer.standard(col(textCol))).as("token"))
    val tf = toks.groupBy("token").agg(count(lit(1)).as("term_freq"))
    val df = toks.distinct().groupBy("token").agg(count(lit(1)).as("doc_freq"))
    tf.join(df, "token")
  }

  /** Top-k tokens by term frequency (ties broken by token asc, so the
    * cut is deterministic engine-to-engine).
    */
  def topK(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    stats(docs, textCol, idCol)
      .orderBy(col("term_freq").desc, col("token").asc)
      .limit(k)
}
