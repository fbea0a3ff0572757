package graft.pipeline

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus composition report: per-group (source, language, …) volume
  * and length statistics — the dataset datasheet a training pipeline
  * publishes per snapshot. One hash aggregation keyed by the group
  * columns; the exact median rides in the same agg (percentile over
  * each group's values — groups are source/lang cardinality, so the
  * per-group state is bounded by group row counts, which is what any
  * exact median costs; swap in percentile_approx when a group exceeds
  * memory at extreme scale).
  */
object Report {

  /** (groupCols…, n_docs, total_tokens, total_chars, avg_chars,
    * median_chars) — averages rounded to 4, median exact.
    */
  def byGroup(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame =
    docs
      .withColumn("_tok", TextOps.tokenCount(col(textCol)))
      .withColumn("_chr", length(col(textCol)).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_tok").as("total_tokens"),
        sum("_chr").as("total_chars"),
        round(avg("_chr"), 4).as("avg_chars"),
        median(col("_chr")).as("median_chars"))
}
