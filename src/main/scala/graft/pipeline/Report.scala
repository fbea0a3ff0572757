package graft.pipeline

import graft.text.{Analyzer, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Sketch-based approximate datasheet — the reporting path that
    * stays affordable when the exact one doesn't: at 100 TB an exact
    * token-vocabulary count is a corpus-sized shuffle on the token key
    * and an exact length median is a global sort, while every figure
    * here is a CONSTANT-SIZE aggregation state merged map-side
    * (HyperLogLog++ registers for the distinct count, a fixed quantile
    * summary for the percentiles), so the whole datasheet is two
    * shuffle-free-until-the-final-merge passes regardless of corpus
    * size.
    *
    * One row: n_docs, n_tokens (exact sums — they cost nothing),
    * approx_distinct_tokens (HLL++, relative sd `rsd`), p50/p90/p99
    * document char lengths (approx percentile, rank error
    * 1/`accuracy`).
    */
  def approxDatasheet(docs: DataFrame, textCol: String,
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val docStats = docs
      .withColumn("_tok", TextOps.tokenCount(col(textCol)))
      .withColumn("_chr", length(col(textCol)).cast("long"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_tok").as("n_tokens"),
        percentile_approx(col("_chr"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(accuracy)).as("_pct"))
      .select(col("n_docs"), col("n_tokens"),
        col("_pct").getItem(0).as("p50_chars"),
        col("_pct").getItem(1).as("p90_chars"),
        col("_pct").getItem(2).as("p99_chars"))
    val vocab = docs
      .select(explode(Analyzer.whitespace(col(textCol))).as("_t"))
      .agg(approx_count_distinct(col("_t"), rsd)
        .as("approx_distinct_tokens"))
    docStats.crossJoin(vocab)
      .select(col("n_docs"), col("n_tokens"), col("approx_distinct_tokens"),
        col("p50_chars"), col("p90_chars"), col("p99_chars"))
  }

  /** Count-min sketch of the corpus token-frequency distribution —
    * point-queryable heavy-hitter counts without materializing the
    * (token, count) table. Tokens are hashed to a stable 64-bit key
    * IN the plan (`xxhash64`) so the driver-side estimate uses the
    * identical key derivation; the sketch itself is a fixed
    * `ceil(2/eps) x depth` counter grid merged associatively across
    * partitions. CMS never under-counts: exact <= estimate <=
    * exact + eps * total insertions, each with confidence
    * `confidence`.
    */
  def tokenFrequencySketch(docs: DataFrame, textCol: String,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = docs
      .select(explode(Analyzer.whitespace(col(textCol))).as("_t"))
      .select(xxhash64(col("_t")).as("_h"))
      .agg(count_min_sketch(col("_h"), lit(eps), lit(confidence), lit(seed))
        .as("cms"))
      .head().getAs[Array[Byte]]("cms")
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** Point estimates for `tokens` from a [[tokenFrequencySketch]].
    * The probe keys are derived by the SAME plan-side `xxhash64` (a
    * one-row local query — no job against the corpus), so probe and
    * sketch hashing can never drift.
    */
  def estimateTokenCounts(spark: SparkSession,
      cms: org.apache.spark.util.sketch.CountMinSketch,
      tokens: Seq[String]): Map[String, Long] = {
    if (tokens.isEmpty) return Map.empty
    import spark.implicits._
    val hashes = tokens.toDF("_t")
      .select(col("_t"), xxhash64(col("_t")).as("_h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    hashes.map { case (t, h) =>
      t -> cms.estimateCount(java.lang.Long.valueOf(h))
    }.toMap
  }
}
