package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the closed-form stand-in
  * for the linear "quality / domain classifier" stage of web-corpus
  * pipelines (CCNet's fastText LM-vs-crawl filter, GPT-3's
  * WebText-vs-CommonCrawl LR: score every document by a classifier
  * trained to recognize a high-quality reference, keep the head).
  * Naive Bayes is chosen deliberately over iterative LR/fastText:
  * training is TWO hash aggregations (no gradient loop, no
  * driver-synchronized epochs), byte-for-byte reproducible, and every
  * number is independently recomputable by a SQL oracle.
  *
  * Training: token counts per (label, token) + label totals; add-k
  * smoothed likelihoods
  *   log P(t | c) = log (count(t, c) + k) − log (tokens_c + k·V)
  * with V = |training vocabulary|. Unseen (token, label) pairs fall to
  * the k / (tokens_c + k·V) floor; the per-label floor differs, which
  * is exactly NB's length-sensitive prior on rare text.
  *
  * Scoring: the document token stream joins the count table per label —
  * shuffle-bounded in corpus tokens × #labels. Label metadata (priors,
  * totals) is a broadcast when-sized table; `broadcastModel = true`
  * additionally pins the token-count table driver-side for small
  * vocabularies.
  */
object NaiveBayes {

  /** `labelStats`: (label, logPrior, tokTotal) — one row per class,
    * driver-held (classes are few by construction). `tokenCounts`:
    * (token, label, c) — distributed; persist to reuse across scoring
    * jobs.
    */
  final case class Model(labelStats: Seq[(String, Double, Long)],
      tokenCounts: DataFrame, vocabSize: Long, k: Double)

  private def docTokens(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("_doc"),
        explode(Analyzer.standard(col(textCol))).as("token"))

  /** Train on labeled documents. Two aggregations over the exploded
    * token stream plus one tiny label count; the (token, label) table
    * stays distributed.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      k: Double = 1.0): Model = {
    require(k > 0, "add-k smoothing needs k > 0")
    val toks = docs.select(col(labelCol).as("label"),
      explode(Analyzer.standard(col(textCol))).as("token"))
    val counts = toks.groupBy("token", "label")
      .agg(count(lit(1)).as("c"))
    val v = counts.select("token").distinct().count()
    val docCounts = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = docCounts.values.sum.toDouble
    val tokTotals = counts.groupBy("label").agg(sum("c").as("nt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = docCounts.toSeq.sortBy(_._1).map { case (l, nd) =>
      (l, math.log(nd / totalDocs), tokTotals.getOrElse(l, 0L))
    }
    Model(stats, counts, v, k)
  }

  /** Per-(document, label) joint log-likelihoods:
    * (idCol, label, logp) — every label scored for every document, so
    * callers can threshold on margins, not just the argmax. Documents
    * with zero tokens score prior-only.
    *
    * Scale shape (label-pruned): tokens join the count table by TOKEN
    * only — never token x label — so the corpus-sized exchange is
    * linear in tokens regardless of the class count; a token row fans
    * out only to the labels that actually saw that token, and the
    * per-(doc, label) aggregation partial-combines before its
    * doc x label exchange. The unseen-token mass is closed-form:
    * every (token, label) pair absent from the count table contributes
    * exactly log(k), so
    *   logp = prior + sum_matched log(c + k)
    *        + (T_d - n_matched) * log(k) - T_d * log(nt_l + k * V).
    * This makes 10-way (or 100-way) domain tagging cost the same
    * token-side work as binary quality filtering.
    */
  def score(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, model: Model,
      broadcastModel: Boolean = false): DataFrame = {
    import spark.implicits._
    val labels = broadcast(
      model.labelStats.toDF("label", "_logPrior", "_nt"))
    val countsRaw = model.tokenCounts
    val counts = if (broadcastModel) broadcast(countsRaw) else countsRaw
    val logK = math.log(model.k)
    // Matched-pair partial sums: one row per (doc, label) that shares
    // at least one training token — the join key is the token alone.
    val matched = docTokens(docs, textCol, idCol)
      .join(counts, Seq("token"))
      .groupBy(col("_doc"), col("label"))
      .agg(sum(log(col("c").cast("double") + model.k)).as("_s1"),
        count(lit(1)).as("_n1"))
    // Every doc scores every label (prior-only fallback keeps empty
    // documents); T_d comes straight from the analyzer, no explode.
    val docLen = docs.select(col(idCol).as("_doc"),
      coalesce(size(Analyzer.standard(col(textCol))), lit(0))
        .cast("long").as("_td"))
    docLen.crossJoin(labels)
      .join(matched, Seq("_doc", "label"), "left")
      .select(col("_doc").as(idCol), col("label"),
        (col("_logPrior")
          + coalesce(col("_s1"), lit(0.0))
          + (col("_td") - coalesce(col("_n1"), lit(0L))) * logK
          - col("_td").cast("double") *
            log(col("_nt").cast("double") + model.k * model.vocabSize))
          .as("logp"))
  }

  /** Argmax classification: (idCol, label, logp), ties broken by label
    * ascending so the result is deterministic on every engine.
    */
  def classify(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, model: Model,
      broadcastModel: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("logp").desc, col("label").asc)
    score(spark, docs, textCol, idCol, model, broadcastModel)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
