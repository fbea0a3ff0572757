package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language model for perplexity-based quality filtering — the
  * CCNet / Gopher pipeline stage "score every document by a reference
  * LM; keep the low-perplexity head". Beyond the reference's own
  * surface (it benchmarks a vector store); first-class here because a
  * training-data pipeline at 100 TB needs it next to dedup and the
  * heuristic filters.
  *
  * The model is DATA, not a driver-side table: over a web corpus the
  * distinct-bigram set runs to hundreds of millions, so
  *   - TRAIN is one explode + hash aggregation per order (map-side
  *     partial agg absorbs the Zipf head before the shuffle, the same
  *     shape as [[Vocab]]);
  *   - SCORE is the document bigram stream equi-joined against the
  *     count tables (shuffle-bounded; `broadcastModel = true` pins
  *     both sides driver-side for small/filtered models).
  *
  * Probabilities are add-k smoothed over the bigram PREFIX counts:
  *   P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * (V + 1))
  * with V = |unigram vocab| and the +1 absorbing unseen successors, so
  * unseen bigrams (and fully unseen prefixes: P = 1/(V+1)) score a
  * small nonzero probability and perplexity stays finite.
  */
object LangModel {

  /** `prefix` = (w1, c1): bigram-prefix totals; `bigrams` = (w1, w2,
    * c12). Both lazy frames over the training corpus — persist them
    * (or write to parquet) to reuse one model across scoring jobs.
    */
  final case class Model(prefix: DataFrame, bigrams: DataFrame,
      vocabSize: Long, k: Double)

  /** (doc, w1, w2) bigram stream: a per-row transform over the token
    * array — linear in tokens, no window, no self-join.
    */
  private def docBigrams(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs
      .select(col(idCol).as("_doc"),
        Analyzer.standard(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("_doc"), explode(expr(
        "transform(sequence(1, size(_t) - 1), " +
          "i -> struct(_t[i-1] AS w1, _t[i] AS w2))")).as("_bg"))
      .select(col("_doc"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** Train the add-k bigram model on a corpus. Two aggregations (one
    * per order) plus one count for V; the count tables stay
    * distributed.
    */
  def train(docs: DataFrame, textCol: String, idCol: String,
      k: Double = 0.1): Model = {
    require(k > 0, "add-k smoothing needs k > 0")
    val bi = docBigrams(docs, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val prefix = bi.groupBy("w1").agg(sum("c12").as("c1"))
    val v = docs
      .select(explode(Analyzer.standard(col(textCol))).as("w"))
      .distinct().count()
    Model(prefix, bi, v, k)
  }

  /** Per-document perplexity under the model: (idCol, num_bigrams,
    * avg_logp, perplexity). Documents with fewer than two tokens have
    * no bigram evidence and are ABSENT from the result (callers decide
    * their fate; [[perplexityFilter]] keeps them).
    */
  def perplexity(docs: DataFrame, textCol: String, idCol: String,
      model: Model, broadcastModel: Boolean = false): DataFrame = {
    val bi = if (broadcastModel) broadcast(model.bigrams) else model.bigrams
    val pre = if (broadcastModel) broadcast(model.prefix) else model.prefix
    val denom = coalesce(col("c1"), lit(0L)).cast("double") +
      lit(model.k * (model.vocabSize + 1))
    val p = (coalesce(col("c12"), lit(0L)).cast("double") + lit(model.k)) /
      denom
    docBigrams(docs, textCol, idCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(pre, Seq("w1"), "left")
      .select(col("_doc"), log(p).as("_lp"))
      .groupBy("_doc")
      .agg(count(lit(1)).as("num_bigrams"), avg("_lp").as("avg_logp"))
      .select(col("_doc").as(idCol), col("num_bigrams"),
        col("avg_logp"), exp(-col("avg_logp")).as("perplexity"))
  }

  /** Keep documents whose perplexity is at most `maxPpl`; documents
    * too short to score (no bigrams) are kept — no evidence is not
    * evidence of noise. One anti-join on the over-threshold id set.
    */
  def perplexityFilter(docs: DataFrame, textCol: String, idCol: String,
      model: Model, maxPpl: Double,
      broadcastModel: Boolean = false): DataFrame =
    docs.join(
      perplexity(docs, textCol, idCol, model, broadcastModel)
        .filter(col("perplexity") > maxPpl).select(idCol),
      Seq(idCol), "left_anti")
}
