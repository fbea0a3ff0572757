package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF vectorization and ranked retrieval over the corpus — the
  * classic counterpart to [[Bm25]], and the bridge from raw text to
  * the engine's sparse-vector search path.
  *
  * Weighting is the standard smoothed form (sklearn's documented
  * default, public): w = tf · (ln((1+N)/(1+df)) + 1), documents
  * L2-normalized. [[search]] scores cosine(query, doc) through a
  * postings join: only documents sharing a query token are touched,
  * the query-weight table broadcasts, and every aggregation is keyed
  * by token or document id — the same data-proportional shape as the
  * BM25 and sparse-inverted paths, so it holds at 100 TB.
  */
object TfIdf {

  private def idf(dfCol: org.apache.spark.sql.Column, n: Long) =
    log((lit(1.0) + n) / (lit(1.0) + dfCol)) + 1.0

  /** Tokenization mirroring [[Analyzer.standard]] for driver-side
    * query strings.
    */
  def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Per-document L2-normalized TF-IDF vectors as `map<token,weight>`
    * (token-keyed: interpretable, joinable, and directly explodable
    * into the sparse-postings layout).
    */
  def vectors(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val n = docs.count()
    val toks = docs.select(col(idCol),
        explode(Analyzer.standard(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val w = toks.join(dfreq, "token")
      .withColumn("w", col("tf") * idf(col("df"), n))
    val norms = w.groupBy(idCol).agg(sqrt(sum(col("w") * col("w"))).as("_norm"))
    w.join(norms, idCol)
      .groupBy(idCol)
      .agg(map_from_entries(collect_list(
        struct(col("token"), col("w") / col("_norm")))).as("tfidf"))
  }

  /** Top-k documents by TF-IDF cosine for a query string. The score
    * column is rounded to 6 decimals and ties break by ascending id,
    * so the cut is deterministic engine-to-engine.
    */
  def search(docs: DataFrame, textCol: String, idCol: String,
      query: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    val toks = docs.select(col(idCol),
        explode(Analyzer.standard(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val w = toks.join(dfreq, "token")
      .withColumn("w", col("tf") * idf(col("df"), n))
    val norms = w.groupBy(idCol).agg(sqrt(sum(col("w") * col("w"))).as("_norm"))

    // Query-side weights: a handful of rows — compute the weight table
    // driver-side from the (tiny) df lookups of the query tokens only.
    val qtf = tokenize(query).groupBy(identity).map { case (t, o) => (t, o.size.toLong) }.toSeq
    val qdf = qtf.map(_._1).toDF("token")
      .join(dfreq, Seq("token"), "left")
      .select(col("token"), coalesce(col("df"), lit(0L)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val qw = qtf.map { case (t, tf) =>
      (t, tf * (math.log((1.0 + n) / (1.0 + qdf(t))) + 1.0))
    }
    val qnorm = math.sqrt(qw.map(x => x._2 * x._2).sum)
    val qTable = broadcast(qw.toDF("token", "qw"))

    w.join(qTable, "token")
      .groupBy(idCol).agg(sum(col("w") * col("qw")).as("_dot"))
      .join(norms, idCol)
      .select(col(idCol),
        round(col("_dot") / col("_norm") / qnorm, 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
