package graft.pipeline

import graft.operators.Knn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Training-pair mining for embedding models — the data-prep stage of
  * contrastive retrieval training (DPR/ANCE-style): for every training
  * query, the strongest corpus candidates that are NOT known positives
  * are the "hard negatives" the loss needs.
  */
object Mining {

  /** Per query: the top-`k` most similar corpus rows excluding the
    * query row itself and its known positives.
    *
    * Exactness at the boundary: the ANN pass overfetches by the MAX
    * positives-per-query (one scalar aggregate — the only driver-side
    * value) plus one for the self row, so after the anti-join every
    * query still has ≥ k true candidates; the re-rank then restores a
    * dense 1..k `rank` under the same (score, id) order the search
    * used. Skipping the overfetch and filtering a plain top-k would
    * silently under-fill queries whose positives rank high — exactly
    * the queries hard-negative mining cares about most.
    *
    * Scale shape: one batched [[Knn]] pass (queries broadcast against
    * the corpus scan, per-partition top-k below the shuffle), one
    * left-anti equi-join on (qid, id) against the positives relation,
    * and a rank window over nq × (k + overfetch) rows. The corpus is
    * read once; nothing else touches it.
    *
    * @param positives   (qidCol, idCol) known positive pairs; may be
    *                    empty (then this is plain self-excluding top-k)
    * @param excludeSelf drop the hit whose id equals the qid — set
    *                    only when queries are drawn from the corpus
    *                    and share its id space (the usual mining
    *                    setup); false when qids are a foreign key
    *                    space (e.g. string query ids)
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      positives: DataFrame,
      vecCol: String,
      idCol: String,
      metric: String = "COSINE",
      k: Int = 10,
      excludeSelf: Boolean = true,
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val maxPos = positives.groupBy(qidCol)
      .agg(count(lit(1)).as("_n"))
      .agg(max("_n")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val fetch = k + maxPos.toInt + (if (excludeSelf) 1 else 0)
    val hits = Knn.search(corpus, queries, vecCol, idCol, metric, fetch,
      qidCol = qidCol, qvecCol = qvecCol)
    val posKeys = positives.select(col(qidCol), col(idCol))
    val negatives = (if (excludeSelf)
        hits.filter(col(qidCol) =!= col(idCol))
      else hits)
      .join(posKeys, Seq(qidCol, idCol), "left_anti")
    // The rank direction comes from the SAME metric registry the
    // retrieval used — a locally re-derived mapping would silently
    // invert the ranking (worst candidates as "hard" negatives) the
    // day a new distance-like metric lands in metricFor.
    val (_, simLike) = graft.Functions.metricFor(metric,
      corpus.schema(vecCol).dataType, col(vecCol), col(vecCol))
    val primary = if (simLike) col("score").desc else col("score").asc
    val w = Window.partitionBy(qidCol).orderBy(primary, col(idCol).asc)
    negatives
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rank"))
  }
}
