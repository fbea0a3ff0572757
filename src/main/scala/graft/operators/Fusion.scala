package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hybrid-search rank fusion (reference hybrid_search + rankers:
  * RRFRanker / WeightedRanker —
  * milvus_client/search_permanently.py:195-223,
  * go_bench/search_horizon_perf_3.go:497-540, go_bench/config.yaml:25-45).
  *
  * Inputs are the per-request result DataFrames produced by [[Knn]]
  * (columns qid, id..., score, rank). Fusion is plain aggregation:
  * results are tiny (nq * k rows per request), so these ops never touch
  * the base collection again — at scale the cost is the searches, not
  * the fusion.
  */
object Fusion {

  /** Reciprocal Rank Fusion: score(id) = sum_i 1 / (k + rank_i(id)).
    * Default k=60 matches RRFRanker's default; the reference sweeps
    * k in {60, 70, 80} (go_bench/config.yaml:41-44).
    */
  def rrf(
      results: Seq[DataFrame],
      idCols: Seq[String],
      k: Int = 60,
      limit: Int = 10,
      offset: Int = 0,
      qidCol: String = "qid"): DataFrame = {
    require(results.nonEmpty)
    val key = qidCol +: idCols
    val contribs = results.map { df =>
      df.select(key.map(col) :+
        (lit(1.0) / (lit(k.toDouble) + col("rank"))).as("_contrib"): _*)
    }
    val unioned = contribs.reduce(_.unionByName(_))
    fuseTop(unioned.groupBy(key.map(col): _*)
      .agg(sum("_contrib").as("fused_score")),
      idCols, limit, offset, qidCol)
  }

  /** Weighted score fusion: score(id) = sum_i w_i * normalized_score_i.
    * Scores are min-max normalized per (query, request) so metrics with
    * different ranges fuse sanely — mirrors Milvus WeightedRanker's
    * per-request normalization.
    */
  def weighted(
      results: Seq[DataFrame],
      weights: Seq[Double],
      idCols: Seq[String],
      limit: Int = 10,
      offset: Int = 0,
      similarityLike: Seq[Boolean] = Seq.empty,
      qidCol: String = "qid"): DataFrame = {
    require(results.length == weights.length)
    val simFlags =
      if (similarityLike.isEmpty) Seq.fill(results.length)(true) else similarityLike
    val key = qidCol +: idCols
    val contribs = results.zip(weights).zip(simFlags).map {
      case ((df, w), isSim) =>
        val perQ = Window.partitionBy(qidCol)
        val mn = min("score").over(perQ)
        val mx = max("score").over(perQ)
        val span = mx - mn
        val norm0 = when(span === 0.0, lit(1.0))
          .otherwise((col("score") - mn) / span)
        val norm = if (isSim) norm0 else lit(1.0) - norm0
        df.select(key.map(col) :+ (norm * w).as("_contrib"): _*)
    }
    val unioned = contribs.reduce(_.unionByName(_))
    fuseTop(unioned.groupBy(key.map(col): _*)
      .agg(sum("_contrib").as("fused_score")),
      idCols, limit, offset, qidCol)
  }

  private def fuseTop(
      fused: DataFrame,
      idCols: Seq[String],
      limit: Int,
      offset: Int,
      qidCol: String): DataFrame = {
    val ord: Seq[Column] =
      col("fused_score").desc +: idCols.map(col(_).asc)
    val w = Window.partitionBy(qidCol).orderBy(ord: _*)
    fused
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") > offset && col("fused_rank") <= offset + limit)
      .withColumn("fused_rank", col("fused_rank") - offset)
  }
}
