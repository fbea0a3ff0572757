package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Function-score reranking of search results — the engine-meaningful
  * slice of the reference's "Function / Model Provider" rerank surface
  * (docs/plans/2026-07-07-milvus-3-feature-inventory.md §6:
  * `rerank_provider_smoke`; the credentialed remote providers — Qwen
  * rerank etc. — are a deployment concern and rejected up front, the
  * same split as TEXT_EMBEDDING's deterministic provider, SURVEY
  * §2.11).
  *
  * Two ranker families, both over ALREADY-RETRIEVED candidates (the
  * nq × k output of [[Knn]]/[[CollectionSearch]]):
  *
  *  - [[decay]]: score from a numeric field's distance to an origin
  *    (recency/geo boosting). Standard function-score decay curves
  *    (gauss | exp | linear) with the (origin, scale, offset, decay)
  *    parameterization; by default the decay REPLACES the vector
  *    similarity — the search supplies candidates, the field supplies
  *    the order — with an opt-in multiply mode that combines them.
  *  - [[model]]: score from the (query text, document text) pair via
  *    the deterministic text encoder
  *    ([[graft.functions.TextEmbedding]]) — the in-engine stand-in
  *    for a remote cross-encoder. Scores are integer dot products of
  *    signed-count embeddings, so results are exactly reproducible by
  *    a SQL oracle.
  *
  * Scale shape: rerankers touch nq × k rows (the search result), never
  * the collection — all cost is in the candidate retrieval. The only
  * shuffle is the per-qid rank window over k rows per query.
  */
object Rerank {

  /** Decay curve value in [0, 1] for numeric `field`:
    * d = max(0, |field - origin| - offset), then
    *  - gauss:  exp(-d² / 2σ²)          with σ² = -scale² / (2·ln decay)
    *  - exp:    exp(d · ln(decay)/scale)
    *  - linear: max(0, (s - d)/s)        with s = scale / (1 - decay)
    * so the value is exactly `decay` at distance `scale` past the
    * offset plateau, 1 inside it. All curve constants fold on the
    * driver; the per-row work is one abs/mult (+ one exp for the
    * smooth curves) inside codegen.
    */
  private[graft] def decayValue(field: Column, function: String,
      origin: Double, scale: Double, offset: Double,
      decay: Double): Column = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(decay > 0 && decay < 1, s"decay must be in (0,1), got $decay")
    require(offset >= 0, s"offset must be non-negative, got $offset")
    val d = greatest(lit(0.0), abs(field.cast("double") - origin) - offset)
    function.toLowerCase match {
      case "gauss" =>
        // σ² = -scale²/(2 ln decay) > 0 since ln(decay) < 0
        val twoSigma2 = -(scale * scale) / math.log(decay)
        exp(-(d * d) / lit(twoSigma2))
      case "exp" =>
        exp(d * lit(math.log(decay) / scale))
      case "linear" =>
        val s = scale / (1.0 - decay)
        greatest(lit(0.0), (lit(s) - d) / lit(s))
      case other =>
        throw new IllegalArgumentException(
          s"unknown decay function '$other' (gauss | exp | linear)")
    }
  }

  /** Rerank `results` (columns: qidCol, idCols..., `fieldCol`, score)
    * by the decay curve over `fieldCol`. `multiply = false` (default)
    * replaces the retrieval score with the decay value — the search
    * defines WHICH k candidates compete, the field defines their
    * order; `multiply = true` scores `score * decayValue` (requires a
    * similarity-like retrieval score, where larger = better).
    * Output: qidCol, idCols..., rerank_score, rerank_rank (1-based
    * after `offset` removal; ties break on idCols ascending).
    */
  def decay(
      results: DataFrame,
      fieldCol: String,
      function: String,
      origin: Double,
      scale: Double,
      idCols: Seq[String],
      offsetParam: Double = 0.0,
      decayParam: Double = 0.5,
      multiply: Boolean = false,
      limit: Int = 10,
      offset: Int = 0,
      qidCol: String = "qid"): DataFrame = {
    val dv = decayValue(col(fieldCol), function, origin, scale,
      offsetParam, decayParam)
    val score = if (multiply) col("score") * dv else dv
    rankTop(results.withColumn("rerank_score", score),
      idCols, limit, offset, qidCol)
  }

  /** Rerank by the deterministic (query text, doc text) relevance
    * model: rerank_score = <encode(query), encode(textCol)>, an
    * integer-valued dot product of signed-token-count embeddings
    * (LongType — exact on every engine). Only the `deterministic`
    * provider runs in-engine; remote rerank providers need external
    * credentials and are rejected, mirroring
    * [[graft.store.Collection.addFunction]]'s TEXT_EMBEDDING contract.
    */
  def model(
      results: DataFrame,
      textCol: String,
      queryText: String,
      idCols: Seq[String],
      dim: Int = 8,
      provider: String = "deterministic",
      limit: Int = 10,
      offset: Int = 0,
      qidCol: String = "qid"): DataFrame = {
    require(provider == "deterministic",
      s"rerank provider '$provider' needs external credentials; " +
        "only 'deterministic' runs in-engine")
    require(dim > 0, s"dim must be positive, got $dim")
    val qemb = graft.functions.TextEmbedding.encodeLocal(queryText, dim)
    val demb = graft.functions.TextEmbedding.encode(col(textCol), dim)
    // Dot against the driver-constant query embedding: the zip runs
    // over dim elements per candidate row (nq × k rows total) — the
    // collection itself is never touched, so interpreted HOF cost is
    // bounded by the result size, not the corpus.
    val dot = aggregate(
      zip_with(demb, lit(qemb.toArray), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x).cast(LongType)
    rankTop(results.withColumn("rerank_score", dot),
      idCols, limit, offset, qidCol)
  }

  private def rankTop(scored: DataFrame, idCols: Seq[String],
      limit: Int, offset: Int, qidCol: String): DataFrame = {
    val ord: Seq[Column] =
      col("rerank_score").desc +: idCols.map(col(_).asc)
    // Single-query results (CollectionSearch's non-batch route) carry
    // no qid column: rank globally — the window spans the k candidate
    // rows of one query, never the collection.
    val hasQid = scored.columns.contains(qidCol)
    val w =
      if (hasQid) Window.partitionBy(qidCol).orderBy(ord: _*)
      else Window.orderBy(ord: _*)
    val keyCols = (if (hasQid) Seq(qidCol) else Seq.empty) ++ idCols
    scored
      .withColumn("rerank_rank", row_number().over(w))
      .filter(col("rerank_rank") > offset &&
        col("rerank_rank") <= offset + limit)
      .withColumn("rerank_rank", col("rerank_rank") - offset)
      .select(keyCols.map(col) :+
        col("rerank_score") :+ col("rerank_rank"): _*)
  }
}
