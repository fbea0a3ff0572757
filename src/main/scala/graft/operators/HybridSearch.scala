package graft.operators

import graft.expr.MilvusExpr
import graft.store.{Catalog, Collection}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hybrid-search orchestration (reference V6): N AnnSearchRequests +
  * a ranker + global offset/limit in one call
  * (search_permanently.py:195-223, go_bench/search_horizon_perf_3.go:
  * 497-540, issue_45203.py:89-117). Each sub-request may target a
  * different vector field, metric, filter, and per-index params; fusion
  * reuses [[Fusion]] and operates only on nq × k rows.
  */
object HybridSearch {

  /** One ANN sub-request — the dict shape of the reference
    * (`data/anns_field/param/limit/filter`). `params` carries per-index
    * search params (V4: HNSW ef, IVF nprobe, DISKANN search_list, ...);
    * the exact engine records them and honors `nprobe` when an IVF
    * model is supplied, others don't change exact results.
    */
  final case class AnnSearchRequest(
      queries: DataFrame, // (qid, qvec)
      annsField: String,
      metricType: String = "COSINE",
      limit: Int = 10,
      filter: Option[String] = None,
      params: Map[String, String] = Map.empty)

  sealed trait Ranker
  final case class RrfRanker(k: Int = 60) extends Ranker
  final case class WeightedRanker(weights: Seq[Double]) extends Ranker

  /** Function-score rankers (feature-inventory §6 rerank surface): the
    * legs supply the CANDIDATE POOL (distinct union of every leg's
    * nq × k hits) and the ranker function supplies the unified score —
    * leg scores never mix, so heterogeneous metrics need no
    * normalization. [[DecayRanker]] scores by a decay curve over a
    * stored numeric field; [[ModelRanker]] scores by the deterministic
    * (query text, doc text) relevance model. Both delegate to
    * [[Rerank]]; the only collection-sized work is one field-fetch
    * join of the broadcast pool against the store.
    */
  final case class DecayRanker(fieldName: String, function: String,
      origin: Double, scale: Double, offsetParam: Double = 0.0,
      decay: Double = 0.5) extends Ranker
  final case class ModelRanker(textField: String, queryText: String,
      dim: Int = 8, provider: String = "deterministic") extends Ranker

  /** Distinct (qid, id) candidate pool of all legs, with the ranker's
    * input column fetched from the base relation by one broadcast-pool
    * equi-join (the pool is nq × k × legs rows — always the small side).
    */
  private def candidatePool(results: Seq[DataFrame], idCol: String,
      base: DataFrame, fieldName: String): DataFrame = {
    val pool = results.map(_.select(col("qid"), col(idCol)))
      .reduce(_.unionByName(_)).distinct()
    broadcast(pool).join(
      base.select(col(idCol), col(fieldName)), Seq(idCol))
  }

  /** Shared function-score fusion: pool -> Rerank -> fused_* columns
    * (the hybrid output contract).
    */
  private def functionScoreFuse(ranker: Ranker, results: Seq[DataFrame],
      idCol: String, base: DataFrame, limit: Int, offset: Int): DataFrame = {
    val reranked = ranker match {
      case DecayRanker(field, fn, origin, scale, off, dec) =>
        Rerank.decay(candidatePool(results, idCol, base, field),
          field, fn, origin, scale, idCols = Seq(idCol),
          offsetParam = off, decayParam = dec, limit = limit,
          offset = offset)
      case ModelRanker(textField, q, dim, provider) =>
        Rerank.model(candidatePool(results, idCol, base, textField),
          textField, q, idCols = Seq(idCol), dim = dim,
          provider = provider, limit = limit, offset = offset)
      case other =>
        throw new IllegalArgumentException(s"not a function-score ranker: $other")
    }
    // Match the Fusion output contract: (qid, id, fused_score, fused_rank)
    reranked.select(col("qid"), col(idCol),
      col("rerank_score").cast("double").as("fused_score"),
      col("rerank_rank").as("fused_rank"))
  }

  private def similarityLike(metric: String): Boolean =
    metric.toUpperCase match {
      case "IP" | "COSINE" | "BM25" => true
      case _ => false
    }

  /** Run the sub-searches and fuse. `consistencyLevel` is accepted for
    * API fidelity (Q7) — Spark batch reads are strongly consistent, so
    * it is a no-op.
    */
  def hybridSearch(
      data: DataFrame,
      requests: Seq[AnnSearchRequest],
      ranker: Ranker,
      idCol: String,
      limit: Int = 10,
      offset: Int = 0,
      outputCols: Seq[String] = Seq.empty,
      consistencyLevel: String = "Strong"): DataFrame = {
    require(requests.nonEmpty, "hybrid search needs at least one request")
    val results = requests.map { r =>
      val pred = r.filter.map(f => MilvusExpr.compile(f, data))
      Knn.search(data, r.queries, r.annsField, idCol, r.metricType,
        r.limit, filter = pred)
    }
    val fused = ranker match {
      case RrfRanker(k) =>
        Fusion.rrf(results, Seq(idCol), k = k, limit = limit, offset = offset)
      case WeightedRanker(ws) =>
        Fusion.weighted(results, ws, Seq(idCol), limit = limit, offset = offset,
          similarityLike = requests.map(r => similarityLike(r.metricType)))
      case fs @ (_: DecayRanker | _: ModelRanker) =>
        functionScoreFuse(fs, results, idCol, data, limit, offset)
    }
    if (outputCols.isEmpty) fused
    else fused.join(data.select((idCol +: outputCols).distinct.map(col): _*), idCol)
  }

  /** A hybrid sub-request against a STORE collection — queries arrive
    * driver-side (the client shape) so each leg can route through the
    * declared index of its anns_field.
    */
  sealed trait CollectionRequest {
    def annsField: String
    def limit: Int
    def filter: Option[String]
    def params: Map[String, String]
  }

  /** Dense leg (FLOAT_VECTOR anns_field). */
  final case class CollectionAnnRequest(
      queryVecs: Seq[(String, Seq[Float])], // (qid, vector)
      annsField: String,
      limit: Int = 10,
      filter: Option[String] = None,
      params: Map[String, String] = Map.empty) extends CollectionRequest

  /** Sparse leg (SPARSE_FLOAT_VECTOR anns_field) — the reference mixes
    * sparse (BM25/IP) and dense requests in one hybrid_search
    * (issue_45203.py:30-76 declares SPARSE_INVERTED_INDEX fields next
    * to AUTOINDEX dense fields on the hybrid collection). Served by
    * the batched sparse route (persisted posting buckets).
    */
  final case class CollectionSparseRequest(
      queries: Seq[(String, Map[Int, Double])], // (qid, sparse vector)
      annsField: String,
      limit: Int = 10,
      filter: Option[String] = None,
      params: Map[String, String] = Map.empty) extends CollectionRequest

  /** Collection-aware hybrid search: every leg runs through
    * [[CollectionSearch.searchBatch]], so a declared IVF / IVF_SQ8 /
    * IVF_RABITQ / LSH index on the leg's anns_field serves it from the
    * PERSISTED build (probe filters prune partition directories) — the
    * reference's hybrid workload runs its ANN legs against indexed
    * fields (go_bench/config.yaml:25-45); the raw-DataFrame
    * [[hybridSearch]] remains the exact-scan shape. Legs without an
    * index/probe budget fall back to the exact batched scan inside the
    * same routing. Fusion operates on nq × k rows per leg; the leg
    * rank needed by RRF is recomputed per qid from (score, pk) — a
    * window over the tiny result, never the base scan.
    */
  def hybridSearchCollection(
      spark: SparkSession,
      coll: Collection,
      requests: Seq[CollectionRequest],
      ranker: Ranker,
      limit: Int = 10,
      offset: Int = 0,
      outputCols: Seq[String] = Seq.empty,
      partitionNames: Seq[String] = Seq.empty): DataFrame = {
    require(requests.nonEmpty, "hybrid search needs at least one request")
    val pk = coll.definition.primaryField.name
    def ranked(hits: DataFrame, simLike: Boolean): DataFrame = {
      val primary = if (simLike) col("score").desc else col("score").asc
      val w = Window.partitionBy("qid").orderBy(primary, col(pk).asc)
      hits.withColumn("rank", row_number().over(w))
    }
    val legs = requests.map {
      case r: CollectionAnnRequest =>
        val metric = r.params.get("metric_type")
          .orElse(coll.definition.indexes.find(_.field == r.annsField)
            .flatMap(_.metricType))
          .getOrElse("COSINE")
        val simLike = similarityLike(metric)
        val hits = CollectionSearch.searchBatch(spark, coll, r.annsField,
          r.queryVecs, r.limit, r.filter.getOrElse(""), r.params,
          partitionNames = partitionNames)
        (ranked(hits, simLike), simLike)
      case r: CollectionSparseRequest =>
        // Sparse IP (and its BM25 impact encoding) is similarity-like.
        // Persisted sparse postings carry `_part` like the dense
        // family, so a partition-scoped sparse leg serves FROM the
        // index (the restriction applies BEFORE the per-qid top-k,
        // never by trimming an already-limited result).
        val hits = CollectionSearch.searchSparseBatch(spark, coll,
          r.annsField, r.queries, r.limit, r.filter.getOrElse(""),
          r.params, partitionNames = partitionNames)
          .select(col("qid"), col(pk), col("score"))
        (ranked(hits, simLike = true), true)
    }
    val fused = ranker match {
      case RrfRanker(k) =>
        Fusion.rrf(legs.map(_._1), Seq(pk), k = k, limit = limit,
          offset = offset)
      case WeightedRanker(ws) =>
        Fusion.weighted(legs.map(_._1), ws, Seq(pk), limit = limit,
          offset = offset, similarityLike = legs.map(_._2))
      case fs @ (_: DecayRanker | _: ModelRanker) =>
        functionScoreFuse(fs, legs.map(_._1), pk, coll.read(spark),
          limit, offset)
    }
    if (outputCols.isEmpty) fused
    else fused.join(
      coll.read(spark).select((pk +: outputCols).distinct.map(col): _*), pk)
  }

  /** Multi-query (V9, tpuffer hybrid_search.go:415-443 `MultiQuery`):
    * run heterogeneous queries (vector + BM25) and return results
    * side-by-side tagged with `qtype`.
    */
  def multiQuery(
      vectorResult: DataFrame,
      textResult: DataFrame,
      idCol: String): DataFrame = {
    val v = vectorResult.select(col(idCol), col("score"), lit("vector").as("qtype"))
    val t = textResult.select(col(idCol), col("score"), lit("bm25").as("qtype"))
    v.unionByName(t)
  }

  /** Search every collection in a catalog (V10,
    * search_all_collections.py:43-121): run `one` per collection, union
    * with the collection name tagged.
    */
  def searchAllCollections(
      spark: SparkSession,
      catalog: Catalog,
      one: (String, DataFrame) => DataFrame): DataFrame = {
    val results = catalog.listCollections().map { name =>
      one(name, catalog.collection(name).read(spark))
        .withColumn("collection", lit(name))
    }
    require(results.nonEmpty, "catalog has no collections")
    results.reduce(_.unionByName(_))
  }

  /** Result-shape assertions (V11, workload.py:155-161,
    * search_horizon_perf_3.go:530-537): exactly nq result groups, each
    * non-empty, warn-level completeness `hits >= topk * ratio`.
    * Returns the offending qids (empty = all good).
    */
  def checkResultShape(result: DataFrame, qidCol: String, nq: Int,
      topk: Int, resultRatio: Double = 1.0): Seq[(Long, Long)] = {
    val counts = result.groupBy(qidCol).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bad = counts.filter(_._2 < (topk * resultRatio).toLong)
    if (counts.length != nq)
      throw new AssertionError(s"expected $nq result groups, got ${counts.length}")
    bad.toSeq
  }
}
