package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import scala.jdk.CollectionConverters._

/** Sparse-vector inverted index (reference index types
  * SPARSE_INVERTED_INDEX / SPARSE_WAND,
  * milvus_client/common/workload.py:150-151,
  * manifests/schema_matrix_2_6.yaml sparse fields): the
  * `map<int,double>` vector column explodes into dimension postings
  * `(dim, id, value)` bucketed by dimension hash, and a query scores
  * ONLY the postings of ITS dimensions — the sparse analog of the BM25
  * term-postings join.
  *
  * Scoring is EXACT inner product over every document sharing at least
  * one query dimension (a document sharing none has IP 0 and, like the
  * reference engine, is never returned). Physical pruning:
  * `partitionBy(_db)` postings mean a query reads only its dimensions'
  * directories — at 100 TB a 10-nnz query touches ~10/numBuckets of
  * the index regardless of corpus size.
  *
  * [[searchWand]] adds the SPARSE_WAND distinction (workload.py:151):
  * a distributed adaptation of max-score/WAND pruning (Broder et al.,
  * CIKM'03; Turtle & Flood's max-score) that is still EXACT. Classic
  * WAND skips posting ranges during a serial document-at-a-time scan;
  * the data-parallel equivalent implemented here prunes at the
  * aggregation level: candidates come only from the ESSENTIAL
  * high-impact dimensions, and the low-impact dimensions' postings are
  * aggregated only for those candidates — shrinking the shuffle from
  * every-overlapping-document (millions for a stopword-like common
  * dimension) to the provably-sufficient candidate set.
  */
object SparseInverted {

  val DIM = "_dim"
  val VAL = "_val"
  val BUCKET = "_db"

  /** Dimension postings for a sparse map column. Persist
    * `partitionBy(_db)` (repartition first: one file per bucket).
    */
  def postings(df: DataFrame, vecCol: String, idCol: String,
      numBuckets: Int = 64, carry: Seq[String] = Seq.empty): DataFrame =
    df.select((col(idCol) +: carry.map(col)) :+
        explode(col(vecCol)).as(Seq("key", "value")): _*)
      .select((col(idCol) +: carry.map(col)) :+ col("key").as(DIM) :+
        col("value").as(VAL): _*)
      .withColumn(BUCKET, pmod(hash(col(DIM)), lit(numBuckets)))

  /** Bucket ids of the query's dimensions, evaluated through the same
    * `hash()` expression the writer used (LocalTableScan, no job).
    */
  def queryBuckets(df: DataFrame, dims: Seq[Int],
      numBuckets: Int): Seq[Int] = {
    val spark = df.sparkSession
    import spark.implicits._
    dims.toDF("d")
      .select(pmod(hash(col("d")), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** Exact top-k sparse IP via the postings join: bucket filter
    * (directory pruning on a persisted index) → dim filter (row
    * groups) → broadcast join with the query's (dim, weight) pairs →
    * per-doc sum.
    */
  /** Per-dimension value bounds of the postings — the WAND impact
    * statistics. Tiny (one row per distinct dimension); persist next
    * to the postings at build time.
    */
  def dimStats(postingsDf: DataFrame): DataFrame =
    postingsDf.groupBy(col(DIM))
      .agg(max(col(VAL)).as("_max"), min(col(VAL)).as("_min"))

  /** The persisted per-dim stats collected driver-side: `dim -> (max,
    * min)`. One row per distinct dimension — WAND impact metadata is
    * index metadata, held in memory for the life of the index exactly
    * like IVF centroids (a few MB even for a million-dim vocabulary);
    * re-reading it per query would cost a scan job per search.
    */
  def collectDimStats(statsDf: DataFrame): Map[Int, (Double, Double)] =
    statsDf.collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  /** Result of [[searchWand]] with its pruning diagnostics: `pruned`
    * is false when the guard conditions forced the exact fallback
    * (negative weights/values, fewer than k essential candidates, or
    * an upper bound too weak to exclude anything).
    */
  final case class WandResult(df: DataFrame, pruned: Boolean,
      essentialDims: Seq[Int])

  /** Driver-side pruning plan for one query: the essential dims and
    * the upper-bound mass of the rest. None → a guard tripped (the
    * WAND precondition or a structurally unprunable query) and the
    * caller must use the exact path.
    */
  private final case class WandPlan(essential: Seq[Int], ubRest: Double)

  private def planWand(query: Map[Int, Double],
      stats: Map[Int, (Double, Double)],
      restRatio: Double): Option[WandPlan] = {
    if (query.valuesIterator.exists(_ < 0)) return None
    val dims = query.keys.toSeq.sorted
    val present = dims.filter(stats.contains)
    if (present.exists(d => stats(d)._2 < 0)) return None
    // Dims with no postings contribute nothing to any document.
    val ubs = present.map(d => d -> query(d) * stats(d)._1).sortBy(-_._2)
    if (ubs.isEmpty) return None
    val ubTotal = ubs.map(_._2).sum
    // Smallest essential prefix with UB_rest <= restRatio * total.
    var acc = 0.0
    val cut = ubs.indexWhere { case (_, ub) =>
      acc += ub; ubTotal - acc <= restRatio * ubTotal
    } + 1
    val essential = ubs.take(cut).map(_._1)
    val ubRest = ubTotal - ubs.take(cut).map(_._2).sum
    // No rest dims: the "partial" IS the full score — the two-phase
    // machinery would just replay the plain search.
    if (essential.size == dims.size && ubRest == 0.0) None
    else Some(WandPlan(essential, ubRest))
  }

  /** EXACT top-k sparse IP with max-score/WAND-style pruning.
    *
    * Let `ub_i = q_i * max_i` bound dimension `i`'s contribution to
    * any document's score (requires non-negative weights and values —
    * the standard WAND precondition; violated → exact fallback). Query
    * dims sort by `ub` descending; the ESSENTIAL prefix `E` is the
    * smallest whose remaining upper-bound mass `UB_rest` is at most
    * `restRatio` of the total.
    *
    *   - Phase 1 aggregates partial scores `s_E(d)` over E's postings
    *     only, and takes `θ` = k-th largest partial (driver-side, k
    *     rows). Since full scores dominate partials, the true k-th
    *     best full score is ≥ θ.
    *   - Any document absent from E scores at most `UB_rest`; when
    *     `UB_rest < θ` it can never reach the top-k, so candidates are
    *     exactly the E-documents with `s_E ≥ θ - UB_rest`.
    *   - Phase 2 re-scores ONLY the candidates over ALL query
    *     dimensions' postings (exact sums), so the big low-impact
    *     postings are filtered by the candidate join (AQE broadcasts
    *     the small side) before the aggregation shuffle.
    *
    * Every guard failure falls back to [[search]] — the method never
    * trades exactness for speed.
    */
  def searchWand(postingsDf: DataFrame, stats: Map[Int, (Double, Double)],
      query: Map[Int, Double], idCol: String, k: Int, numBuckets: Int,
      filter: Option[Column] = None,
      restRatio: Double = 0.3): WandResult = {
    require(query.nonEmpty, "sparse query must have at least one dimension")
    def fallback = WandResult(
      search(postingsDf, query, idCol, k, numBuckets, filter),
      pruned = false, Seq.empty)
    val plan = planWand(query, stats, restRatio) match {
      case None => return fallback
      case Some(p) => p
    }
    val dims = query.keys.toSeq.sorted
    val essential = plan.essential
    val ubRest = plan.ubRest
    val spark = postingsDf.sparkSession
    import spark.implicits._
    // Phase 1: partial scores over essential postings only.
    val eBuckets = queryBuckets(postingsDf, essential, numBuckets)
    val eq = query.filter { case (d, _) => essential.contains(d) }
      .toSeq.sortBy(_._1).toDF("_qdim", "_qval")
    val ePruned0 = postingsDf
      .filter(col(BUCKET).isin(eBuckets: _*) &&
        col(DIM).isin(essential: _*))
    val ePruned = filter.foldLeft(ePruned0)(_ filter _)
    val partial = ePruned
      .join(broadcast(eq), col(DIM) === col("_qdim"))
      .groupBy(col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("_se"))
    // ONE collect serves both θ (the k-th partial) and, almost always,
    // the candidate set: any candidate has s_E ≥ θ - UB_rest, so when
    // the M-th collected partial already sits below that bound, every
    // candidate is inside the collected M and phase 2 can broadcast a
    // driver-side id list instead of re-evaluating the partial
    // aggregate. M = 8k+64 bounds driver memory; more than M
    // candidates (a bound too weak to prune much anyway) → exact
    // fallback.
    val m = math.max(8 * k, k + 64)
    val topPartial = partial
      .orderBy(col("_se").desc, col(idCol).asc).limit(m).collect()
    // Fewer than k essential documents: rest-only docs could fill the
    // top-k — no valid θ, exact fallback.
    if (topPartial.length < k) return fallback
    val theta = topPartial(k - 1).getDouble(1)
    if (ubRest >= theta) return fallback
    // The bound is mathematical but the partial sums are float: keep a
    // relative epsilon of slack so a candidate sitting exactly on the
    // threshold can't be lost to summation-order wobble (the
    // d5_dedup_ngram fp-guard precedent) — extra candidates only cost
    // a few re-scored rows.
    val eps = 1e-9 * (math.abs(theta) + ubRest + 1.0)
    val cutoff = theta - ubRest - eps
    if (topPartial.length == m && topPartial.last.getDouble(1) >= cutoff)
      return fallback // candidates may extend beyond the collected M
    val candIds = topPartial.takeWhile(_.getDouble(1) >= cutoff)
      .map(_.get(0))
    // Phase 2: exact scores for the provably-sufficient candidates —
    // the candidate list rides in as one broadcast local relation, so
    // the big low-impact postings are filtered map-side before the
    // aggregation shuffle.
    val cand = spark.createDataFrame(
      candIds.map(org.apache.spark.sql.Row(_)).toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_cand_id",
          postingsDf.schema(idCol).dataType, nullable = false))))
    val buckets = queryBuckets(postingsDf, dims, numBuckets)
    val qdf = query.toSeq.sortBy(_._1).toDF("_qdim", "_qval")
    val pruned0 = postingsDf
      .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
    val pruned = filter.foldLeft(pruned0)(_ filter _)
    val exact = pruned
      .join(broadcast(cand), col(idCol) === col("_cand_id"))
      .join(broadcast(qdf), col(DIM) === col("_qdim"))
      .groupBy(col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    WandResult(exact, pruned = true, essential)
  }

  /** Batched exact sparse top-k — the nq-batch client shape every
    * dense path already has ([[Ivf.search]], [[Sq8.search]]): ONE job
    * over the union of the queries' dimension buckets; each posting
    * row joins the broadcast (qid, dim, weight) triples of the queries
    * that contain its dimension, partial-aggregated per (qid, doc) and
    * window-limited per qid. Returns (qid, idCol, score).
    */
  /** Per-qid top-`limit` — delegates to the shared two-level salted
    * prune ([[graft.operators.Knn.limitPerQid]]) every routed index
    * path funnels through. Output keeps the final `_r` rank column.
    */
  private def limitPerQid(df: DataFrame, idCol: String, rankOf: String,
      limit: Int): DataFrame =
    graft.operators.Knn.limitPerQid(df, "qid",
      Seq(col(rankOf).desc, col(idCol).asc), limit, "_r")

  def searchBatch(postingsDf: DataFrame,
      queries: Seq[(String, Map[Int, Double])], idCol: String, k: Int,
      numBuckets: Int, filter: Option[Column] = None): DataFrame = {
    val spark = postingsDf.sparkSession
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "sparse batch needs non-empty queries")
    val dims = queries.flatMap(_._2.keys).distinct.sorted
    val buckets = queryBuckets(postingsDf, dims, numBuckets)
    val weights = queries.flatMap { case (qid, q) =>
      q.toSeq.sortBy(_._1).map { case (d, w) => (qid, d, w) }
    }.toDF("qid", "_qdim", "_qval")
    val pruned0 = postingsDf
      .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
    val pruned = filter.foldLeft(pruned0)(_ filter _)
    val scored = pruned
      .join(broadcast(weights), col(DIM) === col("_qdim"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("score"))
    limitPerQid(scored, idCol, "score", k)
      .select(col("qid"), col(idCol), col("score"))
  }

  /** Batched WAND: the max-score prune amortized over nq queries —
    * TWO jobs total (partials over the union of essential postings,
    * then candidate-restricted exact scores) instead of 2·nq, plus at
    * most one [[searchBatch]] job for the queries whose guards forced
    * the exact path. Exactness contract identical to [[searchWand]].
    */
  def searchWandBatch(postingsDf: DataFrame,
      stats: Map[Int, (Double, Double)],
      queries: Seq[(String, Map[Int, Double])], idCol: String, k: Int,
      numBuckets: Int, filter: Option[Column] = None,
      restRatio: Double = 0.3): DataFrame = {
    val spark = postingsDf.sparkSession
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "sparse batch needs non-empty queries")
    val queryMap = queries.toMap
    val planned = queries.map { case (qid, q) =>
      (qid, q, planWand(q, stats, restRatio))
    }
    var fallbackQs = planned.collect { case (qid, q, None) => (qid, q) }
    val prunable = planned.collect { case (qid, q, Some(p)) => (qid, q, p) }
    val prunedResults: Option[DataFrame] = if (prunable.isEmpty) None else {
      // Phase 1 (one job): per-(qid, doc) partials over the union of
      // essential postings, window-limited to M per qid, collected.
      val m = math.max(8 * k, k + 64)
      val eDims = prunable.flatMap(_._3.essential).distinct
      val eBuckets = queryBuckets(postingsDf, eDims, numBuckets)
      val eWeights = prunable.flatMap { case (qid, q, p) =>
        p.essential.sorted.map(d => (qid, d, q(d)))
      }.toDF("qid", "_qdim", "_qval")
      val ePruned0 = postingsDf
        .filter(col(BUCKET).isin(eBuckets: _*) && col(DIM).isin(eDims: _*))
      val ePruned = filter.foldLeft(ePruned0)(_ filter _)
      val partials = limitPerQid(ePruned
        .join(broadcast(eWeights), col(DIM) === col("_qdim"))
        .groupBy(col("qid"), col(idCol))
        .agg(sum(col(VAL) * col("_qval")).as("_se")), idCol, "_se", m)
        .collect()
        .groupBy(_.getString(0))
      // Driver: θ / cutoff / candidates per query (same guards as the
      // single-query path; failures join the fallback batch).
      val candPairs = prunable.flatMap { case (qid, _, p) =>
        // _r is the window rank — rows in window order, no re-sort.
        val rows = partials.getOrElse(qid, Array.empty).sortBy(_.getInt(3))
        lazy val theta = rows(k - 1).getDouble(2)
        lazy val eps = 1e-9 * (math.abs(theta) + p.ubRest + 1.0)
        lazy val cutoff = theta - p.ubRest - eps
        if (rows.length < k || p.ubRest >= theta ||
            (rows.length == m && rows.last.getDouble(2) >= cutoff)) {
          fallbackQs :+= ((qid, queryMap(qid)))
          Seq.empty
        } else rows.takeWhile(_.getDouble(2) >= cutoff)
          .map(r => (qid, r.get(1)))
      }
      if (candPairs.isEmpty) None else {
        // Phase 2 (one job): exact scores for the candidates only.
        val live = prunable.map(_._1).toSet -- fallbackQs.map(_._1).toSet
        val liveQs = queries.filter { case (qid, _) => live.contains(qid) }
        val dims = liveQs.flatMap(_._2.keys).distinct.sorted
        val buckets = queryBuckets(postingsDf, dims, numBuckets)
        val weights = liveQs.flatMap { case (qid, q) =>
          q.toSeq.sortBy(_._1).map { case (d, w) => (qid, d, w) }
        }.toDF("_wqid", "_qdim", "_qval")
        val cand = spark.createDataFrame(
          candPairs.map { case (qid, id) =>
            org.apache.spark.sql.Row(qid, id) }.asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("_cand_id",
              postingsDf.schema(idCol).dataType, nullable = false))))
        val pruned0 = postingsDf
          .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
        val pruned = filter.foldLeft(pruned0)(_ filter _)
        Some(limitPerQid(pruned
          .join(broadcast(cand), col(idCol) === col("_cand_id"))
          .join(broadcast(weights),
            col("qid") === col("_wqid") && col(DIM) === col("_qdim"))
          .groupBy(col("qid"), col(idCol))
          .agg(sum(col(VAL) * col("_qval")).as("score")), idCol, "score", k)
          .select(col("qid"), col(idCol), col("score")))
      }
    }
    val fallbackDf =
      if (fallbackQs.isEmpty) None
      else Some(searchBatch(postingsDf, fallbackQs, idCol, k, numBuckets,
        filter))
    (prunedResults, fallbackDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        searchBatch(postingsDf, queries, idCol, k, numBuckets, filter)
    }
  }

  /** EXACT sparse IP range search (similarity bounds:
    * `radius < s <= range_filter`, radius >= 0): the postings join on
    * the query's dimensions computes every NONZERO product, and a
    * zero-overlap doc scores exactly 0 <= radius — so the join IS the
    * prune, touching only the query dims' bucket directories. Callers
    * must route radius < 0 to a full scan (zero-overlap docs qualify
    * there and have no postings row).
    */
  def rangeSearch(postingsDf: DataFrame, query: Map[Int, Double],
      idCol: String, radius: Double, rangeFilter: Option[Double],
      numBuckets: Int, filter: Option[Column] = None): DataFrame = {
    require(radius >= 0,
      "postings-route sparse range search needs radius >= 0")
    val spark = postingsDf.sparkSession
    import spark.implicits._
    require(query.nonEmpty, "sparse query must have at least one dimension")
    val dims = query.keys.toSeq.sorted
    val buckets = queryBuckets(postingsDf, dims, numBuckets)
    val qdf = query.toSeq.sortBy(_._1).toDF("_qdim", "_qval")
    val pruned0 = postingsDf
      .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
    val pruned = filter.foldLeft(pruned0)(_ filter _)
    val upper = rangeFilter.map(f => col("score") <= lit(f)).getOrElse(lit(true))
    pruned
      .join(broadcast(qdf), col(DIM) === col("_qdim"))
      .groupBy(col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("score"))
      .filter(col("score") > lit(radius) && upper)
  }

  def search(postingsDf: DataFrame, query: Map[Int, Double], idCol: String,
      k: Int, numBuckets: Int,
      filter: Option[Column] = None): DataFrame =
    scores(postingsDf, query, idCol, numBuckets, filter)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Exact per-doc IP scores over the query dims' postings, NO top-k
    * cut — the shared scoring frame [[search]] takes its top k of and
    * the search iterator keysets through. Only docs sharing at least
    * one dimension with the query appear (the dim-keyed join IS the
    * candidate prune); the iterator contract inherits that semantic
    * from the top-k route.
    */
  def scores(postingsDf: DataFrame, query: Map[Int, Double], idCol: String,
      numBuckets: Int, filter: Option[Column] = None): DataFrame =
    joinedPostings(postingsDf, query, numBuckets, filter)
      .groupBy(col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("score"))

  /** [[scores]] with a DETERMINISTIC summation order (ascending dim).
    * The search iterator replays this frame on every page and its
    * keyset cursor compares collected doubles for EQUALITY — a partial
    * aggregation whose merge order shifts between jobs could move a
    * near-tie score by an ulp and skip or duplicate a row at the page
    * boundary. Per-doc cost is a fold over at most |query| elements
    * (map keys are unique per doc, so the (dim, product) sort is a
    * total order); the one-shot top-k route keeps the plain
    * partial-aggregated sum.
    */
  def scoresDeterministic(postingsDf: DataFrame, query: Map[Int, Double],
      idCol: String, numBuckets: Int,
      filter: Option[Column] = None): DataFrame =
    joinedPostings(postingsDf, query, numBuckets, filter)
      .groupBy(col(idCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col(DIM).as("d"),
          (col(VAL) * col("_qval")).as("p")))),
        lit(0.0), (acc, x) => acc + x.getField("p")).as("score"))

  /** The shared prune-and-join preamble of [[scores]] and
    * [[scoresDeterministic]]: bucket filter (directory pruning on a
    * persisted index) → dim filter (row groups) → broadcast join with
    * the query's (dim, weight) pairs. Kept in ONE place so the top-k
    * route and the iterator route can never desynchronize on the
    * candidate set.
    */
  private def joinedPostings(postingsDf: DataFrame,
      query: Map[Int, Double], numBuckets: Int,
      filter: Option[Column]): DataFrame = {
    val spark = postingsDf.sparkSession
    import spark.implicits._
    require(query.nonEmpty, "sparse query must have at least one dimension")
    val dims = query.keys.toSeq.sorted
    val buckets = queryBuckets(postingsDf, dims, numBuckets)
    val qdf = query.toSeq.sortBy(_._1).toDF("_qdim", "_qval")
    val pruned0 = postingsDf
      .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
    val pruned = filter.foldLeft(pruned0)(_ filter _)
    pruned.join(broadcast(qdf), col(DIM) === col("_qdim"))
  }
}
