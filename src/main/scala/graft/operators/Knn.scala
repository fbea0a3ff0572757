package graft.operators

import graft.Functions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact top-k vector search — the reference's core operator family
  * (ANN `search`, reference milvus_client/search_permanently.py:137-189
  * and go_bench/search_horizon_perf_3.go:549-605). Our engine computes
  * EXACT results; Milvus' index-approximate recall is a lower bound on
  * ours, so result-completeness SLOs (hits >= topk * ratio) hold by
  * construction.
  *
  * Scale design: queries arrive as a small DataFrame (nq rows) that is
  * BROADCAST against the collection scan, so the big side is read once
  * for the whole batch with no shuffle. The per-query top-k uses
  * `row_number` over (qid) which Spark 3.5+/4.x executes with a partial
  * WindowGroupLimit below the shuffle — each task keeps only its local
  * top-k per qid before exchanging, so shuffle volume is O(nq * k), not
  * O(rows). Single-query searches go through `orderBy(..).limit(k)` =
  * TakeOrderedAndProject (no full sort, no wide shuffle).
  */
object Knn {

  /** Search `data` for the top-k neighbors of each row in `queries`.
    *
    * @param data       collection DataFrame
    * @param queries    small DataFrame with columns (qidCol, qvecCol)
    * @param vecCol     vector column in `data`
    * @param idCol      entity primary-key column in `data` (tiebreak + output)
    * @param metricName L2 | IP | COSINE | HAMMING
    * @param k          topk (reference exercises up to 15000)
    * @param filter     optional pre-filter (Milvus filtered search is
    *                   approximate; ours is exact and strictly stronger)
    * @param offset     pagination offset (reference hybrid/search offset param)
    * @param outputCols entity columns to carry into results
    * @return columns: qid, <outputCols>, score, rank (rank is 1-based
    *         after offset removal)
    */
  def search(
      data: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      metricName: String,
      k: Int,
      filter: Option[Column] = None,
      offset: Int = 0,
      outputCols: Seq[String] = Seq.empty,
      qidCol: String = "qid",
      qvecCol: String = "qvec",
      nqHint: Option[Int] = None): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    val (score, similarityLike) = Functions.metricFor(
      metricName, data.schema(vecCol).dataType, col(vecCol), col(qvecCol))
    val ord = orderFor(similarityLike, idCol)
    val cols = outputCandidates(data, idCol, outputCols)
    // nq × rows scoring fuses into the scan stage; spread a
    // below-parallelism scan so a LARGE batch scores on every core
    // (scale-adaptive: no-op once the scan has >= default splits).
    // Gated on nq — for client-sized batches (nq up to a few dozen)
    // the extra exchange costs more than the serial scoring it saves
    // (measured: the 10-query topk sweep slowed ~2x ungated while the
    // 2000-query exact self-join sped up 10x). nq is read off a
    // driver-local query frame for free; scan-backed query frames
    // (self-joins, bulk mining) pass `nqHint`.
    val scored = spreadForBatch(filtered, queries, nqHint)
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .select((col(qidCol) +: cols.map(col)) :+ score.as("score"): _*)
    limitPerQid(scored, qidCol, ord, offset + k)
      .filter(col("rank") > offset)
      .withColumn("rank", col("rank") - offset)
  }

  /** k at which batched search switches to the two-level merge. */
  private[graft] val twoLevelThreshold = 1000
  private[graft] val twoLevelFanout = 32

  /** Per-qid top-`limit` under `ord`, with the two-level salted
    * pre-prune at large limits — the ONE per-query reduction every
    * routed search path funnels through. Below the threshold a single
    * rank-limit window suffices (Spark's InferWindowGroupLimit already
    * bounds each map partition to `limit` rows per qid before the
    * shuffle); at the reference's large-k design point (topk=15000,
    * go_bench/search_horizon_perf_3.go:855) the final reducer would
    * still absorb tasks × limit rows per qid, so a (qid, salt)
    * pre-prune caps it at fanout × limit. Output keeps the `rankName`
    * rank column, filtered to `<= limit`.
    */
  private[graft] def limitPerQid(df: DataFrame, qidCol: String,
      ord: Seq[Column], limit: Int, rankName: String = "rank"): DataFrame = {
    val pre =
      if (limit < twoLevelThreshold) df
      else {
        val w1 = Window.partitionBy(col(qidCol), col("_salt")).orderBy(ord: _*)
        df.withColumn("_salt", spark_partition_id() % twoLevelFanout)
          .withColumn("_r1", row_number().over(w1))
          .filter(col("_r1") <= limit)
          .drop("_salt", "_r1")
      }
    val w = Window.partitionBy(qidCol).orderBy(ord: _*)
    pre.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= limit)
  }

  /** Group-by search (reference `group_by_field`,
    * milvus_client/issues.py:79-86): keep each group's best hit, then
    * the global top-k groups per query. Two window passes; both benefit
    * from partial group limits.
    */
  def searchGroupBy(
      data: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      groupByField: String,
      metricName: String,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty,
      groupSize: Int = 1,
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame =
    searchGroupByMulti(data, queries, vecCol, idCol, Seq(groupByField),
      metricName, k, filter, outputCols, groupSize, qidCol, qvecCol)

  /** Multi-field group_by (3.0 plan §2, "multi-field composite
    * group_by"): a group is a distinct COMBINATION of the fields'
    * values. Same physical shape as the single-field path — the group
    * key just widens the window partition columns, so the cost is
    * identical.
    */
  def searchGroupByMulti(
      data: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      groupByFields: Seq[String],
      metricName: String,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty,
      groupSize: Int = 1,
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    require(groupByFields.nonEmpty, "group_by needs at least one field")
    val filtered = filter.map(data.filter).getOrElse(data)
    val (score, similarityLike) = Functions.metricFor(
      metricName, data.schema(vecCol).dataType, col(vecCol), col(qvecCol))
    val ord = orderFor(similarityLike, idCol)
    val cols = outputCandidates(data, idCol, outputCols ++ groupByFields)
    val groupCols = groupByFields.map(col)
    val scored = spreadForBatch(filtered, queries)
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .select((col(qidCol) +: cols.map(col)) :+ score.as("score"): _*)
    // group_size hits per group (Milvus 2.5 group_size param; default 1),
    // then the top-k GROUPS per query, ranked by each group's BEST hit
    // (a strong group's 2nd hit must not evict another group's best).
    // The leader's (score, id) key is window-propagated to every row of
    // its group and groups are ranked with dense_rank over that key:
    // all rows of a group share the key, so the dense rank IS the group
    // rank and the `<= k` filter stays WindowGroupLimit-eligible.
    val perGroup = Window.partitionBy(col(qidCol) +: groupCols: _*).orderBy(ord: _*)
    val grpW = Window.partitionBy(col(qidCol) +: groupCols: _*)
    val base = scored
      .withColumn("_gr", row_number().over(perGroup))
      .filter(col("_gr") <= groupSize)
      .withColumn("_ls", max(when(col("_gr") === 1, col("score"))).over(grpW))
      .withColumn("_lid", max(when(col("_gr") === 1, col(idCol))).over(grpW))
    val lord = Seq(
      if (similarityLike) col("_ls").desc else col("_ls").asc, col("_lid").asc)
    // High group cardinality would funnel one row per distinct group
    // into a single per-qid reducer; at large k pre-prune each
    // (qid, salt-of-group-key) bucket to its top-k groups first — the
    // same two-level move as `search`. Hashing the GROUP key keeps a
    // group's rows in one bucket, so pruning whole groups is safe: the
    // global top-k groups are a subset of the per-bucket top-k unions.
    val pruned =
      if (k < twoLevelThreshold) base
      else {
        val saltW = Window.partitionBy(col(qidCol), col("_gsalt")).orderBy(lord: _*)
        base
          .withColumn("_gsalt", pmod(hash(groupCols: _*), lit(twoLevelFanout)))
          .withColumn("_sgr", dense_rank().over(saltW))
          .filter(col("_sgr") <= k)
          .drop("_gsalt", "_sgr")
      }
    pruned
      .withColumn("_group_rank",
        dense_rank().over(Window.partitionBy(qidCol).orderBy(lord: _*)))
      .filter(col("_group_rank") <= k)
      .withColumn("rank", row_number().over(Window.partitionBy(qidCol)
        .orderBy(col("_group_rank").asc, col("_gr").asc)))
      .drop("_gr", "_ls", "_lid", "_group_rank")
  }

  /** Range search (Milvus 3.0 surface, feature-inventory doc §1-2): all
    * entities within a score threshold of each query. Pure filter — no
    * top-k, no shuffle beyond the scan.
    */
  def rangeSearch(
      data: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      metricName: String,
      threshold: Double,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty,
      qidCol: String = "qid",
      qvecCol: String = "qvec"): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    val (score, similarityLike) = Functions.metricFor(
      metricName, data.schema(vecCol).dataType, col(vecCol), col(qvecCol))
    val keep = if (similarityLike) score >= lit(threshold) else score <= lit(threshold)
    val cols = outputCandidates(data, idCol, outputCols)
    spreadForBatch(filtered, queries)
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .select((col(qidCol) +: cols.map(col)) :+ score.as("score"): _*)
      .filter(keep)
  }

  /** Single-query top-k through TakeOrderedAndProject (orderBy+limit):
    * preferred physical shape when nq == 1.
    */
  def searchOne(
      data: DataFrame,
      queryVec: Seq[Float],
      vecCol: String,
      idCol: String,
      metricName: String,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    val qv = lit(queryVec.map(_.toDouble).toArray)
    val (score, similarityLike) = Functions.metricFor(
      metricName, data.schema(vecCol).dataType, col(vecCol), qv)
    val cols = outputCandidates(data, idCol, outputCols)
    val scored = filtered.select(cols.map(col) :+ score.as("score"): _*)
    val ord = orderFor(similarityLike, idCol)
    scored.orderBy(ord: _*).limit(k)
  }

  /** Single-query top-k over BINARY_VECTOR columns (Hamming). */
  def searchOneBinary(
      data: DataFrame,
      queryBytes: Array[Byte],
      vecCol: String,
      idCol: String,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    val score = Functions.hammingDistance(col(vecCol), lit(queryBytes))
    val cols = outputCandidates(data, idCol, outputCols)
    filtered.select(cols.map(col) :+ score.as("score"): _*)
      .orderBy(col("score").asc, col(idCol).asc).limit(k)
  }

  /** Single-query top-k over SPARSE_FLOAT_VECTOR columns (sparse IP). */
  def searchOneSparse(
      data: DataFrame,
      query: Map[Int, Double],
      vecCol: String,
      idCol: String,
      k: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val filtered = filter.map(data.filter).getOrElse(data)
    val qv = map(query.toSeq.sortBy(_._1).flatMap {
      case (i, v) => Seq(lit(i), lit(v)) }: _*)
    val score = Functions.sparseIp(col(vecCol), qv)
    val cols = outputCandidates(data, idCol, outputCols)
    filtered.select(cols.map(col) :+ score.as("score"): _*)
      .orderBy(col("score").desc, col(idCol).asc).limit(k)
  }



  /** Spread threshold: batches at least this large amortize the extra
    * exchange over nq × rows scoring work.
    */
  private val spreadMinNq = 64

  private def spreadForBatch(data: DataFrame, queries: DataFrame,
      nqHint: Option[Int] = None): DataFrame = {
    val nq = nqHint.orElse(Par.localRows(queries))
    if (nq.exists(_ >= spreadMinNq)) Par.spread(data) else data
  }

  private def orderFor(similarityLike: Boolean, idCol: String): Seq[Column] = {
    val primary = if (similarityLike) col("score").desc else col("score").asc
    // Deterministic tiebreak on the entity id.
    Seq(primary, col(idCol).asc)
  }

  private def outputCandidates(
      data: DataFrame, idCol: String, outputCols: Seq[String]): Seq[String] =
    (idCol +: outputCols).distinct
}
