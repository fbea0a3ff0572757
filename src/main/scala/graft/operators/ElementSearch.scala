package graft.operators

import graft.Functions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Element-level search over StructArray / embedding-list fields — the
  * 3.0 nested-vector surface (reference
  * docs/plans/2026-07-07-milvus-3-feature-inventory.md §1:
  * "embedding-list search + element-level filter", "element-level
  * query/search", "element-level range search / iterator search",
  * "element-level hybrid search", "element-level group_by, including
  * by Struct subfield and by primary key", "StructArray null
  * support", and binary/int8 vector subfield types).
  *
  * Spark-first shape: `posexplode` flattens the nested column to
  * element rows ONCE, and the element candidates then flow through
  * exactly the flat top-k machinery: literal broadcast query,
  * codegen'd distance, TakeOrderedAndProject for the element scope, a
  * single pk-window for the entity scope. The explode is pipelined
  * inside the scan stage (no shuffle); only the final top-k exchanges
  * O(k) rows.
  *
  * Scan width: Catalyst's generator pruning covers `Explode` but NOT
  * `PosExplode` (plan-asserted in ElementSearchSpec), so a bare
  * posexplode of the struct array reads EVERY subfield — at 100 TB a
  * fat payload subfield would ride along on every search. When the
  * caller passes `subfields`, [[elements]] therefore pre-prunes by
  * zipping just those nested accesses (`arrays_zip` of
  * `structArray.sub` extracts, which SchemaPruning does push into the
  * Parquet scan) and posexplodes the narrow zip — positions survive,
  * the scan reads only the named subfields.
  */
object ElementSearch {

  /** Flatten `structArrayCol` to one row per element:
    * (idCol, _elem_idx, <struct subfields>). `_elem_idx` is the
    * element's position — the element-hit path `field[$idx]` the
    * reference validators check. `subfields` bounds the scan (see the
    * object doc); empty means all subfields.
    */
  def elements(data: DataFrame, structArrayCol: String,
      idCol: String, subfields: Seq[String] = Seq.empty): DataFrame = {
    val elemCol =
      if (subfields.isEmpty) col(structArrayCol)
      else arrays_zip(subfields.map(n =>
        col(s"$structArrayCol.$n").as(n)): _*)
    data.select(col(idCol),
      posexplode(elemCol).as(Seq("_elem_idx", "_elem")))
      .select(col(idCol), col("_elem_idx"), col("_elem.*"))
  }

  private def orderFor(similarityLike: Boolean, idCol: String) = {
    val primary = if (similarityLike) col("score").desc else col("score").asc
    Seq(primary, col(idCol).asc, col("_elem_idx").asc)
  }

  private def floatQ(queryVec: Seq[Float]): Column =
    lit(queryVec.map(_.toDouble).toArray)

  /** Shared core: explode, element-filter, score — with the metric
    * dispatched on the SUBFIELD's type, so fp32 lists, int8 lists and
    * packed BINARY_VECTOR subfields (feature doc §1 "StructArray
    * supports more vector subfield types") all route to the right
    * codegen'd distance. Elements whose vector subfield is null
    * (§1 "StructArray null support") are stored but never searched —
    * without the guard a null distance would sort FIRST under Spark's
    * nulls-first ascending order.
    */
  private def scored(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      qv: Column,
      metricName: String,
      elementFilter: Option[Column],
      subfields: Seq[String]): (DataFrame, Boolean) = {
    val ex = elements(data, structArrayCol, idCol, subfields)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val (score, similarityLike) = Functions.metricFor(
      metricName, ex.schema(vecSubCol).dataType, col(vecSubCol), qv)
    (filtered.filter(col(vecSubCol).isNotNull).withColumn("score", score),
      similarityLike)
  }

  /** `search_scope=element`: every array element is an independent
    * candidate; top-k elements across all entities, with an optional
    * element-level filter on struct subfields.
    *
    * @return (idCol, _elem_idx, <subfields>, score, rank)
    */
  def searchElements(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      queryVec: Seq[Float],
      metricName: String,
      k: Int,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame =
    searchElementsBy(data, structArrayCol, vecSubCol, idCol,
      floatQ(queryVec), metricName, k, elementFilter, subfields)

  /** [[searchElements]] over a packed BINARY_VECTOR subfield
    * (HAMMING / JACCARD): the query is the packed bit pattern.
    */
  def searchElementsBinary(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      queryBits: Array[Byte],
      metricName: String,
      k: Int,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame =
    searchElementsBy(data, structArrayCol, vecSubCol, idCol,
      lit(queryBits), metricName, k, elementFilter, subfields)

  private def searchElementsBy(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      qv: Column,
      metricName: String,
      k: Int,
      elementFilter: Option[Column],
      subfields: Seq[String]): DataFrame = {
    val (sc, similarityLike) = scored(data, structArrayCol, vecSubCol,
      idCol, qv, metricName, elementFilter, subfields)
    val ranked = sc.orderBy(orderFor(similarityLike, idCol): _*).limit(k)
    // rank assigned AFTER the TakeOrdered prune: the window sees only
    // k rows, so the "no partition" window is O(k), not O(elements).
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(orderFor(similarityLike, idCol): _*)))
  }

  /** Element-level iterator search (feature doc §1 "element-level
    * range search / iterator search"): neighbors in rank order, one
    * `batchSize` page per call, resumable from the previous page's
    * last (score, entity id, element position) cursor. Each page is an
    * independent TakeOrdered job over the keyset-filtered scan —
    * O(batchSize) result rows, no state between pages.
    */
  def searchIteratorElements(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      queryVec: Seq[Float],
      metricName: String,
      batchSize: Int,
      after: Option[(Double, Long, Int)] = None,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    val (sc, similarityLike) = scored(data, structArrayCol, vecSubCol,
      idCol, floatQ(queryVec), metricName, elementFilter, subfields)
    val paged = after match {
      case None => sc
      case Some((s, id, idx)) =>
        // strictly after the cursor in (score, id, position) rank order
        val scoreAhead =
          if (similarityLike) col("score") < s else col("score") > s
        sc.filter(scoreAhead ||
          (col("score") === s && (col(idCol) > id ||
            (col(idCol) === id && col("_elem_idx") > idx))))
    }
    paged.orderBy(orderFor(similarityLike, idCol): _*).limit(batchSize)
  }

  /** `search_scope=entity` with element-level group_by on the primary
    * key: entities are ranked by their BEST element and each entity
    * contributes at most `groupSize` elements (the 3.0 element
    * group_by-by-pk contract — a strong entity's 2nd element must not
    * evict another entity's best).
    *
    * @return (idCol, _elem_idx, <subfields>, score, entity_rank)
    */
  def searchGroupByEntity(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      queryVec: Seq[Float],
      metricName: String,
      k: Int,
      groupSize: Int = 1,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    val (sc, similarityLike) = scored(data, structArrayCol, vecSubCol,
      idCol, floatQ(queryVec), metricName, elementFilter, subfields)
    val ord = orderFor(similarityLike, idCol)
    // Best `groupSize` elements per entity (one pk-partitioned window,
    // executed with partial WindowGroupLimit below the exchange), then
    // the top-k ENTITIES by their leader element's score: the leader
    // score is window-propagated to the entity's rows and entities are
    // ranked with dense_rank over (leader score, pk) — every row of an
    // entity shares that key, so the dense rank IS the entity rank
    // (same shape as Knn.searchGroupByMulti).
    val perEntity = Window.partitionBy(idCol).orderBy(ord: _*)
    val base = sc
      .withColumn("_er", row_number().over(perEntity))
      .filter(col("_er") <= groupSize)
      .withColumn("_ls",
        max(when(col("_er") === 1, col("score"))).over(Window.partitionBy(idCol)))
    val lord = Seq(
      if (similarityLike) col("_ls").desc else col("_ls").asc, col(idCol).asc)
    // At large k pre-prune each salt-of-pk bucket to its top-k entities
    // before the global rank — without it the final window funnels one
    // row per entity into ONE reducer (single-query search has no qid
    // to partition by).
    val pruned =
      if (k < Knn.twoLevelThreshold) base
      else {
        val saltW = Window.partitionBy(col("_gsalt")).orderBy(lord: _*)
        base
          .withColumn("_gsalt", pmod(hash(col(idCol)), lit(Knn.twoLevelFanout)))
          .withColumn("_sgr", dense_rank().over(saltW))
          .filter(col("_sgr") <= k)
          .drop("_gsalt", "_sgr")
      }
    pruned
      .withColumn("entity_rank", dense_rank().over(Window.orderBy(lord: _*)))
      .filter(col("entity_rank") <= k)
      .drop("_er", "_ls")
  }

  /** Element-level group_by on a struct SUBFIELD (the other half of
    * the 3.0 contract — "element-level group_by, including by Struct
    * subfield and by primary key"): group values are ranked by their
    * best element and each group contributes at most `groupSize`
    * elements. Same two-window shape as [[searchGroupByEntity]], with
    * the partition key swapped from the entity pk to the subfield.
    *
    * @return (idCol, _elem_idx, <subfields>, score, group_rank)
    */
  def searchGroupByField(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      groupByCol: String,
      queryVec: Seq[Float],
      metricName: String,
      k: Int,
      groupSize: Int = 1,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    val (sc, similarityLike) = scored(data, structArrayCol, vecSubCol,
      idCol, floatQ(queryVec), metricName, elementFilter, subfields)
    val ord = orderFor(similarityLike, idCol)
    // Same leader-key + dense_rank shape as [[searchGroupByEntity]],
    // with the group key swapped to the subfield. The leader key also
    // carries the leader's (pk, element position) — two groups' best
    // elements can tie on score and even live in the SAME entity, so
    // the full element identity is the deterministic tiebreak.
    val perGroup = Window.partitionBy(groupByCol).orderBy(ord: _*)
    val grpW = Window.partitionBy(groupByCol)
    val isLead = col("_er") === 1
    val base = sc
      .withColumn("_er", row_number().over(perGroup))
      .filter(col("_er") <= groupSize)
      .withColumn("_ls", max(when(isLead, col("score"))).over(grpW))
      .withColumn("_lid", max(when(isLead, col(idCol))).over(grpW))
      .withColumn("_lidx", max(when(isLead, col("_elem_idx"))).over(grpW))
    val lord = Seq(
      if (similarityLike) col("_ls").desc else col("_ls").asc,
      col("_lid").asc, col("_lidx").asc)
    val pruned =
      if (k < Knn.twoLevelThreshold) base
      else {
        val saltW = Window.partitionBy(col("_gsalt")).orderBy(lord: _*)
        base
          .withColumn("_gsalt", pmod(hash(col(groupByCol)), lit(Knn.twoLevelFanout)))
          .withColumn("_sgr", dense_rank().over(saltW))
          .filter(col("_sgr") <= k)
          .drop("_gsalt", "_sgr")
      }
    pruned
      .withColumn("group_rank", dense_rank().over(Window.orderBy(lord: _*)))
      .filter(col("group_rank") <= k)
      .drop("_er", "_ls", "_lid", "_lidx")
  }

  /** One element-level ANN sub-request for [[hybridSearchElements]] —
    * each may target a different vector subfield, metric, per-request
    * limit, and element filter (the element analogue of
    * [[HybridSearch.AnnSearchRequest]]).
    */
  final case class ElementAnnRequest(
      vecSubCol: String,
      queryVec: Seq[Float],
      metricName: String = "L2",
      limit: Int = 10,
      elementFilter: Option[Column] = None)

  /** Element-level hybrid search (feature doc §1: "element-level
    * hybrid search"): run each sub-request through [[searchElements]],
    * then fuse at ELEMENT identity (idCol, _elem_idx) with RRF or
    * weighted ranking. Fusion operates on the union of the N pruned
    * top-`limit` element lists — O(sum of request limits) rows — so at
    * scale the cost is the sub-searches, never the fusion.
    *
    * @return (idCol, _elem_idx, fused_score, fused_rank)
    */
  def hybridSearchElements(
      data: DataFrame,
      structArrayCol: String,
      idCol: String,
      requests: Seq[ElementAnnRequest],
      ranker: HybridSearch.Ranker,
      limit: Int = 10,
      offset: Int = 0,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    require(requests.nonEmpty, "element hybrid search needs >= 1 request")
    val elemKey = Seq(idCol, "_elem_idx")
    // A single-query call: fusion machinery partitions by qid, so tag
    // every per-request result with the same constant query id.
    val results = requests.map { r =>
      searchElements(data, structArrayCol, r.vecSubCol, idCol, r.queryVec,
        r.metricName, r.limit, r.elementFilter,
        if (subfields.isEmpty) Seq.empty else (subfields :+ r.vecSubCol).distinct)
        .withColumn("qid", lit(0L))
    }
    val similarity = requests.map(_.metricName.toUpperCase match {
      case "IP" | "COSINE" | "BM25" => true
      case _ => false
    })
    val fused = ranker match {
      case HybridSearch.RrfRanker(k) =>
        Fusion.rrf(results, elemKey, k = k, limit = limit, offset = offset)
      case HybridSearch.WeightedRanker(ws) =>
        Fusion.weighted(results, ws, elemKey, limit = limit, offset = offset,
          similarityLike = similarity)
    }
    fused.drop("qid")
  }

  /** Element-level range search: all elements within the score
    * threshold. Pure filter over the exploded scan — no top-k, no
    * shuffle.
    */
  def rangeSearchElements(
      data: DataFrame,
      structArrayCol: String,
      vecSubCol: String,
      idCol: String,
      queryVec: Seq[Float],
      metricName: String,
      threshold: Double,
      elementFilter: Option[Column] = None,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    val (sc, similarityLike) = scored(data, structArrayCol, vecSubCol,
      idCol, floatQ(queryVec), metricName, elementFilter, subfields)
    sc.filter(
      if (similarityLike) col("score") >= lit(threshold)
      else col("score") <= lit(threshold))
  }

  /** Element-level query: filter + project over element rows
    * (element-level nested-array operators compose as plain Columns
    * on the exploded frame).
    */
  def queryElements(
      data: DataFrame,
      structArrayCol: String,
      idCol: String,
      elementFilter: Option[Column] = None,
      limit: Option[Int] = None,
      subfields: Seq[String] = Seq.empty): DataFrame = {
    val ex = elements(data, structArrayCol, idCol, subfields)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val ordered = filtered.orderBy(col(idCol).asc, col("_elem_idx").asc)
    limit.map(ordered.limit).getOrElse(ordered)
  }
}
