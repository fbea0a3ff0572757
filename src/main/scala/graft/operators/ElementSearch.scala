package graft.operators

import graft.Functions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Element-level search over StructArray / embedding-list fields — the
  * 3.0 nested-vector surface (reference
  * docs/plans/2026-07-07-milvus-3-feature-inventory.md §1:
  * "embedding-list search + element-level filter", "element-level
  * query/search", "element-level range search", "element-level
  * group_by, including by Struct subfield and by primary key").
  *
  * Spark-first shape: `posexplode` flattens the nested column to
  * element rows ONCE — Spark's Parquet reader prunes to just the
  * struct subfields the query references (nested schema pruning), so
  * the scan stays narrow even when elements carry many subfields —
  * and the element candidates then flow through exactly the flat
  * top-k machinery: literal broadcast query, codegen'd distance,
  * TakeOrderedAndProject for the element scope, a single pk-window
  * for the entity scope. The explode is pipelined inside the scan
  * stage (no shuffle); only the final top-k exchanges O(k) rows.
  */
object ElementSearch {

  /** Flatten `structArrayCol` to one row per element:
    * (idCol, _elem_idx, <struct subfields>). `_elem_idx` is the
    * element's position — the element-hit path `field[$idx]` the
    * reference validators check.
    */
  def elements(data: DataFrame, structArrayCol: String,
      idCol: String): DataFrame =
    data.select(col(idCol),
      posexplode(col(structArrayCol)).as(Seq("_elem_idx", "_elem")))
      .select(col(idCol), col("_elem_idx"), col("_elem.*"))

  private def orderFor(similarityLike: Boolean, idCol: String) = {
    val primary = if (similarityLike) col("score").desc else col("score").asc
    Seq(primary, col(idCol).asc, col("_elem_idx").asc)
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
      elementFilter: Option[Column] = None): DataFrame = {
    val ex = elements(data, structArrayCol, idCol)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val qv = lit(queryVec.map(_.toDouble).toArray)
    val (score, similarityLike) = Functions.metricFor(
      metricName, ex.schema(vecSubCol).dataType, col(vecSubCol), qv)
    val ranked = filtered.withColumn("score", score)
      .orderBy(orderFor(similarityLike, idCol): _*).limit(k)
    // rank assigned AFTER the TakeOrdered prune: the window sees only
    // k rows, so the "no partition" window is O(k), not O(elements).
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(orderFor(similarityLike, idCol): _*)))
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
      elementFilter: Option[Column] = None): DataFrame = {
    val ex = elements(data, structArrayCol, idCol)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val qv = lit(queryVec.map(_.toDouble).toArray)
    val (score, similarityLike) = Functions.metricFor(
      metricName, ex.schema(vecSubCol).dataType, col(vecSubCol), qv)
    val ord = orderFor(similarityLike, idCol)
    val scored = filtered.withColumn("score", score)
    // Best `groupSize` elements per entity (one pk-partitioned window,
    // executed with partial WindowGroupLimit below the exchange), then
    // the top-k ENTITIES by their leader element's score.
    val perEntity = Window.partitionBy(idCol).orderBy(ord: _*)
    // Leaders (_er == 1) sort FIRST so their row_number runs
    // 1..numEntities deterministically (same trick as
    // Knn.searchGroupBy's leadersFirst window).
    val leaders = Window.orderBy(col("_er").asc +: ord: _*)
    scored
      .withColumn("_er", row_number().over(perEntity))
      .filter(col("_er") <= groupSize)
      .withColumn("_lr", when(col("_er") === 1, row_number().over(leaders)))
      .withColumn("entity_rank",
        max(col("_lr")).over(Window.partitionBy(idCol)))
      .filter(col("entity_rank") <= k)
      .drop("_er", "_lr")
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
      elementFilter: Option[Column] = None): DataFrame = {
    val ex = elements(data, structArrayCol, idCol)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val qv = lit(queryVec.map(_.toDouble).toArray)
    val (score, similarityLike) = Functions.metricFor(
      metricName, ex.schema(vecSubCol).dataType, col(vecSubCol), qv)
    val scored = filtered.withColumn("score", score)
    scored.filter(
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
      limit: Option[Int] = None): DataFrame = {
    val ex = elements(data, structArrayCol, idCol)
    val filtered = elementFilter.map(ex.filter).getOrElse(ex)
    val ordered = filtered.orderBy(col(idCol).asc, col("_elem_idx").asc)
    limit.map(ordered.limit).getOrElse(ordered)
  }
}
