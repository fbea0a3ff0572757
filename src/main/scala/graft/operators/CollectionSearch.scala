package graft.operators

import graft.ann.Ivf
import graft.expr.MilvusExpr
import graft.store.Collection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Index-aware search over a store collection: consults the declared
  * IndexDefs (S4) and per-query search params (V4) to pick the
  * physical path — IVF probe + exact re-rank when an IVF index is
  * declared and `nprobe` given, exact scan otherwise. Metric defaults
  * to the index's declared metric_type (workload.py:126-131 default
  * COSINE).
  *
  * IVF models are trained once per (collection, field) and cached —
  * the catalog-recorded index is the contract that the model can be
  * rebuilt deterministically.
  */
object CollectionSearch {

  private val models =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Ivf.Model]()

  private def ivfModel(spark: SparkSession, coll: Collection, field: String,
      metric: String, nlist: Int): Ivf.Model =
    models.computeIfAbsent((coll.name, field), _ =>
      Ivf.train(coll.read(spark), field, k = nlist, metric = metric))

  /** Invalidate cached models (call after heavy DML/compaction). */
  def invalidate(collName: String): Unit =
    models.keySet.removeIf(_._1 == collName)

  def search(
      spark: SparkSession,
      coll: Collection,
      vecField: String,
      queryVec: Seq[Float],
      k: Int,
      filterExpr: String = "",
      searchParams: Map[String, String] = Map.empty,
      outputFields: Seq[String] = Seq.empty,
      partitionNames: Seq[String] = Seq.empty,
      consistencyLevel: String = "Strong"): DataFrame = {
    val d = coll.definition
    val pk = d.primaryField.name
    val index = d.indexes.find(_.field == vecField)
    val metric = searchParams.get("metric_type")
      .orElse(index.flatMap(_.metricType))
      .getOrElse("COSINE")
    val data = coll.read(spark, partitionNames)
    val pred =
      if (filterExpr.trim.isEmpty) None
      else Some(MilvusExpr.compile(filterExpr, data))
    val ivfDeclared = index.exists(ix =>
      ix.indexType.toUpperCase.startsWith("IVF") ||
        ix.indexType.toUpperCase == "AUTOINDEX")
    searchParams.get("nprobe").map(_.toInt) match {
      case Some(nprobe) if ivfDeclared =>
        val nlist = index.flatMap(_.params.get("nlist")).map(_.toInt).getOrElse(16)
        val model = ivfModel(spark, coll, vecField, metric, nlist)
        Ivf.searchOne(Ivf.assign(data, vecField, model), model, queryVec,
          vecField, pk, k, nprobe, pred, outputFields)
      case _ =>
        Knn.searchOne(data, queryVec, vecField, pk, metric, k, pred, outputFields)
    }
  }

  /** Search-by-PK (3.0 surface, feature-inventory doc §1-2): fetch the
    * entity's own vector, then V1.
    */
  def searchByPk(
      spark: SparkSession,
      coll: Collection,
      vecField: String,
      pkValue: Any,
      k: Int,
      searchParams: Map[String, String] = Map.empty,
      outputFields: Seq[String] = Seq.empty): DataFrame = {
    val d = coll.definition
    val pk = d.primaryField.name
    val row = coll.read(spark).filter(col(pk) === lit(pkValue))
      .select(vecField).head()
    val vec = row.getSeq[Float](0)
    search(spark, coll, vecField, vec, k, searchParams = searchParams,
      outputFields = outputFields)
  }
}
