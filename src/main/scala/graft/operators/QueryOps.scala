package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's scalar query surface (SURVEY.md §2.2/§2.4/§2.5):
  * filtered scan + projection + limit/offset, count(*), min/max/sum/avg,
  * count-distribution buckets, keyset (iterator) pagination, and the
  * merge-on-read views that implement upsert/delete semantics.
  *
  * All of these are stock DataFrame ops on purpose — Catalyst pushes the
  * filters and projections into the parquet scan and AQE handles
  * partition sizing, which is exactly what survives a 100x scale-up.
  */
object QueryOps {

  /** `fn(column)` output-field form for the query-aggregation route. */
  private val AggField = "(?i)(count|min|max|sum|avg)\\((.+)\\)".r

  /** `query(filter, output_fields, limit, offset)`
    * (reference milvus_client/query_permanently_simplified.py:97-132).
    * `orderBy` keys make pagination deterministic — the reference relies
    * on server iteration order instead; we make it explicit.
    */
  def query(
      data: DataFrame,
      filter: Option[Column],
      outputFields: Seq[String],
      orderBy: Seq[Column] = Seq.empty,
      limit: Option[Int] = None,
      offset: Int = 0): DataFrame = {
    // Aggregate output_fields ARE the reference's aggregation API:
    // `count(*)` (common/validators.py:61-65) and the 3.0 plan §2
    // query-aggregation set (count/min/max/sum/avg) — when every
    // requested field is an aggregate, route to ONE partial-aggregated
    // job (map-side combine; no row ever leaves the executors).
    val aggRequested = outputFields.collect {
      case AggField(fn, arg) => (fn.toLowerCase, arg.trim)
    }
    if (outputFields.nonEmpty && aggRequested.length == outputFields.length) {
      val df = filter.map(data.filter).getOrElse(data)
      val cols = aggRequested.map {
        case ("count", "*") => count(lit(1)).as("count(*)")
        case (fn, c) =>
          val f = fn match {
            case "count" => count(col(c))
            case "min" => min(col(c))
            case "max" => max(col(c))
            case "sum" => sum(col(c))
            case "avg" => avg(col(c))
          }
          f.as(s"$fn($c)")
      }
      return df.agg(cols.head, cols.tail: _*)
    }
    var df = filter.map(data.filter).getOrElse(data)
    if (outputFields.nonEmpty && outputFields != Seq("*"))
      df = df.select(outputFields.map(col): _*)
    if (orderBy.nonEmpty) df = df.orderBy(orderBy: _*)
    if (offset > 0) df = df.offset(offset)
    limit.map(df.limit).getOrElse(df)
  }

  /** `query(filter, output_fields=["count(*)"])` (reference
    * common/validators.py:61-65, go_bench/query_horizon_count.go:513-534).
    */
  def countStar(data: DataFrame, filter: Option[Column]): DataFrame =
    filter.map(data.filter).getOrElse(data)
      .agg(count(lit(1)).as("cnt"))

  /** Count-distribution histogram (reference
    * go_bench/query_horizon_count.go:29-36,90-110): bucket a numeric
    * column into labeled ranges and count per bucket. Single shuffle on
    * the (few) bucket labels with map-side partial aggregation.
    */
  def buckets(
      data: DataFrame,
      valueCol: Column,
      edges: Seq[Double],
      labels: Seq[String]): DataFrame = {
    require(labels.length == edges.length + 1)
    val bucket = edges.zipWithIndex.foldRight(lit(labels.last)) {
      case ((edge, i), elseCol) => when(valueCol < edge, lit(labels(i))).otherwise(elseCol)
    }
    data.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Keyset pagination — the scale-correct form of the reference's
    * query_iterator (milvus_client/query_iterator.py:104-163): resume
    * from the last seen PK instead of OFFSET so each page is an indexed
    * range scan, not a re-scan.
    */
  def keysetPage(
      data: DataFrame,
      pkCol: String,
      afterPk: Option[Any],
      batchSize: Int,
      filter: Option[Column] = None,
      tiebreak: Seq[Column] = Seq.empty): DataFrame = {
    var df = filter.map(data.filter).getOrElse(data)
    afterPk.foreach(v => df = df.filter(col(pkCol) > lit(v)))
    df.orderBy(col(pkCol).asc +: tiebreak: _*).limit(batchSize)
  }

  /** Merge-on-read upsert view (reference upsert semantics, SURVEY.md
    * S9): latest version per PK wins. `row_number` over pk benefits from
    * Spark's partial WindowGroupLimit, so pre-shuffle data is pruned to
    * one candidate row per (task, pk).
    */
  def latestPerKey(
      data: DataFrame,
      keyCols: Seq[String],
      versionOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(versionOrder: _*)
    data.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Delete-by-filter view (reference S10,
    * 2.6/common.py:202-238): rows NOT matching the delete predicate
    * survive. Null predicate results keep the row (Milvus deletes only
    * rows where the expr is definitively true).
    */
  def deleteByFilter(data: DataFrame, deletePred: Column): DataFrame =
    data.filter(!coalesce(deletePred, lit(false)))
}
