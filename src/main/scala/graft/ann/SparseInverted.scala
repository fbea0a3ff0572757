package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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
  * reference engine, is never returned). WAND's upper-bound skipping is
  * a serial-scan optimization with no Spark analog; the equivalent
  * pruning here is physical: `partitionBy(_db)` postings mean a query
  * reads only its dimensions' directories — at 100 TB a 10-nnz query
  * touches ~10/numBuckets of the index regardless of corpus size.
  */
object SparseInverted {

  val DIM = "_dim"
  val VAL = "_val"
  val BUCKET = "_db"

  /** Dimension postings for a sparse map column. Persist
    * `partitionBy(_db)` (repartition first: one file per bucket).
    */
  def postings(df: DataFrame, vecCol: String, idCol: String,
      numBuckets: Int = 64): DataFrame =
    df.select(col(idCol), explode(col(vecCol)).as(Seq("key", "value")))
      .select(col(idCol), col("key").as(DIM), col("value").as(VAL))
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
  def search(postingsDf: DataFrame, query: Map[Int, Double], idCol: String,
      k: Int, numBuckets: Int,
      filter: Option[Column] = None): DataFrame = {
    val spark = postingsDf.sparkSession
    import spark.implicits._
    require(query.nonEmpty, "sparse query must have at least one dimension")
    val dims = query.keys.toSeq.sorted
    val buckets = queryBuckets(postingsDf, dims, numBuckets)
    val qdf = query.toSeq.sortBy(_._1).toDF("_qdim", "_qval")
    val pruned0 = postingsDf
      .filter(col(BUCKET).isin(buckets: _*) && col(DIM).isin(dims: _*))
    val pruned = filter.foldLeft(pruned0)(_ filter _)
    pruned
      .join(broadcast(qdf), col(DIM) === col("_qdim"))
      .groupBy(col(idCol))
      .agg(sum(col(VAL) * col("_qval")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
