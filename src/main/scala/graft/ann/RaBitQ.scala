package graft.ann

import graft.Functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** RaBitQ-family 1-bit quantized ANN index (reference index type
  * IVF_RABITQ, milvus_client/common/workload.py:144,148): IVF coarse
  * cells + a 1-bit sign code of each vector's residual to its cell
  * centroid, searched in two phases —
  *
  *   1. ESTIMATE: a narrow scan of `(cell, id, code, rnorm)` scores
  *      every row in the probed cells with a Hamming-based angle
  *      estimate (random-hyperplane bound: the sign-agreement fraction
  *      of two residual codes estimates their angle; see the RaBitQ
  *      paper, Gao & Long, SIGMOD 2024, and the SimHash collision
  *      probability it builds on). Codes are dim/8 bytes vs 4*dim for
  *      the float vector, so this pass reads ~1/32 of the vector bytes
  *      — at 100 TB the estimate pass touches ~3 TB of codes, and
  *      column pruning keeps the float vectors entirely unread.
  *   2. RERANK: the top `k*refine` candidates per query (a few
  *      thousand rows total) are re-scored EXACTLY in the declared
  *      metric via a broadcast semi-join back to the full vectors, and
  *      the final top-k comes from the exact scores.
  *
  * Candidate generation uses L2 residual geometry; for COSINE the
  * caller should search over L2-normalized vectors (the reference
  * normalizes its float vectors, 2.6/common.py:347-350), where cosine
  * and L2 order coincide. The re-rank is exact in the declared metric
  * either way, so estimator error costs recall, never wrong scores.
  */
object RaBitQ {

  val CID = "_cid"
  val CODE = "_code"
  val RNORM = "_rnorm"

  /** Augment a table with its IVF cell, residual sign code, and
    * residual norm. Persist `partitionBy(_cid)` so probe filters prune
    * directories; the code/norm columns make the estimate pass a
    * narrow columnar scan.
    */
  def encode(df: DataFrame, vecCol: String, model: Ivf.Model): DataFrame = {
    val cents = typedlit(model.centroids.map(_.toSeq).toSeq)
    val centroid = element_at(cents, col(CID) + 1)
    Ivf.assign(df, vecCol, model)
      .withColumn(CODE, Functions.centeredSignBits(col(vecCol), centroid))
      .withColumn(RNORM, Functions.vecL2(col(vecCol), centroid))
  }

  /** Estimated squared L2 distance between a query residual (norm
    * `qnorm`, code `qcode`) and a data residual (norm `rnorm`, code
    * `code`) in the same cell: law of cosines with the angle estimated
    * from the codes' Hamming distance (`theta ~ pi * h / dim`).
    */
  private def estimate(h: Column, dim: Int, qnorm: Column,
      rnorm: Column): Column = {
    val cosTheta = cos(h * (math.Pi / dim))
    qnorm * qnorm + rnorm * rnorm - lit(2.0) * qnorm * rnorm * cosTheta
  }

  /** Batched two-phase search. `queries` are driver-side (the
    * reference's nq-batch client shape); per (query, probed cell) the
    * query residual code/norm is computed on the driver and shipped in
    * the broadcast probe table.
    */
  def search(encoded: DataFrame, model: Ivf.Model,
      queries: Seq[(String, Array[Double])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, refine: Int = 4, metric: String = "L2",
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val dim = model.centroids(0).length
    // Probe rows: one per (query, probed cell) with the query's
    // residual code/norm AGAINST THAT CELL's centroid.
    val probeRows = queries.flatMap { case (qid, qv) =>
      model.probes(qv, nprobe).map { cell =>
        val c = model.centroids(cell)
        val code = new Array[Byte]((dim + 7) >> 3)
        var s = 0.0
        var i = 0
        while (i < dim) {
          val r = qv(i) - c(i)
          if (r > 0) code(i >> 3) = (code(i >> 3) | (1 << (i & 7))).toByte
          s += r * r
          i += 1
        }
        (qid, cell, code, math.sqrt(s))
      }
    }
    val probeDf = probeRows.toDF("qid", "_pcell", "_qcode", "_qnorm")
    val allCells = probeRows.map(_._2).distinct
    // Phase 1 — estimate over the probed cells. Catalyst prunes the
    // scan to (cid, id, code, rnorm) + any filter columns; the float
    // vector column is never read here.
    val pruned = filter.foldLeft(
      encoded.filter(col(CID).isin(allCells: _*)))(_ filter _)
    val est = pruned
      .select(col(CID), col(idCol), col(CODE), col(RNORM))
      .join(broadcast(probeDf), col(CID) === col("_pcell"))
      .select(col("qid"), col(idCol),
        estimate(Functions.hammingDistance(col(CODE), col("_qcode")), dim,
          col("_qnorm"), col(RNORM)).as("_est"))
    val r = math.max(k * refine, k)
    val cand = graft.operators.Knn
      .limitPerQid(est, "qid", Seq(col("_est").asc, col(idCol).asc), r, "_r")
      .select(col("qid"), col(idCol).as("_cand_id"))
    // Phase 2 — exact re-rank of the candidates only: broadcast the
    // (qid, id) candidate list, point-fetch the vectors, score exactly.
    // The user filter is NOT re-applied here: every candidate already
    // passed it in phase 1, and the semi-join on (qid, id) fixes
    // membership — re-evaluating a possibly-expensive predicate on the
    // point-fetch scan would buy nothing.
    val qvecs = queries.map { case (qid, qv) => (qid, qv.toSeq) }
      .toDF("qid", "_qvec")
    val fetchCols = (Seq(idCol, vecCol) ++ outputCols).distinct.map(col)
    val fetched = encoded.filter(col(CID).isin(allCells: _*))
      .select(fetchCols: _*)
      .join(broadcast(cand), col(idCol) === col("_cand_id"))
      .join(broadcast(qvecs), "qid")
    val (score, similarityLike) = Functions.metricFor(
      metric, encoded.schema(vecCol).dataType, col(vecCol), col("_qvec"))
    val primary = if (similarityLike) col("score").desc else col("score").asc
    val outCols = (col("qid") +: (idCol +: outputCols).distinct.map(col)) :+
      col("score")
    graft.operators.Knn.limitPerQid(fetched.withColumn("score", score),
        "qid", Seq(primary, col(idCol).asc), k, "_rank")
      .select(outCols: _*)
  }

  /** Single-query convenience wrapper (the collection-search shape). */
  def searchOne(encoded: DataFrame, model: Ivf.Model, queryVec: Seq[Float],
      vecCol: String, idCol: String, k: Int, nprobe: Int, refine: Int = 4,
      metric: String = "L2", filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame =
    search(encoded, model, Seq(("q0", queryVec.map(_.toDouble).toArray)),
      vecCol, idCol, k, nprobe, refine, metric, filter, outputCols)
      .drop("qid")

  /** Recall@k against exact brute force, averaged over a query set —
    * the index-quality oracle (same contract as [[Ivf.recallAtK]]).
    */
  def recallAtK(data: DataFrame, encoded: DataFrame, model: Ivf.Model,
      queries: Seq[(Long, Seq[Float])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, refine: Int = 4,
      metric: String = "L2"): Double = {
    // Batched: ONE exact top-k job and ONE quantized top-k job over the
    // whole query set, semi-joined on (qid, id). sum(|exact ∩ approx|)
    // / (nq·k) equals the per-query average — the old per-query driver
    // loop ran 2·nq jobs for the same number.
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
    // distinct() keeps the metric the set-intersection |exact ∩ approx|
    // even if duplicate ids put the same (qid, id) in the top-k twice.
    val exact = graft.operators.Knn
      .search(data, qdf, vecCol, idCol, metric, k)
      .select(col("qid").cast("string").as("qid"), col(idCol)).distinct()
    val approx = search(encoded, model,
      queries.map { case (qid, qv) =>
        (qid.toString, qv.map(_.toDouble).toArray)
      }, vecCol, idCol, k, nprobe, refine, metric)
      .select(col("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — nq*k would cap recall below 1.0 when data < k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
