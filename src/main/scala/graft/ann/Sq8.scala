package graft.ann

import graft.Functions
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** IVF_SQ8 — IVF coarse cells + 8-bit scalar-quantized codes
  * (reference index type IVF_SQ8, 2.6/common.py:882-898; FAISS
  * IndexIVFScalarQuantizer is the public ancestor). Search runs in two
  * phases, the same shape as [[RaBitQ]] but with a far tighter
  * estimator:
  *
  *   1. ESTIMATE: a narrow scan of `(cell, id, code)` scores every row
  *      in the probed cells with the asymmetric-distance estimate
  *      (ADC: the float query against the 8-bit decoded grid — the
  *      per-dimension error is at most half a quantization step, ~0.2%
  *      of the trained range, vs RaBitQ's 1-bit sign). Codes are dim
  *      bytes vs 4*dim for the float vector, so this pass reads ~1/4
  *      of the vector bytes and column pruning keeps the float vectors
  *      entirely unread.
  *   2. RERANK: the top `k*refine` candidates per query are re-scored
  *      EXACTLY in the declared metric via a broadcast join back to
  *      the full vectors. Because the ADC estimate is tight, small
  *      refine factors (2-4) already recover near-exact recall.
  *
  * Quantization bounds are trained per dimension with a distributed
  * min/max [[Aggregator]] — a single narrow pass over the vector
  * column with map-side partial combine (no shuffle of row data), so
  * training bounds at 100 TB costs one column scan. Rows inserted
  * after training whose coordinates escape the trained range clamp to
  * the boundary code (the standard SQ8 saturation contract); the exact
  * re-rank restores their true distances.
  */
object Sq8 {

  val CID = "_cid"
  val CODE = "_sq8"
  val DNORM = "_dnorm"

  /** Trained SQ8 state: IVF centroids for the coarse cells plus
    * per-dimension affine bounds for the 8-bit grid.
    */
  final case class Model(ivf: Ivf.Model, mins: Array[Double],
      maxs: Array[Double]) {
    def dim: Int = mins.length
    def metric: String = ivf.metric

    /** Per-dimension step of the 256-level grid; 0 for dimensions with
      * no spread (every row equal — their code is always 0 and decode
      * returns the exact constant).
      */
    def scales: Array[Double] =
      mins.indices.map(i => (maxs(i) - mins(i)) / 255.0).toArray

    def invScales: Array[Double] =
      scales.map(s => if (s == 0.0) 0.0 else 1.0 / s)

    /** Query mapped into code space for the L2 ADC kernel: zero-span
      * dimensions map to 0 and drop out (rank-neutral, see Sq8AdcL2).
      */
    def qAdjusted(q: Array[Double]): Array[Double] = {
      val inv = invScales
      q.indices.map(i => (q(i) - mins(i)) * inv(i)).toArray
    }

    /** Per-query byte weights for the dot ADC kernel. */
    def dotWeights(q: Array[Double]): Array[Double] = {
      val s = scales
      q.indices.map(i => q(i) * s(i)).toArray
    }

    /** Query-side constant of the refactored dot estimate. */
    def dotConstant(q: Array[Double]): Double =
      q.indices.map(i => q(i) * mins(i)).sum

    /** Squared-norm constant contributed by zero-span dimensions
      * (their `min_i` IS the exact coordinate of every row).
      */
    def dnormConstant: Double =
      mins.indices.collect {
        case i if maxs(i) == mins(i) => mins(i) * mins(i)
      }.sum
  }

  /** Mutable O(dim) aggregation state for [[BoundsAgg]]: kept as a JVM
    * object inside the object-hash aggregate and only encoded at
    * partial-merge boundaries, so per-row updates are in-place array
    * writes.
    */
  final case class Bounds(mins: Array[Double], maxs: Array[Double])

  /** Distributed per-dimension (min, max) over a vector column: a
    * typed Aggregator with O(dim) state — partial combine happens
    * map-side per partition and only the (mins, maxs) pairs merge at
    * the final reduce, so the pass over 100 TB shuffles nothing but
    * per-partition bound pairs.
    */
  private final class BoundsAgg(dim: Int)
      extends Aggregator[Seq[Double], Bounds, Bounds] with Serializable {
    override def zero: Bounds =
      Bounds(Array.fill(dim)(Double.PositiveInfinity),
        Array.fill(dim)(Double.NegativeInfinity))
    override def reduce(b: Bounds, v: Seq[Double]): Bounds = {
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) {
        val x = v(i)
        if (x < b.mins(i)) b.mins(i) = x
        if (x > b.maxs(i)) b.maxs(i) = x
        i += 1
      }
      b
    }
    override def merge(a: Bounds, b: Bounds): Bounds = {
      var i = 0
      while (i < dim) {
        if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
        if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
        i += 1
      }
      a
    }
    override def finish(r: Bounds): Bounds = r
    override def bufferEncoder: Encoder[Bounds] = Encoders.product[Bounds]
    override def outputEncoder: Encoder[Bounds] = Encoders.product[Bounds]
  }

  /** Per-dimension (mins, maxs) of `vecCol` — one narrow distributed
    * pass, no row shuffle.
    */
  def trainBounds(df: DataFrame, vecCol: String,
      dim: Int): (Array[Double], Array[Double]) = {
    val bounds = udaf(new BoundsAgg(dim))
    val row = df
      .select(bounds(col(vecCol).cast("array<double>")).as("b"))
      .select(col("b.mins"), col("b.maxs"))
      .head()
    (row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray)
  }

  /** Train the full SQ8 model: IVF centroids (seeded sample k-means,
    * [[Ivf.train]]) + distributed per-dimension bounds.
    */
  def train(df: DataFrame, vecCol: String, nlist: Int,
      metric: String = "L2", sampleSize: Int = 10000,
      seed: Long = 42L): Model = {
    val ivf = Ivf.train(df, vecCol, k = nlist, sampleSize = sampleSize,
      metric = metric, seed = seed)
    val dim = ivf.centroids(0).length
    val (mins, maxs) = trainBounds(df, vecCol, dim)
    Model(ivf, mins, maxs)
  }

  /** Augment a table with its IVF cell, 8-bit code, and decoded norm.
    * Persist `partitionBy(_cid)` so probe filters prune directories;
    * the code column makes the estimate pass a 4x-narrower scan. The
    * decoded norm (needed only by COSINE estimates) is derived from
    * the code itself via the L2 ADC kernel against the zero vector, so
    * encode stays a single codegen'd projection.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val scaleSq = model.scales.map(s => s * s)
    // |decode(c)|^2 = sum_i (min_i + c_i*scale_i)^2: the L2 ADC kernel
    // with qAdj_i = -min_i/scale_i, plus the zero-span constant.
    val negAdj = model.qAdjusted(Array.fill(model.dim)(0.0))
    val code = Functions.sq8Encode(col(vecCol), model.mins, model.invScales)
    Ivf.assign(df, vecCol, model.ivf)
      .withColumn(CODE, code)
      .withColumn(DNORM, sqrt(
        Functions.sq8AdcL2(col(CODE), typedlit(negAdj.toSeq), scaleSq) +
          lit(model.dnormConstant)))
  }

  /** ADC estimate column for one (query row) against the code column,
    * oriented like the exact metric (larger-is-closer for IP/COSINE).
    */
  private def estimateCol(model: Model, qAdjCol: Column, wCol: Column,
      dotConstCol: Column, qnormCol: Column): (Column, Boolean) = {
    val scaleSq = model.scales.map(s => s * s)
    model.metric.toUpperCase match {
      case "L2" =>
        (Functions.sq8AdcL2(col(CODE), qAdjCol, scaleSq), false)
      case "IP" =>
        (dotConstCol + Functions.sq8AdcDot(col(CODE), wCol), true)
      case "COSINE" =>
        val dot = dotConstCol + Functions.sq8AdcDot(col(CODE), wCol)
        // dnorm 0 (the all-zero decoded vector) scores 0, like vec_cosine.
        ((dot / (qnormCol * col(DNORM))).cast("double"), true)
      case other => throw new IllegalArgumentException(
        s"IVF_SQ8 supports L2/IP/COSINE, not $other")
    }
  }

  /** Batched two-phase search, the [[RaBitQ.search]] contract: queries
    * are driver-side (the reference's nq-batch client shape); each
    * query's probe set and ADC constants ship in one broadcast table,
    * and both phases run as single jobs over the union of probed
    * cells.
    */
  def search(encoded: DataFrame, model: Model,
      queries: Seq[(String, Array[Double])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, refine: Int = 4,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val probes = queries.map { case (qid, qv) =>
      (qid, model.ivf.probes(qv, nprobe).toArray, model.qAdjusted(qv).toSeq,
        model.dotWeights(qv).toSeq, model.dotConstant(qv),
        math.sqrt(qv.map(x => x * x).sum))
    }
    val allCells = probes.flatMap(_._2).distinct
    val probeDf = probes
      .toDF("qid", "_probes", "_qadj", "_w", "_dotc", "_qnorm")
    // Phase 1 — estimate over the probed cells. Catalyst prunes the
    // scan to (cid, id, code[, dnorm]) + any filter columns; the float
    // vector column is never read here.
    val pruned = filter.foldLeft(
      encoded.filter(col(CID).isin(allCells: _*)))(_ filter _)
    val (est, similarityLike) = estimateCol(model, col("_qadj"), col("_w"),
      col("_dotc"), col("_qnorm"))
    val estCols: Seq[Column] =
      Seq(col(CID), col(idCol), col(CODE)) ++
        (if (model.metric.equalsIgnoreCase("COSINE")) Seq(col(DNORM))
         else Seq.empty)
    val scored = pruned.select(estCols: _*)
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_probes"), col(CID)))
      .select(col("qid"), col(idCol), est.as("_est"))
    val r = math.max(k * refine, k)
    val estOrder = if (similarityLike) col("_est").desc else col("_est").asc
    val cand = graft.operators.Knn
      .limitPerQid(scored, "qid", Seq(estOrder, col(idCol).asc), r, "_r")
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
    val (score, simExact) = Functions.metricFor(
      model.metric, encoded.schema(vecCol).dataType, col(vecCol), col("_qvec"))
    val primary = if (simExact) col("score").desc else col("score").asc
    val outCols = (col("qid") +: (idCol +: outputCols).distinct.map(col)) :+
      col("score")
    graft.operators.Knn.limitPerQid(fetched.withColumn("score", score),
        "qid", Seq(primary, col(idCol).asc), k, "_rank")
      .select(outCols: _*)
  }

  /** Single-query convenience wrapper (the collection-search shape). */
  def searchOne(encoded: DataFrame, model: Model, queryVec: Seq[Float],
      vecCol: String, idCol: String, k: Int, nprobe: Int, refine: Int = 4,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame =
    search(encoded, model, Seq(("q0", queryVec.map(_.toDouble).toArray)),
      vecCol, idCol, k, nprobe, refine, filter, outputCols)
      .drop("qid")

  /** Recall@k against exact brute force, averaged over a query set —
    * the index-quality oracle (same contract as [[Ivf.recallAtK]]).
    */
  def recallAtK(data: DataFrame, encoded: DataFrame, model: Model,
      queries: Seq[(Long, Seq[Float])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, refine: Int = 4): Double = {
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
    val exact = graft.operators.Knn
      .search(data, qdf, vecCol, idCol, model.metric, k)
      .select(col("qid").cast("string").as("qid"), col(idCol)).distinct()
    val approx = search(encoded, model,
      queries.map { case (qid, qv) =>
        (qid.toString, qv.map(_.toDouble).toArray)
      }, vecCol, idCol, k, nprobe, refine)
      .select(col("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — nq*k would cap recall below 1.0 when data < k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
