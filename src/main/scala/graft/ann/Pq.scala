package graft.ann

import graft.Functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF_PQ — IVF coarse cells + residual product-quantization codes
  * (FAISS IndexIVFPQ, Jégou et al. TPAMI'11, is the public ancestor;
  * Milvus exposes the same family as index type IVF_PQ). The memory
  * play at 100 TB: an m-byte code per vector (dim=16/m=8 → 1/8 of the
  * float bytes; dim=768/m=96 → 1/32) makes the candidate-generation
  * scan read a few percent of the vector data, with recall restored by
  * an exact re-rank of the survivors.
  *
  * Search is the same two-phase shape as [[Sq8]]:
  *
  *   1. ESTIMATE (ADC): per (query, probed cell) the driver builds a
  *      lookup table — `lut[j·ksub + c]` = the subspace-j partial
  *      squared distance between the query's residual against THAT
  *      cell's centroid and codeword c — so the per-row kernel is `m`
  *      array lookups on the byte code ([[graft.Functions.pqAdcLut]],
  *      codegen'd), no decode, no multiply. The probe table
  *      (nq × nprobe rows, each with an m·ksub-double LUT) broadcasts
  *      and equi-joins the scan on the cell id — rows join ONLY the
  *      LUTs of their own cell, which is what makes residual encoding
  *      (more accurate than raw-vector PQ) compose with batching.
  *   2. RERANK: top `k·refine` candidates per query re-scored exactly
  *      in the declared metric via a broadcast candidate join back to
  *      the full vectors, identical to the [[Sq8]] phase 2.
  *
  * For IP/COSINE the estimate refactors as `dot(q, x) ≈ dot(q, c_cell)
  * + dot(q_res, decode(code))`: the first term is a per-(query, cell)
  * constant in the probe table, the second the same LUT kernel with
  * dot entries; COSINE divides by the EXACT stored row norm (a better
  * denominator than a reconstructed norm, at one double per row).
  *
  * Training is FAISS-shaped and deterministic: the coarse quantizer is
  * [[Ivf.train]]; each subspace's `ksub` codewords come from k-means
  * over the sample's residual sub-vectors (seeded sample, first-k
  * init, fixed iterations).
  */
object Pq {

  val CID = "_cid"
  val CODE = "_pq"
  val NORM = "_pqnorm"

  /** Trained IVF_PQ state: coarse centroids + per-subspace codebooks
    * (`codebook(j)(c)` is codeword c of subspace j, length dsub).
    */
  final case class Model(ivf: Ivf.Model,
      codebook: Array[Array[Array[Double]]]) {
    def m: Int = codebook.length
    def ksub: Int = codebook(0).length
    def dsub: Int = codebook(0)(0).length
    def dim: Int = m * dsub
    def metric: String = ivf.metric

    /** Codebook flattened [m][ksub][dsub] row-major (expression state
      * for the encode kernel).
      */
    def flat: Array[Double] = {
      val out = new Array[Double](m * ksub * dsub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          System.arraycopy(codebook(j)(c), 0, out, (j * ksub + c) * dsub, dsub)
          c += 1
        }
        j += 1
      }
      out
    }

    /** Squared-L2 ADC table for query `q` against cell `cell`:
      * entry (j, c) = || (q - centroid_cell)_subj - codeword(j, c) ||².
      */
    def lutL2(q: Array[Double], cell: Int): Array[Double] = {
      val cent = ivf.centroids(cell)
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          var s = 0.0
          var i = 0
          val cw = codebook(j)(c)
          while (i < dsub) {
            val xi = j * dsub + i
            val d = (q(xi) - cent(xi)) - cw(i)
            s += d * d
            i += 1
          }
          out(j * ksub + c) = s
          c += 1
        }
        j += 1
      }
      out
    }

    /** Dot ADC table: entry (j, c) = dot(q_subj, codeword(j, c)) —
      * query-only, shared by every cell.
      */
    def lutDot(q: Array[Double]): Array[Double] = {
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          var s = 0.0
          var i = 0
          val cw = codebook(j)(c)
          while (i < dsub) { s += q(j * dsub + i) * cw(i); i += 1 }
          out(j * ksub + c) = s
          c += 1
        }
        j += 1
      }
      out
    }

    /** dot(q, centroid_cell) — the per-(query, cell) constant of the
      * refactored dot estimate.
      */
    def dotCentroid(q: Array[Double], cell: Int): Double = {
      val cent = ivf.centroids(cell)
      var s = 0.0
      var i = 0
      while (i < dim) { s += q(i) * cent(i); i += 1 }
      s
    }
  }

  /** Train coarse centroids + per-subspace residual codebooks on one
    * seeded sample. `dim` must divide into `m` equal subspaces.
    */
  def train(df: DataFrame, vecCol: String, nlist: Int, m: Int,
      ksub: Int = 256, metric: String = "L2", sampleSize: Int = 10000,
      iters: Int = 10, seed: Long = 42L): Model = {
    // ONE seeded sample draw (sorted for layout independence) trains
    // both the coarse quantizer and the subspace codebooks — the same
    // centroids Ivf.train would produce, without a second count +
    // collect over the table.
    val n = df.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(n, 1))
    val sample = df.sample(withReplacement = false, fraction, seed)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
      .sortBy(_.mkString(","))
    require(sample.length >= nlist,
      s"sample ${sample.length} smaller than nlist=$nlist")
    val ivf = Ivf.Model(Ivf.kmeans(sample, nlist, iters), metric)
    val dim = ivf.centroids(0).length
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    val residuals = sample.map { v =>
      val cell = ivf.probes(v, 1).head
      val cent = ivf.centroids(cell)
      v.indices.map(i => v(i) - cent(i)).toArray
    }
    val kk = math.min(ksub, residuals.length)
    require(kk > 0, "empty training sample")
    val codebook = (0 until m).map { j =>
      val subs = residuals.map(_.slice(j * dsub, (j + 1) * dsub))
      val cents = Ivf.kmeans(subs, kk, iters)
      // Pad degenerate codebooks (sample smaller than ksub) by
      // repeating the last codeword — codes stay valid bytes.
      (cents ++ Array.fill(ksub - kk)(cents.last)).toArray
    }.toArray
    Model(ivf, codebook)
  }

  /** Augment a table with its coarse cell, m-byte PQ code of the
    * residual, and exact vector norm (COSINE denominator). Persist
    * `partitionBy(_cid)` so probe filters prune directories. One
    * codegen'd projection — the encode kernel reads the centroid
    * matrix and codebook as shared expression state.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val cents = typedlit(model.ivf.centroids.map(_.toSeq).toSeq)
    val assigned = Ivf.assign(df, vecCol, model.ivf)
    val center = element_at(cents, col(CID) + 1)
    assigned
      .withColumn(CODE,
        Functions.pqEncode(col(vecCol), center, model.flat, model.m, model.ksub))
      .withColumn(NORM, sqrt(Functions.vecDot(col(vecCol), col(vecCol))))
  }

  /** Batched two-phase IVF_PQ search (the [[Sq8.search]] contract):
    * driver-side queries, per-(query, probed cell) ADC tables in one
    * broadcast probe table equi-joined on the cell id, salted per-qid
    * top-k, exact re-rank of `k·refine` candidates.
    */
  def search(encoded: DataFrame, model: Model,
      queries: Seq[(String, Array[Double])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, refine: Int = 4,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val isL2 = model.metric.equalsIgnoreCase("L2")
    val isCosine = model.metric.equalsIgnoreCase("COSINE")
    // One probe-table row per (query, probed cell): the L2 LUT is
    // cell-dependent (residuals), the dot LUT is query-only but rides
    // the same row for one uniform join shape.
    val probes = queries.flatMap { case (qid, qv) =>
      val qnorm = math.sqrt(qv.map(x => x * x).sum)
      model.ivf.probes(qv, nprobe).map { cell =>
        val lut =
          if (isL2) model.lutL2(qv, cell)
          else model.lutDot(qv)
        (qid, cell, lut.toSeq, model.dotCentroid(qv, cell), qnorm)
      }
    }
    val allCells = probes.map(_._2).distinct
    val probeDf = probes.toDF("qid", "_pcell", "_lut", "_dotc", "_qnorm")
    // Phase 1 — ADC estimate over the probed cells: the scan reads
    // (cid, id, code[, norm]) only; rows equi-join their own cell's
    // LUT rows from the broadcast probe table.
    val pruned = filter.foldLeft(
      encoded.filter(col(CID).isin(allCells: _*)))(_ filter _)
    val adc = Functions.pqAdcLut(col(CODE), col("_lut"), model.ksub)
    val (est, similarityLike) =
      if (isL2) (adc, false)
      else if (isCosine)
        ((col("_dotc") + adc) / (col("_qnorm") * col(NORM)), true)
      else (col("_dotc") + adc, true)
    val estCols: Seq[Column] =
      Seq(col(CID), col(idCol), col(CODE)) ++
        (if (isCosine) Seq(col(NORM)) else Seq.empty)
    val scored = pruned.select(estCols: _*)
      .join(broadcast(probeDf), col(CID) === col("_pcell"))
      .select(col("qid"), col(idCol), est.as("_est"))
    val r = math.max(k * refine, k)
    val estOrder = if (similarityLike) col("_est").desc else col("_est").asc
    val cand = graft.operators.Knn
      .limitPerQid(scored, "qid", Seq(estOrder, col(idCol).asc), r, "_r")
      .select(col("qid"), col(idCol).as("_cand_id"))
    // Phase 2 — exact re-rank of the candidates only (see Sq8.search
    // for why the user filter is not re-applied here).
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
    * the index-quality oracle (same contract as [[Sq8.recallAtK]]).
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
