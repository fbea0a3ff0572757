package graft.ann

import graft.Functions
import graft.operators.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** BIN_IVF_FLAT — IVF cells over BINARY_VECTOR columns (reference
  * index type BIN_IVF_FLAT, go_bench/config.yaml:8,
  * milvus_client/common/workload.py:148 maps its nprobe search param;
  * schema manifest accepts it, tests/test_schema_manifest.py:111).
  *
  * The float-IVF structure ([[Ivf]]) carries over unchanged — coarse
  * cells, probe-pruned scans, exact in-cell ranking — but the
  * geometry is Hamming space, so the coarse quantizer is k-MAJORITY
  * (k-modes) instead of k-means: centroids are bit strings, a sample
  * vector joins its nearest centroid by Hamming distance, and each
  * centroid bit updates to the majority vote of its members' bits
  * (the binary analog of the mean; FAISS's IndexBinaryIVF trains the
  * same way). Training is deterministic: seeded sample, sorted,
  * first-k init, fixed iterations — index builds reproduce
  * bit-for-bit anywhere.
  *
  * Cell assignment is a single codegen'd projection (the centroid
  * list is ONE array<binary> literal looped by `zip_with`, O(1)
  * expression-tree size in nlist — the [[Ivf.sortedCells]] lesson).
  * Persist the assigned table `partitionBy(_cid)` and the probe
  * filter prunes whole cell directories at 100 TB. In-cell ranking
  * uses the exact codegen'd [[graft.Functions.hammingDistance]] —
  * with 1-bit-per-dimension vectors there is nothing to quantize
  * further, hence FLAT in-cell storage (the reference offers no
  * BIN_IVF_SQ8 either).
  */
object BinIvf {

  val CID = "_cid"

  final case class Model(centroids: Array[Array[Byte]]) {
    def k: Int = centroids.length
    def nbytes: Int = centroids(0).length

    /** Nearest-centroid ids for a query, best first (ties by cid —
      * the same (distance, cid) order `cellId`'s array_sort uses).
      */
    def probes(q: Array[Byte], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (hamming(q, c), i) }
        .sortBy(identity).take(nprobe).map(_._2).toSeq

    def nearest(q: Array[Byte]): Int = probes(q, 1).head
  }

  private def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    s
  }

  /** Train k-majority centroids on a seeded driver-side sample.
    * Majority ties (exactly half the members set the bit) resolve to
    * 1 — any fixed rule works; this one is deterministic.
    */
  def train(df: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 10000, iters: Int = 10, seed: Long = 42L): Model = {
    val n = df.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(n, 1))
    val sample = df.sample(withReplacement = false, fraction, seed)
      .select(col(vecCol))
      .collect().map(_.getAs[Array[Byte]](0))
      .sortBy(v => v.map(b => f"${b & 0xff}%02x").mkString)
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    val nbytes = sample(0).length
    var centroids = sample.take(k).map(_.clone)
    (0 until iters).foreach { _ =>
      // Per-cluster, per-bit one-counts + member counts.
      val ones = Array.fill(k)(new Array[Long](nbytes * 8))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          val d = hamming(v, centroids(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var bit = 0
        while (bit < nbytes * 8) {
          if (((v(bit >> 3) >> (7 - (bit & 7))) & 1) == 1) ones(best)(bit) += 1
          bit += 1
        }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val nc = new Array[Byte](nbytes)
          var bit = 0
          while (bit < nbytes * 8) {
            if (ones(c)(bit) * 2 >= counts(c))
              nc(bit >> 3) = (nc(bit >> 3) | (1 << (7 - (bit & 7)))).toByte
            bit += 1
          }
          nc
        }
      }
    }
    Model(centroids)
  }

  /** `(distance, cid)` structs for every centroid, nearest first —
    * one array<binary> literal looped by `zip_with`, O(1) tree size.
    */
  private def sortedCells(model: Model, vec: Column): Column = {
    val cents = typedlit(model.centroids.toSeq)
    array_sort(zip_with(cents, sequence(lit(0), lit(model.k - 1)),
      (c, i) => struct(Functions.hammingDistance(vec, c).as("d"),
        i.as("cid"))))
  }

  /** Nearest-centroid id of `vec` — a single codegen'd projection. */
  def cellId(model: Model, vec: Column): Column =
    element_at(sortedCells(model, vec), 1).getField("cid")

  /** Augment a table with its cell assignment; persist
    * `partitionBy(_cid)` for directory pruning.
    */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn(CID, cellId(model, col(vecCol)))

  /** Exact Hamming top-k within the probed cells (results exact up to
    * cell misses; `nprobe = nlist` probes everything and IS exact).
    */
  def searchOne(assigned: DataFrame, model: Model, queryBytes: Array[Byte],
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val cells = model.probes(queryBytes, nprobe)
    val pruned = assigned.filter(col(CID).isin(cells: _*))
    Knn.searchOneBinary(pruned, queryBytes, vecCol, idCol, k, filter,
      outputCols)
  }

  /** Batched search: per-query probe sets ship in one broadcast table,
    * one pass over the union of probed cells with a per-pair
    * cell-membership guard (the [[Ivf.search]] shape).
    */
  def search(assigned: DataFrame, model: Model,
      queries: Seq[(String, Array[Byte])], vecCol: String, idCol: String,
      k: Int, nprobe: Int, filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probes = queries.map { case (qid, qv) =>
      (qid, qv, model.probes(qv, nprobe).toArray)
    }
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("qid", "_qbytes", "_probes")
    val pruned = filter.foldLeft(
      assigned.filter(col(CID).isin(allCells: _*)))(_ filter _)
    val cols = (idCol +: outputCols).distinct.map(col)
    val scored = pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_probes"), col(CID)))
      .select((col("qid") +: cols) :+
        Functions.hammingDistance(col(vecCol), col("_qbytes"))
          .as("score"): _*)
    Knn.limitPerQid(scored, "qid", Seq(col("score").asc, col(idCol).asc), k)
  }

  /** Per-cell max Hamming distance from a member to its own centroid —
    * the exact range-search pruning bound (Hamming IS a metric, so the
    * triangle inequality holds with no caveats). One hash-agg pass
    * over the assigned table; nlist longs to the driver.
    */
  def cellRadii(assigned: DataFrame, vecCol: String,
      model: Model): Array[Long] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cdf = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("_rcid", "_centroid")
    val rows = assigned
      .join(broadcast(cdf), col(CID).cast("int") === col("_rcid"))
      .groupBy(col(CID).cast("int").as("_c"))
      .agg(max(Functions.hammingDistance(col(vecCol), col("_centroid")))
        .as("rmax"))
      .collect()
    val out = new Array[Long](model.k)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** EXACT cell-pruned Hamming range search (distance bounds, the L2
    * direction: `range_filter <= d < radius`). A cell with
    * d(q, c_i) − rmax_i >= radius provably holds no in-band point
    * (d(q, x) >= d(q, c_i) − d(c_i, x)), so only surviving cells scan
    * — directory-pruned when `_cid` is a physical partition — and the
    * exact Hamming filter runs inside them. Pruning is lossless.
    */
  def rangeSearch(assigned: DataFrame, model: Model, radii: Array[Long],
      queries: Seq[(String, Array[Byte])], vecCol: String, idCol: String,
      radius: Double, rangeFilter: Option[Double] = None,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probes = queries.map { case (qid, qb) =>
      val allowed = model.centroids.indices.filter { i =>
        val qc = hamming(qb, model.centroids(i))
        // Both band edges prune: a cell below the lower bound entirely
        // (max possible distance < range_filter) holds no result either.
        qc - radii(i) < radius &&
          rangeFilter.forall(rf => qc + radii(i) >= rf)
      }
      (qid, qb, allowed.toArray)
    }
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("qid", "_qbytes", "_allowed")
    val pruned = filter.foldLeft(
      assigned.filter(col(CID).isin(allCells: _*)))(_ filter _)
    val cols = (idCol +: outputCols).distinct.map(col)
    val lower = rangeFilter.map(f => col("score") >= lit(f)).getOrElse(lit(true))
    pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_allowed"), col(CID)))
      .select((col("qid") +: cols) :+
        Functions.hammingDistance(col(vecCol), col("_qbytes"))
          .as("score"): _*)
      .filter(col("score") < lit(radius) && lower)
  }

  /** Recall@k vs exact brute force over a query set — batched (ONE
    * exact job + ONE probed job, semi-joined), the [[Ivf.recallAtK]]
    * contract.
    */
  def recallAtK(data: DataFrame, assigned: DataFrame, model: Model,
      queries: Seq[(Long, Array[Byte])], vecCol: String, idCol: String,
      k: Int, nprobe: Int): Double = {
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.map { case (qid, qb) => (qid.toString, qb) }
      .toDF("qid", "_qbytes")
    val exact = Knn.limitPerQid(
        data.crossJoin(broadcast(qdf))
          .select(col("qid"), col(idCol),
            Functions.hammingDistance(col(vecCol), col("_qbytes"))
              .as("score")),
        "qid", Seq(col("score").asc, col(idCol).asc), k)
      .select(col("qid"), col(idCol)).distinct()
    val approx = search(assigned, model,
      queries.map { case (qid, qb) => (qid.toString, qb) },
      vecCol, idCol, k, nprobe)
      .select(col("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — nq*k would cap recall below 1.0 when data < k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
