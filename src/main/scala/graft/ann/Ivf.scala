package graft.ann

import graft.Functions
import graft.operators.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF-style ANN acceleration: coarse-quantize every vector to its
  * nearest centroid, search only the `nprobe` closest cells, re-rank
  * exactly with the existing distance expressions.
  *
  * This is the scale path for V1 (reference index types IVF_FLAT /
  * IVF_SQ8 / AUTOINDEX, 2.6/common.py:882-898): brute-force kNN scans
  * the full table per query batch; with IVF the scan touches only
  * ~nprobe/k of the data. The augmented table (`_cid` column) is meant
  * to be persisted `partitionBy("_cid")`, turning the probe filter into
  * directory-level partition pruning at 100 TB.
  *
  * Training is FAISS-shaped: k-means on a driver-side sample
  * (deterministic: seeded sample, first-k init, fixed iterations), so
  * index builds are reproducible.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]], metric: String) {
    def k: Int = centroids.length

    /** Nearest-centroid ids for a query vector, best first. */
    def probes(q: Array[Double], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (dist(q, c), i) }
        .sortBy(_._1).take(nprobe).map(_._2).toSeq

    private def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
  }

  /** Train centroids on a sample (Lloyd's k-means, L2 cell geometry —
    * the standard IVF coarse quantizer for every metric; re-ranking
    * uses the true metric).
    */
  def train(df: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 10000, iters: Int = 10,
      metric: String = "L2", seed: Long = 42L): Model = {
    val n = df.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(n, 1))
    // Sort the collected sample so training is independent of scan
    // partitioning/order — index builds reproduce bit-for-bit anywhere.
    val sample = df.sample(withReplacement = false, fraction, seed)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
      .sortBy(_.mkString(","))
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    Model(kmeans(sample, k, iters), metric)
  }

  /** Lloyd's k-means on a driver-side sample (first-k init, fixed
    * iterations — deterministic). Shared by the IVF coarse quantizer
    * and the per-subspace PQ codebooks ([[Pq.train]]).
    */
  private[ann] def kmeans(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = sample.take(k).map(_.clone)
    val dim = centroids(0).length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var s = 0.0
      var i = 0
      val cc = centroids(c)
      while (i < v.length) { val d = v(i) - cc(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** `(distance, cid)` structs for every centroid, nearest first. The
    * centroid matrix is ONE 2-D literal looped by `transform`, so the
    * expression tree stays O(1) in nlist — the previous shape (an
    * unrolled nlist-way `array()` of distance subtrees) grew linearly
    * and pushed large-nlist projections out of whole-stage codegen
    * (observed 4× slowdown going 16→32 cells at constant work).
    */
  private def sortedCells(model: Model, vec: Column): Column = {
    val cents = typedlit(model.centroids.map(_.toSeq).toSeq)
    array_sort(zip_with(cents, sequence(lit(0), lit(model.k - 1)),
      (c, i) => struct(Functions.vecL2(vec, c).as("d"), i.as("cid"))))
  }

  /** Column computing the nearest-centroid id of `vec` — a single
    * codegen'd projection, no join, no shuffle.
    */
  def cellId(model: Model, vec: Column): Column =
    element_at(sortedCells(model, vec), 1).getField("cid")

  /** `struct(d, cid)` of the nearest centroid — the assignment AND its
    * distance from one projection (no second distance pass). Feeds the
    * prototypicality ranking in [[graft.dedup.SemDedup]].
    */
  def nearestCell(model: Model, vec: Column): Column =
    element_at(sortedCells(model, vec), 1)

  /** Augment a table with its IVF cell assignment. Persist this
    * `partitionBy("_cid")` to get pruning on disk.
    */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("_cid", cellId(model, col(vecCol)))

  /** Per-row probe set: the `nprobe` nearest cell ids of `vec`, as an
    * array column — a single codegen'd projection (array_sort over
    * nlist (dist, cid) structs), no join, no shuffle.
    */
  def probeCells(model: Model, vec: Column, nprobe: Int): Column =
    transform(slice(sortedCells(model, vec), 1, nprobe),
      s => s.getField("cid"))

  /** ANN self-join: EVERY row is a query (the reference's all-pairs
    * kNN bench shape). Instead of broadcasting the full table as the
    * query side and scoring all N² pairs, each query row explodes to
    * its `nprobe` probe cells and equi-joins the cell-assigned data —
    * a plain shuffle join on the cell id that scores only
    * ~nprobe/nlist of the pairs and never broadcasts anything. At
    * 1000 executors this is the only shape that survives: both sides
    * hash-partition on the cell id, and per-qid top-k goes through the
    * same partial WindowGroupLimit as batched search.
    *
    * Results are exact within the probed cells (recall <1 only from
    * cell misses; raise `nprobe` to trade time for recall).
    */
  def selfJoin(df: DataFrame, model: Model, vecCol: String, idCol: String,
      k: Int, nprobe: Int, includeSelf: Boolean = true): DataFrame = {
    val assigned = assign(df, vecCol, model)
    val queries = df
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("_probe", explode(probeCells(model, col("qvec"), nprobe)))
    val (score, similarityLike) = Functions.metricFor(
      model.metric, df.schema(vecCol).dataType, col(vecCol), col("qvec"))
    // Hash join, not sort-merge: the equi-key is a low-cardinality
    // cell id — sorting millions of scored pairs on it buys nothing.
    val scored0 = assigned.join(queries.hint("shuffle_hash"),
        col("_cid") === col("_probe"))
      .select(col("qid"), col(idCol), score.as("score"))
    val scored =
      if (includeSelf) scored0 else scored0.filter(col("qid") =!= col(idCol))
    val primary = if (similarityLike) col("score").desc else col("score").asc
    Knn.limitPerQid(scored, "qid", Seq(primary, col(idCol).asc), k)
  }

  /** ANN top-k for one query: probe `nprobe` cells, exact re-rank
    * inside them (existing Knn machinery — results are exact within the
    * probed cells).
    */
  def searchOne(assigned: DataFrame, model: Model, queryVec: Seq[Float],
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val q = queryVec.map(_.toDouble).toArray
    val cells = model.probes(q, nprobe)
    val pruned = assigned.filter(col("_cid").isin(cells: _*))
    Knn.searchOne(pruned, queryVec, vecCol, idCol, model.metric, k,
      filter, outputCols)
  }

  /** Batched ANN search: per-query probe cells, one pass over the
    * union of probed cells with a per-pair cell-membership guard, then
    * the standard batched exact top-k. The scan touches only cells
    * probed by SOME query (partition-pruned when `_cid` is a physical
    * partition), and each (row, query) pair is scored only when the
    * row's cell is in that query's probe set.
    */
  def search(assigned: DataFrame, model: Model, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    // nq is small (the reference's batch shape): probe cells computed
    // driver-side per query, shipped with the broadcast query table.
    val qRows = queries.select(col(qidCol), col(qvecCol).cast("array<double>"))
      .collect()
      .map(r => (r.get(0).toString, r.getSeq[Double](1).toArray))
    val probes = qRows.map { case (qid, qv) =>
      (qid, qv, model.probes(qv, nprobe).toArray)
    }.toSeq
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("_qid_str", qvecCol, "_probes")
    // Scan only cells probed by some query; guard each (row, query)
    // pair on that query's probe set BEFORE scoring/ranking.
    val pruned = filter.foldLeft(
      assigned.filter(col("_cid").isin(allCells: _*)))(_ filter _)
    val (score, similarityLike) = graft.Functions.metricFor(
      model.metric, assigned.schema(vecCol).dataType, col(vecCol), col(qvecCol))
    val cols = (idCol +: outputCols).distinct.map(col)
    val scored = pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_probes"), col("_cid")))
      .select((col("_qid_str").as(qidCol) +: cols) :+ score.as("score"): _*)
    val primary = if (similarityLike) col("score").desc else col("score").asc
    Knn.limitPerQid(scored, qidCol, Seq(primary, col(idCol).asc), k)
  }

  /** Per-cell pruning bounds for exact range search, one hash-agg pass
    * over the assigned table (nlist quadruples to the driver — bounded
    * by the centroid count, never the data):
    *   - `radii`: max TRUE-L2 member-to-centroid distance (the L2
    *     triangle-inequality bound),
    *   - `angles`: max member-to-centroid angle in radians (the
    *     spherical triangle-inequality bound COSINE and IP use),
    *   - `maxNorm`/`minNorm`: member L2-norm extrema (IP = norm x
    *     angle decomposition: s = |x||q|cos θ).
    * Cells with no members read 0 (and minNorm 0) — conservative.
    */
  final case class CellBounds(radii: Array[Double], angles: Array[Double],
      maxNorm: Array[Double], minNorm: Array[Double])

  def cellBounds(assigned: DataFrame, vecCol: String,
      model: Model): CellBounds = {
    val cents = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
    val spark = assigned.sparkSession
    import spark.implicits._
    val cdf = cents.toDF("_rcid", "_centroid")
    val (d2, _) = Functions.metricFor("L2",
      assigned.schema(vecCol).dataType, col(vecCol), col("_centroid"))
    val (cos, _) = Functions.metricFor("COSINE",
      assigned.schema(vecCol).dataType, col(vecCol), col("_centroid"))
    val ang = acos(greatest(lit(-1.0), least(lit(1.0), cos)))
    val nrm = Functions.vecNorm(col(vecCol))
    val rows = assigned
      .join(broadcast(cdf), col("_cid").cast("int") === col("_rcid"))
      .groupBy(col("_cid").cast("int").as("_c"))
      .agg(max(d2).as("rmax"), max(ang).as("amax"),
        max(nrm).as("nmax"), min(nrm).as("nmin"))
      .collect()
    val b = CellBounds(new Array(model.k), new Array(model.k),
      new Array(model.k), new Array(model.k))
    rows.foreach { r =>
      b.radii(r.getInt(0)) = r.getDouble(1)
      b.angles(r.getInt(0)) = r.getDouble(2)
      b.maxNorm(r.getInt(0)) = r.getDouble(3)
      b.minNorm(r.getInt(0)) = r.getDouble(4)
    }
    b
  }

  /** [[cellBounds]]'s L2 slice, for callers that only need the radii. */
  def cellRadii(assigned: DataFrame, vecCol: String,
      model: Model): Array[Double] = cellBounds(assigned, vecCol, model).radii

  /** EXACT cell-pruned range search (Milvus `radius`/`range_filter`
    * bounds, L2 only): a cell whose centroid satisfies
    * `d(q, c_i) - rmax_i > radius` can hold no qualifying point
    * (triangle inequality: d(q, x) >= d(q, c_i) - d(c_i, x) >=
    * d(q, c_i) - rmax_i), so only the surviving cells are scanned —
    * directory-pruned when `_cid` is a physical partition — and the
    * exact score filter runs inside them. Unlike probe-budget ANN this
    * is EXACT: pruning discards only provably-out-of-range cells.
    * Bounds are the reference's: `range_filter <= d < radius`.
    */
  def rangeSearch(assigned: DataFrame, model: Model,
      radii: Array[Double], queries: Seq[(String, Seq[Float])],
      vecCol: String, idCol: String, radius: Double,
      rangeFilter: Option[Double] = None,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    require(model.metric.toUpperCase == "L2",
      s"cell-pruned range search is L2-only, got ${model.metric}")
    val spark = assigned.sparkSession
    import spark.implicits._
    val probes = queries.map { case (qid, qv) =>
      val q = qv.map(_.toDouble).toArray
      val allowed = model.centroids.indices.filter { i =>
        val qc = math.sqrt(sq2(q, model.centroids(i)))
        // Both band edges prune: a cell below the lower bound entirely
        // (max possible distance < range_filter) holds no result either.
        // The 1e-9 slack on BOTH edges (the cosine/IP routes'
        // convention) keeps the prune strictly conservative against
        // ulp drift between this driver-side sqrt and the build's SQL
        // distance — the exact in-cell score filter discards any
        // extra admitted rows.
        qc - radii(i) <= radius + 1e-9 &&
          rangeFilter.forall(rf => qc + radii(i) >= rf - 1e-9)
      }
      (qid, qv.map(_.toDouble), allowed.toArray)
    }
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("_qid_str", "qvec", "_allowed")
    val pruned = filter.foldLeft(
      assigned.filter(col("_cid").isin(allCells: _*)))(_ filter _)
    val (score, _) = Functions.metricFor("L2",
      assigned.schema(vecCol).dataType, col(vecCol), col("qvec"))
    val cols = (idCol +: outputCols).distinct.map(col)
    val lower = rangeFilter.map(f => col("score") >= lit(f)).getOrElse(lit(true))
    pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_allowed"), col("_cid")))
      .select((col("_qid_str").as("qid") +: cols) :+ score.as("score"): _*)
      .filter(col("score") < lit(radius) && lower)
  }

  /** EXACT cell-pruned COSINE range search (Milvus similarity-metric
    * bounds: `radius < s <= range_filter`). Cosine similarity itself
    * violates the triangle inequality, but the ANGLE does (spherical
    * triangle inequality: θ(q, x) >= θ(q, c_i) − θ(c_i, x)), so with
    * the per-cell max member angle amax_i a cell is provably
    * out-of-band when cos(max(0, θ(q, c_i) − amax_i)) <= radius —
    * every member's similarity is at most that. A small angular slack
    * absorbs acos ulp drift between the build's SQL acos and the
    * driver's, keeping the prune strictly conservative. The exact
    * score filter runs inside surviving cells, so the result is EXACT.
    */
  def rangeSearchCosine(assigned: DataFrame, model: Model,
      angles: Array[Double], queries: Seq[(String, Seq[Float])],
      vecCol: String, idCol: String, radius: Double,
      rangeFilter: Option[Double] = None,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val slack = 1e-6
    val probes = queries.map { case (qid, qv) =>
      val q = qv.map(_.toDouble).toArray
      val allowed = model.centroids.indices.filter { i =>
        val qc = math.acos(math.max(-1.0, math.min(1.0,
          cosineSim(q, model.centroids(i)))))
        // Both band edges prune: max possible similarity must clear
        // `radius`, min possible must not clear `range_filter`.
        math.cos(math.max(0.0, qc - angles(i) - slack)) > radius &&
          rangeFilter.forall(rf =>
            math.cos(math.min(math.Pi, qc + angles(i) + slack))
              <= rf + 1e-9)
      }
      (qid, qv.map(_.toDouble), allowed.toArray)
    }
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("_qid_str", "qvec", "_allowed")
    val pruned = filter.foldLeft(
      assigned.filter(col("_cid").isin(allCells: _*)))(_ filter _)
    val (score, _) = Functions.metricFor("COSINE",
      assigned.schema(vecCol).dataType, col(vecCol), col("qvec"))
    val cols = (idCol +: outputCols).distinct.map(col)
    val upper = rangeFilter.map(f => col("score") <= lit(f)).getOrElse(lit(true))
    pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_allowed"), col("_cid")))
      .select((col("_qid_str").as("qid") +: cols) :+ score.as("score"): _*)
      .filter(col("score") > lit(radius) && upper)
  }

  /** EXACT cell-pruned IP range search (similarity bounds:
    * `radius < s <= range_filter`). Inner product has no triangle
    * inequality, but it DECOMPOSES: s(q, x) = |q|·|x|·cos θ(q, x),
    * the angle obeys the spherical triangle inequality, and per-cell
    * norm extrema bound |x| — so each cell gets provable s bounds:
    *   max_s = |q| · (cosMax >= 0 ? maxNorm·cosMax : minNorm·cosMax)
    *   min_s = |q| · (cosMin >= 0 ? minNorm·cosMin : maxNorm·cosMin)
    * with cosMax/cosMin = cos of the angle interval
    * [max(0, θqc − amax), min(π, θqc + amax)]. A cell prunes when
    * max_s <= radius OR min_s > range_filter — both lossless, so the
    * result is EXACT.
    */
  def rangeSearchIp(assigned: DataFrame, model: Model,
      bounds: CellBounds, queries: Seq[(String, Seq[Float])],
      vecCol: String, idCol: String, radius: Double,
      rangeFilter: Option[Double] = None,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val slack = 1e-6
    val probes = queries.map { case (qid, qv) =>
      val q = qv.map(_.toDouble).toArray
      val qn = math.sqrt(q.map(v => v * v).sum)
      val allowed = model.centroids.indices.filter { i =>
        val qc = math.acos(math.max(-1.0, math.min(1.0,
          cosineSim(q, model.centroids(i)))))
        val cosMax = math.cos(math.max(0.0, qc - bounds.angles(i) - slack))
        val cosMin = math.cos(math.min(math.Pi, qc + bounds.angles(i) + slack))
        val maxS = qn * (if (cosMax >= 0) bounds.maxNorm(i) * cosMax
                         else bounds.minNorm(i) * cosMax)
        val minS = qn * (if (cosMin >= 0) bounds.minNorm(i) * cosMin
                         else bounds.maxNorm(i) * cosMin)
        maxS > radius - 1e-9 &&
          rangeFilter.forall(rf => minS <= rf + 1e-9)
      }
      (qid, qv.map(_.toDouble), allowed.toArray)
    }
    val allCells = probes.flatMap(_._3).distinct
    val probeDf = probes.toDF("_qid_str", "qvec", "_allowed")
    val pruned = filter.foldLeft(
      assigned.filter(col("_cid").isin(allCells: _*)))(_ filter _)
    val (score, _) = Functions.metricFor("IP",
      assigned.schema(vecCol).dataType, col(vecCol), col("qvec"))
    val cols = (idCol +: outputCols).distinct.map(col)
    val upper = rangeFilter.map(f => col("score") <= lit(f)).getOrElse(lit(true))
    pruned
      .crossJoin(broadcast(probeDf))
      .filter(array_contains(col("_allowed"), col("_cid")))
      .select((col("_qid_str").as("qid") +: cols) :+ score.as("score"): _*)
      .filter(col("score") > lit(radius) && upper)
  }

  private def cosineSim(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  private def sq2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Recall@k of the ANN path against exact brute force, averaged over
    * a query set (the standard index-quality oracle).
    */
  def recallAtK(data: DataFrame, assigned: DataFrame, model: Model,
      queries: Seq[(Long, Seq[Float])], vecCol: String, idCol: String,
      k: Int, nprobe: Int): Double = {
    // Batched: ONE exact top-k job and ONE ANN top-k job over the whole
    // query set, semi-joined on (qid, id). sum(|exact ∩ approx|)/(nq·k)
    // equals the per-query recall average — the old per-query driver
    // loop ran 2·nq jobs for the same number.
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
    // distinct() keeps the metric the set-intersection |exact ∩ approx|
    // even if duplicate ids put the same (qid, id) in the top-k twice.
    val exact = Knn.search(data, qdf, vecCol, idCol, model.metric, k)
      .select(col("qid").cast("string").as("qid"), col(idCol)).distinct()
    val approx = search(assigned, model, qdf, vecCol, idCol, k, nprobe)
      .select(col("qid").cast("string").as("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — nq*k would cap recall below 1.0 when data < k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
