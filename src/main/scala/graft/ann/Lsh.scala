package graft.ann

import graft.Functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Random-hyperplane (sign) LSH ANN for angular metrics — the
  * LSH-bucketed similarity-search scale path alongside [[Ivf]]
  * (reference ANN surface: 2.6/common.py:882-898; public algorithm:
  * Charikar, STOC'02 SimHash rounding).
  *
  * Each of `tables` independent hash tables assigns a row the packed
  * sign bits of `numPlanes` Gaussian hyperplane dot products. Two
  * vectors at angle θ agree on one plane with probability 1 − θ/π, so
  * bucket collisions concentrate near-neighbors; multiple tables trade
  * memory for recall the standard way.
  *
  * Unlike IVF there is no training scan: hyperplanes are
  * data-independent, seeded, and reproducible — an empty-table index
  * build, which is exactly what you want when the 100 TB corpus
  * arrives incrementally (no retrain, signatures are append-only).
  *
  * Scale shape mirrors [[Ivf.search]]: signatures are one codegen'd
  * projection per row, queries broadcast their multiprobe sets, and
  * the candidate guard runs BEFORE any distance is scored. A declared
  * LSH index persists the [[explodeTables]] layout through
  * `IndexStore.ensureLsh` — `partitionBy("_t", "_sig")` — so a routed
  * search scans only its probed bucket directories
  * ([[searchOnePersisted]]).
  */
object Lsh {

  /** `planes(t)(p)` is hyperplane p of table t. */
  final case class Model(planes: Array[Array[Array[Double]]], metric: String) {
    def tables: Int = planes.length
    def numPlanes: Int = planes(0).length
    def dim: Int = planes(0)(0).length

    /** Packed sign signature of `v` in table `t`. */
    def signature(v: Array[Double], t: Int): Int = {
      var sig = 0
      var p = 0
      while (p < numPlanes) {
        var s = 0.0
        var i = 0
        val h = planes(t)(p)
        val n = math.min(v.length, h.length)
        while (i < n) { s += v(i) * h(i); i += 1 }
        if (s >= 0) sig |= 1 << p
        p += 1
      }
      sig
    }

    /** Multiprobe set for `v` in table `t`: the signature plus every
      * signature within Hamming distance `radius` (radius >= numPlanes
      * enumerates ALL buckets — the provably-exact configuration).
      */
    def probes(v: Array[Double], t: Int, radius: Int): Seq[Int] = {
      val sig = signature(v, t)
      if (radius >= numPlanes) 0 until (1 << numPlanes)
      else (0 until (1 << numPlanes))
        .filter(s => Integer.bitCount(s ^ sig) <= radius)
    }
  }

  /** Deterministic Gaussian hyperplanes (seeded `java.util.Random`,
    * Box–Muller via nextGaussian) — no data scan, reproducible builds.
    */
  def train(dim: Int, tables: Int = 4, numPlanes: Int = 8,
      metric: String = "COSINE", seed: Long = 42L): Model = {
    val rng = new java.util.Random(seed)
    val planes = Array.fill(tables, numPlanes, dim)(rng.nextGaussian())
    Model(planes, metric)
  }

  /** Per-table packed sign bits of `vec` as one int column — the
    * codegen'd [[org.apache.spark.sql.graft.functions.LshSignature]]
    * expression (the plane matrix ships once as a codegen reference
    * object; float vectors are read natively, no cast/copy). The
    * higher-order-function formulation this replaced ran interpreted,
    * outside whole-stage codegen — the same lesson as the minhash
    * shape note in Dedup.minhashSignatures.
    */
  private def signatureCol(model: Model, vec: Column, t: Int): Column =
    Functions.lshSignature(vec, model.planes(t))

  /** Augment a table with its per-table signatures (`_sigs` array) —
    * the in-memory shape [[search]] guards on.
    */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("_sigs", array(
      (0 until model.tables).map(t =>
        signatureCol(model, col(vecCol), t)): _*))

  /** The PERSISTED index layout: one row per (hash table, row) with
    * that table's signature, for `partitionBy("_t", "_sig")`. This is
    * the classic multi-table LSH store — each hash table is its own
    * bucket directory tree — chosen over a single copy bucketed by
    * table-0's signature because it lets EVERY table's probe set prune
    * at the directory level while keeping the multi-table union
    * semantics exact: a query scans only its probed (t, sig)
    * directories, never the corpus. Cost: `tables`× index storage, the
    * same multiple every multi-table LSH index pays.
    */
  def explodeTables(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.select(col("*"),
      posexplode(array((0 until model.tables).map(t =>
        signatureCol(model, col(vecCol), t)): _*)).as(Seq("_t", "_sig")))

  /** Batched ANN search: per-query multiprobe sets per table
    * (driver-side — nq is the reference's small batch shape), broadcast
    * with the queries; a row is a candidate iff SOME table's signature
    * lands in that query's probe set for the same table, and only
    * candidates are scored + ranked. radius >= numPlanes probes every
    * bucket ⇒ exact brute force through the identical code path.
    */
  def search(assigned: DataFrame, model: Model, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, radius: Int = 1,
      filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(qidCol), col(qvecCol).cast("array<double>"))
      .collect()
      .map(r => (r.get(0).toString, r.getSeq[Double](1).toArray))
    val probeDf = qRows.map { case (qid, qv) =>
      (qid, qv.toSeq,
        (0 until model.tables).map(t => model.probes(qv, t, radius)))
    }.toSeq.toDF("_qid_str", qvecCol, "_probes")
    val guard = (0 until model.tables).map { t =>
      array_contains(element_at(col("_probes"), t + 1),
        element_at(col("_sigs"), t + 1))
    }.reduce(_ || _)
    val (score, similarityLike) = Functions.metricFor(
      model.metric, assigned.schema(vecCol).dataType, col(vecCol), col(qvecCol))
    val cols = (idCol +: outputCols).distinct.map(col)
    val pruned = filter.foldLeft(assigned)(_ filter _)
    val scored = pruned
      .crossJoin(broadcast(probeDf))
      .filter(guard)
      .select((col("_qid_str").as(qidCol) +: cols) :+ score.as("score"): _*)
    val primary = if (similarityLike) col("score").desc else col("score").asc
    graft.operators.Knn.limitPerQid(scored, qidCol,
      Seq(primary, col(idCol).asc), k)
  }

  /** Single-query search over the persisted [[explodeTables]] layout:
    * the probe predicate is a disjunction of per-table `_sig IN
    * (probe set)` terms over the PARTITION columns, so the scan opens
    * only the probed (t, sig) directories. Rows colliding in several
    * probed tables are deduplicated on the pk before scoring (the
    * duplicates are identical copies, so any survivor is correct).
    * radius >= numPlanes probes every bucket of every table ⇒ exact
    * brute force through the identical pruned code path.
    */
  def searchOnePersisted(index: DataFrame, model: Model,
      queryVec: Seq[Float], vecCol: String, idCol: String, k: Int,
      radius: Int = 1, filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val qv = queryVec.map(_.toDouble).toArray
    val probePred = (0 until model.tables).map { t =>
      col("_t") === t && col("_sig").isin(model.probes(qv, t, radius): _*)
    }.reduce(_ || _)
    val cols = (idCol +: outputCols).distinct
    val candidates = filter
      .foldLeft(index.filter(probePred))(_ filter _)
      .select((cols :+ vecCol).distinct.map(col): _*)
      .dropDuplicates(idCol)
    val (score, similarityLike) = Functions.metricFor(
      model.metric, index.schema(vecCol).dataType, col(vecCol), lit(qv))
    val primary = if (similarityLike) col("score").desc else col("score").asc
    candidates.select(cols.map(col) :+ score.as("score"): _*)
      .orderBy(primary, col(idCol).asc).limit(k)
  }

  /** Batched search over the persisted [[explodeTables]] layout — the
    * client's nq>1 shape as ONE Spark job. The scan is pruned by a
    * STATIC disjunction over the union of every query's probed
    * (t, sig) pairs (partition-column predicate ⇒ directory pruning,
    * same guarantee as [[searchOnePersisted]]); per-query membership
    * is then fixed by an equi-join against the broadcast (qid, t, sig)
    * probe triples. Rows colliding with one query in several probed
    * tables are deduplicated on (qid, pk) before scoring. Returns
    * (qid, pk, <outputCols>, score, rank).
    */
  def searchPersistedBatch(index: DataFrame, model: Model,
      queries: Seq[(String, Seq[Float])], vecCol: String, idCol: String,
      k: Int, radius: Int = 1, filter: Option[Column] = None,
      outputCols: Seq[String] = Seq.empty): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "batched search needs at least one query")
    val qvs = queries.map { case (qid, qv) =>
      (qid, qv.map(_.toDouble).toArray)
    }
    val probeRows = qvs.flatMap { case (qid, qv) =>
      (0 until model.tables).flatMap(t =>
        model.probes(qv, t, radius).map(sig => (qid, t, sig)))
    }
    // Static partition-pruning predicate: union of probed pairs per t.
    val probePred = probeRows.groupBy(_._2).map { case (t, rows) =>
      col("_t") === t && col("_sig").isin(rows.map(_._3).distinct: _*)
    }.reduce(_ || _)
    val probeDf = probeRows.toDF("_pqid", "_pt", "_psig")
    val qvecDf = qvs.map { case (qid, qv) => (qid, qv.toSeq) }
      .toDF("qid", "_qvec")
    val cols = (idCol +: outputCols).distinct
    val cand = filter.foldLeft(index.filter(probePred))(_ filter _)
      .join(broadcast(probeDf),
        col("_t") === col("_pt") && col("_sig") === col("_psig"))
      .select(col("_pqid").as("qid") +: (cols :+ vecCol).distinct.map(col): _*)
      .dropDuplicates("qid" +: cols.take(1))
      .join(broadcast(qvecDf), "qid")
    val (score, similarityLike) = Functions.metricFor(
      model.metric, index.schema(vecCol).dataType, col(vecCol), col("_qvec"))
    val scored = cand
      .select((col("qid") +: cols.map(col)) :+ score.as("score"): _*)
    val primary = if (similarityLike) col("score").desc else col("score").asc
    graft.operators.Knn.limitPerQid(scored, "qid",
      Seq(primary, col(idCol).asc), k)
  }

  /** Recall@k vs exact brute force, batched exactly like
    * [[Ivf.recallAtK]]: one exact job, one LSH job, set-intersection
    * semi-join.
    */
  def recallAtK(data: DataFrame, assigned: DataFrame, model: Model,
      queries: Seq[(Long, Seq[Float])], vecCol: String, idCol: String,
      k: Int, radius: Int): Double = {
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
    val exact = graft.operators.Knn.search(
      data, qdf, vecCol, idCol, model.metric, k)
      .select(col("qid").cast("string").as("qid"), col(idCol)).distinct()
    val approx = search(assigned, model, qdf, vecCol, idCol, k, radius)
      .select(col("qid").cast("string").as("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — nq*k would cap recall below 1.0 when data < k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
