package graft.dedup

import graft.Functions
import graft.ann.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication scoped by a coarse
  * quantizer — the SemDeDup shape (Abbas et al. 2023: cluster the
  * corpus embeddings with k-means, then search for near-duplicate
  * pairs only WITHIN each cluster).
  *
  * Where [[Dedup.embeddingNearDups]] buckets by a random-hyperplane
  * sign sketch (recall depends on the sketch), this family buckets by
  * nearest-centroid cells — the same coarse quantizer the IVF index
  * uses ([[Ivf.cellId]], a single codegen'd projection), so the
  * cluster assignment can be SHARED with an existing IVF build and the
  * cell column persisted `partitionBy` for pruning.
  *
  * Keep policy: "keep-first" — a row is dropped iff some LOWER-id row
  * in the SAME cell is cosine-similar above the threshold (the
  * dropped row's witness may itself be dropped; no transitive
  * chasing). This is deterministic, needs no connected-components
  * pass, and is the policy large pipelines actually run (one scan,
  * one within-cell join). For clique-labelled clusters compose the
  * pair output with [[Dedup.connectedComponents]] instead.
  *
  * 100 TB shape: the only corpus-sized shuffle is the within-cell
  * self-join, and k (number of cells) is chosen so cells are
  * reducer-sized — the paper runs k ≈ sqrt(N). Nothing enumerates
  * cross-cell pairs; the assignment itself is a pure projection.
  *
  * Reference anchor: the reference's embedding dedup demos are
  * brute-force pairwise (2.6/common.py get_cosine_similarity); this is
  * the scale re-expression.
  */
object SemDedup {

  /** Deterministic seed quantizer: centroids = the embeddings of the k
    * LOWEST ids (a k-row bounded collect). Zero Lloyd iterations —
    * exactly reproducible by any engine, which is what the DuckDB
    * oracle entry recomputes. For production-quality cells train with
    * [[trainedModel]] instead; both feed the same dedup plan.
    */
  def seedModel(embs: DataFrame, vecCol: String, idCol: String,
      k: Int, metric: String = "L2"): Ivf.Model = {
    val seeds = embs.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"corpus smaller than k=$k")
    Ivf.Model(seeds, metric)
  }

  /** Lloyd-trained quantizer (delegates to the IVF trainer — seeded
    * sample, first-k init, fixed iterations; bit-for-bit reproducible).
    */
  def trainedModel(embs: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 10000, iters: Int = 10): Ivf.Model =
    Ivf.train(embs, vecCol, k, sampleSize, iters)

  /** Within-cell near-duplicate pairs: cosine ≥ threshold, id_a <
    * id_b, both in the same cell. The join key is the cell id — a
    * plain equi-join, never a cross join.
    */
  def cellPairs(embs: DataFrame, vecCol: String, idCol: String,
      model: Ivf.Model, threshold: Double): DataFrame = {
    val assigned = Ivf.assign(embs, vecCol, model)
    val a = assigned.select(col(idCol).as("id_a"),
      col(vecCol).as("_va"), col("_cid"))
    val b = assigned.select(col(idCol).as("id_b"),
      col(vecCol).as("_vb"), col("_cid"))
    a.join(b, "_cid")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Functions.vecCosine(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("_cid").as("cell"),
        col("cosine"))
  }

  /** Cluster-balanced sample: up to `perCell` rows from EACH quantizer
    * cell, chosen by the deterministic md5 coin (so the within-cell
    * pick is an unbiased random sample, reproducible across engines)
    * with id tie-break. This is the diversity-preserving selection
    * step curation pipelines run after semantic dedup — a head-heavy
    * corpus contributes at most `perCell` examples per region of
    * embedding space instead of drowning the tail.
    *
    * 100 TB shape: one shuffle on the cell id; row_number streams over
    * each sorted cell (no per-cell buffering), and cell sizes are
    * already reducer-bounded by the k chosen for the quantizer.
    * Returns the selected `(idCol, cell)` rows.
    */
  def clusterBalancedSample(embs: DataFrame, vecCol: String,
      idCol: String, model: Ivf.Model, perCell: Int,
      salt: String = "cbs"): DataFrame = {
    require(perCell > 0, "perCell must be positive")
    import org.apache.spark.sql.expressions.Window
    val coin = graft.pipeline.Mixing.hashUniform(col(idCol), salt)
    Ivf.assign(embs, vecCol, model)
      .select(col(idCol), col("_cid").as("cell"), coin.as("_coin"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("_coin").asc,
          col(idCol).asc)))
      .filter(col("_rn") <= perCell)
      .select(col(idCol), col("cell"))
  }

  /** Prototypicality pruning (the "diversify" half of D4, Tirumala et
    * al. 2023): within each quantizer cell, DROP the `dropFraction`
    * most-prototypical rows — the ones CLOSEST to their centroid —
    * and keep the tail. Semantic dedup removes near-copies; this
    * removes the redundant cluster cores that survive it (many
    * non-duplicate but mutually-generic documents around each
    * centroid), which the paper shows beats either step alone.
    *
    * Ranking is by `(round(L2-to-centroid, 6), id)` — the rounding
    * pins the order against last-ulp float divergence so any engine
    * recomputing the same centroids ranks identically (the d22 oracle
    * does exactly that). Per cell of size n, the `floor(n *
    * dropFraction)` lowest-ranked rows are dropped.
    *
    * 100 TB shape: one projection (assignment + distance), one
    * cell-keyed window — cells are reducer-sized by the quantizer's k,
    * and nothing compares row pairs at all.
    */
  def prototypicalityPrune(embs: DataFrame, vecCol: String,
      idCol: String, model: Ivf.Model, dropFraction: Double): DataFrame = {
    require(dropFraction >= 0 && dropFraction < 1,
      s"dropFraction must be in [0, 1), got $dropFraction")
    import org.apache.spark.sql.expressions.Window
    val nc = Ivf.nearestCell(model, col(vecCol))
    val w = Window.partitionBy("cell")
    embs.select(col(idCol), nc.getField("cid").as("cell"),
        round(nc.getField("d"), 6).as("_d"))
      .withColumn("_rn", row_number().over(
        w.orderBy(col("_d").asc, col(idCol).asc)))
      .withColumn("_n", count(lit(1)).over(w))
      .select(col(idCol), col("cell"),
        (col("_rn") > floor(col("_n") * dropFraction).cast("long"))
          .as("keep"))
  }

  /** Keep-first semantic dedup verdict per row: `(id, cell, keep)`.
    * keep=false iff a lower-id row in the same cell is similar above
    * the threshold. Implemented as the pair join reduced to its
    * dropped-id side + a left anti-ish join (left join + null test),
    * so the full pair set is never materialized wider than needed.
    */
  def semanticDedup(embs: DataFrame, vecCol: String, idCol: String,
      model: Ivf.Model, threshold: Double): DataFrame = {
    val dropped = cellPairs(embs, vecCol, idCol, model, threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("_dropped", lit(true))
    Ivf.assign(embs, vecCol, model)
      .select(col(idCol), col("_cid").as("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        not(coalesce(col("_dropped"), lit(false))).as("keep"))
  }
}
