package graft.dedup

import graft.SparkSpec
import graft.ann.Ivf

/** Cluster-scoped semantic dedup: seed-cell assignment, within-cell
  * pair discovery, and the keep-first policy on a hand-computed
  * three-cluster fixture. The d15 oracle entry recomputes the same
  * plan in DuckDB over the real embeddings table.
  */
class SemDedupSpec extends SparkSpec {

  // ids 0/1/2 are the three cluster centers (and, being the lowest
  // ids, the k=3 seed centroids); 3/4/6 are planted near-dups; 5 is a
  // cell-2 resident below the threshold.
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0)),
      (3L, Seq(0.98, 0.05, 0.0)),   // ~id0
      (4L, Seq(0.1, 0.99, 0.0)),    // ~id1
      (5L, Seq(0.6, 0.0, 0.8)),     // cell 2, cos(id2)=0.8 < t
      (6L, Seq(0.97, -0.05, 0.0))   // ~id0, ~id3
    ).toDF("vec_id", "embedding")
  }

  test("seed model = embeddings of the k lowest ids") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    assert(m.k == 3)
    assert(m.centroids(0).toSeq == Seq(1.0, 0.0, 0.0))
    assert(m.centroids(2).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("within-cell pairs: only same-cell, above-threshold, a<b") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    val pairs = SemDedup.cellPairs(fixture, "embedding", "vec_id", m, 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 3L), (0L, 6L), (3L, 6L), (1L, 4L)))
  }

  test("keep-first verdicts match the hand-computed fixture") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    val keep = SemDedup
      .semanticDedup(fixture, "embedding", "vec_id", m, 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep == Map(0L -> true, 1L -> true, 2L -> true,
      3L -> false, 4L -> false, 5L -> true, 6L -> false))
  }

  test("cell column matches the IVF coarse quantizer assignment") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    val cells = SemDedup
      .semanticDedup(fixture, "embedding", "vec_id", m, 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == Map(0L -> 0, 1L -> 1, 2L -> 2,
      3L -> 0, 4L -> 1, 5L -> 2, 6L -> 0))
  }

  test("clusterBalancedSample: per-cell cap, deterministic, covers all cells") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    val s1 = SemDedup
      .clusterBalancedSample(fixture, "embedding", "vec_id", m, perCell = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    // cell 0 holds {0,3,6} -> 2 kept; cells 1 {1,4} and 2 {2,5} whole
    assert(s1.length === 6)
    assert(s1.count(_._2 == 0) === 2)
    assert(s1.count(_._2 == 1) === 2)
    assert(s1.count(_._2 == 2) === 2)
    val s2 = SemDedup
      .clusterBalancedSample(fixture, "embedding", "vec_id", m, perCell = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(s1.toSeq === s2.toSeq)
    // perCell = 1 keeps exactly one row per cell
    val s3 = SemDedup
      .clusterBalancedSample(fixture, "embedding", "vec_id", m, perCell = 1)
      .collect()
    assert(s3.length === 3)
  }

  test("prototypicalityPrune: drops the closest-to-centroid fraction per cell") {
    val m = SemDedup.seedModel(fixture, "embedding", "vec_id", 3)
    // cells: 0={0,3,6} 1={1,4} 2={2,5}; at 0.5 each cell drops
    // floor(n/2) nearest rows — the seed row itself in every cell,
    // plus nobody else (floor(3*.5)=1, floor(2*.5)=1)
    val keep = SemDedup
      .prototypicalityPrune(fixture, "embedding", "vec_id", m, 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep == Map(0L -> false, 1L -> false, 2L -> false,
      3L -> true, 4L -> true, 5L -> true, 6L -> true))
    // dropFraction 0 keeps everything
    val all = SemDedup
      .prototypicalityPrune(fixture, "embedding", "vec_id", m, 0.0)
      .collect()
    assert(all.forall(_.getBoolean(2)))
  }

  test("prototypicalityPrune: equal-distance ties cut by id, lower id first") {
    val s = spark
    import s.implicits._
    val rows = fixture.union(Seq(
      (10L, Seq(0.0, 0.9, 0.1)),
      (11L, Seq(0.0, 0.9, 0.1))).toDF("vec_id", "embedding"))
    val m = SemDedup.seedModel(rows, "embedding", "vec_id", 3)
    // cell 1 = {1, 4, 10, 11} by distance {0, .1005, .1414, .1414};
    // at 0.75 it drops floor(3) = 3: ids 1, 4, then the TIE resolves
    // to 10 (lower id ranks more prototypical), keeping 11.
    val keep = SemDedup
      .prototypicalityPrune(rows, "embedding", "vec_id", m, 0.75)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!keep(1L) && !keep(4L) && !keep(10L) && keep(11L))
  }

  test("trained quantizer separates the planted dups the same way") {
    // Lloyd-trained cells (different centroids, same geometry): the
    // same dup set must fall out on a well-separated fixture.
    val m = SemDedup.trainedModel(fixture, "embedding", k = 3, iters = 5)
    val keep = SemDedup
      .semanticDedup(fixture, "embedding", "vec_id", m, 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep.count(!_._2) == 3)
    assert(!keep(3L) && !keep(4L) && !keep(6L))
  }
}
