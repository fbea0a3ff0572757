package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

import scala.collection.mutable

/** Vamana graph index (the DiskANN graph, Subramanya et al. 2019,
  * NeurIPS), Spark-native through the same per-(partition, segment)
  * model as [[Hnsw]]: each segment builds its single-layer
  * α-robust-pruned graph in one task; serving reuses the HNSW walk
  * machinery VERBATIM because a Vamana graph is exactly a persisted
  * [[Hnsw.GraphRow]] graph with one layer whose entry point is the
  * MEDOID — the medoid row is written at level 1 (its sole layer-1
  * neighbor list empty), so [[Hnsw.searchParts]]'s
  * highest-level-then-lowest-id entry rule lands on it, the empty
  * upper layer descends immediately, and the layer-0 beam IS
  * DiskANN's GreedySearch with `search_list_size` as the beam. The
  * exactness guard (beam >= segment size -> brute force), the
  * filtered-search traversal mask, growing-segment delta serving and
  * partition pruning all carry over unchanged.
  *
  * Determinism: medoid = nearest point to the segment mean (L2, tie
  * by id); insertion order = ascending id, two passes (α = 1, then
  * the configured α — the paper's schedule); every candidate ordering
  * breaks ties by ascending id; no RNG anywhere. The graph is a pure
  * function of (data, params).
  *
  * Build differences from HNSW worth naming: no levels (one layer),
  * degree bound R enforced by α-robust-prune (keep the closest
  * candidate, discard any candidate within its α-cone:
  * α·d(kept, c) <= d(p, c)), reverse edges inserted with the same
  * prune — the construction that makes DiskANN graphs navigable at
  * low degree.
  *
  * Scale shape: identical to [[Hnsw.buildParts]] — one shuffle on the
  * (part, segment) key, one in-memory O(n·L·log n)-ish build per
  * segment, nothing rescans the collection at query time.
  */
object Vamana {

  final case class Params(
      r: Int = 16,
      l: Int = 64,
      alpha: Double = 1.2,
      metric: String = "L2") {
    require(r >= 2, s"degree bound r must be >= 2, got $r")
    require(l >= r, "build beam l must be >= r")
    require(alpha >= 1.0, "alpha must be >= 1.0")
  }

  /** One segment's in-memory Vamana build over local indices. */
  private final class LocalVamana(
      val ids: Array[Long], val vecs: Array[Array[Double]], p: Params) {
    private val dist = Hnsw.distFn(p.metric)
    val n: Int = ids.length
    val nbrs: Array[mutable.ArrayBuffer[Int]] =
      Array.fill(n)(new mutable.ArrayBuffer[Int])

    /** Nearest point to the segment mean (the standard DiskANN medoid
      * proxy — exact medoids are O(n²)); plain L2 regardless of the
      * serving metric, it is only a navigation seed. Tie by id.
      */
    val medoid: Int =
      if (n == 0) -1
      else {
        val dim = vecs(0).length
        val mean = new Array[Double](dim)
        vecs.foreach { v =>
          var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
        }
        var i = 0
        while (i < dim) { mean(i) /= n; i += 1 }
        def l2(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var j = 0
          while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
          s
        }
        (0 until n).minBy(j => (l2(mean, vecs(j)), ids(j)))
      }

    /** GreedySearch from the medoid with beam `l`: returns every
      * VISITED node with its distance, sorted (dist, id) — the
      * candidate pool robustPrune consumes (DiskANN's V set).
      */
    private def greedyVisited(q: Array[Double], l: Int): Seq[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by(t => (t._1, ids(t._2)))
      val seen = new java.util.HashSet[Int]()
      val cand = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](ord)
      val visited = new mutable.ArrayBuffer[(Double, Int)]
      val d0 = dist(q, vecs(medoid))
      seen.add(medoid)
      cand.enqueue((d0, medoid)); res.enqueue((d0, medoid))
      visited += ((d0, medoid))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= l && ord.compare((dc, c), res.head) > 0) cand.clear()
        else nbrs(c).foreach { nb =>
          if (seen.add(nb)) {
            val dn = dist(q, vecs(nb))
            visited += ((dn, nb))
            if (res.size < l || ord.compare((dn, nb), res.head) < 0) {
              cand.enqueue((dn, nb))
              res.enqueue((dn, nb))
              if (res.size > l) res.dequeue(): Unit
            }
          }
        }
      }
      visited.sortBy(t => (t._1, ids(t._2))).toSeq
    }

    /** α-robust prune (Algorithm 2): keep the closest remaining
      * candidate, discard every candidate inside its α-cone
      * (α·d(kept, c) <= d(p, c)), stop at R kept.
      */
    private def robustPrune(pIdx: Int, candIdx: Seq[Int],
        alpha: Double): Seq[Int] = {
      var remaining = (candIdx ++ nbrs(pIdx)).distinct
        .filter(_ != pIdx)
        .map(c => (dist(vecs(pIdx), vecs(c)), c))
        .sortBy(t => (t._1, ids(t._2)))
      val out = new mutable.ArrayBuffer[Int]
      while (remaining.nonEmpty && out.size < p.r) {
        val star = remaining.head._2
        out += star
        remaining = remaining.tail.filter { case (dc, c) =>
          alpha * dist(vecs(star), vecs(c)) > dc
        }
      }
      out.toSeq
    }

    def build(): Unit = {
      if (n <= 1) return
      val order = (0 until n).sortBy(ids)
      // Two-pass schedule (the paper's): a navigable α=1 graph first,
      // then the diversity-pruned α pass over it.
      Seq(1.0, p.alpha).foreach { a =>
        order.foreach { i =>
          val visited = greedyVisited(vecs(i), p.l).map(_._2)
          val pruned = robustPrune(i, visited, a)
          nbrs(i).clear(); nbrs(i) ++= pruned
          pruned.foreach { j =>
            if (!nbrs(j).contains(i)) {
              nbrs(j) += i
              if (nbrs(j).size > p.r) {
                val rp = robustPrune(j, nbrs(j).toSeq, a)
                nbrs(j).clear(); nbrs(j) ++= rp
              }
            }
          }
        }
      }
    }

    /** Persisted rows: single layer; the medoid carries level 1 with
      * an empty layer-1 list so the shared walk's entry rule finds it.
      */
    def toRows(part: String, seg: Int): Iterator[Hnsw.GraphRow] =
      (0 until n).iterator.map { i =>
        val out = nbrs(i).map(ids(_)).sorted.toSeq
        if (i == medoid)
          Hnsw.GraphRow(part, seg, ids(i), vecs(i).map(_.toFloat).toSeq, 1,
            Seq(out, Seq.empty))
        else
          Hnsw.GraphRow(part, seg, ids(i), vecs(i).map(_.toFloat).toSeq, 0,
            Seq(out))
      }
  }

  /** Build per-(partition, segment) Vamana graphs — the
    * [[Hnsw.buildParts]] shuffle with the Vamana construction in-task;
    * rows persist in the SAME layout and are served by
    * [[Hnsw.searchParts]] unchanged.
    */
  def buildParts(df: DataFrame, vecCol: String, idCol: String,
      partCol: String, params: Params = Params(),
      segments: Int = 0): Dataset[Hnsw.GraphRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val segs = if (segments > 0) segments
      else spark.sessionState.conf.numShufflePartitions
    df.select(col(partCol).cast("string").as("part"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"),
        pmod(xxhash64(col(idCol)), lit(segs)).cast("int").as("seg"))
      .as[(String, Long, Seq[Double], Int)]
      .groupByKey(r => (r._1, r._4))
      .flatMapGroups { (key: (String, Int), it) =>
        val rows = it.toArray
        val b = new LocalVamana(rows.map(_._2),
          rows.map(_._3.toArray), params)
        b.build()
        b.toRows(key._1, key._2)
      }
  }
}
