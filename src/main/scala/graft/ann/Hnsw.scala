package graft.ann

import graft.operators.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

import scala.collection.mutable

/** HNSW graph index (Malkov & Yashunin 2016), Spark-native via the
  * SEGMENT model the reference's server uses: the collection hashes
  * into segments, each segment builds its own in-memory
  * hierarchical graph in one task, and a search beam-walks every
  * segment's graph in parallel before an exact global top-k merge —
  * "a per-query graph walk" IS data-parallel when the unit is the
  * segment, exactly how Milvus fans a search over sealed segments.
  * (The declared-HNSW collection route keeps serving via IVF cell
  * pruning — this operator is the genuine graph family next to it;
  * see CollectionSearch's routing note.)
  *
  * Determinism (the property every oracle here rests on):
  *  - segment assignment = xxhash64(id) mod segments — layout-free;
  *  - node level = geometric from splitmix64(id ^ seed) — not RNG
  *    draws in insertion order;
  *  - insertion order = ascending id within the segment;
  *  - every candidate ordering breaks ties by ascending id.
  * So the graph — and therefore the candidate set — is a pure
  * function of (data, params), identical on any cluster, partition
  * layout, or retry.
  *
  * Exactness guard: `ef >= segment size` switches that segment to a
  * brute-force scan (a beam that wide buys nothing, and a disconnected
  * graph component could otherwise hide rows) — the same documented
  * fallback discipline as WAND's candidate guard.
  *
  * Scale shape: build is one shuffle on the segment key + one
  * in-memory build per segment (the Milvus sealed-segment build);
  * search reads the graph table once, runs O(ef·log n) local work per
  * (segment, query), and merges nq × k × segments candidate rows —
  * the collection itself is never rescanned.
  */
object Hnsw {

  final case class Params(
      m: Int = 8,
      efConstruction: Int = 64,
      metric: String = "L2",
      seed: Long = 42L) {
    require(m >= 2, s"m must be >= 2, got $m")
    require(efConstruction >= m, "efConstruction must be >= m")
  }

  /** One graph node row: global id, vector, top level, and per-level
    * neighbor id lists (index 0 = layer 0).
    */
  final case class Node(seg: Int, id: Long, vec: Seq[Double],
      level: Int, nbrs: Seq[Seq[Long]])

  /** Persisted-route node row (the [[graft.store.IndexStore]] layout):
    * `part` is the collection partition the node lives in — graphs are
    * built per (partition, segment) so partition-scoped searches prune
    * whole partition subtrees of the index parquet; `vec` persists as
    * float (the collection's own width — the double cast happens
    * in-task at walk time).
    */
  final case class GraphRow(part: String, seg: Int, id: Long,
      vec: Seq[Float], level: Int, nbrs: Seq[Seq[Long]])

  // ---- deterministic hashing ----------------------------------------

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Geometric level from the id hash: P(level >= l) = (1/m)^l. */
  private[ann] def levelOf(id: Long, m: Int, seed: Long): Int = {
    val u = (splitmix64(id ^ seed) >>> 11).toDouble / (1L << 53).toDouble
    val lvl = (-math.log(math.max(u, 1e-18)) / math.log(m.toDouble)).toInt
    math.min(lvl, 24)
  }

  // ---- metric ---------------------------------------------------------

  /** Internal rank DISTANCE (smaller = better) for the build and walk;
    * [[outputScore]] converts back to the public score convention.
    */
  private[ann] def distFn(metric: String): (Array[Double], Array[Double]) => Double =
    metric.toUpperCase match {
      case "L2" => (a, b) => {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      case "IP" => (a, b) => {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        -s
      }
      case "COSINE" => (a, b) => {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported HNSW metric $other")
    }

  private def similarityLike(metric: String): Boolean =
    metric.toUpperCase match {
      case "IP" | "COSINE" => true
      case _ => false
    }

  /** Public score from the internal distance: L2 reports the rooted
    * distance (the engine-wide convention), IP the inner product,
    * COSINE the similarity.
    */
  private def outputScore(metric: String, d: Double): Double =
    metric.toUpperCase match {
      case "L2" => math.sqrt(d)
      case "IP" => -d
      case "COSINE" => 1.0 - d
    }

  // ---- local (one segment) build + search ----------------------------

  /** In-memory graph over local indices; neighbors as per-level index
    * buffers. All orderings are (dist, id).
    */
  private final class LocalGraph(
      val ids: Array[Long], val vecs: Array[Array[Double]],
      p: Params, providedLevels: Array[Int] = null) {
    private val dist = distFn(p.metric)
    val n: Int = ids.length
    // Search over a persisted graph adopts the PERSISTED levels — the
    // walk must match the graph that was built, not whatever (m, seed)
    // the caller passed; only `metric` matters at search time.
    val levels: Array[Int] =
      if (providedLevels != null) providedLevels
      else Array.tabulate(n)(i => levelOf(ids(i), p.m, p.seed))
    // nbrs(i)(l): neighbor local indices of node i at layer l
    val nbrs: Array[Array[mutable.ArrayBuffer[Int]]] =
      Array.tabulate(n)(i =>
        Array.fill(levels(i) + 1)(new mutable.ArrayBuffer[Int]))
    var entry: Int = -1

    private def d(a: Int, b: Int): Double = dist(vecs(a), vecs(b))
    private def dq(q: Array[Double], a: Int): Double = dist(q, vecs(a))

    /** Best-first beam at one layer; returns up to ef (dist, idx)
      * sorted best-first with id tie-break. `allowed` is the filtered-
      * search traversal mask (hnswlib's filter semantics, Milvus's
      * scalar bitmask): DISALLOWED nodes are traversed — they keep the
      * graph connected and guide the walk — but never enter the RESULT
      * set, so the beam keeps widening until ef ALLOWED nodes are
      * found or the frontier is exhausted.
      */
    private def searchLayer(q: Array[Double], eps: Seq[Int], ef: Int,
        lc: Int,
        allowed: Long => Boolean = _ => true): mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.by(t => (t._1, ids(t._2)))
      val visited = new java.util.HashSet[Int]()
      // candidates: best-first; results: worst-first (bounded at ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](ord)
      eps.foreach { e =>
        if (visited.add(e)) {
          val de = dq(q, e)
          cand.enqueue((de, e))
          if (allowed(ids(e))) res.enqueue((de, e))
        }
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= ef && ord.compare((dc, c), res.head) > 0) {
          cand.clear()
        } else {
          nbrs(c)(lc).foreach { nb =>
            if (visited.add(nb)) {
              val dn = dq(q, nb)
              if (res.size < ef || ord.compare((dn, nb), res.head) < 0) {
                cand.enqueue((dn, nb))
                if (allowed(ids(nb))) {
                  res.enqueue((dn, nb))
                  if (res.size > ef) res.dequeue(): Unit
                }
              }
            }
          }
        }
      }
      val out = new mutable.ArrayBuffer[(Double, Int)](res.size)
      out ++= res.dequeueAll.reverse
      out
    }

    private def connect(a: Int, b: Int, lc: Int, cap: Int): Unit = {
      val buf = nbrs(a)(lc)
      if (!buf.contains(b)) {
        buf += b
        if (buf.size > cap) {
          // prune to the cap closest (ties by id) — keeps degree bounded
          val kept = buf.map(x => (d(a, x), x))
            .sortBy(t => (t._1, ids(t._2))).take(cap).map(_._2)
          buf.clear(); buf ++= kept
        }
      }
    }

    def insertAll(): Unit = {
      // ascending-id insertion: the graph is order-independent of the
      // scan that delivered the rows
      val order = (0 until n).sortBy(ids)
      order.foreach { i =>
        if (entry < 0) entry = i
        else {
          val lvl = levels(i)
          var ep = Seq(entry)
          var lc = levels(entry)
          while (lc > lvl) { // greedy descend above the node's level
            ep = Seq(searchLayer(vecs(i), ep, 1, math.min(lc, levels(entry))).head._2)
            lc -= 1
          }
          var l = math.min(lvl, levels(entry))
          while (l >= 0) {
            val cands = searchLayer(vecs(i), ep, p.efConstruction, l)
            val cap = if (l == 0) 2 * p.m else p.m
            cands.take(p.m).foreach { case (_, nb) =>
              connect(i, nb, l, cap)
              connect(nb, i, l, cap)
            }
            ep = cands.take(p.m).map(_._2).toSeq
            l -= 1
          }
          if (lvl > levels(entry)) entry = i
        }
      }
    }

    /** Top-k for one query; brute force when ef covers the segment.
      * `allowed` masks the RESULT set only (filtered search) — the
      * greedy descent and the beam traverse the full graph.
      */
    def searchK(q: Array[Double], k: Int, ef: Int,
        allowed: Long => Boolean = _ => true): Seq[(Long, Double)] = {
      if (n == 0) return Seq.empty
      if (ef >= n) { // exact fallback — disconnection-proof
        return (0 until n).filter(i => allowed(ids(i)))
          .map(i => (dq(q, i), i))
          .sortBy(t => (t._1, ids(t._2))).take(k)
          .map { case (dd, i) => (ids(i), dd) }
      }
      var ep = Seq(entry)
      var lc = levels(entry)
      while (lc > 0) {
        ep = Seq(searchLayer(q, ep, 1, lc).head._2)
        lc -= 1
      }
      searchLayer(q, ep, math.max(ef, k), 0, allowed).take(k)
        .map { case (dd, i) => (ids(i), dd) }.toSeq
    }

    def toNodes(seg: Int): Iterator[Node] =
      (0 until n).iterator.map(i => Node(seg, ids(i), vecs(i).toSeq,
        levels(i), nbrs(i).map(_.map(ids(_)).sorted.toSeq).toSeq))
  }

  /** Reconstruct a walkable graph from persisted node rows: adopt the
    * persisted levels + adjacency (no rebuild — the caller's m/efC/seed
    * are irrelevant to the walk; a mismatch must not silently truncate
    * the graph). Neighbor ids absent from `ids` (rows masked out by the
    * growing-segment anti-join, or a partition-scoped read) drop from
    * the adjacency; the entry point is recomputed over the PRESENT
    * nodes, so a masked graph stays walkable — the Milvus
    * tombstone-mask discipline, with the documented recall trade that
    * heavy masking thins the graph until [[staleServable]]'s byte gate
    * forces the rebuild.
    */
  private def adopt(ids: Array[Long], vecs: Array[Array[Double]],
      levels: Array[Int], adj: Array[Seq[Seq[Long]]],
      params: Params): LocalGraph = {
    val idx = ids.zipWithIndex.toMap
    val g = new LocalGraph(ids, vecs, params, providedLevels = levels)
    adj.zipWithIndex.foreach { case (nbrs, i) =>
      nbrs.zipWithIndex.foreach { case (ns, l) =>
        if (l < g.nbrs(i).length) g.nbrs(i)(l) ++= ns.flatMap(idx.get)
      }
    }
    g.entry = {
      var best = 0
      var i = 1
      while (i < ids.length) {
        if (g.levels(i) > g.levels(best) ||
          (g.levels(i) == g.levels(best) && ids(i) < ids(best))) best = i
        i += 1
      }
      if (ids.isEmpty) -1 else best
    }
    g
  }

  // ---- distributed surface -------------------------------------------

  /** Build per-segment graphs: one shuffle on the hash-assigned
    * segment key, one in-memory build per segment. Size `segments` so
    * a segment's vectors + graph fit a task (the Milvus sealed-segment
    * sizing rule); 0 = the session's shuffle parallelism.
    */
  def build(df: DataFrame, vecCol: String, idCol: String,
      params: Params = Params(), segments: Int = 0): Dataset[Node] = {
    val spark = df.sparkSession
    import spark.implicits._
    val segs = if (segments > 0) segments
      else spark.sessionState.conf.numShufflePartitions
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"),
        pmod(xxhash64(col(idCol)), lit(segs)).cast("int").as("seg"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (seg, it) =>
        val rows = it.toArray
        val g = new LocalGraph(rows.map(_._1),
          rows.map(_._2.toArray), params)
        g.insertAll()
        g.toNodes(seg)
      }
  }

  /** Build per-(partition, segment) graphs over a collection snapshot
    * — the [[build]] shuffle with the collection partition as the
    * outer key, producing rows [[graft.store.IndexStore]] persists
    * `partitionBy(_part, seg)` so partition-scoped searches prune
    * directories. One shuffle, one in-memory build per (part, seg).
    */
  def buildParts(df: DataFrame, vecCol: String, idCol: String,
      partCol: String, params: Params = Params(),
      segments: Int = 0): Dataset[GraphRow] = {
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
        val g = new LocalGraph(rows.map(_._2),
          rows.map(_._3.toArray), params)
        g.insertAll()
        g.toNodes(key._2).map(n => GraphRow(key._1, n.seg, n.id,
          n.vec.map(_.toFloat), n.level, n.nbrs))
      }
  }

  /** Beam-search persisted per-(partition, segment) graphs for the
    * query batch — the serving-path twin of [[search]] over the
    * [[GraphRow]] parquet layout (read back as a plain DataFrame so
    * the growing-segment anti-join and partition pruning compose
    * upstream). Returns per-query global top-k (qid, idCol, score,
    * rank).
    */
  def searchParts(graphRows: DataFrame, queries: Seq[(String, Seq[Float])],
      idCol: String, k: Int, ef: Int, metric: String,
      allowedIds: Option[Array[Long]] = None): DataFrame = {
    require(k > 0 && ef > 0, "k and ef must be positive")
    val spark = graphRows.sparkSession
    import spark.implicits._
    val params = Params(metric = metric)
    val qs = queries.map { case (qid, v) => (qid, v.map(_.toDouble).toArray) }
    // Filtered-search mask: a SORTED pk array in the task closure
    // (8 bytes/id — the caller caps its size), probed by binary
    // search during the walk. Disallowed nodes still route the beam;
    // they never surface (searchLayer doc).
    val mask: Long => Boolean = allowedIds match {
      case None => _ => true
      case Some(sorted) =>
        id => java.util.Arrays.binarySearch(sorted, id) >= 0
    }
    val candidates = graphRows.select(
        col("_part").cast("string").as("part"),
        col("seg").cast("int").as("seg"),
        col("id").cast("long").as("id"),
        col("vec").cast("array<float>").as("vec"),
        col("level").cast("int").as("level"),
        col("nbrs").cast("array<array<bigint>>").as("nbrs"))
      .as[GraphRow]
      .groupByKey(r => (r.part, r.seg))
      .flatMapGroups { (_: (String, Int), it) =>
        val nodes = it.toArray.sortBy(_.id)
        val g = adopt(nodes.map(_.id),
          nodes.map(_.vec.map(_.toDouble).toArray),
          nodes.map(_.level), nodes.map(_.nbrs), params)
        qs.iterator.flatMap { case (qid, qv) =>
          g.searchK(qv, k, ef, mask).map { case (id, d) =>
            (qid, id, outputScore(metric, d))
          }
        }
      }
      .toDF("qid", idCol, "score")
    val primary =
      if (similarityLike(metric)) col("score").desc else col("score").asc
    Knn.limitPerQid(candidates, "qid", Seq(primary, col(idCol).asc), k)
  }

  /** Beam-search every segment's graph for the query batch, merge the
    * per-segment candidates with an exact global top-k. Queries are a
    * driver-side batch (the reference's nq shape), captured by the
    * task closure.
    */
  def search(graph: Dataset[Node], queries: Seq[(String, Seq[Float])],
      idCol: String, k: Int, ef: Int,
      params: Params = Params()): DataFrame = {
    require(k > 0 && ef > 0, "k and ef must be positive")
    val spark = graph.sparkSession
    import spark.implicits._
    val qs = queries.map { case (qid, v) => (qid, v.map(_.toDouble).toArray) }
    val simLike = similarityLike(params.metric)
    val metric = params.metric
    val candidates = graph
      .groupByKey(_.seg)
      .flatMapGroups { (_, it) =>
        val nodes = it.toArray.sortBy(_.id)
        val g = adopt(nodes.map(_.id), nodes.map(_.vec.toArray),
          nodes.map(_.level), nodes.map(_.nbrs), params)
        qs.iterator.flatMap { case (qid, qv) =>
          g.searchK(qv, k, ef).map { case (id, d) =>
            (qid, id, outputScore(metric, d))
          }
        }
      }
      .toDF("qid", idCol, "score")
    val primary = if (simLike) col("score").desc else col("score").asc
    Knn.limitPerQid(candidates, "qid", Seq(primary, col(idCol).asc), k)
  }

  /** Recall@k vs exact brute force over a query batch — the standard
    * index-quality oracle, [[Ivf.recallAtK]]'s shape.
    */
  def recallAtK(data: DataFrame, graph: Dataset[Node],
      queries: Seq[(Long, Seq[Float])], vecCol: String, idCol: String,
      k: Int, ef: Int, params: Params = Params()): Double = {
    val spark = data.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
    val exact = Knn.search(data, qdf, vecCol, idCol, params.metric, k)
      .select(col("qid").cast("string").as("qid"), col(idCol)).distinct()
    val approx = search(graph,
      queries.map { case (q, v) => (q.toString, v) }, idCol, k, ef, params)
      .select(col("qid"), col(idCol))
    // Denominator = what exact actually RETURNED (min(k, n) per query
    // after dedup) — dividing by nq·k would cap recall below 1.0 on
    // datasets smaller than k.
    val denom = exact.count()
    if (denom == 0) 1.0
    else exact.join(approx, Seq("qid", idCol), "left_semi")
      .count().toDouble / denom
  }
}
