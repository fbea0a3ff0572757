package graft.pipeline

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the distributed integer-mass propagation equals a
  * driver-side reference implementation on random graphs, and is
  * invariant to the input's partition layout — the determinism the
  * operator exists to provide. (Drives scalacheck Gen directly — the
  * scalatestplus bridge isn't available offline.)
  */
class LinkRankPropertySpec extends SparkSpec {
  import spark.implicits._

  private val edgeGen = for {
    n <- Gen.choose(2, 12) // node id space
    m <- Gen.choose(1, 30) // edge count (dups allowed — must dedup)
    es <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n.toLong - 1)
      d <- Gen.choose(0L, n.toLong - 1)
    } yield (s, d))
  } yield es

  /** Exact local mirror of the spec in LinkRank's scaladoc. */
  private def local(edges: Seq[(Long, Long)], iters: Int,
      initMass: Long = 1000000L, dampNum: Long = 85,
      dampDen: Long = 100): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = initMass * (dampDen - dampNum) / dampDen
    var mass = nodes.map(_ -> initMass).toMap
    for (_ <- 0 until iters) {
      val in = e.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        mass(s) * dampNum / (dampDen * outdeg(s))
      }.sum).toMap
      mass = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    mass
  }

  test("distributed result equals the local mirror on random graphs") {
    val params = Gen.Parameters.default
    for (i <- 0 until 30) {
      val edges = edgeGen(params, Seed(7000L + i)).get
      val iters = 1 + i % 4
      val got = LinkRank.linkRank(edges.toDF("s", "d"), "s", "d", iters)
        .as[(Long, Long)].collect().toMap
      val want = local(edges, iters)
      assert(got == want, s"case $i (iters=$iters, edges=$edges)")
    }
  }

  test("result is invariant to input partition layout") {
    val params = Gen.Parameters.default
    for (i <- 0 until 5) {
      val edges = edgeGen(params, Seed(9000L + i)).get
      val df = edges.toDF("s", "d")
      val a = LinkRank.linkRank(df, "s", "d", iters = 3)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      val b = LinkRank.linkRank(df.repartition(7), "s", "d", iters = 3)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      val c = LinkRank.linkRank(df.coalesce(1), "s", "d", iters = 3)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(a == b && a == c, s"case $i diverged across layouts")
    }
  }
}
