package graft.operators

import graft.SparkSpec
import graft.ann.Hnsw
import org.apache.spark.sql.functions._

class HnswSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic vectors: grid points in 4-D
  private def corpus(n: Int) = spark.range(0, n).selectExpr(
    "id AS vec_id",
    "array(cast(id % 13 as float), cast((id * 7) % 11 as float), " +
      "cast((id * 3) % 5 as float), cast(id % 2 as float)) AS embedding")

  private def bruteTop(n: Int, q: Array[Double], k: Int): Seq[Long] = {
    (0L until n.toLong).map { id =>
      val v = Array[Double](id % 13, (id * 7) % 11, (id * 3) % 5, id % 2)
      val d = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, id)
    }.sortBy(identity).take(k).map(_._2)
  }

  test("exact fallback (ef >= segment size) returns the true top-k") {
    val g = Hnsw.build(corpus(300), "embedding", "vec_id",
      Hnsw.Params(m = 4, efConstruction = 16), segments = 4)
    val q = Array[Double](3.0, 5.0, 2.0, 1.0)
    val got = Hnsw.search(g, Seq(("q0", q.map(_.toFloat).toSeq)),
      "vec_id", k = 10, ef = 1000)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == bruteTop(300, q, 10), got.toString)
  }

  test("beam search recall at a normal operating point") {
    val data = corpus(500)
    val g = Hnsw.build(data, "embedding", "vec_id",
      Hnsw.Params(m = 8, efConstruction = 64), segments = 4)
    val queries = Seq(0L, 7L, 42L).map { i =>
      (i, Seq((i % 13).toFloat, ((i * 7) % 11).toFloat,
        ((i * 3) % 5).toFloat, (i % 2).toFloat))
    }
    val recall = Hnsw.recallAtK(data, g, queries, "embedding", "vec_id",
      k = 10, ef = 64, Hnsw.Params(m = 8, efConstruction = 64))
    assert(recall >= 0.8, s"recall $recall")
  }

  test("build is deterministic and layout-independent") {
    val a = Hnsw.build(corpus(200), "embedding", "vec_id",
      segments = 3).collect().sortBy(_.id)
    val b = Hnsw.build(corpus(200).repartition(7), "embedding", "vec_id",
      segments = 3).collect().sortBy(_.id)
    assert(a.toSeq == b.toSeq, "graph must not depend on input layout")
    // every neighbor list respects the degree caps
    a.foreach { nd =>
      nd.nbrs.zipWithIndex.foreach { case (ns, l) =>
        val cap = if (l == 0) 16 else 8 // 2m / m at m = 8 default
        assert(ns.size <= cap, s"node ${nd.id} layer $l degree ${ns.size}")
        assert(!ns.contains(nd.id), "no self-loops")
      }
    }
  }

  test("search adopts the persisted graph regardless of caller m/seed") {
    // built with non-default (m, seed); searched with default Params —
    // the persisted levels/adjacency must serve unchanged (only the
    // metric matters at walk time)
    val g = Hnsw.build(corpus(300), "embedding", "vec_id",
      Hnsw.Params(m = 16, efConstruction = 32, seed = 7L), segments = 4)
    val q = Array[Double](3.0, 5.0, 2.0, 1.0)
    val got = Hnsw.search(g, Seq(("q0", q.map(_.toFloat).toSeq)),
      "vec_id", k = 10, ef = 1000)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == bruteTop(300, q, 10), got.toString)
  }

  test("recall reaches 1.0 on datasets smaller than k") {
    val tiny = corpus(6)
    val g = Hnsw.build(tiny, "embedding", "vec_id",
      Hnsw.Params(m = 2, efConstruction = 4), segments = 1)
    val r = Hnsw.recallAtK(tiny, g,
      Seq((0L, Seq(0f, 0f, 0f, 0f))), "embedding", "vec_id",
      k = 10, ef = 100, Hnsw.Params(m = 2, efConstruction = 4))
    assert(r == 1.0, s"recall $r must not be capped by nq*k")
  }

  test("similarity metrics rank descending (COSINE)") {
    val data = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val p = Hnsw.Params(m = 2, efConstruction = 4, metric = "COSINE")
    val g = Hnsw.build(data, "embedding", "vec_id", p, segments = 1)
    val got = Hnsw.search(g, Seq(("q", Seq(1f, 0f, 0f, 0f))),
      "vec_id", k = 3, ef = 100, p)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L), got.toString)
  }

  test("multi-segment merge is an exact top-k over per-segment candidates") {
    // with ef = segment size per segment, every segment contributes its
    // exact local top-k, so the merged result is globally exact
    val g = Hnsw.build(corpus(400), "embedding", "vec_id",
      Hnsw.Params(m = 4, efConstruction = 16), segments = 8)
    val q = Array[Double](1.0, 1.0, 1.0, 1.0)
    val got = Hnsw.search(g, Seq(("q0", q.map(_.toFloat).toSeq)),
      "vec_id", k = 15, ef = 500)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == bruteTop(400, q, 15))
  }
}
