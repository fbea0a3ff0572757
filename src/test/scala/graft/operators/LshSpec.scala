package graft.operators

import graft.{SparkSpec, Tables}
import graft.ann.Lsh
import org.apache.spark.sql.functions._

class LshSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("driver-side signatures agree with the column expression bit-for-bit") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Lsh.train(dim = 64, tables = 4, numPlanes = 8)
    val rows = Lsh.assign(emb, "embedding", model)
      .select($"vec_id", $"embedding".cast("array<double>"), $"_sigs")
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val sigs = r.getSeq[Int](2)
      (0 until model.tables).foreach { t =>
        assert(sigs(t) == model.signature(v, t),
          s"vec ${r.getLong(0)} table $t: col ${sigs(t)} != driver ${model.signature(v, t)}")
      }
    }
  }

  test("full-probe LSH equals exact brute-force through the same code path") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Lsh.train(dim = 64, tables = 2, numPlanes = 4)
    val assigned = Lsh.assign(emb, "embedding", model).cache()
    val qv = emb.filter($"vec_id" === 7).select("embedding").head().getSeq[Float](0)
    val q = Seq((7L, qv)).toDF("qid", "qvec")
    val exact = Knn.search(emb, q, "embedding", "vec_id", "COSINE", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = Lsh.search(assigned, model, q, "embedding", "vec_id",
      k = 10, radius = model.numPlanes)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    assigned.unpersist()
  }

  test("multiprobe radius=1 recall is usable and the self-hit is found") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Lsh.train(dim = 64, tables = 4, numPlanes = 8)
    val assigned = Lsh.assign(emb, "embedding", model).cache()
    val queries = Seq(0L, 7L, 42L).map { id =>
      id -> emb.filter($"vec_id" === id).select("embedding").head().getSeq[Float](0)
    }
    val recall = Lsh.recallAtK(emb, assigned, model, queries,
      "embedding", "vec_id", k = 10, radius = 1)
    assert(recall > 0.2, s"radius-1 recall collapsed: $recall")
    queries.foreach { case (id, qv) =>
      val q = Seq((id, qv)).toDF("qid", "qvec")
      val top1 = Lsh.search(assigned, model, q, "embedding", "vec_id",
        k = 1, radius = 1).select("vec_id").head().getLong(0)
      assert(top1 == id, s"self-hit missed for $id (got $top1)")
    }
    assigned.unpersist()
  }

  test("radius grows the probe set monotonically; radius>=planes covers all buckets") {
    val model = Lsh.train(dim = 8, tables = 1, numPlanes = 6)
    val v = Array.tabulate(8)(i => math.sin(i * 1.3))
    val p0 = model.probes(v, 0, 0)
    val p1 = model.probes(v, 0, 1)
    val pAll = model.probes(v, 0, 6)
    assert(p0 == Seq(model.signature(v, 0)))
    assert(p1.toSet.subsetOf(pAll.toSet) && p0.toSet.subsetOf(p1.toSet))
    assert(p1.size == 7) // sig + 6 single-bit flips
    assert(pAll == (0 until 64))
  }
}
