package graft.operators

import graft.{SparkSpec, Tables}
import graft.ann.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, sfDir, "embeddings")

  test("encode: m-byte codes, each byte the argmin codeword of the residual subspace") {
    val model = Pq.train(emb, "embedding", nlist = 4, m = 8, ksub = 16,
      sampleSize = 400)
    val enc = Pq.encode(emb, "embedding", model)
    val sample = enc.select("embedding", Pq.CID, Pq.CODE).limit(30).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble).toArray
      val cid = r.getInt(1)
      val code = r.getAs[Array[Byte]](2)
      assert(code.length == model.m)
      val cent = model.ivf.centroids(cid)
      val res = v.indices.map(i => v(i) - cent(i)).toArray
      (0 until model.m).foreach { j =>
        val sub = res.slice(j * model.dsub, (j + 1) * model.dsub)
        val best = model.codebook(j).zipWithIndex.minBy { case (cw, _) =>
          sub.indices.map(i => { val d = sub(i) - cw(i); d * d }).sum
        }._2
        assert((code(j) & 0xff) == best,
          s"subspace $j: code ${code(j) & 0xff} vs argmin $best")
      }
    }
  }

  test("self-hit: a row's own vector ranks itself first with exact score 0") {
    val s = spark
    import s.implicits._
    val model = Pq.train(emb, "embedding", nlist = 8, m = 8, ksub = 32,
      sampleSize = 500)
    val enc = Pq.encode(emb, "embedding", model).cache()
    Seq(0L, 7L, 42L).foreach { id =>
      val qv = emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
      val top = Pq.searchOne(enc, model, qv, "embedding", "vec_id",
        k = 1, nprobe = 2, refine = 8).head()
      assert(top.getLong(0) == id, s"query $id got ${top.getLong(0)}")
      assert(top.getAs[Double]("score") == 0.0)
    }
    enc.unpersist()
  }

  test("full probe + refine covering all rows is EXACT (rerank guarantee)") {
    val s = spark
    import s.implicits._
    val n = emb.count().toInt
    val model = Pq.train(emb, "embedding", nlist = 4, m = 8, ksub = 16,
      sampleSize = 400)
    val enc = Pq.encode(emb, "embedding", model)
    val qv = emb.filter($"vec_id" === 3L).select("embedding")
      .head().getSeq[Float](0)
    val exact = graft.operators.Knn.searchOne(emb, qv, "embedding", "vec_id",
      "L2", 10).select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // refine large enough that the candidate set is every row: the
    // exact re-rank must then return the exact top-k regardless of how
    // lossy the m-byte estimate is.
    val approx = Pq.searchOne(enc, model, qv, "embedding", "vec_id",
      k = 10, nprobe = 4, refine = n).select("vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(approx.toSeq == exact.toSeq)
  }

  test("cosine estimates divide by the stored exact norm; recall is high") {
    val s = spark
    import s.implicits._
    val model = Pq.train(emb, "embedding", nlist = 4, m = 16, ksub = 32,
      metric = "COSINE", sampleSize = 500)
    val enc = Pq.encode(emb, "embedding", model).cache()
    val qv = emb.filter($"vec_id" === 5L).select("embedding")
      .head().getSeq[Float](0)
    val top = Pq.searchOne(enc, model, qv, "embedding", "vec_id",
      k = 1, nprobe = 4, refine = 8).head()
    assert(top.getLong(0) == 5L)
    assert(math.abs(top.getAs[Double]("score") - 1.0) < 1e-9)
    val queries = Seq(0L, 5L, 9L, 13L).map { id =>
      id -> emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
    }
    val rec = Pq.recallAtK(emb, enc, model, queries, "embedding", "vec_id",
      k = 10, nprobe = 4, refine = 8)
    assert(rec >= 0.8, s"COSINE recall@10 $rec")
    enc.unpersist()
  }

  test("recall@k: generous probes + refine recover near-exact L2 recall") {
    val s = spark
    import s.implicits._
    val model = Pq.train(emb, "embedding", nlist = 8, m = 8, ksub = 64,
      sampleSize = 500)
    val enc = Pq.encode(emb, "embedding", model).cache()
    val queries = Seq(1L, 11L, 21L, 31L).map { id =>
      id -> emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
    }
    val rec = Pq.recallAtK(emb, enc, model, queries, "embedding", "vec_id",
      k = 10, nprobe = 6, refine = 8)
    assert(rec >= 0.8, s"L2 recall@10 $rec")
    enc.unpersist()
  }

  test("collection route: a declared IVF_PQ index serves search exactly at full probe") {
    val s = spark
    import s.implicits._
    import graft.store._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-pqroute").toString)
    val c = cat.createCollection(CollectionDef("pqr", Seq(
      FieldDef("vec_id", org.apache.spark.sql.types.LongType,
        nullable = false, isPrimary = true),
      FieldDef("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), dim = Some(64)))))
    c.insert(s, emb.select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_PQ", Some("L2"),
      Map("nlist" -> "4", "m" -> "8", "nbits" -> "4")))
    val qv = emb.filter($"vec_id" === 11L).select("embedding")
      .head().getSeq[Float](0)
    val routed = CollectionSearch.search(s, c, "embedding", qv, 10,
      searchParams = Map("nprobe" -> "4", "refine_k" -> "100"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(emb, qv, "embedding", "vec_id", "L2", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(routed == exact)
  }

  test("estimate phase joins the broadcast probe table on the cell id") {
    val s = spark
    import s.implicits._
    val model = Pq.train(emb, "embedding", nlist = 4, m = 8, ksub = 16,
      sampleSize = 400)
    val enc = Pq.encode(emb, "embedding", model)
    val qv = emb.filter($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0)
    val plan = Pq.searchOne(enc, model, qv, "embedding", "vec_id",
      k = 5, nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe table must broadcast-equi-join on _cid:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"no all-pairs anywhere in the PQ plan:\n$plan")
  }
}
