package graft.operators

import graft.{SparkSpec, Tables}
import graft.ann.{Ivf, RaBitQ}
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

class RaBitQSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("centered_sign_bits packs sign(vec - center) LSB-first") {
    val row = spark.sql(
      """SELECT centered_sign_bits(array(1.0D, -1.0D, 2.0D, 0.0D),
        |       array(0.0D, 0.0D, 0.0D, 1.0D)) AS c""".stripMargin).head()
    // bits: [1,0,1,0] -> byte 0b0101 = 5, one byte for dim 4
    assert(row.getAs[Array[Byte]]("c").toSeq == Seq(5.toByte))
  }

  test("encode: code is ceil(dim/8) bytes, rnorm nonnegative, cells cover") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Ivf.train(emb, "embedding", k = 8, sampleSize = 500)
    val enc = RaBitQ.encode(emb, "embedding", model).cache()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val bad = enc.filter(
      length(col(RaBitQ.CODE)) =!= ((dim + 7) / 8) ||
        col(RaBitQ.RNORM) < 0).count()
    assert(bad == 0)
    assert(enc.select(RaBitQ.CID).distinct().count() > 1)
  }

  test("self-hit: a row's own vector ranks itself first with exact score 0") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Ivf.train(emb, "embedding", k = 8, sampleSize = 500)
    val enc = RaBitQ.encode(emb, "embedding", model).cache()
    Seq(0L, 7L, 42L).foreach { id =>
      val qv = emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
      val top = RaBitQ.searchOne(enc, model, qv, "embedding", "vec_id",
        k = 1, nprobe = 1).head()
      assert(top.getLong(0) == id)
      assert(top.getAs[Double]("score") == 0.0)
    }
  }

  test("full probe + refine covering all rows is EXACT (rerank guarantee)") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings").cache()
    val model = Ivf.train(emb, "embedding", k = 8, sampleSize = 500)
    val enc = RaBitQ.encode(emb, "embedding", model).cache()
    // nprobe = nlist probes every cell; k*refine = 10*50 >= 500 rows, so
    // the candidate set is the whole table and the exact re-rank must
    // reproduce brute force bit-for-bit.
    val queries = Seq(0L, 7L, 42L).map { id =>
      id -> emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
    }
    val recall = RaBitQ.recallAtK(emb, enc, model, queries,
      "embedding", "vec_id", k = 10, nprobe = 8, refine = 50)
    assert(recall == 1.0, s"full-coverage recall: $recall")
  }

  test("estimate-pruned search keeps usable recall at narrow refine") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings").cache()
    val model = Ivf.train(emb, "embedding", k = 8, sampleSize = 500)
    val enc = RaBitQ.encode(emb, "embedding", model).cache()
    val queries = Seq(0L, 7L, 42L).map { id =>
      id -> emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
    }
    // Uniform-random dim-16 vectors are the estimator's worst case (no
    // cluster structure); this asserts usability, not SOTA recall.
    val recall = RaBitQ.recallAtK(emb, enc, model, queries,
      "embedding", "vec_id", k = 10, nprobe = 8, refine = 4)
    assert(recall >= 0.5, s"recall@10 full-probe refine=4: $recall")
  }

  test("filtered search returns only rows matching the predicate") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val model = Ivf.train(emb, "embedding", k = 8, sampleSize = 500)
    val enc = RaBitQ.encode(emb, "embedding", model).cache()
    val qv = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    val res = RaBitQ.searchOne(enc, model, qv, "embedding", "vec_id",
      k = 5, nprobe = 8, filter = Some(col("label") >= 5),
      outputCols = Seq("label")).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Int]("label") >= 5))
  }

  test("collection route: IVF_RABITQ index serves search with refine_k") {
    val s = spark
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-rbq").toString)
    val c = cat.createCollection(CollectionDef("rbq", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_RABITQ", Some("L2"),
      Map("nlist" -> "8")))
    val qv = Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val res = CollectionSearch.search(s, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "8", "refine_k" -> "8")).collect()
    assert(res.length == 5)
    assert(res.head.getLong(0) == 0L) // self-hit first under L2

    // THE scale claim, plan-asserted: the estimate pass scans only the
    // 1-bit codes (narrow columns) — the float vector column must be
    // pruned from that scan (it is read only by the candidate re-rank
    // fetch), and the probe filter must prune _cid partitions.
    val df = CollectionSearch.search(s, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "2", "refine_k" -> "4"))
    val plan = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(sch =>
      sch.contains("_code") && !sch.contains("embedding")),
      s"estimate scan was not pruned to the code columns:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"probe filter did not prune partitions:\n$plan")
    assert(df.count() == 5)
  }
}
