package graft.operators

import graft.{SparkSpec, Tables}
import graft.ann.Sq8
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

class Sq8Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, sfDir, "embeddings")

  test("trainBounds equals exact per-dimension min/max") {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val (mins, maxs) = Sq8.trainBounds(emb, "embedding", dim)
    // Independent computation through posexplode + groupBy.
    val rows = emb
      .select(posexplode(col("embedding").cast("array<double>")))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    (0 until dim).foreach { i =>
      assert(mins(i) == rows(i)._1, s"min dim $i")
      assert(maxs(i) == rows(i)._2, s"max dim $i")
    }
  }

  test("encode: codes are dim bytes; decode error <= half a grid step") {
    val model = Sq8.train(emb, "embedding", nlist = 4, sampleSize = 500)
    val enc = Sq8.encode(emb, "embedding", model)
    val scales = model.scales
    val sample = enc.select("embedding", Sq8.CODE).limit(50).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val v = r.getSeq[Float](0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == model.dim)
      v.indices.foreach { i =>
        val dec = model.mins(i) + (code(i) & 0xff) * scales(i)
        assert(math.abs(dec - v(i)) <= scales(i) / 2 + 1e-9,
          s"dim $i: decode $dec vs ${v(i)} (step ${scales(i)})")
      }
    }
  }

  test("self-hit: a row's own vector ranks itself first with exact score 0") {
    val s = spark
    import s.implicits._
    val model = Sq8.train(emb, "embedding", nlist = 8, sampleSize = 500)
    val enc = Sq8.encode(emb, "embedding", model).cache()
    Seq(0L, 7L, 42L).foreach { id =>
      val qv = emb.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
      val top = Sq8.searchOne(enc, model, qv, "embedding", "vec_id",
        k = 1, nprobe = 1).head()
      assert(top.getLong(0) == id)
      assert(top.getAs[Double]("score") == 0.0)
    }
    enc.unpersist()
  }

  test("full probe + refine covering all rows is EXACT (rerank guarantee)") {
    val s = spark
    import s.implicits._
    val data = emb.cache()
    val model = Sq8.train(data, "embedding", nlist = 8, sampleSize = 500)
    val enc = Sq8.encode(data, "embedding", model).cache()
    val queries = Seq(0L, 7L, 42L).map { id =>
      id -> data.filter($"vec_id" === id).select("embedding")
        .head().getSeq[Float](0)
    }
    val recall = Sq8.recallAtK(data, enc, model, queries,
      "embedding", "vec_id", k = 10, nprobe = 8, refine = 50)
    assert(recall == 1.0, s"full-coverage recall: $recall")
    // The ADC estimator is tight enough that a NARROW refine (2) over
    // all probed cells should still be near-exact — this is the
    // quantitative edge over the 1-bit RaBitQ estimator, whose recall
    // at its equivalent point sits near 0.5 on this data.
    val narrow = Sq8.recallAtK(data, enc, model, queries,
      "embedding", "vec_id", k = 10, nprobe = 8, refine = 2)
    assert(narrow >= 0.9, s"narrow-refine recall: $narrow")
    data.unpersist(); enc.unpersist()
  }

  test("COSINE estimates route through the stored decoded norm") {
    val s = spark
    import s.implicits._
    val model = Sq8.train(emb, "embedding", nlist = 4, metric = "COSINE",
      sampleSize = 500)
    val enc = Sq8.encode(emb, "embedding", model).cache()
    val qv = emb.filter($"vec_id" === 7).select("embedding")
      .head().getSeq[Float](0)
    val top = Sq8.searchOne(enc, model, qv, "embedding", "vec_id",
      k = 3, nprobe = 4).collect()
    assert(top.length == 3)
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getAs[Double]("score") - 1.0) < 1e-6)
    enc.unpersist()
  }

  test("zero-span dimensions encode exactly and stay rank-neutral") {
    val s = spark
    import s.implicits._
    // Dimension 1 is constant (span 0): its scale is 0, codes are 0,
    // and decode returns the exact constant.
    val df = Seq(
      (0L, Seq(0.0f, 5.0f, 1.0f)),
      (1L, Seq(1.0f, 5.0f, 2.0f)),
      (2L, Seq(2.0f, 5.0f, 0.0f)),
      (3L, Seq(3.0f, 5.0f, 4.0f))).toDF("vec_id", "embedding")
    val model = Sq8.train(df, "embedding", nlist = 1, sampleSize = 10)
    assert(model.scales(1) == 0.0)
    val enc = Sq8.encode(df, "embedding", model)
    val q = Seq(1.1f, 5.0f, 2.0f)
    val top = Sq8.searchOne(enc, model, q, "embedding", "vec_id",
      k = 4, nprobe = 1, refine = 1).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 0L, 2L, 3L))
  }

  test("estimate phase salts its candidate window once k*refine crosses the threshold") {
    val s = spark
    import s.implicits._
    val model = Sq8.train(emb, "embedding", nlist = 4, sampleSize = 500)
    val enc = Sq8.encode(emb, "embedding", model)
    val qv = emb.filter($"vec_id" === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    def planFor(k: Int): String =
      Sq8.search(enc, model, Seq(("q0", qv)), "embedding", "vec_id", k,
        nprobe = 4, refine = 4).queryExecution.executedPlan.toString
    def windows(plan: String): Int = "Window \\[".r.findAllIn(plan).length
    // k=300 × refine=4 ⇒ candidate budget r=1200 crosses the two-level
    // threshold: the estimate window salts (2 Window nodes) while the
    // k=300 exact re-rank stays single-window — 3 total.
    val big = planFor(300)
    assert(windows(big) == 3 && big.contains("_salt"),
      s"r=1200 estimate phase should pre-prune per (qid, salt):\n$big")
    val small = planFor(10)
    assert(windows(small) == 2 && !small.contains("_salt"),
      s"r=40 must keep both phases single-window:\n$small")
  }

  test("collection route: IVF_SQ8 index serves search with refine_k") {
    val s = spark
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-sq8").toString)
    val c = cat.createCollection(CollectionDef("sq8", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, emb.select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_SQ8", Some("L2"),
      Map("nlist" -> "8")))
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val res = CollectionSearch.search(s, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "8", "refine_k" -> "8")).collect()
    assert(res.length == 5)
    assert(res.head.getLong(0) == 0L) // self-hit first under L2

    // THE scale claim, plan-asserted: the estimate pass scans only the
    // byte codes (4x narrower than the vectors) — the float vector
    // column must be pruned from that scan (it is read only by the
    // candidate re-rank fetch), and the probe filter must prune _cid
    // partitions.
    val df = CollectionSearch.search(s, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "2", "refine_k" -> "4"))
    val plan = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(sch =>
      sch.contains("_sq8") && !sch.contains("embedding")),
      s"estimate scan was not pruned to the code columns:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"probe filter did not prune partitions:\n$plan")
    assert(df.count() == 5)

    // Reload path: a fresh search after dropping the in-memory cache
    // must reuse the persisted build (same result through loadSq8).
    IndexStore.drop(c, "embedding")
    c.createIndex(s, IndexDef("embedding", "IVF_SQ8", Some("L2"),
      Map("nlist" -> "8")))
    val res2 = CollectionSearch.search(s, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "8", "refine_k" -> "8")).collect()
    assert(res2.map(_.getLong(0)).toSeq == res.map(_.getLong(0)).toSeq)
  }
}
