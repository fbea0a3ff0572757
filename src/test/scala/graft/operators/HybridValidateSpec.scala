package graft.operators

import graft.{SparkSpec, Tables}
import graft.operators.HybridSearch._
import graft.store.{Catalog, CollectionDef, FieldDef}
import graft.validate.Validators
import graft.workload.Workload
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class HybridValidateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hybrid search fuses two metric requests with RRF and carries output fields") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = hybridSearch(emb,
      Seq(
        AnnSearchRequest(q, "embedding", "COSINE", limit = 10),
        AnnSearchRequest(q, "embedding", "L2", limit = 10)),
      RrfRanker(60), idCol = "vec_id", limit = 5, outputCols = Seq("label"))
    val rows = out.orderBy("fused_rank").collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[Long]("vec_id") == 0L) // self-match tops both lists
    assert(out.columns.contains("label"))
  }

  test("hybrid search with filter strings per request and weighted ranker") {
    val s = spark
    import s.implicits._
    val emb = Tables.load(s, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = hybridSearch(emb,
      Seq(
        AnnSearchRequest(q, "embedding", "COSINE", limit = 10,
          filter = Some("label >= 5")),
        AnnSearchRequest(q, "embedding", "L2", limit = 10,
          filter = Some("label < 5"))),
      WeightedRanker(Seq(0.6, 0.4)), idCol = "vec_id", limit = 8)
    assert(out.count() == 8)
  }

  test("multiQuery tags vector and bm25 results side-by-side") {
    val s = spark
    import s.implicits._
    val v = Seq((1L, 0.9), (2L, 0.8)).toDF("id", "score")
    val t = Seq((3L, 5.0)).toDF("id", "score")
    val out = multiQuery(v, t, "id").collect()
    assert(out.length == 3)
    assert(out.map(_.getString(2)).toSet == Set("vector", "bm25"))
  }

  test("searchAllCollections loops the catalog") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-all").toString)
    Seq("c1", "c2").foreach { n =>
      val c = cat.createCollection(CollectionDef(n, Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true))))
      c.insert(s, Seq(Tuple1(1L), Tuple1(2L)).toDF("id"))
    }
    val out = searchAllCollections(s, cat, (_, df) => df.agg(count(lit(1)).as("n")))
    val rows = out.collect().map(r => (r.getString(1), r.getLong(0))).toMap
    assert(rows == Map("c1" -> 2L, "c2" -> 2L))
  }

  test("checkResultShape flags underfilled queries") {
    val s = spark
    import s.implicits._
    val res = Seq((0L, 1L), (0L, 2L), (1L, 9L)).toDF("qid", "vec_id")
    val bad = checkResultShape(res, "qid", nq = 2, topk = 2)
    assert(bad == Seq((1L, 1L)))
    intercept[AssertionError](checkResultShape(res, "qid", nq = 3, topk = 1))
  }

  test("stable checksum: deterministic, pk-order independent, content sensitive") {
    val s = spark
    import s.implicits._
    val a = Seq((2L, 1.23456789, "x"), (1L, 0.5, "y"))
      .toDF("id", "score", "name")
    val b = Seq((1L, 0.5, "y"), (2L, 1.23456789, "x")) // same rows, other order
      .toDF("id", "score", "name")
    val c = Seq((1L, 0.5, "y"), (2L, 1.23456789, "z"))
      .toDF("id", "score", "name")
    val (ha, hb, hc) = (Validators.stableChecksum(a, "id"),
      Validators.stableChecksum(b, "id"), Validators.stableChecksum(c, "id"))
    assert(ha == hb)
    assert(ha != hc)
    assert(ha.length == 64)
    // float rounding to 5 decimals: 1.234567 and 1.2345699 collide
    val d1 = Seq((1L, 1.234567)).toDF("id", "v")
    val d2 = Seq((1L, 1.2345699)).toDF("id", "v")
    assert(Validators.stableChecksum(d1, "id") == Validators.stableChecksum(d2, "id"))
  }

  test("checksum normalization: bytes hex, sorted map keys, arrays") {
    val s = spark
    import s.implicits._
    val df1 = Seq((1L, Array[Byte](0x0a, -1), Map("b" -> 2.0, "a" -> 1.0), Seq(1.0, 2.0)))
      .toDF("id", "bin", "m", "arr")
    val df2 = Seq((1L, Array[Byte](0x0a, -1), Map("a" -> 1.0, "b" -> 2.0), Seq(1.0, 2.0)))
      .toDF("id", "bin", "m", "arr")
    assert(Validators.stableChecksum(df1, "id") == Validators.stableChecksum(df2, "id"))
    assert(Validators.normFloat(1.000001) == "1")
    assert(Validators.normFloat(-0.0000001) == "0")
    assert(Validators.normFloat(2.5) == "2.5")
  }

  test("count/pk validators") {
    val s = spark
    val orders = Tables.load(s, sfDir, "orders")
    assert(Validators.validateCount(orders, None, orders.count()).isEmpty)
    assert(Validators.validateCount(orders, None, -1).isDefined)
    assert(Validators.validatePksPresent(orders, "o_orderkey", Seq(1L, 2L)).isEmpty)
    assert(Validators.validatePksAbsent(orders, "o_orderkey", Seq(-5L)).isEmpty)
    assert(Validators.validatePksAbsent(orders, "o_orderkey", Seq(1L)).isDefined)
  }

  test("pressure runner: deterministic op mix, all ops succeed, stats populated") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-press").toString)
    val c = cat.createCollection(CollectionDef("press", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType),
      FieldDef("version", LongType))))
    c.insert(s, (0L until 50L).map(i => (i, i % 7, s"seed_$i", 0L))
      .toDF("id", "category", "content", "version"))
    val res = Workload.runPressure(s, c,
      ops = Seq("insert", "upsert", "query", "count"),
      numOps = 12, concurrency = 3, seed = 7L)
    assert(res.stats("total") == 12.0)
    assert(res.stats("failed") == 0.0, s"errors: ${res.errors}")
    assert(res.stats("qps") > 0)
    assert(res.perOp.values.sum == 12L)
    // deterministic plan: same seed -> same op mix
    val res2 = Workload.runPressure(s, c,
      ops = Seq("insert", "upsert", "query", "count"),
      numOps = 12, concurrency = 3, seed = 7L)
    assert(res.perOp == res2.perOp)
  }
}
