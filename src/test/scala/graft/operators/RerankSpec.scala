package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RerankSpec extends SparkSpec {
  import spark.implicits._

  private def candidates() =
    // A fake single-query search result: qid, id, a numeric field
    // (recency proxy) and a similarity score.
    Seq(
      (0L, 1L, 100.0, 0.90),
      (0L, 2L, 130.0, 0.80),
      (0L, 3L, 160.0, 0.70),
      (0L, 4L, 400.0, 0.99),
      (0L, 5L, 100.0, 0.50))
      .toDF("qid", "id", "ts", "score")

  private def localDecay(fn: String, x: Double, origin: Double,
      scale: Double, offset: Double, decay: Double): Double = {
    val d = math.max(0.0, math.abs(x - origin) - offset)
    fn match {
      // exp(-d²/2σ²) with σ² = -scale²/(2 ln decay) ⇒ exp(d²·ln(decay)/scale²)
      case "gauss" => math.exp((d * d) * math.log(decay) / (scale * scale))
      case "exp" => math.exp(d * math.log(decay) / scale)
      case "linear" =>
        val s = scale / (1.0 - decay)
        math.max(0.0, (s - d) / s)
    }
  }

  test("decay curves: value is 1 inside the offset plateau, `decay` at scale") {
    for (fn <- Seq("gauss", "exp", "linear")) {
      val df = Seq((0L, 1L, 100.0), (0L, 2L, 110.0), (0L, 3L, 150.0))
        .toDF("qid", "id", "ts")
      val out = Rerank.decay(df, "ts", fn, origin = 100.0, scale = 40.0,
        idCols = Seq("id"), offsetParam = 10.0, decayParam = 0.5)
        .orderBy("id")
        .select("id", "rerank_score").as[(Long, Double)].collect().toMap
      // |100-100| = 0 and |110-100|-10 = 0: both inside the plateau
      assert(math.abs(out(1L) - 1.0) < 1e-12, s"$fn at origin: ${out(1L)}")
      assert(math.abs(out(2L) - 1.0) < 1e-12, s"$fn at plateau edge: ${out(2L)}")
      // |150-100|-10 = 40 = scale: the curve is pinned to decay=0.5 there
      assert(math.abs(out(3L) - 0.5) < 1e-9, s"$fn at scale: ${out(3L)}")
    }
  }

  test("decay matches the closed-form curves and replaces the score") {
    val (origin, scale, off, dec) = (100.0, 50.0, 0.0, 0.5)
    for (fn <- Seq("gauss", "exp", "linear")) {
      val out = Rerank.decay(candidates(), "ts", fn, origin, scale,
        idCols = Seq("id"), offsetParam = off, decayParam = dec, limit = 5)
        .orderBy("id")
        .select("id", "rerank_score").as[(Long, Double)].collect()
      out.foreach { case (id, got) =>
        val ts = Map(1L -> 100.0, 2L -> 130.0, 3L -> 160.0,
          4L -> 400.0, 5L -> 100.0)(id)
        val want = localDecay(fn, ts, origin, scale, off, dec)
        assert(math.abs(got - want) < 1e-9, s"$fn id=$id got=$got want=$want")
      }
    }
    // replace mode: id=4 (best retrieval score, far field value) must
    // sink below the near ones
    val ranks = Rerank.decay(candidates(), "ts", "gauss", origin, scale,
      idCols = Seq("id"), limit = 5)
      .select("id", "rerank_rank").as[(Long, Int)].collect().toMap
    assert(ranks(1L) < ranks(4L) && ranks(5L) < ranks(4L))
    // ties on the decay value break on id ascending: ts=100 twice
    assert(ranks(1L) == 1 && ranks(5L) == 2)
  }

  test("decay multiply mode combines retrieval score and curve") {
    val out = Rerank.decay(candidates(), "ts", "linear", origin = 100.0,
      scale = 100.0, idCols = Seq("id"), decayParam = 0.5, multiply = true,
      limit = 5)
      .select("id", "rerank_score").as[(Long, Double)].collect().toMap
    // linear s = 200; id=2: d=30 -> (200-30)/200 = 0.85; * 0.80 = 0.68
    assert(math.abs(out(2L) - 0.85 * 0.80) < 1e-12)
    // id=4: d=300 -> max(0, -100/200) = 0 -> product 0
    assert(out(4L) == 0.0)
  }

  test("decay rejects bad params and unknown curves") {
    intercept[IllegalArgumentException] {
      Rerank.decay(candidates(), "ts", "sigmoid", 0, 1, Seq("id")).collect()
    }
    intercept[IllegalArgumentException] {
      Rerank.decay(candidates(), "ts", "gauss", 0, -1, Seq("id")).collect()
    }
    intercept[IllegalArgumentException] {
      Rerank.decay(candidates(), "ts", "gauss", 0, 1, Seq("id"),
        decayParam = 1.0).collect()
    }
  }

  test("model rerank scores by integer embedding dot with the query") {
    val docs = Seq(
      (0L, 10L, "vector stream data engine"),
      (0L, 11L, "the quick brown fox"),
      (0L, 12L, "stream engine"),
      (0L, 13L, ""))
      .toDF("qid", "id", "text")
    val q = "vector stream data engine"
    val out = Rerank.model(docs, "text", q, idCols = Seq("id"), dim = 8)
      .select("id", "rerank_score").as[(Long, Long)].collect().toMap
    // local mirror: dot of encodeLocal pairs
    def dot(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => (x * y).toDouble }.sum.toLong
    val qe = graft.functions.TextEmbedding.encodeLocal(q, 8)
    for ((id, text) <- Seq(10L -> q, 11L -> "the quick brown fox",
        12L -> "stream engine", 13L -> "")) {
      val want = dot(qe, graft.functions.TextEmbedding.encodeLocal(text, 8))
      assert(out(id) == want, s"id=$id got=${out(id)} want=$want")
    }
    // the exact-match doc scores highest
    val best = Rerank.model(docs, "text", q, idCols = Seq("id"), dim = 8,
      limit = 1).select("id").as[Long].head()
    assert(best == 10L)
  }

  test("model rerank rejects non-deterministic providers") {
    val docs = Seq((0L, 1L, "x")).toDF("qid", "id", "text")
    intercept[IllegalArgumentException] {
      Rerank.model(docs, "text", "q", idCols = Seq("id"),
        provider = "qwen").collect()
    }
  }

  test("hybrid DecayRanker: legs pool candidates, decay field orders them") {
    import graft.operators.HybridSearch._
    val emb = Seq(
      (1L, Seq(1f, 0f), 10.0, "alpha"),
      (2L, Seq(0.9f, 0.1f), 20.0, "beta"),
      (3L, Seq(0f, 1f), 30.0, "gamma"),
      (4L, Seq(0.1f, 0.9f), 40.0, "delta"))
      .toDF("vec_id", "embedding", "ts", "txt")
    val q = Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
    // two legs with opposite metrics: every row lands in the pool
    val out = hybridSearch(emb,
      Seq(AnnSearchRequest(q, "embedding", "COSINE", limit = 2),
        AnnSearchRequest(q, "embedding", "L2", limit = 2)),
      DecayRanker("ts", "gauss", origin = 40.0, scale = 20.0),
      idCol = "vec_id", limit = 4)
    assert(out.columns.toSeq ==
      Seq("qid", "vec_id", "fused_score", "fused_rank"))
    val ranks = out.select("vec_id", "fused_rank")
      .as[(Long, Int)].collect().toMap
    // pool = cosine top2 {1,2} union L2-as-similarity legs... both legs
    // return 2 candidates each; decay toward ts=40 orders descending ts
    assert(ranks.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    val ordered = out.orderBy("fused_rank").select("vec_id").as[Long].collect()
    assert(ordered.sameElements(ordered.sortBy(id =>
      -Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0)(id))),
      s"decay toward ts=40 must order by ts desc: ${ordered.toSeq}")
  }

  test("hybrid ModelRanker scores the pooled candidates' text") {
    import graft.operators.HybridSearch._
    val emb = Seq(
      (1L, Seq(1f, 0f), "vector stream data engine"),
      (2L, Seq(0.9f, 0.1f), "unrelated words entirely"),
      (3L, Seq(0f, 1f), "stream engine"))
      .toDF("vec_id", "embedding", "txt")
    val q = Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
    val out = hybridSearch(emb,
      Seq(AnnSearchRequest(q, "embedding", "COSINE", limit = 3),
        AnnSearchRequest(q, "embedding", "L2", limit = 3)),
      ModelRanker("txt", "vector stream data engine"),
      idCol = "vec_id", limit = 3)
      .orderBy("fused_rank").select("vec_id").as[Long].collect()
    assert(out.head == 1L, s"exact text match must rank first: ${out.toSeq}")
  }

  test("hybrid function-score pool fetch is a broadcast join, never a shuffle of the base") {
    import graft.operators.HybridSearch._
    val base = spark.range(0, 10000).selectExpr("id AS vec_id",
      "array(cast(id % 7 as float), cast(id % 11 as float)) AS embedding",
      "cast(id as double) AS ts")
    val q = Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
    val out = hybridSearch(base,
      Seq(AnnSearchRequest(q, "embedding", "COSINE", limit = 5),
        AnnSearchRequest(q, "embedding", "L2", limit = 5)),
      DecayRanker("ts", "exp", origin = 0.0, scale = 100.0),
      idCol = "vec_id", limit = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"candidate pool must broadcast against the base:\n$plan")
    assert(out.count() == 5)
  }

  test("rerank over a real Knn result carries output columns through") {
    val emb = Seq(
      (1L, Seq(1f, 0f), 10.0),
      (2L, Seq(0.9f, 0.1f), 20.0),
      (3L, Seq(0f, 1f), 30.0))
      .toDF("vec_id", "embedding", "ts")
    val q = Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
    val hits = Knn.search(emb, q, "embedding", "vec_id", "COSINE", 3,
      outputCols = Seq("ts"))
    val reranked = Rerank.decay(hits, "ts", "gauss", origin = 30.0,
      scale = 10.0, idCols = Seq("vec_id"), limit = 3)
      .select("vec_id", "rerank_rank").as[(Long, Int)].collect().toMap
    // retrieval order was 1,2,3 (cosine); decay on ts flips it
    assert(reranked == Map(3L -> 1, 2L -> 2, 1L -> 3))
  }
}
