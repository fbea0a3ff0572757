package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import spark.implicits._

  // 1-D embeddings on a line: similarity order under L2 is obvious.
  private def corpus() = (0L to 9L)
    .map(i => (i, Seq(i.toFloat, 0f)))
    .toDF("vec_id", "embedding")

  test("hard negatives exclude self and positives, keep the next-best k") {
    val q = Seq((5L, Seq(5f, 0f))).toDF("qid", "qvec")
    val pos = Seq((5L, 4L), (5L, 6L)).toDF("qid", "vec_id")
    val out = Mining.hardNegatives(corpus(), q, pos,
      "embedding", "vec_id", metric = "L2", k = 3)
      .orderBy("rank").select("vec_id", "rank")
      .as[(Long, Int)].collect().toSeq
    // nearest to 5 are [5(self), 4(pos), 6(pos), 3, 7, 2, ...] →
    // negatives 3, 7 (tie at distance 2 → id asc), then 2 (dist 3,
    // ties with 8 on distance → id asc)
    assert(out == Seq((3L, 1), (7L, 2), (2L, 3)), out.toString)
  }

  test("boundary exactness: high-ranking positives never under-fill k") {
    val q = Seq((0L, Seq(0f, 0f))).toDF("qid", "qvec")
    // every one of the query's 4 nearest is a positive; k=5 must still
    // return 5 true negatives (the overfetch covers the anti-joined set)
    val pos = (1L to 4L).map(p => (0L, p)).toDF("qid", "vec_id")
    val out = Mining.hardNegatives(corpus(), q, pos,
      "embedding", "vec_id", metric = "L2", k = 5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(5L, 6L, 7L, 8L, 9L), out.toString)
  }

  test("empty positives = plain self-excluding top-k; excludeSelf=false keeps self") {
    val q = Seq((2L, Seq(2f, 0f))).toDF("qid", "qvec")
    val none = Seq.empty[(Long, Long)].toDF("qid", "vec_id")
    val out = Mining.hardNegatives(corpus(), q, none,
      "embedding", "vec_id", metric = "L2", k = 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
    val withSelf = Mining.hardNegatives(corpus(), q, none,
      "embedding", "vec_id", metric = "L2", k = 1, excludeSelf = false)
      .select("vec_id").as[Long].collect().toSeq
    assert(withSelf == Seq(2L), "self is the 0-distance top hit")
  }

  test("similarity metrics rank descending; corpus scanned once (broadcast queries)") {
    val q = Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
    val none = Seq.empty[(Long, Long)].toDF("qid", "vec_id")
    val df = Mining.hardNegatives(corpus(), q, none,
      "embedding", "vec_id", metric = "COSINE", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"queries must broadcast against the corpus:\n$plan")
    // cosine((i,0),(1,0)) = i/(i·1) — EXACTLY 1.0 for every i>0 (dot
    // and norms are exact floats), so all of 1..9 tie and the (score,
    // id) tie-break decides; the self row (qid 0 = the zero vector)
    // is excluded anyway.
    val out = df.orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L), out.toString)
  }
}
