package graft.pipeline

import graft.SparkSpec

class LinkRankSpec extends SparkSpec {
  import spark.implicits._

  test("integer mass propagation matches hand-computed iterations") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    // iter 1: contrib(1→·) = 85e6 div 200 = 425000 each;
    //         2→3 = 850000; 3→1 = 850000
    val m1 = LinkRank.linkRank(edges, "s", "d", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(m1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // iter 2 from those masses (floor division at every step)
    val m2 = LinkRank.linkRank(edges, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("iters = 0 returns the uniform initial mass; dangling mass absorbs") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val m0 = LinkRank.linkRank(edges, "s", "d", iters = 0)
      .as[(Long, Long)].collect().toMap
    assert(m0 == Map(1L -> 1000000L, 2L -> 1000000L))
    // node 2 has no out-edges: its mass is absorbed, not redistributed
    val m1 = LinkRank.linkRank(edges, "s", "d", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(m1 == Map(1L -> 150000L, 2L -> 1000000L))
    val m2 = LinkRank.linkRank(edges, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("duplicate edges count once; total mass never grows") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("s", "d")
    val m = LinkRank.linkRank(edges, "s", "d", iters = 1)
      .as[(Long, Long)].collect().toMap
    // dedup → outdeg 1 each: both send 850000, keep base 150000
    assert(m == Map(1L -> 1000000L, 2L -> 1000000L))
    for (it <- 0 to 4) {
      val total = LinkRank.linkRank(edges, "s", "d", iters = it)
        .agg(org.apache.spark.sql.functions.sum("mass")).as[Long].head()
      assert(total <= 2000000L, s"mass grew at iter $it: $total")
    }
  }

  test("runtime plan reuses the edge exchange across iterations (no per-iter rescan)") {
    val edges = spark.range(0, 5000).selectExpr(
      "id % 97 AS s", "(id * 31) % 89 AS d")
    val df = LinkRank.linkRank(edges, "s", "d", iters = 3)
    df.collect(): Unit // AQE reuses identical shuffle stages at runtime
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"),
      "expected the executed adaptive plan")
    val reused = "ReusedExchange".r.findAllIn(plan).length +
      "ReusedQueryStage".r.findAllIn(plan).length
    assert(reused >= 3,
      s"iterations must reuse the deduped edge/outdeg exchanges " +
        s"instead of recomputing the source per round (got $reused):\n" +
        plan.linesIterator.take(60).mkString("\n"))
  }

  test("scores order like float PageRank on a hub-spoke graph") {
    // 5 spokes all link to the hub; hub links to one spoke
    val edges = (Seq((10L, 1L)) ++ (1L to 5L).map(s => (s, 10L)))
      .toDF("s", "d")
    val m = LinkRank.linkRank(edges, "s", "d", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(m(10L) > m(1L), "hub must outrank every spoke")
    assert(m(1L) > m(2L), "the hub-endorsed spoke outranks the rest")
    assert((2L to 5L).map(m).toSet.size == 1, "symmetric spokes tie")
    // param validation
    intercept[IllegalArgumentException](
      LinkRank.linkRank(edges, "s", "d", iters = -1).collect())
    intercept[IllegalArgumentException](
      LinkRank.linkRank(edges, "s", "d", dampNum = 101).collect())
  }
}
