package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Add-k bigram LM perplexity: hand-computed probabilities on a tiny
  * fixture, unseen-gram smoothing, filter semantics (short docs kept),
  * and the broadcast-model plan shape.
  */
class LangModelSpec extends SparkSpec {

  // corpus: d1 = "a b a b", d2 = "a a"
  //   bigram counts: (a,b)->2, (b,a)->1, (a,a)->1
  //   prefix totals: a->3, b->1;  V = 2
  private def fixture() = {
    val s = spark
    import s.implicits._
    Seq((1L, "a b a b"), (2L, "a a")).toDF("id", "text")
  }

  test("train counts bigrams, prefixes and vocab exactly") {
    val m = LangModel.train(fixture(), "text", "id", k = 0.5)
    assert(m.vocabSize == 2)
    val bi = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "a") -> 1L))
    val pre = m.prefix.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pre == Map("a" -> 3L, "b" -> 1L))
  }

  test("perplexity matches the closed-form add-k computation") {
    val m = LangModel.train(fixture(), "text", "id", k = 0.5)
    // denominators: c1 + k*(V+1) = c1 + 1.5
    val pBgivenA = 2.5 / 4.5 // (2+.5)/(3+1.5)
    val pAgivenB = 1.5 / 2.5 // (1+.5)/(1+1.5)
    val d1 = (math.log(pBgivenA) + math.log(pAgivenB) +
      math.log(pBgivenA)) / 3
    val got = LangModel.perplexity(fixture(), "text", "id", m)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-12)
    assert(math.abs(got(1L)._3 - math.exp(-d1)) < 1e-9)
    val pAgivenA = 1.5 / 4.5
    assert(math.abs(got(2L)._3 - 1.0 / pAgivenA) < 1e-9)
  }

  test("fully unseen prefixes score 1/(V+1); perplexity stays finite") {
    val s = spark
    import s.implicits._
    val m = LangModel.train(fixture(), "text", "id", k = 0.5)
    val alien = Seq((9L, "c c c")).toDF("id", "text")
    val ppl = LangModel.perplexity(alien, "text", "id", m)
      .head().getDouble(3)
    // P(c|c) = k / (0 + k*(V+1)) = 1/3 per bigram -> ppl = 3
    assert(math.abs(ppl - 3.0) < 1e-9)
  }

  test("filter drops the noisy tail, keeps clean and too-short docs") {
    val s = spark
    import s.implicits._
    val m = LangModel.train(fixture(), "text", "id", k = 0.5)
    val scored = Seq(
      (1L, "a b a b"), // in-distribution: low ppl
      (9L, "c c c"),   // unseen: ppl 3
      (5L, "a")        // one token: no bigram evidence -> kept
    ).toDF("id", "text")
    val kept = LangModel.perplexityFilter(scored, "text", "id", m,
      maxPpl = 2.5).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"got $kept")
    // looser threshold keeps the alien doc too
    val keptAll = LangModel.perplexityFilter(scored, "text", "id", m,
      maxPpl = 3.5).count()
    assert(keptAll == 3)
  }

  test("broadcast mode joins the model without a shuffle on the corpus side") {
    val m = LangModel.train(fixture(), "text", "id", k = 0.5)
    val plan = LangModel.perplexity(fixture(), "text", "id", m,
      broadcastModel = true).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join under broadcast mode:\n$plan")
  }
}
