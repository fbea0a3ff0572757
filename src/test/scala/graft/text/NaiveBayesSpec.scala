package graft.text

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {

  // good: alpha:3 beta:2 gamma:1 (nt=6); spam: buy:3 now:2 cheap:1
  // (nt=6); V=6; priors ln(1/2) each.
  private def trainDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta alpha", "good"),
      (2L, "beta alpha gamma", "good"),
      (3L, "buy now buy", "spam"),
      (4L, "now buy cheap", "spam"),
    ).toDF("doc_id", "text", "label")
  }

  test("score computes hand-checked add-k joint log-likelihoods for every label") {
    val s = spark
    import s.implicits._
    val m = NaiveBayes.train(trainDocs, "text", "label", k = 1.0)
    assert(m.vocabSize == 6)
    assert(m.labelStats.map(x => (x._1, x._3)) == Seq(("good", 6L), ("spam", 6L)))
    val scores = NaiveBayes.score(s, Seq((10L, "alpha beta")).toDF("doc_id", "text"),
        "text", "doc_id", m)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val lnHalf = math.log(0.5)
    assert(math.abs(scores("good") - (lnHalf + math.log(4.0 / 12) + math.log(3.0 / 12))) < 1e-12)
    assert(math.abs(scores("spam") - (lnHalf + 2 * math.log(1.0 / 12))) < 1e-12)
  }

  test("classify picks the argmax and breaks exact ties by label order") {
    val s = spark
    import s.implicits._
    val m = NaiveBayes.train(trainDocs, "text", "label")
    val out = NaiveBayes.classify(s, Seq(
        (10L, "alpha beta gamma"),   // good vocabulary
        (11L, "buy cheap now"),      // spam vocabulary
        (12L, "alpha buy"),          // symmetric evidence -> exact tie
      ).toDF("doc_id", "text"), "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "good", 11L -> "spam", 12L -> "good"))
  }

  test("empty documents score prior-only and stay in the result") {
    val s = spark
    import s.implicits._
    val m = NaiveBayes.train(trainDocs, "text", "label")
    val out = NaiveBayes.score(s, Seq((20L, "")).toDF("doc_id", "text"),
        "text", "doc_id", m)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(out.length == 2)
    out.foreach { case (_, lp) => assert(math.abs(lp - math.log(0.5)) < 1e-12) }
  }

  test("scale shape: the per-label fan-out is a broadcast, the count join never a cartesian product") {
    val s = spark
    import s.implicits._
    val m = NaiveBayes.train(trainDocs, "text", "label")
    val plan = NaiveBayes.score(s,
        Seq((10L, "alpha beta")).toDF("doc_id", "text"), "text", "doc_id", m)
      .queryExecution.executedPlan.toString
    // the labels table rides a broadcast (nested-loop over ~#labels
    // rows), so the token stream is never shuffled for the fan-out
    assert(plan.contains("Broadcast"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("10-way classification matches local brute-force NB (label-pruned path)") {
    val s = spark
    import s.implicits._
    // 10 labels with heavily overlapping vocabularies — the shape the
    // token-keyed (not token x label) scoring must stay exact on.
    val labels = (0 until 10).map(i => s"dom$i")
    val train = (0 until 60).map { i =>
      val l = i % 10
      (i.toLong, s"w${l} w${(l + 1) % 10} common shared w${i % 5} extra$i", labels(l))
    }.toDF("doc_id", "text", "label")
    val m = NaiveBayes.train(train, "text", "label", k = 1.0)
    val probe = Seq(
      (100L, "w3 w4 common shared"),
      (101L, "unseen tokens entirely"),
      (102L, "common common w7"),
      (103L, "")).toDF("doc_id", "text")
    val got = NaiveBayes.score(s, probe, "text", "doc_id", m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.size == 4 * 10)
    // brute force from the model's own distributed count table
    val counts = m.tokenCounts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val probeLocal = Seq(
      (100L, Seq("w3", "w4", "common", "shared")),
      (101L, Seq("unseen", "tokens", "entirely")),
      (102L, Seq("common", "common", "w7")),
      (103L, Seq.empty[String]))
    for ((id, toks) <- probeLocal; (l, prior, nt) <- m.labelStats) {
      val want = prior + toks.map { t =>
        math.log(counts.getOrElse((t, l), 0L) + m.k) -
          math.log(nt + m.k * m.vocabSize)
      }.sum
      assert(math.abs(got((id, l)) - want) < 1e-9,
        s"doc $id label $l: got ${got((id, l))} want $want")
    }
  }

  test("unseen tokens fall to the smoothing floor, not negative infinity") {
    val s = spark
    import s.implicits._
    val m = NaiveBayes.train(trainDocs, "text", "label")
    val out = NaiveBayes.classify(s,
        Seq((30L, "zebra quark")).toDF("doc_id", "text"), "text", "doc_id", m)
      .collect()
    assert(out.length == 1)
    val lp = out.head.getDouble(2)
    // prior + 2 * floor ln(1/12)
    assert(math.abs(lp - (math.log(0.5) + 2 * math.log(1.0 / 12))) < 1e-12)
    assert(!lp.isNegInfinity)
  }
}
