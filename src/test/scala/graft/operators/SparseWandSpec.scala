package graft.operators

import graft.SparkSpec
import graft.ann.SparseInverted
import org.apache.spark.sql.DataFrame

class SparseWandSpec extends SparkSpec {

  /** Deterministic corpus with a WAND-friendly impact skew: dimension
    * 9 is rare and high-valued, dimension 1 is common and low-valued
    * (the stopword shape the prune exists for).
    */
  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val skewed = Seq(
      (1L, Map(9 -> 7.0)), (2L, Map(9 -> 6.0)), (3L, Map(9 -> 5.0)),
      (4L, Map(1 -> 0.5, 9 -> 1.0)), (5L, Map(1 -> 0.2)))
    // plus a long tail of docs touching only the common dim
    val tail = (100L until 150L).map(i => (i, Map(1 -> 0.1)))
    (skewed ++ tail).toDF("id", "vec")
  }

  private def build(df: DataFrame, buckets: Int = 8) = {
    val postings = SparseInverted.postings(df, "vec", "id", buckets)
    (postings, SparseInverted.collectDimStats(
      SparseInverted.dimStats(postings)))
  }

  test("prune engages on skewed impacts and reproduces the exact top-k") {
    val (postings, stats) = build(corpus)
    val q = Map(1 -> 1.0, 9 -> 2.0)
    val r = SparseInverted.searchWand(postings, stats, q, "id", 3, 8)
    assert(r.pruned, "expected the max-score prune to engage")
    assert(r.essentialDims == Seq(9))
    val got = r.df.collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got == Seq((1L, 14.0), (2L, 12.0), (3L, 10.0)))
    // identical to the plain inverted path
    val plain = SparseInverted.search(postings, q, "id", 3, 8)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got == plain)
  }

  test("candidates near the partial threshold survive (rest dims can promote)") {
    val s = spark
    import s.implicits._
    // doc 20 is 4th by essential-dim partial but 3rd by full score:
    // the prune must keep it as a candidate and phase 2 must promote it.
    val df = Seq(
      (10L, Map(9 -> 7.0)), (11L, Map(9 -> 6.0)),
      (20L, Map(9 -> 5.4, 1 -> 0.5)), (21L, Map(9 -> 5.5)),
      (30L, Map(1 -> 0.1))).toDF("id", "vec")
    val (postings, stats) = build(df)
    val q = Map(1 -> 1.0, 9 -> 2.0)
    val r = SparseInverted.searchWand(postings, stats, q, "id", 3, 8)
    assert(r.pruned)
    val got = r.df.collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    // full scores: 10 -> 14.0, 11 -> 12.0, 20 -> 11.3, 21 -> 11.0
    assert(got == Seq((10L, 14.0), (11L, 12.0), (20L, 11.3)))
  }

  test("exactness property: WAND equals plain search on random corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242L)
    // Zipf-ish dims: low dims common, high dims rare; values positive.
    val docs = (0L until 300L).map { i =>
      val nnz = 3 + rnd.nextInt(6)
      (i, (0 until nnz).map { _ =>
        val d = math.min((math.pow(2.0, rnd.nextDouble() * 7)).toInt, 120)
        d -> (rnd.nextDouble() * (if (d > 60) 8.0 else 1.0) + 0.05)
      }.toMap)
    }
    val df = docs.toDF("id", "vec")
    val (postings, stats) = build(df, buckets = 16)
    (0 until 5).foreach { qi =>
      val q = (0 until 4).map { _ =>
        val d = math.min((math.pow(2.0, rnd.nextDouble() * 7)).toInt, 120)
        d -> (rnd.nextDouble() + 0.1)
      }.toMap
      val wand = SparseInverted.searchWand(postings, stats, q, "id", 10, 16)
        .df.collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      val plain = SparseInverted.search(postings, q, "id", 10, 16)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(wand.map(_._1) == plain.map(_._1), s"query $qi ids: $q")
      wand.zip(plain).foreach { case ((_, ws), (_, ps)) =>
        assert(math.abs(ws - ps) < 1e-9, s"query $qi scores")
      }
    }
  }

  test("batched paths match the per-query results (mixed prune/fallback)") {
    val s = spark
    import s.implicits._
    val (postings, stats) = build(corpus)
    // q0 prunes (skewed), q1 falls back (negative weight), q2 falls
    // back (single essential dim covers everything)
    val qs = Seq(
      "q0" -> Map(1 -> 1.0, 9 -> 2.0),
      "q1" -> Map(1 -> -1.0, 9 -> 2.0),
      "q2" -> Map(9 -> 1.0))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, -x._3, x._2)).toSeq
    val viaBatch = norm(
      SparseInverted.searchBatch(postings, qs, "id", 3, 8))
    val viaWandBatch = norm(
      SparseInverted.searchWandBatch(postings, stats, qs, "id", 3, 8))
    val viaSingle = qs.flatMap { case (qid, q) =>
      SparseInverted.search(postings, q, "id", 3, 8)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.sortBy(x => (x._1, -x._3, x._2))
    assert(viaBatch == viaSingle)
    assert(viaWandBatch == viaSingle)
  }

  test("batch plan: salted per-qid pre-prune at k>=1000, absent at k=10") {
    val (postings, _) = build(corpus)
    def planFor(k: Int): String =
      SparseInverted.searchBatch(postings,
        Seq("q" -> Map(1 -> 1.0, 9 -> 2.0)), "id", k, 8)
        .queryExecution.executedPlan.toString
    def windows(plan: String): Int = "Window \\[".r.findAllIn(plan).length
    val big = planFor(1200)
    assert(windows(big) == 2 && big.contains("_salt"),
      s"k=1200 should pre-prune per (qid, salt) then merge:\n$big")
    val small = planFor(10)
    assert(windows(small) == 1 && !small.contains("_salt"),
      s"k=10 must stay a single-window plan:\n$small")
  }

  test("guards fall back to the exact path without losing results") {
    val s = spark
    import s.implicits._
    val (postings, stats) = build(corpus)
    // negative query weight violates the WAND precondition
    val qNeg = Map(1 -> -1.0, 9 -> 2.0)
    val rNeg = SparseInverted.searchWand(postings, stats, qNeg, "id", 3, 8)
    assert(!rNeg.pruned)
    assert(rNeg.df.collect().map(_.getLong(0)).toSeq ==
      SparseInverted.search(postings, qNeg, "id", 3, 8)
        .collect().map(_.getLong(0)).toSeq)
    // negative stored value: guard reads the persisted min
    val dfNeg = Seq((1L, Map(9 -> 7.0)), (2L, Map(9 -> -1.0, 1 -> 5.0)))
      .toDF("id", "vec")
    val (p2, s2) = build(dfNeg)
    assert(!SparseInverted.searchWand(p2, s2, Map(1 -> 1.0, 9 -> 2.0),
      "id", 1, 8).pruned)
    // fewer than k essential docs: no valid threshold
    val rSmall = SparseInverted.searchWand(postings, stats,
      Map(9 -> 1.0, 1 -> 0.001), "id", 30, 8)
    assert(!rSmall.pruned)
    assert(rSmall.df.count() > 0)
    // single-dim query: partial == full, the two-phase machinery is
    // pointless and must short-circuit to the plain path
    assert(!SparseInverted.searchWand(postings, stats, Map(9 -> 1.0),
      "id", 2, 8).pruned)
  }
}
