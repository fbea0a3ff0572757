package graft.dedup

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {

  // A 12-token boilerplate header shared by docs 1 and 2 (doc 2 also
  // extends it by two tokens), unique tails; doc 3 shares nothing long
  // enough; doc 4 is too short to shingle at w=6.
  private def docs = {
    val s = spark
    import s.implicits._
    val header = "this software is provided as is without warranty of any kind whatsoever"
    Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta"),
      (2L, s"intro words first $header extra tail one two three four five six"),
      (3L, "a completely different document about query planning and shuffle costs today"),
      (4L, "too short"),
    ).toDF("doc_id", "text")
  }

  test("duplicatedSpans reports the maximal shared span in every occurrence") {
    val spans = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", minTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // header = 12 tokens; doc1 ordinals 0..11, doc2 ordinals 3..14
    assert(spans == Seq((1L, 0L, 11L, 12L), (2L, 3L, 14L, 12L)))
  }

  test("adjacent seed windows merge into one span, not window-sized fragments") {
    // 12-token shared run with w=6 yields 7 overlapping seeds per doc;
    // the merge must produce exactly ONE interval per doc (checked
    // above via span_tokens=12); also check nothing from doc 3/4 leaks
    val byDoc = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", minTokens = 6)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 1L, 2L -> 1L))
  }

  test("cutSpans keeps the lowest-id copy and rebuilds the others without it") {
    val out = SubstringDedup.cutSpans(docs, "text", "doc_id", minTokens = 6)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 is the keeper: untouched (token-space rebuild of its own text)
    assert(out(1L)._2 == 0L)
    assert(out(1L)._1.startsWith("this software is provided"))
    // doc 2 loses exactly the 12 header tokens, keeps intro + tail in order
    assert(out(2L) == (("intro words first extra tail one two three four five six", 12L)))
    // untouched docs pass through whole, including the unshingleable one
    assert(out(3L)._2 == 0L)
    assert(out(4L) == (("too short", 0L)))
  }

  test("scale shapes: seed detection is one hash agg + semi-join, islands window is per-doc") {
    val spans = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", minTokens = 6)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs shape leaked in:\n" + plan)
    // the gaps-and-islands windows must be partitioned by _doc — a
    // global single-task window would serialize the whole corpus
    assert(plan.contains("Window"))
    assert("Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty,
      "found a Window with an empty partition spec:\n" + plan)
    val cutPlan = SubstringDedup.cutSpans(docs, "text", "doc_id", minTokens = 6)
      .queryExecution.executedPlan.toString
    assert(!cutPlan.contains("CartesianProduct"))
  }

  test("a run duplicated only WITHIN one document is not flagged") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "one two three four five six seven one two three four five six seven"),
      (2L, "totally different content that shares no six gram with the first entry"),
    ).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(d, "text", "doc_id", minTokens = 6).count() == 0L)
  }
}
