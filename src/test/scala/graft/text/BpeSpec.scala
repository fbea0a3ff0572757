package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training/encoding against the canonical Sennrich fixture
  * (low/lower/newest/widest), whose merge sequence is hand-derivable
  * and independently pinned by tools/ref_bpe.py. The oracle entries
  * (t18–t21) re-check the pair counts and roundtrip on the real
  * documents table; this spec owns the merge-by-merge semantics.
  */
class BpeSpec extends SparkSpec {

  // 5x low, 2x lower, 6x newest, 3x widest — one word per doc.
  private def fixture = {
    val s = spark
    import s.implicits._
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  // Hand-derived (and tools/ref_bpe.py-confirmed) first 8 merges.
  private val expectedMerges = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
    ("lo", "w"), ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"))

  test("learnMerges reproduces the canonical Sennrich merge sequence") {
    assert(Bpe.learnMerges(fixture, "text", 8) == expectedMerges)
  }

  test("learnMerges stops early when no pair repeats") {
    // Every word unique, every char distinct: all pair counts are 1.
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abc"), (1L, "def")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, "text", 10).isEmpty)
  }

  test("tie-break is count desc then (left, right) lexicographic") {
    val s = spark
    import s.implicits._
    // "ba" x2 and "ab" x2: pairs (b,a)=2, (a,b)=2, (a,</w>)=2,
    // (b,</w>)=2 — all tied; (a,</w>) is lexicographically first.
    val docs = Seq((0L, "ba ba"), (1L, "ab ab")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, "text", 1) == Seq(("a", "</w>")))
  }

  test("encode matches the reference encodes, including unseen words") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "low"), (1L, "lower"), (2L, "newest"), (3L, "widest"),
      (4L, "lowest"), (5L, "newer"), (6L, "wide"), (7L, "zz"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", "doc_id", expectedMerges)
      .orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toList)
    assert(got.toList == List(
      List("low", "</w>"),
      List("low", "e", "r", "</w>"),
      List("newest</w>"),
      List("w", "i", "d", "est</w>"),
      List("low", "est</w>"),
      List("n", "ew", "e", "r", "</w>"),
      List("w", "i", "d", "e", "</w>"),
      List("z", "z", "</w>")))
  }

  test("merge rewrite is left-to-right non-overlapping (aaa case)") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", "doc_id", Seq(("a", "a")))
      .head().getSeq[String](1).toList
    assert(got == List("aa", "a", "</w>"))
  }

  test("decode(encode(x)) is whitespace-normalized x for multi-word docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "newest low  lower\twidest"),
      (1L, "  low newest "),
      (2L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", "doc_id", expectedMerges)
      .select(col("doc_id"), Bpe.decode(col("tokens")).as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got.toList == List("newest low lower widest", "low newest", ""))
  }

  test("distributed fallback path agrees with the driver-side loop") {
    // driverVocabLimit=0 forces the distributed rounds;
    // checkpointEvery=2 exercises its lineage truncation too.
    assert(Bpe.learnMerges(fixture, "text", 8, checkpointEvery = 2,
      driverVocabLimit = 0L) == expectedMerges)
  }

  test("distributed fallback also stops early and tie-breaks the same") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "ba ba"), (1L, "ab ab")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, "text", 1, driverVocabLimit = 0L)
      == Seq(("a", "</w>")))
    val uniq = Seq((0L, "abc"), (1L, "def")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(uniq, "text", 10, driverVocabLimit = 0L).isEmpty)
  }

  test("pairCounts round 0 matches hand counts on the fixture") {
    val got = Bpe.pairCounts(Bpe.wordVocab(fixture, "text"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // spot checks: e-s 9 (newest 6 + widest 3), l-o 7 (low 5 + lower 2),
    // w-e 8 (lower 2 + newest 6), t-</w> 9
    assert(got(("e", "s")) == 9L)
    assert(got(("l", "o")) == 7L)
    assert(got(("w", "e")) == 8L)
    assert(got(("t", "</w>")) == 9L)
  }
}
