package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over random corpora (scalacheck Gen driven directly,
  * as in DedupPropertySpec): the BPE encode/decode pair must be a
  * lossless round trip for ANY learned merge list, and the local and
  * distributed trainers must agree merge-for-merge.
  */
class BpePropertySpec extends SparkSpec {

  // Small alphabet + repeated stems force heavy pair collisions (the
  // regime where merge tie-breaks and overlap rules actually bite).
  private val word = Gen.oneOf(
    "low", "lower", "lowest", "new", "newer", "newest",
    "wide", "wider", "widest", "ab", "aab", "aaab", "abab")
  private val doc = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(3, 10).flatMap(n => Gen.listOfN(n, doc))

  test("decode(encode(corpus)) is the whitespace-normalized corpus for any merge count") {
    val s = spark
    import s.implicits._
    (0 until 5).foreach { i =>
      val texts = corpus(Gen.Parameters.default, Seed(7000L + i)).get
      val docs = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val nMerges = 1 + i * 7 // 1, 8, 15, 22, 29
      val merges = Bpe.learnMerges(docs, "text", nMerges)
      val got = Bpe.encode(docs, "text", "doc_id", merges)
        .select($"doc_id", Bpe.decode($"tokens").as("d"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      texts.zipWithIndex.foreach { case (t, j) =>
        val want = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .mkString(" ")
        assert(got(j.toLong) == want,
          s"seed=$i doc=$j merges=$nMerges")
      }
    }
  }

  test("local and distributed trainers emit identical merge sequences") {
    val s = spark
    import s.implicits._
    (0 until 3).foreach { i =>
      val texts = corpus(Gen.Parameters.default, Seed(8000L + i)).get
      val docs = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val local = Bpe.learnMerges(docs, "text", 12)
      val dist = Bpe.learnMerges(docs, "text", 12,
        driverVocabLimit = 0L) // force the distributed path
      assert(local == dist, s"seed=$i")
    }
  }
}
