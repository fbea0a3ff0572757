package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the Column encode (what stored rows get) and the
  * driver-side mirror (what query text gets) implement the identical
  * spec — any divergence would silently skew every text-to-vector
  * search distance. Random texts include unicode letters, digits,
  * punctuation runs, and empties.
  */
class TextEmbeddingSpec extends SparkSpec {

  private val token = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12)),
    Gen.oneOf("Vector", "STREAM", "données", "ĉapelo", "x1", "42", "a"))
  private val text = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, token))
    .flatMap(ts => Gen.oneOf(" ", ", ", "!! ", "\t").map(ts.mkString))

  test("Column encode == driver-side encodeLocal on random text") {
    val s = spark
    import s.implicits._
    val texts = (0 until 200).flatMap(i =>
      text(Gen.Parameters.default, Seed(i.toLong))) :+ "" :+ "  ,,  "
    val dims = Seq(1, 4, 8, 16)
    dims.foreach { dim =>
      val got = texts.toDF("t")
        .select(col("t"), TextEmbedding.encode(col("t"), dim).as("e"))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      texts.foreach { t =>
        assert(got(t) == TextEmbedding.encodeLocal(t, dim),
          s"divergence on '$t' at dim=$dim")
      }
    }
  }

  test("Column encode == encodeLocal on supplementary-plane text") {
    val s = spark
    import s.implicits._
    // Tokens with non-BMP letters (Gothic hwair, Deseret, CJK Ext-B):
    // String.length counts them as 2 UTF-16 units but Spark's length()
    // counts code points — the mirror must agree on the bucket AND sign
    // (the BMP-only property gen above can never catch this).
    val texts = Seq("𐍈urt", "ab𐐨cd",
      "𠀀𠀁", "mixed 𐍈 bmp")
    Seq(4, 16).foreach { dim =>
      val got = texts.toDF("t")
        .select(col("t"), TextEmbedding.encode(col("t"), dim).as("e"))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      texts.foreach { t =>
        assert(got(t) == TextEmbedding.encodeLocal(t, dim),
          s"supplementary-plane divergence on '$t' at dim=$dim")
      }
    }
  }

  test("encode is L2-meaningful: identical text -> distance 0, " +
      "disjoint token bags usually differ") {
    val a = TextEmbedding.encodeLocal("the quick brown fox", 16)
    val b = TextEmbedding.encodeLocal("the quick brown fox", 16)
    assert(a == b)
    assert(a.map(x => x * x).sum > 0, "non-degenerate")
  }
}
