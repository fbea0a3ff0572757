package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: both chunkers equal their straight-line local
  * models on random corpora, sizes, strides, budgets, and delimiters.
  * (Drives scalacheck Gen directly — the scalatestplus bridge isn't
  * available offline.)
  */
class ChunkerPropertySpec extends SparkSpec {

  private val word = Gen.oneOf("a", "bb", "ccc", "dddd", "stream", "x1")
  private val doc = Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, doc))

  private def windowModel(text: String, size: Int,
      stride: Int): Seq[(Int, String, Int)] = {
    val t = text.split(" ", -1)
    val n = t.length
    val nw = if (n <= size) 1 else (n - size + stride - 1) / stride + 1
    (0 until nw).map { g =>
      val s = g * stride
      (g, t.slice(s, s + size).mkString(" "), math.min(size, n - s))
    }
  }

  private def boundaryModel(text: String, budget: Int,
      delim: String): Seq[(Int, String, Int, Int)] = {
    val units = {
      // literal split keeping trailing empties
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      var done = false
      while (!done) {
        val at = text.indexOf(delim, start)
        if (at < 0) { out += text.substring(start); done = true }
        else { out += text.substring(start, at); start = at + delim.length }
      }
      out.toSeq
    }
    var cum = 0L
    val byChunk = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[String]]
    units.foreach { u =>
      byChunk.getOrElseUpdate((cum / budget).toInt,
        scala.collection.mutable.ArrayBuffer.empty[String]) += u
      cum += u.length + delim.length
    }
    byChunk.toSeq.map { case (id, us) =>
      val ct = us.mkString(delim)
      (id, ct, us.length, ct.length)
    }
  }

  test("tokenWindows == the local window model on random corpora") {
    val s = spark
    import s.implicits._
    (0 until 8).foreach { i =>
      val params = for {
        texts <- corpus
        size <- Gen.choose(1, 8)
        stride <- Gen.choose(1, size)
      } yield (texts, size, stride)
      val (texts, size, stride) =
        params(Gen.Parameters.default, Seed(4100L + i)).get
      val docs = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val got = Chunker.tokenWindows(docs, "text", "doc_id", size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .sortBy(x => (x._1, x._2))
      val want = texts.zipWithIndex.flatMap { case (t, j) =>
        windowModel(t, size, stride).map(w => (j.toLong, w._1, w._2, w._3))
      }.sortBy(x => (x._1, x._2))
      assert(got.toSeq == want,
        s"seed ${4100 + i}: size=$size stride=$stride")
    }
  }

  test("boundaryChunks == the local budget model; reassembly lossless") {
    val s = spark
    import s.implicits._
    (0 until 8).foreach { i =>
      val params = for {
        texts <- corpus
        budget <- Gen.choose(1, 40)
        delim <- Gen.oneOf(" ", ". ", "|")
      } yield (texts, budget, delim)
      val (texts, budget, delim) =
        params(Gen.Parameters.default, Seed(4200L + i)).get
      val docs = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val got = Chunker.boundaryChunks(docs, "text", "doc_id", budget, delim)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), r.getInt(4)))
        .sortBy(x => (x._1, x._2))
      val want = texts.zipWithIndex.flatMap { case (t, j) =>
        boundaryModel(t, budget, delim)
          .map(c => (j.toLong, c._1, c._2, c._3, c._4))
      }.sortBy(x => (x._1, x._2))
      assert(got.toSeq == want, s"seed ${4200 + i}: budget=$budget delim='$delim'")
      // lossless: per doc, chunks joined by the delimiter == the text
      got.groupBy(_._1).foreach { case (id, rows) =>
        assert(rows.sortBy(_._2).map(_._3).mkString(delim) ==
          texts(id.toInt), s"doc $id not lossless")
      }
    }
  }
}
