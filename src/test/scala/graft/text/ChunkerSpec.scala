package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Passage chunking: sliding token windows and char-budget boundary
  * chunks — coverage, overlap, reassembly, edge docs, plan shape.
  */
class ChunkerSpec extends SparkSpec {

  test("tokenWindows: overlap, coverage, and last-window clipping") {
    val s = spark
    import s.implicits._
    // 10 tokens, size 4, stride 3 -> starts 0,3,6 plus clip: nw = ceil(6/3)+1 = 3
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunker.tokenWindows(docs, "text", "doc_id", size = 4, stride = 3)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(out(0).getString(2) == "w1 w2 w3 w4")
    assert(out(1).getString(2) == "w4 w5 w6 w7")
    assert(out(2).getString(2) == "w7 w8 w9 w10")
    assert(out.map(_.getInt(3)).toSeq == Seq(4, 4, 4))
    // every token appears in at least one window
    val covered = out.flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("tokenWindows: short doc yields exactly one full-doc window") {
    val s = spark
    import s.implicits._
    val docs = Seq((7L, "a b c")).toDF("doc_id", "text")
    val out = Chunker.tokenWindows(docs, "text", "doc_id", 32, 24).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 0 && out(0).getString(2) == "a b c" &&
      out(0).getInt(3) == 3)
  }

  test("tokenWindows: ragged tail window reports its true token count") {
    val s = spark
    import s.implicits._
    // 11 tokens, size 4, stride 4 (no overlap): windows 4,4,3
    val docs = Seq((1L, (1 to 11).mkString(" "))).toDF("doc_id", "text")
    val out = Chunker.tokenWindows(docs, "text", "doc_id", 4, 4)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getInt(3)).toSeq == Seq(4, 4, 3))
    assert(out(2).getString(2) == "9 10 11")
  }

  test("boundaryChunks: breaks on unit boundaries, reassembly is lossless") {
    val s = spark
    import s.implicits._
    val text = (1 to 30).map(i => f"word$i%02d").mkString(" ") // 30 x 6 chars
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val out = Chunker.boundaryChunks(docs, "text", "doc_id", budgetChars = 50)
      .orderBy("chunk_id").collect()
    // weight per unit = 6 + 1 = 7; floor(cum/50) increments every ceil(50/7)=8 units
    assert(out.length > 1)
    // lossless: joining the chunks with the delimiter restores the text
    assert(out.map(_.getString(2)).mkString(" ") == text)
    // n_units / n_chars agree with the chunk text itself
    out.foreach { r =>
      assert(r.getInt(3) == r.getString(2).split(" ", -1).length)
      assert(r.getInt(4) == r.getString(2).length)
    }
    // every chunk except the last stays within budget + one unit
    out.dropRight(1).foreach(r => assert(r.getInt(4) <= 50 + 7))
  }

  test("boundaryChunks: sentence-delimiter chunking and oversized unit") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "short one. " + ("x" * 40) + ". tail bit"),
      (2L, "")).toDF("doc_id", "text")
    val out = Chunker.boundaryChunks(docs, "text", "doc_id",
        budgetChars = 20, delimiter = ". ")
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // unit 2 (40 chars) overruns its chunk; unit 3 lands in a LATER id
    // (ids may skip) and reassembly with the delimiter is lossless
    assert(d1.map(_.getString(2)).mkString(". ") ==
      "short one. " + ("x" * 40) + ". tail bit")
    assert(d1.map(_.getInt(1)).toSeq == d1.map(_.getInt(1)).toSeq.sorted)
    // empty text -> exactly one empty chunk, not zero rows
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(2) == "" && d2(0).getInt(3) == 1)
  }

  test("null text: the doc keeps its id as one empty chunk, never vanishes") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = Chunker.tokenWindows(docs, "text", "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(w.toSet == Set((1L, "a b c"), (2L, "")))
    val b = Chunker.boundaryChunks(docs, "text", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(b.toSet == Set((1L, "a b c"), (2L, "")))
  }

  test("plan shape: both chunkers are shuffle-free (no Exchange)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    for (df <- Seq(
        Chunker.tokenWindows(docs, "text", "doc_id", 4, 2),
        Chunker.boundaryChunks(docs, "text", "doc_id", 10))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
  }
}
