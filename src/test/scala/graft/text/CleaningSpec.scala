package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boilerplate removal, PII redaction, C4 heuristic cleaning, and
  * vocabulary heavy hitters.
  */
class CleaningSpec extends SparkSpec {

  test("boilerplate: corpus-frequent lines stripped, unique prose kept in order") {
    val s = spark
    import s.implicits._
    val docs = (1L to 8L).map { i =>
      (i, s"HEADER LINE\nunique prose number $i\n  \nsecond thought $i\nFOOTER LINE")
    }.toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id", maxDf = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 8)
    out.zipWithIndex.foreach { case (r, i) =>
      val id = i + 1
      assert(r.getString(1) == s"unique prose number $id\nsecond thought $id",
        s"doc $id got: ${r.getString(1)}")
    }
  }

  test("Signals.annotate: one projection, fields agree with the individual ops") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The quick brown fox and the lazy dog met at noon today."),
      (2L, "mail me at a.b@example.com or ring +1 555-123-4567 now ok."),
      (3L, "code { dropped }"),
      (4L, "")).toDF("doc_id", "text")
    val out = Signals.annotate(docs, "text")
    // fields equal the standalone operators they compose
    val joined = out.select(col("doc_id"), col("signals"),
        TextOps.fingerprint(col("text")).as("_fp"),
        TextOps.tokenCount(col("text")).as("_nt"),
        TextOps.qualityScore(col("text")).as("_q"),
        TextOps.langId(col("text")).as("_lang"),
        Pii.emailCount(col("text")).as("_ne"),
        C4Filters.docKeep(col("text")).as("_keep"))
      .collect()
    joined.foreach { r =>
      val sg = r.getStruct(1)
      assert(sg.getAs[String]("fingerprint") == r.getString(2))
      assert(sg.getAs[Int]("n_tokens") == r.getInt(3))
      assert(sg.getAs[Double]("quality") == r.getDouble(4))
      assert(sg.getAs[String]("lang") == r.getString(5))
      assert(sg.getAs[Int]("n_emails") == r.getInt(6))
      assert(sg.getAs[Boolean]("c4_keep") == r.getBoolean(7))
    }
    // spot values: PII doc counts, code doc rejected, english detected
    val byId = joined.map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(byId(2L).getAs[Int]("n_emails") == 1)
    assert(byId(2L).getAs[Int]("n_phones") == 1)
    assert(!byId(3L).getAs[Boolean]("c4_keep"))
    assert(byId(1L).getAs[String]("lang") == "en")
    // plan: a pure projection — no Exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("boilerplate: doc reduced to nothing comes back with empty text, not dropped") {
    val s = spark
    import s.implicits._
    val docs = (Seq.tabulate(5)(i => (i.toLong, "ONLY BOILERPLATE")) :+
      (9L, "ONLY BOILERPLATE\nreal content here")).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id", maxDf = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    assert(out.take(5).forall(_.getString(1) == ""))
    assert(out.last.getString(1) == "real content here")
  }

  test("line document frequency counts docs, not occurrences") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "dup\ndup\ndup"),      // 3 occurrences, 1 doc
      (2L, "dup\nother")).toDF("doc_id", "text")
    val df = Boilerplate.lineDocFreq(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("dup" -> 2L, "other" -> 1L))
  }

  test("pii: counts and redaction on mixed text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail a.b@x.org and c_d%e@sub.dom.io, host 10.0.0.1, call +44 20 7946 0958 now"),
      (2L, "no pii here, just the year 2024 and v1.2.3"),
    ).toDF("id", "text")
    val out = docs.select(col("id"), Pii.counts(col("text")).as("c"),
        Pii.redact(col("text")).as("r"))
      .selectExpr("id", "c.n_emails", "c.n_ips", "c.n_phones", "r")
      .orderBy("id").collect()
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == ((2, 1, 1)))
    assert(out(0).getString(4) ==
      "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE> now")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == ((0, 0, 0)))
    assert(out(1).getString(4) == out(1).getString(4))
  }

  test("c4: line rules keep proper sentences, doc rules drop code and lorem ipsum") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A proper first sentence here.\nshort\nAnother good line with words!"),
      (2L, "if (x) { return; }\nA fine sentence nonetheless."),
      (3L, "This mentions Lorem Ipsum placeholder text sadly.\nOther good content here."),
      (4L, "no terminal punctuation at all\nstill none"),
    ).toDF("doc_id", "text")
    val out = C4Filters.c4(docs, "text", minWords = 3, minLines = 1)
      .select("doc_id", "keep", "clean_text").orderBy("doc_id").collect()
    assert(out(0).getBoolean(1))
    assert(out(0).getString(2) ==
      "A proper first sentence here.\nAnother good line with words!")
    assert(!out(1).getBoolean(1), "brace doc must be dropped")
    assert(!out(2).getBoolean(1), "lorem ipsum doc must be dropped")
    assert(!out(3).getBoolean(1), "doc with no surviving lines must be dropped")
  }

  test("tfidf: querying a doc's own text ranks it first with cosine 1.0") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark shuffles data between stages during wide transformations"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "window functions partition and order rows for analytics"),
    ).toDF("doc_id", "text")
    val out = TfIdf.search(docs, "text", "doc_id", docs.filter($"doc_id" === 1)
        .head().getString(1), k = 3).collect()
    assert(out.head.getLong(0) == 1L)
    // Query vector is parallel to doc 1's vector (same tf and idf
    // weights), so the cosine must be exactly 1 after rounding.
    assert(math.abs(out.head.getDouble(1) - 1.0) < 1e-9, out.head.toString)
  }

  test("tfidf: vectors are L2-normalized maps keyed by token") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val vecs = TfIdf.vectors(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getMap[String, Double](1)).toMap
    vecs.values.foreach { m =>
      val norm = math.sqrt(m.values.map(v => v * v).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"norm $norm for $m")
    }
    // beta (df=1, tf=2) must outweigh shared alpha (df=2, tf=1) in doc 1.
    assert(vecs(1L)("beta") > vecs(1L)("alpha"))
  }

  test("plan shapes: no cross joins in boilerplate, broadcast query side in tfidf, take-ordered vocab cut") {
    val s = spark
    import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"line a\nprose $i\nline b")).toDF("doc_id", "text")
    val bpPlan = Boilerplate.removeBoilerplate(docs, "text", "doc_id", maxDf = 3)
      .queryExecution.executedPlan.toString
    assert(!bpPlan.contains("CartesianProduct") &&
      !bpPlan.contains("BroadcastNestedLoop"), s"boilerplate went all-pairs:\n$bpPlan")
    val tfPlan = TfIdf.search(docs, "text", "doc_id", "prose line", 5)
      .queryExecution.executedPlan.toString
    assert(tfPlan.contains("BroadcastHashJoin"),
      s"query-weight table must broadcast:\n$tfPlan")
    val vkPlan = Vocab.topK(docs, "text", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(vkPlan.contains("TakeOrdered"),
      s"top-k must be a TakeOrdered, not a global sort:\n$vkPlan")
  }

  test("vocab: tf/df and deterministic top-k cut") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry cherry"),
    ).toDF("doc_id", "text")
    val st = Vocab.stats(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(st("apple") == ((3L, 2L)))
    assert(st("banana") == ((1L, 1L)))
    assert(st("cherry") == ((3L, 1L)))
    val top = Vocab.topK(docs, "text", "doc_id", 2).collect().map(_.getString(0))
    // tf ties (apple, cherry at 3) break by token asc.
    assert(top.toSeq == Seq("apple", "cherry"))
  }
}
