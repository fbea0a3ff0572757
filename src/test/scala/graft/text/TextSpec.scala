package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("unicodeNormalize: composed/decomposed forms converge, fingerprints merge") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "café menu"),     // composed é
      (2L, "café menu"),    // e + combining acute
      (3L, "Å ring"),        // ANGSTROM SIGN
      (4L, "Å ring"),       // A + combining ring above
      (5L, "plain ascii")).toDF("id", "text")
    val n = df.select($"id",
        graft.Functions.unicodeNormalize($"text").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(n(1L) == n(2L))
    assert(n(3L) == n(4L))
    assert(n(3L).charAt(0) == 'Å')
    assert(n(5L) == "plain ascii")
    // the dedup motivation: normalized fingerprints collapse the pair
    val fps = df.select(
        TextOps.fingerprint(graft.Functions.unicodeNormalize($"text"))
          .as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(2) == fps(3))
    // NFKC goes further: the ﬁ ligature decomposes to "fi"
    val k = Seq("ﬁsh").toDF("t")
      .select(graft.Functions.unicodeNormalize($"t", "NFKC"))
      .head().getString(0)
    assert(k == "fish")
    // SQL registration + bad form rejected at plan time
    assert(s.sql("SELECT nfc_normalize('café')").head().getString(0)
      == "café")
    intercept[Exception] {
      df.select(graft.Functions.unicodeNormalize($"text", "NFX")).collect()
    }
  }

  test("standard analyzer tokenizes, lowercases, drops empties") {
    val s = spark
    import s.implicits._
    val out = Seq("Hello, World!  foo_bar 42")
      .toDF("t").select(Analyzer.standard($"t")).head().getSeq[String](0)
    assert(out == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("shingles produce word n-grams; short docs collapse to one") {
    val s = spark
    import s.implicits._
    val sh3 = Seq("a b c d e").toDF("t")
      .select(TextOps.shingles($"t", 3)).head().getSeq[String](0)
    assert(sh3 == Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("t")
      .select(TextOps.shingles($"t", 3)).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("fingerprint is md5 of normalized text") {
    val s = spark
    import s.implicits._
    val fps = Seq("  Hello   WORLD ", "hello world", "other")
      .toDF("t").select(TextOps.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    // normalized form is "hello world"
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes).map("%02x".format(_)).mkString
    assert(fps(0) == expect)
  }

  test("token and subword counts") {
    val s = spark
    import s.implicits._
    val r = Seq("one two three").toDF("t")
      .select(TextOps.tokenCount($"t"), TextOps.subwordCount($"t")).head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 3)
    val sub = Seq("don't stop-me now2day").toDF("t")
      .select(TextOps.subwordCount($"t")).head().getInt(0)
    assert(sub > 3) // punctuation splits add segments
  }

  test("langId picks profile languages and CJK") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("the cat sat on the mat and it was good", "en"),
      ("el perro y la casa de que los", "es"),
      ("der hund und die katze ist nicht von", "de"),
      ("le chat et les maisons est une du que", "fr"),
      ("你好世界这是中文", "zh"),
      ("zzz qqq xxx", "und"))
    val out = cases.map(_._1).toDF("t")
      .select(TextOps.langId($"t")).collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("quality features and composite score") {
    val s = spark
    import s.implicits._
    val good = "the quick brown fox jumps over the lazy dog and it was good to see"
    val bad = "!!! ??? !!! ??? !!!"
    val rows = Seq(good, bad).toDF("t")
      .select(TextOps.qualityScore($"t").as("q")).collect().map(_.getDouble(0))
    assert(rows(0) > 0.8, s"good text scored ${rows(0)}")
    assert(rows(1) < 0.5, s"garbage scored ${rows(1)}")
  }

  test("BM25 ranks term-bearing docs; recomputed-in-Scala oracle") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark query engine with vector search"),
      (2L, "vector vector vector everywhere"),
      (3L, "completely unrelated text about cats"),
      (4L, "a very long document about many things including vector topics and much more filler filler filler"),
    ).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "text", "doc_id", "vector search", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 shares no term: absent
    assert(!got.map(_._1).contains(3L))
    // Scala oracle: recompute BM25 for the same corpus.
    val corpus = Map(
      1L -> "spark query engine with vector search",
      2L -> "vector vector vector everywhere",
      4L -> "a very long document about many things including vector topics and much more filler filler filler")
    val all = corpus + (3L -> "completely unrelated text about cats")
    def toks(t: String) = t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    val n = all.size.toDouble
    val avgdl = all.values.map(toks(_).length).sum / n
    val (k1, b) = (1.2, 0.75)
    def score(id: Long, q: Seq[String]): Double = {
      val ts = toks(all(id))
      q.map { term =>
        val df = all.values.count(toks(_).contains(term)).toDouble
        if (!ts.contains(term)) 0.0
        else {
          val tf = ts.count(_ == term).toDouble
          val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.length / avgdl))
        }
      }.sum
    }
    got.foreach { case (id, sc) =>
      assert(math.abs(sc - score(id, Seq("vector", "search"))) < 1e-9,
        s"doc $id: got $sc want ${score(id, Seq("vector", "search"))}")
    }
    // ordering: doc 1 has both terms
    assert(got.head._1 == 1L)
  }

  test("highlighter: term tagging, fragment config, score, run_analyzer") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The Vector stream processes a vector per batch."),
      (2L, "No matching terms here at all."),
      (3L, (("x " * 60) + "vector wins ") + ("y " * 60)))
      .toDF("doc_id", "text")
    val cfg = Highlight.FragmentConfig(preTag = "<b>", postTag = "</b>",
      fragmentContext = 10, numFragments = 2)
    val out = Highlight.withHighlights(docs, "text", "vector stream", cfg)
      .orderBy("doc_id").collect()
    // term tagging: case-insensitive, both terms, word boundaries
    assert(out(0).getAs[String]("highlight") ==
      "The <b>Vector</b> <b>stream</b> processes a <b>vector</b> per batch.")
    assert(out(1).getAs[String]("highlight") == out(1).getAs[String]("text"),
      "no terms -> untouched text")
    // fragments: bounded context windows around matches, capped count
    val frags0 = out(0).getSeq[String](out(0).fieldIndex("fragments"))
    assert(frags0.nonEmpty && frags0.length <= 2)
    assert(frags0.head.contains("<b>Vector</b>"))
    assert(out(1).getSeq[String](out(1).fieldIndex("fragments")).isEmpty)
    val frags2 = out(2).getSeq[String](out(2).fieldIndex("fragments"))
    assert(frags2.length == 1)
    assert(frags2.head.length <= cfg.fragmentContext * 2 +
      "<b></b>".length + "vector".length)
    // highlighter score: fraction of query terms present
    assert(out(0).getAs[Double]("highlight_score") == 1.0)
    assert(out(1).getAs[Double]("highlight_score") == 0.0)
    assert(out(2).getAs[Double]("highlight_score") == 0.5)
    // run_analyzer: (id, pos, token) stream
    val toks = Highlight.runAnalyzer(docs.filter($"doc_id" === 1L),
      "text", "doc_id").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(toks == Seq((0, "the"), (1, "vector"), (2, "stream"),
      (3, "processes"), (4, "a"), (5, "vector"), (6, "per"), (7, "batch")))
  }

  test("BM25 top-k with highlights: per-result projection only") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "vector stream engine"), (2L, "stream table"),
      (3L, "plain text"), (4L, "vector index"))
      .toDF("doc_id", "text")
    val top = Bm25.topK(docs, "text", "doc_id", "vector stream", 2)
      .join(docs, "doc_id")
    val hl = Highlight.withHighlights(top, "text", "vector stream")
      .orderBy(col("score").desc)
    val rows = hl.collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[String]("highlight")
      .contains("<em>vector</em> <em>stream</em>"))
    assert(rows.forall(_.getAs[Double]("highlight_score") > 0.0))
  }

  test("ngram tokenizer: runs by token_chars, n-grams in [min,max]") {
    val s = spark
    import s.implicits._
    val df = Seq(("ab-cde", "x1 y")).toDF("t", "u")
    val tok23 = Analyzer.ngram(2, 3)(col("t"))
    assert(df.select(tok23).head().getSeq[String](0) ==
      Seq("ab", "cd", "de", "cde"))
    // min=max=2, digits count as token chars by default
    assert(df.select(Analyzer.ngram(2, 2)(col("u"))).head().getSeq[String](0) ==
      Seq("x1"))
    // letters-only token_chars splits the digit out
    assert(df.select(
      Analyzer.ngram(1, 2, Seq("letter"))(col("u"))).head().getSeq[String](0) ==
      Seq("x", "y"))
    // runs shorter than min_gram emit nothing
    assert(df.select(Analyzer.ngram(4, 5)(col("t"))).head().getSeq[String](0)
      .isEmpty)
    intercept[IllegalArgumentException](Analyzer.ngram(3, 2))
    intercept[IllegalArgumentException](Analyzer.ngram(1, 2, Seq("emoji")))
  }

  test("dictionary tokenizer: greedy longest match from a file resource") {
    val s = spark
    import s.implicits._
    // dictionary file resource: one word per line
    val dictFile = java.nio.file.Files.createTempFile("graft-dict", ".txt")
    java.nio.file.Files.write(dictFile,
      "database\ndata\nstream\nbase\n".getBytes("UTF-8"))
    val words = new String(java.nio.file.Files.readAllBytes(dictFile), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    val an = Analyzer.dictionary(words)
    val toks = Seq(Tuple1("Databasestream x data!")).toDF("t")
      .select(an(col("t"))).head().getSeq[String](0)
    // longest match wins at each position: database > data; then stream
    assert(toks == Seq("database", "stream", "x", "data"))
    // unmatched alnum chars emit singly; punctuation separates
    val t2 = Seq(Tuple1("qdata")).toDF("t")
      .select(an(col("t"))).head().getSeq[String](0)
    assert(t2 == Seq("q", "data"))
    // composes with the synonym filter
    val canon = Analyzer.withSynonyms(an, Map("database" -> "db"))
    assert(Seq(Tuple1("database")).toDF("t")
      .select(canon(col("t"))).head().getSeq[String](0) == Seq("db"))
  }

  test("dictionary tokenizer segments a no-space script (Thai)") {
    val s = spark
    import s.implicits._
    val an = Analyzer.dictionary(
      Seq("สวัสดี", "ครับ", "ภาษา", "ไทย", "คนไทย", "คน"))
    def toks(t: String): Seq[String] =
      Seq(Tuple1(t)).toDF("t").select(an(col("t"))).head().getSeq[String](0)
    // no word separators anywhere in the input
    assert(toks("สวัสดีครับ") == Seq("สวัสดี", "ครับ"))
    // greedy longest match: คนไทย wins over คน + ไทย
    assert(toks("คนไทยครับ") == Seq("คนไทย", "ครับ"))
    // unknown word พูด: letters emit singly, the combining vowel
    // mark ู (NonSpacingMark, not a letter) separates
    assert(toks("คนไทยพูดภาษาไทย") ==
      Seq("คนไทย", "พ", "ด", "ภาษา", "ไทย"))
  }

  test("pinyin filter transliterates CJK tokens, passes others through") {
    val s = spark
    import s.implicits._
    val an = Analyzer.withPinyin(
      Analyzer.dictionary(Seq("向量", "数据库", "数据", "搜索")))
    val toks = Seq(Tuple1("向量数据库")).toDF("t")
      .select(an(col("t"))).head().getSeq[String](0)
    // longest match (数据库 over 数据), then per-char transliteration
    assert(toks == Seq("xiangliang", "shujuku"))
    // non-CJK tokens and chars outside the table pass through unchanged
    val mixed = Analyzer.withPinyin(Analyzer.whitespace)
    val t2 = Seq(Tuple1("spark 搜索 quick")).toDF("t")
      .select(mixed(col("t"))).head().getSeq[String](0)
    assert(t2 == Seq("spark", "sousuo", "quick"))
    // composes downstream like any token stream: BM25-style counting
    // over transliterated tokens sees the same token twice
    val t3 = Seq(Tuple1("搜索 搜索 向量")).toDF("t")
      .select(mixed(col("t"))).head().getSeq[String](0)
    assert(t3.count(_ == "sousuo") == 2)
  }

  test("synonym filter rewrites tokens to canonical forms") {
    val s = spark
    import s.implicits._
    val an = Analyzer.withSynonyms(Analyzer.standard,
      Map("vec" -> "vector", "strm" -> "stream"))
    val toks = Seq(Tuple1("Vec and strm and plain")).toDF("t")
      .select(an(col("t"))).head().getSeq[String](0)
    assert(toks == Seq("vector", "and", "stream", "and", "plain"))
  }

  test("semantic highlighter ranks sentences by embedding cosine") {
    val s = spark
    import s.implicits._
    val df = Seq((1L,
      "Vector streams power search. Cats nap all day. The stream of vector data grows."))
      .toDF("id", "t")
    val frags = df.select(
      Highlight.semanticFragments(col("t"), "vector stream", topK = 3).as("f"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(frags.length == 3)
    val ordered = frags.map(r => (r.getDouble(0), r.getString(1)))
    // both query-term sentences outrank the cat sentence
    assert(ordered(0)._1 >= ordered(1)._1 && ordered(1)._1 > ordered(2)._1)
    assert(ordered.take(2).map(_._2).forall(t =>
      t.toLowerCase.contains("vector")))
    assert(ordered(2)._2 == "Cats nap all day")
    assert(ordered(2)._1 == 0.0, "no shared terms -> zero cosine")
    // scores bounded to [0, 1]
    assert(ordered.forall { case (sc, _) => sc >= 0.0 && sc <= 1.0 })
  }

  test("BM25 index reuse across queries") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val ix = Bm25.buildIndex(docs, "text", "doc_id")
    assert(Bm25.score(ix, "alpha").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Bm25.score(ix, "gamma").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("batched persisted BM25 equals the per-query loop, one broadcast join") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).map { i =>
      (i, s"alpha ${if (i % 2 == 0) "beta beta" else "gamma"} " +
        s"delta${i % 5} filler$i")
    }.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bmb").toString
    val p = Bm25.writeIndex(Bm25.buildIndex(docs, "text", "doc_id"), tmp)
    val queries = Seq(1L -> "beta delta0", 2L -> "gamma",
      3L -> "beta beta gamma", // repeated term: presence semantics
      4L -> "zzz_absent")
    val batch = Bm25.topKPersistedBatch(s, p, queries, k = 5)
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = queries.flatMap { case (qid, q) =>
      Bm25.topKPersisted(s, p, q, 5).collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), i + 1) }
    }.toSet
    assert(got == want, s"batch $got != loop $want")
    // the probe side rides a broadcast; the postings scan is the only
    // distributed input
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("tagPhrases matches multi-word phrases as analyzed token runs") {
    val s = spark
    import s.implicits._
    val phrases = Seq("machine learning", "Deep Learning", "spark",
      "large language model")
    val docs = Seq(
      (1L, "Machine Learning, and deep-learning too"),
      (2L, "a large   LANGUAGE model beats a small one"),
      (3L, "sparkling water"), // 'spark' must not match inside a token
      (4L, "learning machine"), // order matters
      (5L, "spark spark spark"), // distinct
      (6L, null.asInstanceOf[String]),
      (7L, "ml")).toDF("id", "text")
    val out = docs.select(col("id"),
        graft.text.TextOps.tagPhrases(col("text"), phrases).as("tags"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("deep learning", "machine learning"),
      out(1L).toString) // punctuation/case/hyphen-normalized, sorted
    assert(out(2L) == Seq("large language model"))
    assert(out(3L) == Seq.empty)
    assert(out(4L) == Seq.empty)
    assert(out(5L) == Seq("spark"))
    assert(out(6L) == Seq.empty, "null text tags empty")
    assert(out(7L) == Seq.empty)
    // short-doc guard: a 1-token doc against a 3-word phrase is empty,
    // not a descending-sequence artifact
    val short = Seq((1L, "model")).toDF("id", "text")
      .select(graft.text.TextOps.tagPhrases(col("text"),
        Seq("large language model")).as("t"))
      .as[Seq[String]].head()
    assert(short == Seq.empty)
    intercept[IllegalArgumentException](
      graft.text.TextOps.tagPhrases(col("text"), Seq("  ")))
  }
}
