package graft.text

import graft.SparkSpec
import graft.dedup.Decontaminate
import org.apache.spark.sql.functions._

/** Repetition filters, benchmark decontamination, sequence packing —
  * hand-computed fixtures plus invariants the DuckDB oracle entries
  * (t9/d6/p1) can't cheaply express.
  */
class PipelineOpsSpec extends SparkSpec {

  test("repetition features: hand-computed line and n-gram fractions") {
    val s = spark
    import s.implicits._
    // lines: ["a b", "a b", "c d"]; tokens: a b a b c d (norm 11 chars)
    val df = Seq((1L, "a b\na b\nc d")).toDF("id", "text")
    val r = Repetition.features(df, "text", "id",
      topNs = Seq(2), dupNs = Seq(5)).head()
    assert(r.getAs[Int]("n_lines") == 3)
    // fractions are rounded to 6 decimals by the operator
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 0.333333) < 1e-9)
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 0.666667) < 1e-9)
    // 2-gram "a b" occurs twice -> 2*3 chars over 11 normalized chars
    assert(math.abs(r.getAs[Double]("top2_gram_char_frac") - 0.545455) < 1e-9)
    // both 5-grams are unique
    assert(r.getAs[Double]("dup5_gram_char_frac") == 0.0)
  }

  test("repetition features: single-line doc has zero line dup") {
    val s = spark
    import s.implicits._
    val r = Repetition.features(
      Seq((1L, "x y z w")).toDF("id", "text"), "text", "id",
      topNs = Seq(2), dupNs = Seq(5)).head()
    assert(r.getAs[Int]("n_lines") == 1)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    // shorter than 5 tokens: the whole token string is the one 5-gram,
    // occurring once -> no dup chars
    assert(r.getAs[Double]("dup5_gram_char_frac") == 0.0)
  }

  test("gopherFilter drops keyword-stuffed docs, keeps normal prose") {
    val s = spark
    import s.implicits._
    val stuffed = ("buy cheap pills " * 40).trim
    // realistic length matters: the char-coverage fractions are only
    // meaningful on documents long enough that one n-gram is a small
    // share — exactly the regime the published thresholds target
    val prose = (1 to 80).map(i => s"word$i").mkString(" ")
    val out = Repetition.gopherFilter(
      Seq((1L, prose), (2L, stuffed)).toDF("id", "text"), "text", "id")
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(out(1L))
    assert(!out(2L))
  }

  test("decontaminate flags exactly the leaked doc with exact gram count") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "unrelated words about completely different topics entirely here now")
    ).toDF("doc_id", "text")
    // bench contains tokens 2..10 of doc 2: 9 tokens -> two 8-grams,
    // both present in doc 2.
    val bench = Seq("two three four five six seven eight nine ten")
      .toDF("text")
    val hits = Decontaminate.contaminated(corpus, "text", "doc_id",
      bench, "text", n = 8).collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 2L)))
    val kept = Decontaminate.clean(corpus, "text", "doc_id", bench, "text",
      n = 8).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // shuffle-join mode agrees with the broadcast mode
    val hits2 = Decontaminate.contaminated(corpus, "text", "doc_id",
      bench, "text", n = 8, broadcastBench = false).collect()
    assert(hits2.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 2L)))
  }

  test("hash sampling is deterministic, rate-accurate, and partition-stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = graft.pipeline.Mixing.hashSample(df, "id", 0.3, "s1")
      .collect().map(_.getLong(0)).toSet
    val b = graft.pipeline.Mixing.hashSample(df.repartition(7), "id", 0.3, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // rand(seed) would fail this: draw depends on layout
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // different salt -> different (roughly independent) membership
    val c = graft.pipeline.Mixing.hashSample(df, "id", 0.3, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("upsample: floor copies + coin-gated extra, rate-accurate, stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val up = graft.pipeline.Mixing.upsample(df, "id", 2.3, "u1")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val copies = up.groupBy(_._1).view.mapValues(_.length).toMap
    // every row appears 2 or 3 times, copy indices are 0..n-1
    assert(copies.values.forall(n => n == 2 || n == 3))
    assert(copies.size === 2000)
    assert(up.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == (0L until rows.length.toLong) })
    // E[copies] = 2.3 within sampling noise
    assert(math.abs(up.length / 2000.0 - 2.3) < 0.05)
    // partition-layout stable
    val up2 = graft.pipeline.Mixing.upsample(df.repartition(7), "id", 2.3, "u1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(up2 == up.toSet)
    // factor < 1 downsamples by membership with copy 0 only
    val down = graft.pipeline.Mixing.upsample(df, "id", 0.4, "u1")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(down.forall(_._2 == 0L))
    assert(math.abs(down.length / 2000.0 - 0.4) < 0.05)
  }

  test("domainBlocklistFilter: registered-domain rollup, junk passes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "https://www.bad.example.com/x"),   // subdomain of blocked
      (2L, "https://example.com/y"),           // blocked apex
      (3L, "https://good.org/z"),
      (4L, "https://shop.bad.co.uk/p"),        // blocked two-level suffix
      (5L, "junk ::: not a url")).toDF("doc_id", "url")
    val kept = graft.pipeline.UrlOps.domainBlocklistFilter(docs,
        org.apache.spark.sql.functions.col("url"),
        Seq("example.com", "bad.co.uk"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 5L))
  }

  test("Curate.curate: stages fire in order; blocklist and bench branches work") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A proper sentence with enough words here.\nshort stub"),
      (2L, "A proper sentence with enough words here.\nshort stub"), // dup of 1
      (3L, "Another fine document about spark catalyst internals today."),
      (4L, "This one mentions a badword so it must be dropped entirely."),
      (5L, "code marker { dropped }"),
      (6L, "An eval item that leaks the secret benchmark answer is forty two exactly here okay."))
      .toDF("doc_id", "text")
    val bench = Seq(
      "remember the secret benchmark answer is forty two exactly here ok")
      .toDF("text")
    val out = graft.pipeline.Curate.curate(docs, "text", "doc_id",
      Some(bench), graft.pipeline.Curate.Config(
        blocklist = Seq("badword"))).collect()
    val kept = out.map(_.getLong(0)).toSet
    // 2 deduped into 1; 4 blocklisted; 5 code-dropped; 6 decontaminated
    assert(kept === Set(1L, 3L))
    // cleaned text: the stub line is gone
    val textIdx = 1
    assert(!out.find(_.getLong(0) == 1L).get.getString(textIdx)
      .contains("short stub"))
    // every surviving row carries a split label
    val ds = graft.pipeline.Curate.datasheet(
      graft.pipeline.Curate.curate(docs, "text", "doc_id"), "text")
      .collect()
    assert(ds.map(_.getLong(1)).sum >= 4) // no blocklist/bench: 4+ docs
  }

  test("curriculumOrder: stages descend, within-stage order is the epoch permutation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0L until 40L).map(i => (i, i / 40.0)).toDF("id", "q")
    val out = graft.pipeline.Mixing
      .curriculumOrder(docs, "id", col("q"), stages = 4, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // stage sequence (floor(q*4) clamped) must be non-increasing
    val stages = out.map(x => math.min((x._2 * 4).toInt, 3))
    assert(stages.zip(stages.tail).forall { case (a, b) => a >= b })
    // best stage (q >= 0.75) occupies the head, worst the tail
    assert(out.take(10).forall(_._2 >= 0.75))
    assert(out.takeRight(10).forall(_._2 < 0.25))
    // same epoch reproduces; a different epoch permutes within stages
    val again = graft.pipeline.Mixing
      .curriculumOrder(docs, "id", col("q"), 4, epoch = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(again == out.map(_._1).toSeq)
    val e2 = graft.pipeline.Mixing
      .curriculumOrder(docs, "id", col("q"), 4, epoch = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(e2 != again)
    assert(e2.toSet == again.toSet)
  }

  test("Curate.audit: every input labeled with its first rejecting stage") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A proper sentence with enough words here.\nshort stub"),
      (2L, "A proper sentence with enough words here.\nshort stub"), // dup of 1
      (3L, "Another fine document about spark catalyst internals today."),
      (4L, "This one mentions a badword so it must be dropped entirely."),
      (5L, "code marker { dropped }"),
      (6L, "An eval item that leaks the secret benchmark answer is forty two exactly here okay."))
      .toDF("doc_id", "text")
    val bench = Seq(
      "remember the secret benchmark answer is forty two exactly here ok")
      .toDF("text")
    val cfg = graft.pipeline.Curate.Config(blocklist = Seq("badword"))
    val stages = graft.pipeline.Curate
      .audit(docs, "text", "doc_id", Some(bench), cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stages(2L) == "exact_dup")
    assert(stages(4L) == "blocklist")
    assert(stages(5L) == "c4_clean")
    assert(stages(6L) == "decontaminated")
    val splitNames = cfg.splits.map(_._1).toSet
    assert(splitNames.contains(stages(1L)) && splitNames.contains(stages(3L)))
    // contract: split-labeled audit ids == curate's surviving ids
    val curated = graft.pipeline.Curate
      .curate(docs, "text", "doc_id", Some(bench), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stages.collect {
      case (id, st) if splitNames.contains(st) => id
    }.toSet == curated)
    // and the audit's split label matches curate's assignment
    val curSplits = graft.pipeline.Curate
      .curate(docs, "text", "doc_id", Some(bench), cfg)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    curSplits.foreach { case (id, sp) => assert(stages(id) == sp) }
  }

  test("split partitions exhaustively, near the weights, and is growth-stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val out = graft.pipeline.Mixing.split(df, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 2000) // every row assigned exactly one split
    val frac = out.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.8) < 0.04)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // growth stability: assignments over a SUBSET are unchanged — the
    // property row_number()-based splits lack
    val sub = graft.pipeline.Mixing.split(df.filter($"id" < 500), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub == out.filter(_._1 < 500))
  }

  test("mixBySource hits target proportions and caps at availability") {
    val s = spark
    import s.implicits._
    val df = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1020L).map(i => (i, "rare")) ++
      (2000L until 2500L).map(i => (i, "dropped"))).toDF("id", "src")
    val out = graft.pipeline.Mixing.mixBySource(df, "src", "id",
      Map("big" -> 0.5, "rare" -> 0.5), targetRows = 100, salt = "t")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // big: rate 50/1000 = 0.05 -> ~50; rare: rate min(1, 50/20)=1 -> all 20
    assert(out("rare") == 20)
    assert(math.abs(out("big") - 50.0) < 25)
    assert(!out.contains("dropped"))
  }

  test("temperatureWeights flattens toward uniform as alpha -> 0") {
    val counts = Map("a" -> 900L, "b" -> 90L, "c" -> 10L)
    val w1 = graft.pipeline.Mixing.temperatureWeights(counts, 1.0)
    assert(math.abs(w1("a") - 0.9) < 1e-12)
    val w3 = graft.pipeline.Mixing.temperatureWeights(counts, 0.3)
    assert(w3("a") < 0.9 && w3("c") > 0.01)
    assert(math.abs(w3.values.sum - 1.0) < 1e-12)
    // ordering preserved
    assert(w3("a") > w3("b") && w3("b") > w3("c"))
  }

  test("pack matches a sequential cumsum across forced multi-partition runs") {
    val s = spark
    import s.implicits._
    val counts = Seq(3L, 7L, 0L, 12L, 5L, 9L, 1L, 20L, 4L, 6L)
    val df = counts.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "cnt")
    val budget = 10L
    val got = Packing.pack(s, df, "id", col("cnt"), budget,
      numPartitions = 3)
      .select("id", "n_tokens", "start_offset", "first_bin", "last_bin",
        "n_bins")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    var off = 0L
    val want = counts.zipWithIndex.map { case (c, i) =>
      val start = off; off += c
      val first = start / budget
      val last = (start + math.max(c, 1L) - 1) / budget
      (i.toLong, c, start, first, last, last - first + 1)
    }
    assert(got.toSeq == want)
  }

  test("scale shapes: mixing is shuffle-free, decontamination broadcasts, pack windows per partition") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map(i => (i, s"tok$i text body", "s" + i % 3))
      .toDF("id", "text", "src")
    // hash sampling: pure projection + filter — no Exchange anywhere
    val sampled = graft.pipeline.Mixing.hashSample(docs, "id", 0.5, "x")
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"))
    // decontamination: the benchmark gram set rides a broadcast join,
    // so the corpus side never shuffles
    val plan = graft.dedup.Decontaminate.contaminated(
      docs, "text", "id", docs.limit(3), "text", n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // packing: the running-sum Window is partitioned by _pid — never a
    // global (single-task) window
    val packPlan = Packing.pack(s, docs, "id", lit(5L), 10L)
      .queryExecution.executedPlan.toString
    assert(packPlan.contains("Window"))
    assert("Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(packPlan).isEmpty,
      "found a Window with an empty partition spec:\n" + packPlan)
  }

  test("chunks partition each document exactly and fill bins to budget") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 3L), (1L, 25L), (2L, 4L), (3L, 10L))
      .toDF("id", "cnt")
    val budget = 10L
    val ch = Packing.chunks(s, df, "id", col("cnt"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // spans of one doc cover [0, cnt) contiguously
    val perDoc = ch.groupBy(_._2)
    assert(perDoc(1L).sortBy(_._1).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 7L), (7L, 10L), (17L, 8L)))
    assert(perDoc.map { case (id, spans) => id -> spans.map(_._4).sum } ==
      Map(0L -> 3L, 1L -> 25L, 2L -> 4L, 3L -> 10L))
    // every bin except the last holds exactly `budget` tokens
    val perBin = ch.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = perBin.keys.max
    perBin.foreach { case (bin, tokens) =>
      if (bin < lastBin) assert(tokens == budget)
      else assert(tokens <= budget)
    }
  }

  test("tokenBudgetHead matches the sequential quality-ordered cumsum") {
    val s = spark
    import s.implicits._
    // (id, score, tokens) with score ties to exercise the id tie-break
    val rows = Seq(
      (0L, 0.9, 10L), (1L, 0.5, 7L), (2L, 0.9, 3L), (3L, 0.2, 100L),
      (4L, 0.7, 5L), (5L, 0.5, 2L), (6L, 0.95, 4L), (7L, 0.1, 1L))
    val df = rows.toDF("id", "score", "tok")
    def sequential(budget: Long): Seq[(Long, Long)] = {
      var cum = 0L
      rows.sortBy { case (id, sc, _) => (-sc, id) }.flatMap {
        case (id, _, t) =>
          cum += t
          if (cum <= budget) Some(id -> cum) else None
      }
    }
    for (budget <- Seq(0L, 4L, 16L, 17L, 24L, 1000L);
        parts <- Seq(1, 3, 8)) {
      val got = graft.pipeline.Mixing.tokenBudgetHead(
        s, df, "id", col("score"), col("tok"), budget,
        numPartitions = parts)
        .select("id", "cum_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      assert(got.toSeq == sequential(budget).sortBy(_._1),
        s"budget=$budget parts=$parts")
    }
  }

  test("tokenBudgetHead: null score sorts last, null tokens count as zero") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(0.9), Some(5L)),
      (2L, None, Some(100L)),      // null score -> worst rank
      (3L, Some(0.5), None),       // null tokens -> zero-length
      (4L, Some(0.4), Some(5L)))
      .toDF("id", "score", "tok")
    val got = graft.pipeline.Mixing.tokenBudgetHead(
      s, df, "id", col("score"), col("tok"), budget = 10L,
      numPartitions = 4)
      .select("id", "cum_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // order: 1 (cum 5), 3 (cum 5), 4 (cum 10), 2 last (cum 110 > 10)
    assert(got == Map(1L -> 5L, 3L -> 5L, 4L -> 10L), got.toString)
  }

  test("topFraction keeps exactly the best ceil(frac*n), ties by id, layout-stable") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, 0.5), (1L, 0.9), (2L, 0.5), (3L, 0.1),
      (4L, 0.9), (5L, 0.7), (6L, 0.3))
    val df = rows.toDF("id", "score")
    for (frac <- Seq(0.0, 0.3, 0.5, 1.0); parts <- Seq(1, 4)) {
      val want = rows.sortBy { case (id, sc) => (-sc, id) }
        .take(math.ceil(rows.size * frac).toInt).map(_._1).sorted
      val got = graft.pipeline.Mixing.topFraction(
        s, df.repartition(parts), "id", col("score"), frac)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"frac=$frac parts=$parts")
    }
  }

  test("tokenBudgetHead plan: per-partition window, tail partitions pruned") {
    val s = spark
    import s.implicits._
    // range-backed (NOT a LocalRelation): the optimizer folds filters
    // over local data at plan time, which would hide the pruning
    // Filter this test asserts on
    val df = s.range(1000)
      .select(col("id"), (col("id") % 97).cast("double").as("score"),
        lit(10L).as("tok"))
    val head = graft.pipeline.Mixing.tokenBudgetHead(
      s, df, "id", col("score"), col("tok"), budget = 100L,
      numPartitions = 8)
    val plan = head.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert("Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty,
      "found a global (single-task) window:\n" + plan)
    // budget 100 of 10000 total tokens: only the best-score bucket can
    // contribute, so a kept-pid FILTER must prune the rest before the
    // window reads them. Catalyst pushes it to the scan with the pid
    // CASE-WHEN edge expression inlined (even better — pre-shuffle),
    // so match the inlined shape, not the column name.
    assert(
      "Filter [^\\n]*_tbh_pid".r.findFirstIn(plan).isDefined ||
        "Filter [^\\n]*CASE WHEN [^\\n]*(= 0\\)|INSET)".r
          .findFirstIn(plan).isDefined,
      "kept-bucket pruning filter missing from the plan:\n" + plan)
    assert(head.select(sum("cum_tokens")).head().getLong(0) > 0)
  }

  test("epochShuffle: deterministic permutation, layout-invariant, epoch-dependent") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map(Tuple1(_)).toDF("doc_id")
    def order(df: org.apache.spark.sql.DataFrame, epoch: Int): Seq[Long] =
      graft.pipeline.Mixing.epochShuffle(df, "doc_id", epoch)
        .collect().map(_.getLong(0)).toSeq
    val e1 = order(docs, 1)
    assert(e1 == order(docs.repartition(7), 1), "layout must not change the order")
    assert(e1 != order(docs, 2), "different epochs must permute differently")
    assert(e1.sorted == (0L until 100L), "a permutation, nothing lost")
    assert(e1 != (0L until 100L).toSeq, "actually shuffled")
  }

  test("epochShuffle plan: one range-partitioned sort, no window, no extra exchange") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map(Tuple1(_)).toDF("doc_id")
    val plan = graft.pipeline.Mixing.epochShuffle(docs, "doc_id", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("Sort"),
      s"expected a range sort:\n$plan")
    assert(!plan.contains("Window"),
      s"global order must not use a single-task window:\n$plan")
  }

  test("approxDatasheet: sketch figures land inside their error bounds") {
    val s = spark
    import s.implicits._
    // 200 docs; doc i has i+1 copies of a shared token plus one unique
    // token, so exact vocab = 201 and lengths are known
    val docs = (0L until 200L).map { i =>
      (i, (Seq.fill((i % 20).toInt + 1)("common") :+ s"uniq$i").mkString(" "))
    }.toDF("id", "text")
    val r = graft.pipeline.Report.approxDatasheet(docs, "text").head()
    assert(r.getAs[Long]("n_docs") == 200L)
    val exactTokens = (0L until 200L).map(i => (i % 20) + 2).sum
    assert(r.getAs[Long]("n_tokens") == exactTokens)
    val approxVocab = r.getAs[Long]("approx_distinct_tokens")
    assert(math.abs(approxVocab - 201L) <= 201 * 0.05 * 4,
      s"HLL estimate $approxVocab too far from 201")
    // percentiles of char lengths: p50 must sit between exact p25/p75
    val lens = docs.select(length(col("text")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val p50 = r.getAs[Long]("p50_chars")
    assert(p50 >= lens(lens.length / 4) && p50 <= lens(3 * lens.length / 4))
    assert(r.getAs[Long]("p99_chars") >= p50)
  }

  test("token CMS: estimates never under-count and respect the eps bound") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map { i =>
      (i, s"alpha beta ${if (i % 10 == 0) "rare" else "filler" + i}")
    }.toDF("id", "text")
    val totalTokens = 300L
    val cms = graft.pipeline.Report.tokenFrequencySketch(
      docs, "text", eps = 0.01, confidence = 0.999)
    assert(cms.totalCount() == totalTokens)
    val est = graft.pipeline.Report.estimateTokenCounts(
      s, cms, Seq("alpha", "beta", "rare", "absent"))
    val exact = Map("alpha" -> 100L, "beta" -> 100L, "rare" -> 10L,
      "absent" -> 0L)
    val slack = math.ceil(0.01 * totalTokens).toLong
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t under-counted: ${est(t)} < $n")
      assert(est(t) <= n + slack, s"$t over slack: ${est(t)} > $n + $slack")
    }
  }

  test("capPerDomain keeps exactly the cap lowest (coin, id) rows per domain") {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map(i => (i.toLong, s"dom${i % 4}"))
    val df = rows.toDF("id", "dom")
    val got = graft.pipeline.UrlOps.capPerDomain(df, col("dom"), "id",
        maxPerDomain = 10, salt = "t")
      .select("id").collect().map(_.getLong(0)).toSet
    // brute force: per-domain sort by the same md5 coin
    val coins = df.select(col("id"),
        graft.pipeline.Mixing.hashUniform(col("id"), "t").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = rows.groupBy(_._2).values.flatMap { g =>
      g.map(_._1).sortBy(id => (coins(id), id)).take(10)
    }.toSet
    assert(got == want)
    assert(got.size == 40)
  }

  test("normalizeUrl and registeredDomain are null-safe on junk") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, "not a url"), (2L, ""), (3L, "http:///nohost"))
      .toDF("id", "url")
      .select(graft.pipeline.UrlOps.normalizeUrl(col("url")).as("c"),
        graft.pipeline.UrlOps.registeredDomain(col("url")).as("d"))
      .collect()
    out.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), r.toString))
  }

  test("corpus report: exact per-group stats including interpolated median") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb", "s1"), (2L, "cc dd ee", "s1"),     // chars 5, 8
      (3L, "x", "s2"), (4L, "yy zz", "s2"), (5L, "ww", "s2"), // 1, 5, 2
    ).toDF("doc_id", "text", "source")
    val rows = graft.pipeline.Report.byGroup(docs, "text", Seq("source"))
      .orderBy("source").collect()
    val s1 = rows(0)
    assert(s1.getLong(1) == 2 && s1.getLong(2) == 5 && s1.getLong(3) == 13)
    assert(math.abs(s1.getDouble(5) - 6.5) < 1e-9, "even-count median interpolates")
    val s2 = rows(1)
    assert(s2.getLong(1) == 3 && s2.getDouble(5) == 2.0)
  }
}
