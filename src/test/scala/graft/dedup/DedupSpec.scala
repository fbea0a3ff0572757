package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
      (4L, "completely different text about database systems and query planning"),
      (5L, "THE  QUICK  Brown fox jumps over the lazy dog near the river bank today"), // normalized dup of 1
      (6L, "another unrelated document discussing machine learning models"),
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id per normalized fingerprint") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 6L)) // 2 and 5 collapse into 1
  }

  test("exact dedup: null texts form one group, tied ids collapse to one row") {
    val s = spark
    import s.implicits._
    val messy = Seq[(java.lang.Long, String)](
      (1L, null), (2L, null),          // null content: one group
      (3L, "same row twice"), (3L, "same row twice"), // retried write
      (4L, "unique")).toDF("doc_id", "text")
    val kept = Dedup.exact(messy, "text", "doc_id").collect()
    assert(kept.length === 3)
    assert(kept.map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
  }

  test("nearDupAgainstIndex rejects an index built with different params") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val idx = Dedup.lshIndex(corpus, "text", "doc_id", bands = 32)
    intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstIndex(corpus, idx, corpus, "text", "doc_id",
        bands = 16)
    }
    // metadata survives the parquet round trip
    val dir = java.nio.file.Files.createTempDirectory("graft-lshmeta")
      .toString + "/i"
    idx.write.parquet(dir)
    intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstIndex(corpus, s.read.parquet(dir), corpus,
        "text", "doc_id", bands = 16)
    }
  }

  test("softWeights: inverse duplication-count weights, unique docs weigh 1") {
    val w = Dedup.softWeights(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(w.size === 6)
    // 1/2/5 are one normalized-dup group of 3
    Seq(1L, 2L, 5L).foreach { id =>
      assert(w(id)._1 === 3L)
      assert(math.abs(w(id)._2 - 1.0 / 3) < 1e-12)
    }
    Seq(3L, 4L, 6L).foreach { id => assert(w(id) === (1L, 1.0)) }
    // null-text rows form ONE weighted group and stay in the output —
    // the raw-fingerprint shape dropped them (a null _fp never
    // equi-joins its own count row).
    val s = spark
    import s.implicits._
    val messy = Seq[(java.lang.Long, String)](
      (1L, null), (2L, null), (3L, "unique")).toDF("doc_id", "text")
    val mw = Dedup.softWeights(messy, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(mw.size === 3)
    assert(mw(1L) === (2L, 0.5) && mw(2L) === (2L, 0.5))
    assert(mw(3L) === (1L, 1.0))
  }

  test("leakReport: per-bench-item doc and gram counts; clean items absent") {
    val s = spark
    import s.implicits._
    val leak = "the quick brown fox jumps over the lazy dog" // 9 tokens
    val bench = Seq(
      (100L, s"prefix $leak suffix"),
      (200L, "a perfectly clean eval prompt with nothing shared at all"))
      .toDF("bench_id", "text")
    val rep = Decontaminate.leakReport(
        docs, "text", "doc_id", bench, "text", "bench_id", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // item 100's 9-token leak run = 2 distinct 8-grams, present in
    // docs 1/2/3/5 (doc 3 shares both: its tail differs later)
    assert(rep.keySet === Set(100L))
    assert(rep(100L)._1 === 4L)
    assert(rep(100L)._2 === 2L)
  }

  test("exact-dup groups report members") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(g.length == 1)
    assert(g.head.getSeq[Long](g.head.fieldIndex("ids")) == Seq(1L, 2L, 5L))
  }

  test("minhash-LSH finds near-dups and verifies exact Jaccard") {
    val out = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.5, shingleSize = 3, numHashes = 64, bands = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // near-dup pairs among {1,2,5 (identical), 3 (one word off)}
    assert(out.keySet == Set((1L, 2L), (1L, 5L), (2L, 5L), (1L, 3L), (2L, 3L), (3L, 5L)))
    assert(out((1L, 2L)) == 1.0)
    // doc 3 differs in the last word: 14 tokens -> 12 trigram windows,
    // only the window containing the final word differs -> 11 shared,
    // union 13 -> J = 11/13
    assert(math.abs(out((1L, 3L)) - 11.0 / 13.0) < 1e-9)
  }

  test("jaccard matches a hand-computed value") {
    val s = spark
    import s.implicits._
    val j = Seq(("a b c d", "a b c e"))
      .toDF("x", "y").select(Dedup.ngramJaccard($"x", $"y", 2)).head().getDouble(0)
    // bigrams x: {a b, b c, c d}; y: {a b, b c, c e}; J = 2/4
    assert(j == 0.5)
  }

  test("prefix-filter ngram near-dups match minhash-verified exact Jaccard") {
    val out = Dedup.ngramNearDups(docs, "text", "doc_id",
      threshold = 0.5, shingleSize = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Prefix filtering is EXACT — same pairs + values as the minhash
    // path's verified output on this fixture.
    assert(out.keySet == Set((1L, 2L), (1L, 5L), (2L, 5L), (1L, 3L), (2L, 3L), (3L, 5L)))
    assert(out((1L, 2L)) == 1.0)
    assert(math.abs(out((1L, 3L)) - 11.0 / 13.0) < 1e-9)
  }

  test("prefix-filter completeness at a high threshold on sets of unequal size") {
    val s = spark
    import s.implicits._
    // 10 vs 12 tokens, sharing all of the shorter doc's shingles:
    // J = 8/10 = 0.8 — right AT the threshold, the hardest case for an
    // off-by-one in the prefix length.
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j k l"),
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNearDups(d, "text", "doc_id",
      threshold = 0.8, shingleSize = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.keySet == Set((1L, 2L)) && out((1L, 2L)) == 0.8, s"got $out")
  }

  test("prefix-filter plan: every join is key-equi (no cartesian product)") {
    val plan = Dedup.ngramNearDups(docs, "text", "doc_id",
      threshold = 0.6, shingleSize = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix-filter dedup must never go all-pairs:\n$plan")
  }

  test("simhash near-dups: identical docs distance 0, near-dups close") {
    val out = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((1L, 2L)) == 0L)
    assert(out((1L, 5L)) == 0L)
    assert(out.contains((1L, 3L)), s"near-dup 1-3 missed: $out")
    assert(!out.contains((1L, 4L)) && !out.contains((1L, 6L)))
  }

  test("embedding near-dups: exact and LSH paths agree on planted dups") {
    val s = spark
    import s.implicits._
    val base = (0 until 8).map(i => math.sin(i * 1.7).toFloat)
    val near = base.updated(0, base(0) + 0.01f)
    val far = (0 until 8).map(i => math.cos(i * 2.3).toFloat)
    val embs = Seq((1L, base), (2L, near), (3L, far))
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(embs, "embedding", "vec_id",
      threshold = 0.99, exact = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
    val lsh = Dedup.embeddingNearDups(embs, "embedding", "vec_id",
      threshold = 0.99, exact = false, planes = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == Set((1L, 2L)))
  }

  test("connected components: labels are the component minimum (chains, cycle, star)") {
    val s = spark
    import s.implicits._
    // Components: a 4-chain {1-2-3-4}, a triangle {10,11,12}, a star
    // {20 <- 21,22,23}, and a long path {30..35} that forces >1 round
    // of propagation (exercises pointer jumping, not just 1-hop min).
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L), (22L, 20L), (23L, 20L),
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L), (34L, 35L),
    ).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 4L).forall(cc(_) == 1L), s"chain: $cc")
    assert((10L to 12L).forall(cc(_) == 10L), s"triangle: $cc")
    assert((20L to 23L).forall(cc(_) == 20L), s"star: $cc")
    assert((30L to 35L).forall(cc(_) == 30L), s"path: $cc")
    assert(cc.size == 4 + 3 + 4 + 6)
  }

  test("dedupAgainst drops corpus-known and intra-batch dups, keeps fresh docs") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "known text one"), (2L, "known text two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "known text one"),          // verbatim re-crawl
      (11L, "  KNOWN   text two  "),    // normalization variant
      (12L, "fresh text"),
      (13L, "fresh text"),              // intra-batch dup of 12
      (14L, "another fresh text"),
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 14L))
  }

  test("dedupByPairs keeps exactly one representative per cluster") {
    val s = spark
    import s.implicits._
    val corpus = (1L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 8L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairs(corpus, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {2,5,7} -> keep 2; {3,8} -> keep 3; untouched 1,4,6 survive.
    assert(kept == Set(1L, 2L, 3L, 4L, 6L))
  }

  test("dedupByPairsBest keeps the highest-score member, ties to lowest id") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "short"), (2L, "the much longer member"), (3L, "mid size"),
      (4L, "same len"), (5L, "same len"),  // tied cluster
      (6L, "lone doc")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairsBest(corpus, "doc_id",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")), pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {1,2,3} -> 2 (longest); {4,5} -> 4 (tie, lower id); 6 singleton.
    assert(kept == Set(2L, 4L, 6L))
    // exactly one survivor per cluster + every singleton
    assert(Dedup.dedupByPairsBest(corpus, "doc_id",
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")), pairs).count() == 3)
  }

  test("dedupByPairsBest works with STRING ids (only the score is negated)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      ("url/a", "short"), ("url/b", "the much longer member"),
      ("url/c", "same len"), ("url/d", "same len"),
      ("url/e", "lone")).toDF("doc_id", "text")
    val pairs = Seq(("url/a", "url/b"), ("url/c", "url/d"))
      .toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairsBest(corpus, "doc_id",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")), pairs)
      .select("doc_id").collect().map(_.getString(0)).toSet
    // b longest of {a,b}; {c,d} tie -> lexicographically lower id c.
    assert(kept == Set("url/b", "url/c", "url/e"))
    // duplicate-id rows (retried write) collapse to one survivor
    val dup = corpus.union(Seq(("url/e", "lone")).toDF("doc_id", "text"))
    assert(Dedup.dedupByPairsBest(dup, "doc_id",
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")), pairs).count() == 3)
  }
}
