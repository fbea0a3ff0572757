package graft.dedup

import graft.SparkSpec

/** Cross-table near-dup screening and semantic decontamination on
  * hand-computed fixtures (the d17/d16 oracle entries recompute the
  * same verdicts from the real tables in DuckDB).
  */
class IncrementalDedupSpec extends SparkSpec {

  test("nearDupAgainst flags mutated copies, passes fresh docs") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "pack my box with five dozen liquor jugs for the long trip"),
      (102L, "sphinx of black quartz judge my vow said the old librarian"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // near-copy of 100 (one word appended at the end)
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      // identical to 101 (and sharing its id space deliberately: 101)
      (101L, "pack my box with five dozen liquor jugs for the long trip"),
      // fresh
      (2L, "completely different content about spark catalyst expression codegen internals"))
      .toDF("doc_id", "text")
    val got = Dedup.nearDupAgainst(batch, corpus, "text", "doc_id",
      threshold = 0.7, shingleSize = 3, numHashes = 64, bands = 16)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0L -> true, 101L -> true, 2L -> false))
  }

  test("nearDupAgainstIndex over a parquet-round-tripped index matches nearDupAgainst") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "pack my box with five dozen liquor jugs for the long trip"),
      (102L, "sphinx of black quartz judge my vow said the old librarian"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about spark catalyst expression codegen internals"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx")
      .toString + "/idx"
    Dedup.lshIndex(corpus, "text", "doc_id").write.parquet(dir)
    val viaIndex = Dedup.nearDupAgainstIndex(batch, s.read.parquet(dir),
        corpus, "text", "doc_id", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val direct = Dedup.nearDupAgainst(batch, corpus, "text", "doc_id",
        threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaIndex == direct)
    assert(viaIndex == Map(0L -> true, 2L -> false))
  }

  test("bucketed fingerprint table: probe parity, corpus side reads buckets without exchange") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 400L)
      .map(i => (i, s"corpus document number $i with stable content"))
      .toDF("doc_id", "text")
    val batch = (0L until 50L)
      .map(i => (1000L + i, s"corpus document number ${i * 4} with stable content"))
      .toDF("doc_id", "text")
      .unionByName(Seq((2000L, "entirely fresh text")).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-fptab")
      .toString + "/t"
    Dedup.writeFingerprintTable(corpus, "text", "doc_id",
      "fp_idx_spec", numBuckets = 8, path = Some(dir))
    val viaTable = Dedup.dedupAgainstTable(batch, "text", "doc_id",
      "fp_idx_spec")
    val direct = Dedup.dedupAgainst(batch, corpus, "text", "doc_id")
    val a = viaTable.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = direct.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a == Set(2000L))
    // the point of the layout: the bucketed plan reads the corpus
    // pre-partitioned (bucketed scan) and pays strictly fewer
    // exchanges than the recomputing plan
    viaTable.collect()
    val bucketedPlan = viaTable.queryExecution.executedPlan.toString
    direct.collect()
    val directPlan = direct.queryExecution.executedPlan.toString
    assert(bucketedPlan.contains("Bucketed: true"), bucketedPlan)
    def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges(bucketedPlan) < exchanges(directPlan),
      s"bucketed:\n$bucketedPlan\ndirect:\n$directPlan")
    s.sql("DROP TABLE IF EXISTS fp_idx_spec")
  }

  test("nearDupAgainst verdict covers every batch doc exactly once") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val batch = Seq((1L, "x y z w v u"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val rows = Dedup.nearDupAgainst(batch, corpus, "text", "doc_id",
      threshold = 0.9).collect()
    assert(rows.length == 2)
    val got = rows.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch id 1 collides with a corpus id but has different text:
    // id keying must stay per-side.
    assert(got == Map(1L -> false, 2L -> true))
  }

  test("semanticContaminated flags cosine neighbors of the bench set") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.98, 0.05, 0.0)), // ~bench vec
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val bench = Seq((900L, Seq(1.0, 0.0, 0.0))).toDF("bid", "embedding")
    val got = Decontaminate.semanticContaminated(
      corpus, "embedding", "vec_id", bench, "embedding", 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }
}
