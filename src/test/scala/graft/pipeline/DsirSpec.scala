package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR hashed-n-gram importance resampling: feature stream shape,
  * model mass, on-domain ranking, and deterministic Gumbel top-k. The
  * p8/p9 oracle entries recompute the full estimator in DuckDB over
  * the real documents table.
  */
class DsirSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def corpus = Seq(
    (0L, "spark catalyst optimizer rules rewrite the logical plan"),
    (1L, "catalyst expressions compile to java bytecode via codegen"),
    (2L, "the cat sat on the mat near the door"),
    (3L, "a dog chased the cat across the yard"),
    (4L, "spark catalyst codegen compiles the physical plan"),
    (5L, ""),
    (6L, "recipes for sourdough bread and pastry dough")
  ).toDF("doc_id", "text")

  private def target = Seq(
    (100L, "catalyst optimizer codegen rules for the logical plan"),
    (101L, "spark catalyst compiles expressions to bytecode")
  ).toDF("doc_id", "text")

  test("docBuckets: bucket ids in range, counts sum to gram count") {
    val b = Dsir.docBuckets(corpus, "text", "doc_id", 64)
    assert(b.filter(col("bucket") < 0 || col("bucket") >= 64).count() === 0)
    // doc 2 has 9 tokens -> 9 unigrams + 8 bigrams = 17 grams
    val n = b.filter(col("doc_id") === 2L)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(n === 17L)
    // empty doc contributes no rows
    assert(b.filter(col("doc_id") === 5L).count() === 0)
  }

  test("fit: model bounded by numBuckets, probabilities sum below 1") {
    val m = Dsir.fit(corpus, "text", "doc_id", 32, alpha = 0.5)
    val rows = m.buckets.collect()
    assert(rows.length <= 32)
    val mass = rows.map(r => math.exp(r.getDouble(1))).sum +
      (32 - rows.length) * math.exp(m.logUnseen)
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  test("importanceWeights: target-like docs outrank off-domain docs") {
    val t = Dsir.fit(target, "text", "doc_id", 1024)
    val r = Dsir.fit(corpus, "text", "doc_id", 1024)
    val w = Dsir.importanceWeights(corpus, "text", "doc_id", t, r)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(w.size === 7)
    // spark/catalyst docs should carry higher weight than cat/dog/bread
    val onDomain = Seq(0L, 1L, 4L).map(w)
    val offDomain = Seq(2L, 3L, 6L).map(w)
    assert(onDomain.min > offDomain.max)
    // token-free doc weighs exactly 0
    assert(w(5L) === 0.0)
  }

  test("both model tables ride broadcasts; no cartesian anywhere") {
    val t = Dsir.fit(target, "text", "doc_id", 256)
    val r = Dsir.fit(corpus, "text", "doc_id", 256)
    val plan = Dsir.importanceWeights(corpus, "text", "doc_id", t, r)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket models not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the scoring plan:\n$plan")
  }

  test("resampleTop: deterministic, ordered by key, n-bounded") {
    val t = Dsir.fit(target, "text", "doc_id", 1024)
    val r = Dsir.fit(corpus, "text", "doc_id", 1024)
    val s1 = Dsir.resampleTop(corpus, "text", "doc_id", t, r, 3).collect()
    val s2 = Dsir.resampleTop(corpus, "text", "doc_id", t, r, 3).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    assert(s1.length === 3)
    val keys = s1.map(_.getDouble(2)).toSeq
    assert(keys === keys.sorted.reverse)
    // different salt -> (almost surely) different gumbel keys
    val s3 = Dsir.resampleTop(corpus, "text", "doc_id", t, r, 3, "other")
      .collect().map(_.getDouble(2)).toSeq
    assert(s3 !== keys)
  }
}
