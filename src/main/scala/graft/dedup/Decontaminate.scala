package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share a
  * long word n-gram with any document in an evaluation/benchmark set
  * (the standard pre-training hygiene step: GPT-3 §C used 13-gram
  * overlap, Llama 8–10; default 8 here).
  *
  * Scale shape: the corpus side explodes each document's DISTINCT
  * n-grams (linear in corpus tokens) and equi-joins the benchmark's
  * distinct gram set. A benchmark is small next to a 100 TB corpus
  * (thousands of eval documents vs billions of training documents), so
  * the gram set broadcasts and the "join" is a map-side hash probe —
  * no shuffle of the corpus at all. With `broadcastBench = false` the
  * same plan runs as a shuffle join for the rare both-sides-huge case.
  * Joining on the gram STRING keeps the check exact; at extreme gram
  * cardinality swap the join key for xxhash64(gram) (collisions only
  * ever ADD a flagged doc, never hide one).
  */
object Decontaminate {

  /** Documents of `corpus` contaminated by `bench`: returns
    * (idCol, n_hit_grams) — one row per corpus document sharing at
    * least one n-token gram with any benchmark document, with the
    * count of DISTINCT shared grams (the audit signal: 1 hit on an
    * 8-gram is plausibly idiomatic text; hundreds is a verbatim leak).
    */
  def contaminated(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      broadcastBench: Boolean = true): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("_gram"))
    val benchGrams0 = bench
      .select(explode(array_distinct(
        TextOps.shingles(col(benchTextCol), n))).as("_gram"))
      .distinct()
    val benchGrams =
      if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    corpusGrams.join(benchGrams, "_gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Per-BENCHMARK-ITEM leak report — the flip side of
    * [[contaminated]]: for each eval item, how many corpus documents
    * share at least one n-gram with it and how many of its distinct
    * grams leaked. This is the report an eval owner reads (is MY
    * benchmark compromised, and how badly?) where `contaminated`
    * answers the corpus owner's question (which docs must go?).
    *
    * Scale shape: the bench gram table (bench id, gram) broadcasts;
    * the corpus contributes its distinct (doc, gram) stream once; the
    * per-item aggregation keys on the bench id — cardinality = the
    * eval suite, not the corpus.
    */
  def leakReport(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      benchIdCol: String,
      n: Int = 8,
      broadcastBench: Boolean = true): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("_gram"))
    val benchGrams0 = bench.select(col(benchIdCol),
      explode(array_distinct(
        TextOps.shingles(col(benchTextCol), n))).as("_gram"))
      .distinct()
    val benchGrams =
      if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    corpusGrams.join(benchGrams, "_gram")
      .groupBy(col(benchIdCol))
      .agg(countDistinct(col(idCol)).as("n_leaked_docs"),
        countDistinct(col("_gram")).as("n_leaked_grams"))
  }

  /** SEMANTIC decontamination: flag corpus rows whose embedding is
    * cosine-similar (≥ threshold) to ANY benchmark embedding — the
    * paraphrase-robust companion to the exact n-gram check (verbatim
    * leaks share grams; reworded leaks only share geometry; run both).
    *
    * Scale shape: the benchmark embedding set broadcasts (thousands of
    * eval items vs billions of corpus rows) and the similarity test is
    * a pair of broadcast nested-loop SEMI/ANTI joins — two scans of
    * the corpus, ZERO shuffle (the previous id-keyed verdict join
    * sort-merged the whole corpus, contradicting exactly this note),
    * early-out per row on the first hit. Returns every corpus id with
    * a boolean verdict: `(idCol, contaminated)`.
    */
  def semanticContaminated(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      bench: DataFrame,
      benchVecCol: String,
      threshold: Double): DataFrame = {
    val b = broadcast(bench.select(col(benchVecCol).as("_bvec")))
    val cond = graft.Functions.vecCosine(col(vecCol), col("_bvec")) >=
      threshold
    corpus.join(b, cond, "left_semi")
      .select(col(idCol), lit(true).as("contaminated"))
      .unionByName(corpus.join(b, cond, "left_anti")
        .select(col(idCol), lit(false).as("contaminated")))
  }

  /** The clean corpus: `corpus` minus contaminated documents — a
    * broadcast anti-join when the benchmark broadcasts, so the corpus
    * still never shuffles.
    */
  def clean(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      broadcastBench: Boolean = true): DataFrame = {
    val hits = contaminated(corpus, textCol, idCol, bench, benchTextCol,
      n, broadcastBench).select(col(idCol))
    corpus.join(if (broadcastBench) broadcast(hits) else hits,
      Seq(idCol), "left_anti")
  }
}
