package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.json4s.JsonDSL._

/** BM25 full-text search (reference V8: Milvus `Function(BM25)` +
  * text-as-query search, common/workload.py:230-234,
  * manifests/schema_matrix_2_6.yaml:65-69; Turbopuffer
  * `RankByTextBM25`, tpuffer/fts_query.go:397-407).
  *
  * Spark-first shape — an inverted-index join, not a scan-and-score:
  *   1. postings: explode(doc tokens) → tf per (doc, term)   [one shuffle]
  *   2. df per term + (N, avgdl) corpus stats                [aggregation]
  *   3. semi-join postings ⋈ query terms (broadcast)          [prunes to
  *      docs sharing ≥1 query term — the inverted-index lookup]
  *   4. per-doc score aggregation → top-k                     [tiny]
  *
  * At 100 TB the expensive parts are the postings build (linear, one
  * shuffle on term) and stats — both are offline-index work that
  * [[Bm25Index]] materializes once and every query reuses; a query then
  * touches only the postings of its terms (partition-pruned scan when
  * the postings table is written bucketed by term).
  *
  * Scoring (Lucene/Milvus BM25):
  *   idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  */
object Bm25 {

  final case class Params(k1: Double = 1.2, b: Double = 0.75,
      analyzer: String = "standard")

  /** Materialized index: postings (id, term, tf, dl) + df table + corpus
    * stats. Build once, search many times.
    */
  final case class Bm25Index(
      postings: DataFrame, // idCol, term, tf, dl
      docFreq: DataFrame,  // term, df
      numDocs: Long,
      avgdl: Double,
      idCol: String,
      params: Params)

  def buildIndex(docs: DataFrame, textCol: String, idCol: String,
      params: Params = Params()): Bm25Index = {
    val tokenize = Analyzer.byName(params.analyzer)
    val toks = docs
      .select(col(idCol), tokenize(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
    // NOTE (measured, round 4): persisting postings here is a
    // pessimization — the stats/docFreq/write consumers share the
    // groupBy's shuffle stage, which Spark already skips on re-execution
    // (shuffle files are reused across jobs on an identical lineage),
    // so a cache only adds serialization overhead (~10% on the indexed
    // BM25 bench).
    val postings = toks.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = postings.groupBy("term")
      .agg(countDistinct(col(idCol)).as("df"))
    // Corpus stats from the postings (one row per doc after distinct) —
    // avoids re-tokenizing the corpus in a second scan. Zero-token docs
    // don't appear in postings; they can't match any term, and avgdl
    // over scoreable docs is the consistent normalizer.
    val stats = postings.select(col(idCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    Bm25Index(postings, docFreq, stats.getLong(0), stats.getDouble(1),
      idCol, params)
  }

  /** Score one text query against the index; returns (idCol, score)
    * for every doc sharing at least one query term.
    */
  def score(index: Bm25Index, query: String): DataFrame = {
    val terms = tokenizeQuery(query, index.params.analyzer)
    scoreJoin(index.postings, index.docFreq, terms, index.numDocs,
      index.avgdl, index.idCol, index.params)
  }

  private def scoreJoin(postings: DataFrame, docFreq: DataFrame,
      terms: Seq[String], numDocs: Long, avgdl: Double, idCol: String,
      p: Params): DataFrame = {
    // Query terms with per-term idf — tiny, broadcast into the join.
    val termDf = docFreq
      .filter(col("term").isin(terms: _*))
      .withColumn("idf",
        log(lit(1.0) + (lit(numDocs.toDouble) - col("df") + 0.5)
          / (col("df") + 0.5)))
    val contrib = postings
      .join(broadcast(termDf), "term")
      .withColumn("_score",
        col("idf") * (col("tf") * (p.k1 + 1)) /
          (col("tf") + lit(p.k1) * (lit(1 - p.b) + lit(p.b) * col("dl") / avgdl)))
    contrib.groupBy(idCol)
      .agg(sum("_score").as("score"))
  }

  /** One-shot text top-k over a document DataFrame (builds the index
    * inline — use [[buildIndex]] + [[score]] for repeated queries).
    */
  def topK(docs: DataFrame, textCol: String, idCol: String, query: String,
      k: Int, params: Params = Params(),
      filter: Option[Column] = None): DataFrame = {
    val base = filter.map(docs.filter).getOrElse(docs)
    val index = buildIndex(base, textCol, idCol, params)
    score(index, query)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** On-disk index handle: postings partitioned by a term-hash bucket
    * (`_tb`), so a query's scan prunes to the directories of ITS terms
    * — build once, query many (tpuffer/fts_query.go:397-407 shape).
    */
  final case class PersistedBm25(
      postingsPath: String, docFreqPath: String,
      numDocs: Long, avgdl: Double, idCol: String,
      params: Params, numBuckets: Int,
      // "" for pre-doclen layouts (they can't delta-serve; rebuild)
      doclenPath: String = "")

  /** Materialize an index under `dir`: `postings/` (partitionBy(_tb)),
    * `docfreq/`, `stats.json`. One linear shuffle-on-bucket job.
    */
  def writeIndex(index: Bm25Index, dir: String,
      numBuckets: Int = 64): PersistedBm25 = {
    val postingsPath = s"$dir/postings"
    val docFreqPath = s"$dir/docfreq"
    // Denormalize the per-term idf INTO the postings (one term-keyed
    // join, paid once at build): idf = f(df, numDocs) is fixed for the
    // build's lifetime, so serving never joins docfreq — a query is one
    // bucket-pruned scan-score-aggregate job. The impact-ordered-index
    // move; ~one extra double per posting row. NOT broadcast: the full
    // vocabulary is unbounded at scale — AQE picks broadcast when the
    // df side is actually small.
    val idfByTerm = index.docFreq.withColumn("idf",
      log(lit(1.0) + (lit(index.numDocs.toDouble) - col("df") + 0.5)
        / (col("df") + 0.5)))
      .select("term", "idf")
    index.postings
      .join(idfByTerm, "term")
      .withColumn("_tb", pmod(hash(col("term")), lit(numBuckets)))
      // Co-locate each bucket before the partitioned write: without
      // this, every task writes a file into every bucket directory
      // (tasks x buckets small files — ~2k at local settings, far worse
      // on a cluster); with it, one shuffle yields one file per bucket.
      .repartition(col("_tb"))
      .write.mode("overwrite").partitionBy("_tb").parquet(postingsPath)
    index.docFreq.write.mode("overwrite").parquet(docFreqPath)
    // Per-doc lengths (one row per scoreable doc — zero-token docs are
    // excluded from numDocs/avgdl by construction, so excluding them
    // here keeps delta-serve stat adjustments consistent). This is
    // what lets [[topKDeltaServed]] retire a deleted doc's (1, dl)
    // contribution without re-tokenizing anything sealed.
    index.postings.select(col(index.idCol), col("dl")).distinct()
      .write.mode("overwrite").parquet(s"$dir/doclen")
    val stats = ("numDocs" -> index.numDocs) ~ ("avgdl" -> index.avgdl) ~
      ("idCol" -> index.idCol) ~ ("numBuckets" -> numBuckets)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "stats.json"),
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(stats)).getBytes)
    PersistedBm25(postingsPath, docFreqPath, index.numDocs, index.avgdl,
      index.idCol, index.params, numBuckets, s"$dir/doclen")
  }

  // NOTE (measured, round 4): deriving docFreq/stats from the WRITTEN
  // postings parquet (write first, then scan the compact output for the
  // two stats jobs) is a wash vs the lineage re-execution above —
  // Spark's shuffle-stage reuse already makes the re-executions cheap
  // (old 1.6-1.8s vs new 1.4-2.0s warm at sf0.1; the indexed bench's
  // first-run cost is JVM/scan warmup, not build shape).

  def readIndexMeta(dir: String, params: Params = Params()): PersistedBm25 = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "stats.json"))))
    PersistedBm25(s"$dir/postings", s"$dir/docfreq",
      (j \ "numDocs").extract[Long], (j \ "avgdl").extract[Double],
      (j \ "idCol").extract[String], params,
      (j \ "numBuckets").extract[Int],
      if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "doclen"))) s"$dir/doclen" else "")
  }

  /** Score a query against a persisted index. The postings scan is
    * pruned twice: `_tb IN (buckets of the query's terms)` is a
    * DIRECTORY-level partition filter, and `term IN (...)` a row-group
    * filter inside the surviving buckets — per-query cost scales with
    * the query's posting lists, not the corpus.
    */
  def scorePersisted(spark: SparkSession, p: PersistedBm25,
      query: String): DataFrame = {
    val terms = tokenizeQuery(query, p.params.analyzer)
    if (terms.isEmpty)
      // Empty result keeps the PERSISTED id type (a VARCHAR-pk
      // collection must not get a LongType id that pollutes downstream
      // joins with casts).
      return spark.read.parquet(p.postingsPath)
        .select(col(p.idCol), lit(0.0).as("score")).limit(0)
    val buckets = termBuckets(spark, terms, p.numBuckets)
    val postings = spark.read.parquet(p.postingsPath)
      .filter(col("_tb").isin(buckets: _*) && col("term").isin(terms: _*))
    if (postings.columns.contains("idf")) {
      // Current layout: idf was denormalized into the postings at build
      // time (see writeIndex), so scoring is a single bucket-pruned
      // scan-score-aggregate — no docfreq join per query.
      val pr = p.params
      postings
        .withColumn("_score",
          col("idf") * (col("tf") * (pr.k1 + 1)) /
            (col("tf") + lit(pr.k1) *
              (lit(1 - pr.b) + lit(pr.b) * col("dl") / p.avgdl)))
        .groupBy(p.idCol)
        .agg(sum("_score").as("score"))
    } else {
      // Legacy layout (pre-idf postings): join docfreq at query time.
      val docFreq = spark.read.parquet(p.docFreqPath)
      scoreJoin(postings, docFreq, terms, p.numDocs, p.avgdl, p.idCol,
        p.params)
    }
  }

  /** Batched top-k: nq text queries answered in ONE job over the
    * persisted postings — the shape that serves QPS on Spark, where a
    * per-query loop pays the fixed job-scheduling cost nq times. The
    * union of every query's term buckets is scanned ONCE (still a
    * directory-pruned read — only buckets some query needs); a
    * broadcast (term, qid) probe fans each posting out to the queries
    * containing its term; scores aggregate per (qid, doc); the shared
    * salted per-qid window prunes to k (the batched-kNN plan family).
    * Repeated terms within one query are deduplicated, matching the
    * single-query scorer's term-presence semantics. Output:
    * (qid, idCol, score, rank).
    */
  def topKPersistedBatch(spark: SparkSession, p: PersistedBm25,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    import spark.implicits._
    val probe = queries.flatMap { case (qid, q) =>
      tokenizeQuery(q, p.params.analyzer).distinct.map(t => (qid, t))
    }
    if (probe.isEmpty)
      return spark.read.parquet(p.postingsPath)
        .select(lit(0L).as("qid"), col(p.idCol), lit(0.0).as("score"),
          lit(0).as("rank")).limit(0)
    val allTerms = probe.map(_._2).distinct
    val buckets = termBuckets(spark, allTerms, p.numBuckets)
    val postings = spark.read.parquet(p.postingsPath)
      .filter(col("_tb").isin(buckets: _*) && col("term").isin(allTerms: _*))
    require(postings.columns.contains("idf"),
      "batched serving requires the idf-denormalized postings layout")
    val pr = p.params
    val scored = postings
      .join(broadcast(probe.toDF("qid", "term")), "term")
      .withColumn("_score",
        col("idf") * (col("tf") * (pr.k1 + 1)) /
          (col("tf") + lit(pr.k1) *
            (lit(1 - pr.b) + lit(pr.b) * col("dl") / p.avgdl)))
      .groupBy(col("qid"), col(p.idCol))
      .agg(sum("_score").as("score"))
    graft.operators.Knn.limitPerQid(scored, "qid",
      Seq(col("score").desc, col(p.idCol).asc), k)
  }

  /** Top-k against a persisted index (ORDER BY + LIMIT =
    * TakeOrderedAndProject over the pruned aggregation).
    */
  def topKPersisted(spark: SparkSession, p: PersistedBm25, query: String,
      k: Int): DataFrame =
    scorePersisted(spark, p, query)
      .orderBy(col("score").desc, col(p.idCol).asc)
      .limit(k)

  /** Exactly-adjusted corpus stats for delta serving. The removed
    * side's agg scans the (2-column) doclen table — the one
    * corpus-sized input — so callers should compute this ONCE per
    * (build, committedSeq) generation and pass it to every query
    * ([[graft.store.IndexStore]] memoizes it alongside the growing
    * postings).
    */
  final case class DeltaStats(nPrime: Long, avgdlPrime: Double)

  /** The growing side's mini-postings — delta-sized, eagerly pinned
    * (localCheckpoint), meant to be built ONCE per DML generation and
    * shared by [[deltaStats]] and every [[topKDeltaServed]] query.
    */
  def growingPostings(p: PersistedBm25, growingDocs: DataFrame,
      textCol: String): DataFrame = {
    val idc = p.idCol
    val tokenize = Analyzer.byName(p.params.analyzer)
    growingDocs
      .select(col(idc), tokenize(col(textCol)).as("_toks"))
      .select(col(idc), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col(idc), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
  }

  def deltaStats(spark: SparkSession, p: PersistedBm25,
      gposts: DataFrame, changedPks: DataFrame): DeltaStats = {
    val idc = p.idCol
    val pks = broadcast(changedPks.select(col(changedPks.columns.head)
      .as(idc)))
    val rem = spark.read.parquet(p.doclenPath).join(pks, idc)
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    // One row per growing doc with >= 1 token — the same scoreable-doc
    // universe the sealed build's numDocs/avgdl count.
    val add = gposts.select(col(idc), col("dl")).distinct()
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    val nPrime = p.numDocs - rem.getLong(0) + add.getLong(0)
    DeltaStats(nPrime,
      if (nPrime <= 0) 0.0
      else (p.avgdl * p.numDocs - rem.getLong(1) + add.getLong(1)) / nPrime)
  }

  /** EXACT BM25 top-k over (sealed \ changed) ∪ growing — post-DML
    * serving WITHOUT rebuilding the sealed index (the Milvus
    * sealed/growing model for FTS). Unlike the vector routes, BM25's
    * scores depend on GLOBAL stats (N, avgdl, df), so serving stale
    * stats would change every score; instead the stats are adjusted
    * exactly:
    *
    *   - N' and avgdl' from the persisted per-doc length table: the
    *     changed pks' (1, dl) contributions retire via one bounded
    *     broadcast join, the growing rows' add via one delta-sized agg;
    *   - df'(t), for the QUERY's terms only: sealed df (term-pruned
    *     docfreq read) − changed-doc hits (term-pruned postings ∩
    *     changed pks) + growing hits;
    *   - sealed postings are RE-scored with idf'/avgdl' (they store tf
    *     and dl, so the stored build-time idf is simply ignored), the
    *     changed pks anti-joined out, and the growing mini-postings
    *     unioned in.
    *
    * Per-query cost: the same bucket+term-pruned sealed scan a fresh
    * query pays, plus delta-sized work — never a corpus re-tokenize.
    * The result equals a full rebuild's scores up to the floating-point
    * reconstruction of avgdl' (the parity spec asserts 1e-9 relative).
    *
    * `growingDocs` = the currently-visible rows committed after the
    * build (upserts resolved, tombstones dropped); `changedPks` =
    * every pk those deltas touched (both bounded by the caller's
    * serve-stale gate).
    */
  def topKDeltaServed(spark: SparkSession, p: PersistedBm25,
      query: String, k: Int, growingDocs: DataFrame,
      changedPks: DataFrame, textCol: String,
      precomputed: Option[DeltaStats] = None,
      precomputedPostings: Option[DataFrame] = None): DataFrame = {
    require(p.doclenPath.nonEmpty,
      "delta serving needs a doclen-bearing index layout (rebuild once)")
    val terms = tokenizeQuery(query, p.params.analyzer)
    val idc = p.idCol
    if (terms.isEmpty)
      return spark.read.parquet(p.postingsPath)
        .select(col(idc), lit(0.0).as("score")).limit(0)
    val pks = broadcast(changedPks.select(col(changedPks.columns.head)
      .as(idc)))
    val gposts = precomputedPostings.getOrElse(
      growingPostings(p, growingDocs, textCol))
    val st = precomputed.getOrElse(
      deltaStats(spark, p, gposts, changedPks))
    val nPrime = st.nPrime
    if (nPrime <= 0)
      return spark.read.parquet(p.postingsPath)
        .select(col(idc), lit(0.0).as("score")).limit(0)
    val avgdlPrime = st.avgdlPrime
    // df'(t) for the query terms (three tiny term-keyed collects).
    val buckets = termBuckets(spark, terms, p.numBuckets)
    val sealedPruned = spark.read.parquet(p.postingsPath)
      .filter(col("_tb").isin(buckets: _*) && col("term").isin(terms: _*))
    def toMap(rows: Array[org.apache.spark.sql.Row]): Map[String, Long] =
      rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfSealed = toMap(spark.read.parquet(p.docFreqPath)
      .filter(col("term").isin(terms: _*))
      .select(col("term"), col("df")).collect())
    val dfRem = toMap(sealedPruned.join(pks, idc)
      .groupBy("term").agg(countDistinct(col(idc)).as("c")).collect())
    val dfAdd = toMap(gposts.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct(col(idc)).as("c")).collect())
    val idf = terms.flatMap { t =>
      val df = dfSealed.getOrElse(t, 0L) - dfRem.getOrElse(t, 0L) +
        dfAdd.getOrElse(t, 0L)
      if (df <= 0) None
      else Some((t, math.log(1.0 + (nPrime - df + 0.5) / (df + 0.5))))
    }
    if (idf.isEmpty)
      return spark.read.parquet(p.postingsPath)
        .select(col(idc), lit(0.0).as("score")).limit(0)
    import spark.implicits._
    val idfDf = broadcast(idf.toDF("term", "_idf"))
    val pr = p.params
    def scored(posts: DataFrame): DataFrame = posts
      .join(idfDf, "term")
      .withColumn("_score",
        col("_idf") * (col("tf") * (pr.k1 + 1)) /
          (col("tf") + lit(pr.k1) *
            (lit(1 - pr.b) + lit(pr.b) * col("dl") / avgdlPrime)))
      .select(col(idc), col("_score"))
    scored(sealedPruned.join(pks, Seq(idc), "left_anti"))
      .unionByName(scored(gposts.filter(col("term").isin(terms: _*))))
      .groupBy(idc).agg(sum("_score").as("score"))
      .orderBy(col("score").desc, col(idc).asc)
      .limit(k)
  }

  /** Spark-hash term buckets, evaluated through the same `hash()`
    * expression the writer used (a LocalTableScan — no job).
    */
  private def termBuckets(spark: SparkSession, terms: Seq[String],
      numBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("term")
      .select(pmod(hash(col("term")), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  private[text] def tokenizeQuery(query: String, analyzer: String): Seq[String] =
    analyzer.toLowerCase match {
      case "standard" =>
        query.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq.distinct
      case "whitespace" => query.split("\\s+").filter(_.nonEmpty).toSeq.distinct
      case other => throw new IllegalArgumentException(s"unknown analyzer $other")
    }
}
