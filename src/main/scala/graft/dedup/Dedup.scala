package graft.dedup

import graft.Functions
import graft.text.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for LLM training-data pipelines. Every
  * near-dup variant is bucketed (LSH bands / hash chunks) so candidate
  * generation is an equi-join on bucket keys — never an all-pairs cross
  * join — followed by an exact verification on the candidates only.
  * That is the shape that survives 100 TB: the joins shuffle on bucket
  * keys with data-proportional volume, and verification touches only
  * the (tiny) candidate set.
  */
object Dedup {

  // --- exact -------------------------------------------------------------

  /** The dedup fingerprint with null text coalesced to a sentinel
    * (not a possible md5 hex string), so null-content rows form ONE
    * duplicate group instead of silently falling out of null-keyed
    * joins.
    */
  private def fpCol(textCol: String): Column =
    coalesce(TextOps.fingerprint(col(textCol)), lit("_null_"))

  /** Keep exactly one row — the lowest id; ties (identical ids from a
    * retried write) collapse — per `_fp`. Map-side-combined min-agg
    * plus a keeper equi-join, NOT a window: a mass-duplicated page (a
    * billion copies of one fingerprint) costs one agg cell here,
    * whereas a window over the fingerprint serializes the hot key on
    * one reducer and AQE's skew splitting does not apply to windows
    * (it does to this join). The single keeper shape shared by
    * [[exact]], [[dedupAgainst]] and [[dedupAgainstTable]] — the d9
    * and d21 oracles assume these cannot drift.
    */
  private def keeperIds(withFp: DataFrame, idCol: String): DataFrame =
    withFp.groupBy("_fp").agg(min(col(idCol)).as("_keep"))

  private def keepFirst(withFp: DataFrame, idCol: String): DataFrame =
    withFp.join(keeperIds(withFp, idCol), Seq("_fp"))
      .filter(col(idCol) === col("_keep"))
      .dropDuplicates("_fp")
      .drop("_fp", "_keep")

  /** Exact dedup on normalized text: keep the lowest-id document per
    * fingerprint (see [[keepFirst]] for the skew-proof shape).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    keepFirst(docs.withColumn("_fp", fpCol(textCol)), idCol)

  /** [[exact]] without the filter: every input row plus a `keep`
    * boolean (true = this row is the fingerprint's keeper). Built on
    * the SAME fingerprint and keeper rule as [[exact]] (shared
    * [[fpCol]]/[[keeperIds]]), so audit/attribute consumers — e.g.
    * [[graft.pipeline.Curate.audit]] — can't drift from the dedup the
    * chain actually runs. Rows duplicated on id both read keep=true
    * (the verdict frame doesn't collapse rows; [[exact]] does).
    */
  def exactVerdicts(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val withFp = docs.withColumn("_fp", fpCol(textCol))
    withFp.join(keeperIds(withFp, idCol), Seq("_fp"))
      .withColumn("keep", col(idCol) === col("_keep"))
      .drop("_fp", "_keep")
  }

  /** Exact-dup groups: fingerprints appearing more than once, with
    * their member ids (for reporting / CORRECTNESS).
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .groupBy("_fp")
      .agg(count(lit(1)).as("cnt"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("cnt") > 1)

  /** SOFT dedup: instead of dropping exact duplicates, weight every
    * document by the inverse of its duplication count —
    * `(id, dup_count, weight = 1/dup_count)` — so a page crawled a
    * thousand times contributes one page's worth of training loss
    * while unique text keeps weight 1. The down-weighting alternative
    * to [[exact]] for pipelines that re-weight the sampler rather
    * than delete (duplication-aware temperature mixing).
    *
    * One fingerprint-keyed aggregation plus the join back — the same
    * two shuffles as [[exact]], no windows.
    */
  def softWeights(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // fpCol, not the raw fingerprint: a null-text row's null _fp never
    // equi-joins its own count row, so the document would VANISH from
    // the weights output instead of joining the null-content group —
    // the exact failure the sentinel exists for (see fpCol).
    val fp = docs.select(col(idCol), fpCol(textCol).as("_fp"))
    val counts = fp.groupBy("_fp").agg(count(lit(1)).as("dup_count"))
    fp.join(counts, "_fp")
      .select(col(idCol), col("dup_count"),
        (lit(1.0) / col("dup_count")).as("weight"))
  }

  // --- MinHash + banded LSH ---------------------------------------------

  /** MinHash signatures over word n-gram shingles.
    *
    * Each shingle is hashed ONCE to a 64-bit base (xxhash64 of the
    * string); the numHashes functions re-hash only the 8-byte base
    * (h_i = xxhash64(i, base)) — far cheaper than hashing the string
    * numHashes times, and safe under ANSI mode (an affine a·base+b
    * family would overflow-error, not wrap).
    *
    * Shape note (measured, round 4): building the signature row-locally
    * with nested transform()/array_min() — no explode, no shuffle —
    * is ~2x SLOWER than this explode + numHashes min() aggs shape,
    * because higher-order functions are interpreted (not codegen'd):
    * the 64·shingles hash evals per doc leave whole-stage codegen,
    * while min-agg input expressions stay inside it. The hash-agg
    * exchange is cheaper than interpreting the loop. So: explode +
    * codegen'd min aggs IS the right Spark shape; "batch the min-aggs
    * into one array aggregate" is a dead end until Spark codegens HOFs.
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 128): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), shingleSize)))
        .as("_shingle"))
      .withColumn("_base", xxhash64(col("_shingle")))
    val mins = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("_base"))).as(s"_h$i")
    }
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"_h$i")): _*)
        .as("signature"))
  }

  /** Candidate pairs via banded LSH: split the signature into
    * `bands` bands of `rows` hashes; docs sharing any band bucket are
    * candidates. Equi-join on (band, bucketHash) — shuffle volume is
    * O(docs × bands), never quadratic.
    */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
      bands: Int, rows: Int): DataFrame = {
    val buckets = bandBuckets(signatures, idCol, bands, rows)
    val a = buckets.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = buckets.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** `(id, band, bucket)` banded-signature buckets — the persistable
    * LSH index side shared by the self-join ([[lshCandidatePairs]]),
    * the cross-table probe ([[nearDupAgainst]]), and the streaming
    * candidate state.
    */
  private def bandBuckets(signatures: DataFrame, idCol: String,
      bands: Int, rows: Int): DataFrame =
    signatures.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), concat_ws("_",
          (0 until rows).map(r => col("signature")(b * rows + r)): _*))): _*))
        .as(Seq("band", "bucket")))

  /** Exact Jaccard similarity over distinct shingle sets, computed for
    * given pairs only (posting-list join, no cross product).
    */
  def jaccardVerify(docs: DataFrame, textCol: String, idCol: String,
      pairs: DataFrame, shingleSize: Int): DataFrame = {
    // Prune to docs actually referenced by candidate pairs BEFORE
    // computing shingle sets — otherwise both join branches re-shingle
    // the whole corpus to verify a handful of candidates.
    val wanted = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    val sets = docs.join(wanted, Seq(idCol), "left_semi")
      .select(col(idCol).as("_id"),
        array_distinct(TextOps.shingles(col(textCol), shingleSize)).as("_set"))
    pairs
      .join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("_set", "_sa"), "id_a")
      .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("_set", "_sb"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
          size(array_union(col("_sa"), col("_sb"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidate
    * join → exact Jaccard verification → pairs ≥ threshold.
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      numHashes: Int = 128, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sigs = minhashSignatures(docs, textCol, idCol, shingleSize, numHashes)
    val pairs = lshCandidatePairs(sigs, idCol, bands, numHashes / bands)
    jaccardVerify(docs, textCol, idCol, pairs, shingleSize)
      .filter(col("jaccard") >= threshold)
  }

  /** N-gram Jaccard similarity of two text columns (scalar, for direct
    * scoring / tests).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val (sa, sb) = (array_distinct(TextOps.shingles(a, n)),
      array_distinct(TextOps.shingles(b, n)))
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** EXACT n-gram Jaccard near-dups via prefix filtering (PPJoin-style,
    * Xiao et al., WWW'08 — public algorithm): unlike MinHash this loses
    * nothing to sketching, yet never goes all-pairs.
    *
    * Completeness argument: J(A,B) >= t implies |A∩B| >= t·|A∪B| >=
    * t·|A|. Order every doc's shingles by a GLOBAL canonical order
    * (ascending document frequency, ties by value — rarest first);
    * if two sets share >= ceil(t·|A|) elements they MUST share one
    * within the first |A| - ceil(t·|A|) + 1 of A's ordered shingles.
    * So an equi-join on prefix shingles only is a complete candidate
    * generator, and rare-first ordering keeps posting lists short —
    * hot (stopword-like) shingles land in the suffix and never join.
    *
    * Shuffles: df agg on shingle, df join on shingle, one window per
    * doc, candidate equi-join on prefix shingle, then
    * [[jaccardVerify]] on candidates only. All key-partitioned,
    * data-proportional — no cross join anywhere; 100 TB-safe.
    */
  def ngramNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val exploded = docs.select(col(idCol).as("_id"),
        array_distinct(TextOps.shingles(col(textCol), shingleSize)).as("_set"))
      .select(col("_id"), size(col("_set")).as("_len"),
        explode(col("_set")).as("_sh"))
    val df = exploded.groupBy("_sh").agg(count(lit(1)).as("_df"))
    val ranked = exploded.join(df, "_sh")
      .withColumn("_rk", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df").asc, col("_sh").asc)))
    // Prefix length |A| - ceil(t·|A|) + 1. The 1e-9 guard keeps fp
    // noise from inflating the ceil at exact-integer products
    // (0.8 * 10 = 8.000000000000002 would ceil to 9, shrinking the
    // prefix below the completeness bound right AT the threshold).
    val prefix = ranked.filter(
      col("_rk") <= col("_len") - ceil(lit(threshold) * col("_len") - lit(1e-9)) + 1)
    val a = prefix.select(col("_id").as("id_a"), col("_sh"))
    val b = prefix.select(col("_id").as("id_b"), col("_sh"))
    val cand = a.join(b, "_sh").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccardVerify(docs, textCol, idCol, cand, shingleSize)
      .filter(col("jaccard") >= threshold)
  }

  // --- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over token hashes: bit j of the fingerprint is the
    * sign of Σ_tokens (±1 by token-hash bit j). Pure aggregation —
    * explode tokens, sum per bit, reassemble.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(graft.text.Analyzer.standard(col(textCol))).as("_tok"))
      .withColumn("_h", xxhash64(col("_tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"_b$j"))
    toks.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j =>
          when(col(s"_b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dups: candidates share at least one of 4 16-bit
    * chunks (any pair within Hamming distance 3 must agree on ≥1 chunk),
    * verified with the exact popcount distance.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, textCol, idCol)
    val chunks = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("chunk", "val")))
    val a = chunks.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("chunk"), col("val"))
    val b = chunks.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("chunk"), col("val"))
    a.join(b, Seq("chunk", "val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --- embedding cosine near-dup ----------------------------------------

  /** Embedding near-dup pairs with cosine ≥ threshold.
    *
    * exact=true: block-nested join (for oracles/small data).
    * exact=false: random-hyperplane LSH buckets (sign sketch) as the
    * scale path — candidates must share the full sign signature, then
    * exact cosine verifies. Deterministic hyperplanes from xxhash64.
    */
  def embeddingNearDups(embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double, exact: Boolean = false,
      planes: Int = 16): DataFrame = {
    if (exact) {
      val a = embs.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
      val b = embs.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
      a.crossJoin(b)
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", Functions.vecCosine(col("_va"), col("_vb")))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    } else {
      val withSig = embs.withColumn("_sig", signSketch(col(vecCol), planes))
      val a = withSig.select(col(idCol).as("id_a"), col(vecCol).as("_va"), col("_sig"))
      val b = withSig.select(col(idCol).as("id_b"), col(vecCol).as("_vb"), col("_sig"))
      a.join(b, "_sig")
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", Functions.vecCosine(col("_va"), col("_vb")))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    }
  }

  /** Incremental exact dedup: drop batch documents whose normalized
    * fingerprint already exists in `corpus`, then exact-dedup within
    * the batch (lowest id per fingerprint wins). The shape for a
    * pipeline ingesting new crawls against an already-deduped corpus:
    * the corpus side reduces to its distinct fingerprint column
    * (projection + distinct — at 100 TB this is the corpus's
    * fingerprint index, not its text), and the membership check is a
    * fingerprint-keyed anti-join.
    */
  def dedupAgainst(newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String): DataFrame =
    dedupAgainstSeen(newDocs, textCol, idCol,
      corpus.select(fpCol(textCol).as("_fp")).distinct())

  /** Batch anti-joined against a known-fingerprint set, then the
    * intra-batch [[keepFirst]] pass.
    */
  private def dedupAgainstSeen(newDocs: DataFrame, textCol: String,
      idCol: String, seen: DataFrame): DataFrame =
    keepFirst(
      newDocs.withColumn("_fp", fpCol(textCol))
        .join(seen, Seq("_fp"), "left_anti"),
      idCol)

  // --- bucketed fingerprint index -----------------------------------------

  /** Persist the corpus's exact-dedup fingerprint index as a BUCKETED,
    * bucket-sorted parquet table (`bucketBy(numBuckets, "_fp")`): every
    * future fingerprint probe — [[dedupAgainstTable]], or any join or
    * aggregation keyed on `_fp` — reads the corpus side already hash
    * partitioned, so Spark aligns the (small) probe side to the bucket
    * layout and the corpus side NEVER shuffles again. This is the
    * layout decision that matters at 100 TB: the big side's shuffle is
    * paid once at write time instead of on every nightly batch.
    * Written as an external table when `path` is given (keeps test
    * warehouses in temp dirs). Schema: `(idCol, _fp)`.
    */
  def writeFingerprintTable(docs: DataFrame, textCol: String,
      idCol: String, table: String, numBuckets: Int,
      path: Option[String] = None): Unit = {
    // No DROP first: mode("overwrite") replaces the table atomically
    // at commit, so a failed rebuild leaves the PREVIOUS index
    // serving instead of a TABLE_NOT_FOUND window.
    val w = docs
      .select(col(idCol), fpCol(textCol).as("_fp"))
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, "_fp").sortBy("_fp")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** [[dedupAgainst]] with the corpus side served by a persisted
    * bucketed fingerprint table (see [[writeFingerprintTable]]): the
    * distinct and the anti-join on `_fp` consume the table's bucket
    * partitioning in place — only the batch side exchanges.
    */
  def dedupAgainstTable(newDocs: DataFrame, textCol: String,
      idCol: String, table: String): DataFrame =
    dedupAgainstSeen(newDocs, textCol, idCol,
      newDocs.sparkSession.table(table).select("_fp").distinct())

  /** Incremental NEAR-dup screening: per-batch-document verdicts
    * `(id, near_dup)` — true iff some corpus document's exact n-gram
    * Jaccard with it reaches `threshold`, with candidates found by
    * banded MinHash-LSH across the two tables.
    *
    * This is [[dedupAgainst]]'s fuzzy sibling and the shape a crawl
    * pipeline actually runs: the CORPUS side reduces to its banded
    * signature buckets `(id, band, bucket)` — an index that is
    * persisted once and probed by every new batch; re-shingling the
    * corpus per batch would be the scale bug. The batch explodes to
    * the same bands and equi-joins the bucket index (shuffle volume
    * O(batch × bands) plus the one-off corpus index build); exact
    * verification re-shingles only documents named by a candidate
    * pair. Batch and corpus ids may overlap — sets are keyed per side,
    * never unioned.
    */
  def nearDupAgainst(newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, threshold: Double = 0.8,
      shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame =
    nearDupAgainstIndex(newDocs,
      lshIndex(corpus, textCol, idCol, shingleSize, numHashes, bands),
      corpus, textCol, idCol, threshold, shingleSize, numHashes, bands)

  /** The corpus's LSH signature index `(idCol, band, bucket)` — the
    * PERSISTABLE artifact behind [[nearDupAgainst]]: build once, write
    * to parquet (ideally partitioned/bucketed by `band, bucket`), and
    * probe it with every incoming batch via [[nearDupAgainstIndex]].
    * Re-shingling the corpus per batch is the scale bug this exists to
    * avoid. Build parameters (shingleSize, numHashes, bands) are part
    * of the index's identity and must match at probe time.
    */
  def lshIndex(corpus: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // Build params ride as column metadata (survives the parquet
    // round trip), so a probe with mismatched params fails loudly
    // instead of silently returning near-empty candidate sets.
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("shingleSize", shingleSize.toLong)
      .putLong("numHashes", numHashes.toLong)
      .putLong("bands", bands.toLong).build()
    bandBuckets(
      minhashSignatures(corpus, textCol, idCol, shingleSize, numHashes),
      idCol, bands, numHashes / bands)
      .withColumn("bucket", col("bucket").as("bucket", meta))
  }

  /** [[nearDupAgainst]] with a PREBUILT corpus index (see
    * [[lshIndex]]): the batch explodes to its band buckets and
    * equi-joins the index — shuffle volume O(batch × bands); the
    * corpus contributes text only for exact verification of
    * candidate-named documents (a semi-join-pruned re-shingle).
    */
  def nearDupAgainstIndex(newDocs: DataFrame, corpusIndex: DataFrame,
      corpus: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    corpusIndex.schema.find(_.name == "bucket").map(_.metadata)
      .filter(_.contains("bands")).foreach { md =>
        require(md.getLong("shingleSize") == shingleSize &&
          md.getLong("numHashes") == numHashes &&
          md.getLong("bands") == bands,
          s"index built with (shingleSize=${md.getLong("shingleSize")}, " +
            s"numHashes=${md.getLong("numHashes")}, " +
            s"bands=${md.getLong("bands")}) but probed with " +
            s"(shingleSize=$shingleSize, numHashes=$numHashes, bands=$bands)")
      }
    val rows = numHashes / bands
    def buckets(docs: DataFrame, side: String): DataFrame =
      bandBuckets(
        minhashSignatures(docs, textCol, idCol, shingleSize, numHashes),
        idCol, bands, rows)
        .select(col(idCol).as(side), col("band"), col("bucket"))
    val cand = buckets(newDocs, "id_a")
      .join(corpusIndex.select(col(idCol).as("id_b"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .select("id_a", "id_b").distinct()
    def sets(docs: DataFrame, side: String): DataFrame =
      docs.join(cand.select(col(side).as(idCol)).distinct(),
          Seq(idCol), "left_semi")
        .select(col(idCol).as(side),
          array_distinct(TextOps.shingles(col(textCol), shingleSize))
            .as(s"_s$side"))
    val dup = cand
      .join(sets(newDocs, "id_a"), "id_a")
      .join(sets(corpus, "id_b"), "id_b")
      .filter(size(array_intersect(col("_sid_a"), col("_sid_b")))
        .cast("double") /
        size(array_union(col("_sid_a"), col("_sid_b"))) >= threshold)
      .select(col("id_a").as(idCol)).distinct()
      .withColumn("_dup", lit(true))
    newDocs.select(col(idCol))
      .join(dup, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_dup"), lit(false)).as("near_dup"))
  }

  // --- duplicate clusters (connected components) --------------------------

  /** Transitive duplicate clusters over a near-dup pair list: the
    * connected components of the pair graph, labeled by each
    * component's minimum id.
    *
    * Near-dup similarity is not transitive (A~B and B~C do not imply
    * A~C), but a corpus dedup must still drop B AND C when the chain
    * exists — so pair lists from [[minhashNearDups]] /
    * [[ngramNearDups]] / [[simhashNearDups]] need component resolution
    * before any document is removed. The reference-scale analog is the
    * cluster step of MinHash dedup pipelines (e.g. Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better").
    *
    * Algorithm: distributed min-label propagation with pointer
    * jumping. Each round (a) every node takes the min label in its
    * 1-hop neighborhood (one equi-join on the edge list + one hash
    * agg), then (b) labels chase their own label's label (one
    * self-join), halving chain lengths — so rounds are
    * O(log(diameter)), not O(diameter). All joins are key-partitioned
    * and data-proportional; per-round lineage is truncated with a
    * local checkpoint so the plan does not grow with iterations.
    * Convergence is detected by an exact changed-label count. 100 TB
    * shape: edge lists from bucketed candidate generation are
    * O(docs × bands); each round shuffles that volume at most twice.
    *
    * @return (node, cluster) — every id that appears in `pairs`,
    *         labeled with the min id reachable from it.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    val raw = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    // Size the per-round shuffles to the MEASURED graph, not the
    // session default. AQE cannot coalesce the partitioning of plans
    // that populate a cache (canChangeCachedPlanOutputPartitioning is
    // off by default), so without this a fixture-sized graph pays
    // O(log diameter) rounds of 32-task scheduling — measured ~1 s per
    // round on a 40-node chain vs ~30 ms single-task. The count also
    // materializes the (possibly expensive) pair plan exactly once.
    // At scale the clamp saturates to defaultParallelism and the
    // repartition branch is skipped entirely.
    val defaultPar = pairs.sparkSession.sparkContext.defaultParallelism
    val parts = math.max(1L, math.min(defaultPar.toLong,
      (raw.count() + 499999L) / 500000L)).toInt
    // Identity at scale (parts == defaultParallelism): the big-graph
    // plan keeps its two data-proportional shuffles per round; only
    // sub-500k-edge graphs take the narrow path.
    def sized(df: DataFrame, key: String): DataFrame =
      if (parts < defaultPar) df.repartition(parts, col(key)) else df
    val edges =
      if (parts < defaultPar) {
        val e = raw.repartition(parts, col("src")).persist()
        e.count(); raw.unpersist(false); e
      } else raw
    var labels = sized(edges.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node")), "node")
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("cluster"))
      val combined = sized(labels.unionByName(viaEdges), "node")
        .groupBy("node").agg(min("cluster").as("cluster"))
      // Pointer jump: cluster := cluster(cluster). Every label is a
      // node id present in `combined`, so the left join only misses
      // when the label is already a component minimum pointing at
      // itself — coalesce covers both.
      //
      // The eager localCheckpoint is LOAD-BEARING: `combined` appears
      // on BOTH sides of the pointer-jump join, so without truncation
      // the LOGICAL plan doubles every round — persist() caches data
      // but Catalyst still re-analyzes the full tree, and the
      // driver-side planning cost goes exponential in the round count
      // (measured: a 40-node chain over an RDD-backed pair plan spent
      // ~10 s in analysis by round 8). Checkpointing resets each
      // round's plan to a LogicalRDD; superseded generations are freed
      // asynchronously by the ContextCleaner once unreachable.
      val next = combined.join(
          combined.select(col("node").as("cluster"), col("cluster").as("_c2")),
          Seq("cluster"), "left")
        .select(col("node"), coalesce(col("_c2"), col("cluster")).as("cluster"))
        .transform(sized(_, "node"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "_old"), "node")
        .filter(col("cluster") =!= col("_old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(false)
    labels
  }

  /** Keep one representative (the min id) per duplicate cluster:
    * resolves `pairs` into components and anti-joins the non-minimum
    * members out of `docs`. Documents in no pair survive untouched.
    */
  def dedupByPairs(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep-BEST-per-cluster: [[dedupByPairs]] keeps the min-id member;
    * this keeps the member with the highest `score` (ties: lowest id)
    * — the keep-longest / keep-highest-quality policy curation
    * pipelines often prefer, since a near-dup cluster's members are
    * NOT interchangeable (one is usually the full page, the rest
    * truncated or boilerplate-padded copies). Rows in no cluster are
    * their own singleton and always survive.
    *
    * Same skew-proof shape as [[keepFirst]]: per-cluster argmax via a
    * map-side-combined `max(struct(score, -id))` agg + keeper
    * equi-join — a billion-member cluster costs one agg cell, and no
    * window serializes the hot cluster on one reducer.
    */
  def dedupByPairsBest(docs: DataFrame, idCol: String, score: Column,
      pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame =
    keepBestPerCluster(docs, idCol, score,
      connectedComponents(pairs, aCol, bCol))

  /** The keeper stage of [[dedupByPairsBest]], reusable against
    * precomputed component labels (`(node, cluster)` — e.g. persisted
    * [[connectedComponents]] output). Unlabeled rows are singletons.
    *
    * The argmax is `min(struct(-score, id))` — the SCORE is negated
    * (it must be numeric and non-null; quality scores and lengths
    * are), never the id, so string/any-ordered PKs work and the id
    * tie-break uses native column ordering. Rows duplicated on id
    * (retried write) collapse to one surviving row, the same contract
    * [[keepFirst]] documents.
    */
  def keepBestPerCluster(docs: DataFrame, idCol: String, score: Column,
      labels: DataFrame): DataFrame = {
    val labeled = docs
      .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .withColumn("_cl", coalesce(col("cluster"), col(idCol)))
    val winners = labeled.groupBy("_cl")
      .agg(min(struct((-score).as("_ns"), col(idCol).as("_id"))).as("_w"))
    labeled.join(winners, Seq("_cl"))
      .filter(col(idCol) === col("_w").getField("_id"))
      .dropDuplicates(idCol)
      .drop("_cl", "cluster", "_w")
  }

  /** Random-hyperplane sign sketch: bit p = sign(<v, r_p>) where r_p is
    * a deterministic pseudo-random ±1 vector derived from xxhash64(p, i).
    */
  private def signSketch(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            i => when(xxhash64(lit(p), i).bitwiseAND(1) === 0, 1.0).otherwise(-1.0)),
          (v, r) => v * r),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
}
