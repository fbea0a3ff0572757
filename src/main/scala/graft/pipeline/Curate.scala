package graft.pipeline

import graft.text.{C4Filters, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation chain as ONE composable plan — what a
  * nightly crawl-refresh job actually runs, in dependency order:
  *
  *   1. C4 line/document cleaning (terminal-punctuation line rule,
  *      code/placeholder drops) — pure projections;
  *   2. optional blocklist drop — literal-array intersect, projection;
  *   3. exact dedup, keep-first on the normalized cleaned text —
  *      skew-proof keeper agg+join;
  *   4. optional n-gram benchmark decontamination — broadcast gram
  *      probe, corpus never shuffles for it;
  *   5. growth-stable hash split — pure projection.
  *
  * Everything stays ONE Catalyst plan: no intermediate
  * materialization, filters and projections fuse into the scan, and
  * the only corpus-sized shuffles are dedup's fingerprint agg+join.
  * Returns `(idCol, textCol = cleaned text, split)` — feed it to
  * [[Mixing.epochShuffle]] / [[Shards.write]] for the training-order
  * stage, and [[Curate.datasheet]] for the per-split report.
  *
  * Gated end-to-end by the p11_curate_e2e oracle entry (every stage
  * recomputed in SQL over the same inputs).
  */
object Curate {

  final case class Config(
      minWords: Int = 3,
      minLines: Int = 1,
      blocklist: Seq[String] = Nil,
      benchGramN: Int = 8,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      salt: String = "curate")

  /** Clean → (blocklist) → dedup → (decontaminate) → split. `bench`
    * is the eval suite to strip leaks of; None skips that stage.
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      bench: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val cleaned0 = C4Filters.c4(docs, textCol, cfg.minWords, cfg.minLines)
      .filter(col("keep"))
      .drop(textCol).withColumnRenamed("clean_text", textCol)
      .drop("keep")
    val cleaned =
      if (cfg.blocklist.isEmpty) cleaned0
      else C4Filters.blocklistFilter(cleaned0, textCol, cfg.blocklist)
    val deduped = graft.dedup.Dedup.exact(cleaned, textCol, idCol)
    val clean = bench.fold(deduped)(b =>
      graft.dedup.Decontaminate.clean(
        deduped, textCol, idCol, b, textCol, cfg.benchGramN))
    Mixing.split(clean, idCol, cfg.splits, cfg.salt)
  }

  /** Per-split datasheet of a curated frame: docs, chars, whitespace
    * tokens. One hash agg.
    */
  def datasheet(curated: DataFrame, textCol: String): DataFrame =
    curated.groupBy("split").agg(
      count(lit(1)).as("docs"),
      sum(length(col(textCol))).as("chars"),
      sum(TextOps.tokenCount(col(textCol)).cast("long")).as("tokens"))

  /** Per-document provenance of the SAME chain [[curate]] runs —
    * the Dolma-style attributes answer to "why is my doc not in the
    * training set": every INPUT doc comes back as `(idCol, stage)`
    * where `stage` names the FIRST stage that rejected it
    * (`c4_clean`, `blocklist`, `exact_dup`, `decontaminated`) or,
    * for survivors, the split it landed in. By construction
    * `audit(...).filter(stage is a split name)` selects exactly
    * [[curate]]'s output ids — the p14 oracle entry re-derives every
    * verdict in SQL.
    *
    * Same shuffle budget as [[curate]] itself: the flags are pure
    * projections, dup verdicts reuse the skew-proof keeper agg+join
    * (computed over the SAME survivor population the chain dedups —
    * a doc dropped by cleaning can't shadow a later dup), and the
    * contamination probe joins gram hits for dedup survivors only.
    * Assumes `idCol` is unique (the PK contract [[curate]] shares).
    *
    * Plan shape (audited): 4 hash exchanges, 4 broadcasts, 0 sorts —
    * but the corpus SCAN appears ~5x (the flag projection feeds both
    * sides of the keeper join and the gram probe, and scans aren't
    * exchange-reused). The scans prune to (id, text); if the input is
    * wide or the source expensive, persist the 2-column projection
    * first and pass that.
    */
  def audit(docs: DataFrame, textCol: String, idCol: String,
      bench: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val flagged = C4Filters.c4(docs, textCol, cfg.minWords, cfg.minLines)
    val bl =
      if (cfg.blocklist.isEmpty) lit(false)
      else C4Filters.blocklistHits(col("clean_text"), cfg.blocklist) > 0
    val base = flagged.select(col(idCol), col("clean_text").as("_ct"),
      col("keep").as("_c4"), bl.as("_bl"))
    val survivors = base.filter(col("_c4") && !col("_bl"))
    // Dup verdicts come from the SAME fingerprint + keeper rule the
    // chain's Dedup.exact runs (shared code, can't drift).
    val dupVerdicts = graft.dedup.Dedup
      .exactVerdicts(survivors.select(col(idCol), col("_ct")), "_ct", idCol)
      .select(col(idCol), col("keep").as("_dkeep"))
    val withDup = base.join(dupVerdicts, Seq(idCol), "left")
      .withColumn("_dup",
        col("_c4") && !col("_bl") && !coalesce(col("_dkeep"), lit(true)))
    val withCont = bench match {
      case Some(b) =>
        val dedupKept = withDup
          .filter(col("_c4") && !col("_bl") && !col("_dup"))
          .select(col(idCol), col("_ct"))
        val hits = graft.dedup.Decontaminate
          .contaminated(dedupKept, "_ct", idCol, b, textCol, cfg.benchGramN)
          .select(col(idCol), lit(true).as("_cont"))
        withDup.join(hits, Seq(idCol), "left")
      case None => withDup.withColumn("_cont", lit(false))
    }
    Mixing.split(withCont, idCol, cfg.splits, cfg.salt)
      .select(col(idCol),
        when(!col("_c4"), "c4_clean")
          .when(col("_bl"), "blocklist")
          .when(col("_dup"), "exact_dup")
          .when(coalesce(col("_cont"), lit(false)), "decontaminated")
          .otherwise(col("split")).as("stage"))
  }
}
