package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit between two versions of a dataset
  * (last month's crawl refresh vs this month's): which documents were
  * added, removed, changed, or untouched, plus the roll-up a dataset
  * changelog/datasheet records.
  *
  * Rows are compared by CONTENT FINGERPRINT (128-bit md5 of the text),
  * not by carrying the text through the join: the full-outer join — the
  * only corpus-sized shuffle — moves 16-byte digests plus keys instead
  * of document bodies, so diffing two 100 TB snapshots shuffles ~key
  * volume, not corpus volume. Digest equality stands in for text
  * equality (collision odds are negligible at any corpus size, the
  * same contract every fingerprint dedup stage in [[graft.dedup.Dedup]]
  * relies on).
  *
  * Complements [[Mixing.split]]/[[Report]]: those describe ONE
  * snapshot; this describes the delta BETWEEN snapshots.
  */
object CorpusDiff {

  /** Per-document verdict: `(idCol, status)` with status in
    * {added, removed, changed, unchanged}. Every id present in either
    * snapshot appears exactly once (ids must be unique per snapshot —
    * the usual PK contract).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Presence is its own flag: md5(NULL) is NULL, so a null-text row
    // would otherwise be indistinguishable from a missing row and a
    // REMOVED null-text doc would report 'added'. Null-safe hash
    // equality (<=>) makes NULL text compare as a value: null -> null
    // across versions is 'unchanged', null -> text is 'changed'.
    def fp(df: DataFrame, h: String, p: String) =
      df.select(col(idCol), md5(col(textCol).cast("binary")).as(h),
        lit(true).as(p))
    fp(oldDf, "_ho", "_po")
      .join(fp(newDf, "_hn", "_pn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_po").isNull, "added")
          .when(col("_pn").isNull, "removed")
          .when(col("_ho") <=> col("_hn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Changelog roll-up: `(status, docs)` — one tiny hash agg over the
    * verdicts.
    */
  def summary(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("status").agg(count(lit(1)).as("docs"))
}
