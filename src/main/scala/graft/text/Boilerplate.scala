package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the CCNet / RefinedWeb
  * paragraph-dedup shape): a line that recurs across many documents —
  * navigation chrome, cookie banners, copyright footers — is
  * boilerplate and is stripped from every document, while
  * document-unique prose survives.
  *
  * Scale shape: explode to (doc, pos, line), aggregate line document
  * frequency (one hash shuffle keyed by line), equi-join the df back,
  * and regroup by document to rebuild text in original line order.
  * Every stage is key-partitioned and data-proportional — the same
  * plan holds at 100 TB with the line-df table as the only corpus-wide
  * aggregate (itself prunable: lines with df == 1 dominate and
  * hash-partition evenly; hot boilerplate lines are few).
  */
object Boilerplate {

  /** Trimmed, non-empty lines of each document with their original
    * position: (idCol, pos, line).
    */
  def lines(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "_raw")))
      .withColumn("line", trim(col("_raw")))
      .filter(col("line") =!= "")
      .drop("_raw")

  /** Line document frequency: for each distinct trimmed line, the
    * number of documents containing it at least once.
    */
  def lineDocFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    lines(docs, textCol, idCol)
      .select(col(idCol), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))

  /** Strip lines that occur in more than `maxDf` documents and rebuild
    * each document's text from its surviving lines in original order.
    * Returns `docs` with `textCol` replaced by the cleaned text (empty
    * string when every line was boilerplate); all other columns pass
    * through.
    */
  def removeBoilerplate(docs: DataFrame, textCol: String, idCol: String,
      maxDf: Long): DataFrame = {
    val ln = lines(docs, textCol, idCol)
    val hot = lineDocFreq(docs, textCol, idCol).filter(col("df") > maxDf)
    val kept = ln.join(hot, Seq("line"), "left_anti")
    // array_sort on (pos, line) structs orders by pos first; rebuild
    // happens in one hash agg keyed by the document id.
    val rebuilt = kept.groupBy(idCol).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line"))).as("_clean"))
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("_clean"), lit("")))
      .drop("_clean")
  }

  /** Corpus-global line dedup, C4's keep-first policy: every
    * occurrence of a trimmed line EXCEPT the first (by (id, pos)
    * order) is removed — within and across documents — and each
    * document's text is rebuilt from its surviving lines. Returns
    * (idCol, text_clean, lines_removed) for every input document.
    *
    * Scale shape: one hash aggregation finds each line's minimal
    * (id, pos) occurrence (map-side combined min on the line key), an
    * equi-join marks keepers IN PLACE, and ONE per-document agg
    * rebuilds the text and counts kept + total lines together — two
    * corpus-wide shuffles (line key, doc key) and two corpus explodes
    * (the agg scan and the join probe; a third totals scan previously
    * re-exploded the corpus again). A line repeated a billion times
    * costs one min-agg cell, never a window over its occurrences.
    */
  def dedupLines(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ln = lines(docs, textCol, idCol)
    val first = ln.groupBy("line")
      .agg(min(struct(col(idCol), col("pos"))).as("_first"))
    val marked = ln.join(first, Seq("line"))
      .withColumn("_keep",
        col(idCol) === col("_first").getField(idCol) &&
          col("pos") === col("_first").getField("pos"))
    // collect_list skips nulls, so the keeper filter rides inside the
    // same agg that counts every occurrence.
    val rebuilt = marked.groupBy(idCol).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(when(col("_keep"),
          struct(col("pos"), col("line"))))),
        x => x.getField("line"))).as("text_clean"),
      count(lit(1)).as("_n"),
      sum(when(col("_keep"), 1L).otherwise(0L)).as("_kept"))
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (coalesce(col("_n"), lit(0L)) - coalesce(col("_kept"), lit(0L)))
          .as("lines_removed"))
  }
}
