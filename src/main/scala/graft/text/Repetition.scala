package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-document repetition features — the Gopher/MassiveText
  * repetition-quality filter family (Rae et al. 2021, table A1):
  * duplicate-line fraction, duplicate-line character fraction, top
  * n-gram character fraction, duplicate n-gram character fraction.
  * Training-data pipelines drop documents whose content is dominated
  * by repeated boilerplate (navigation bars, SEO keyword stuffing,
  * crawler loops) before tokenization.
  *
  * Scale shape: the line-level features are per-row Column expressions
  * (a document's line count is small, so the O(lines²) higher-order
  * functions stay cheap and inside whole-stage codegen). The n-gram
  * features are NOT computed per-row — a per-row
  * `transform(distinct, g -> count(filter(grams, = g)))` is O(L²) in
  * document length and melts on book-length documents — but by
  * explode → groupBy(id, n, gram) → pivot, which is linear work,
  * shuffle-bounded, and skew-safe (the heaviest key is one document's
  * one n-gram).
  *
  * Deterministic definitions (the DuckDB oracle recomputes these
  * exactly):
  *  - lines = non-empty trimmed segments of split(text, '\n');
  *  - dup_line_frac = (n_lines − n_distinct_lines) / n_lines;
  *  - dup_line_char_frac = Σ chars of lines occurring ≥2 times (all
  *    occurrences) / Σ chars of all lines;
  *  - tokens = lowercase alphanumeric runs ([[Analyzer.standard]]);
  *    n-grams join n consecutive tokens with single spaces; the
  *    character denominator is length(' '-joined tokens) — the
  *    normalized character count both engines can agree on;
  *  - top{n}_gram_char_frac = max over grams of
  *    occurrences × gram_length / norm_chars ("max character coverage
  *    by a single n-gram" — a tie-free refinement of Gopher's "chars
  *    in the most frequent n-gram");
  *  - dup{n}_gram_char_frac = Σ over grams occurring ≥2 times of
  *    occurrences × gram_length / norm_chars (overlap-counted, as in
  *    the original).
  */
object Repetition {

  /** Per-document repetition features. Output columns: idCol, n_lines,
    * dup_line_frac, dup_line_char_frac, then top{n}_gram_char_frac for
    * each n in `topNs` and dup{n}_gram_char_frac for each n in
    * `dupNs`. Documents with fewer than n tokens contribute their
    * whole token string as the single "n-gram" (the [[TextOps.shingles]]
    * convention), so every row gets defined (non-null) fractions.
    */
  def features(
      df: DataFrame,
      textCol: String,
      idCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5)): DataFrame = {
    val text = col(textCol)
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines)
    val lineChars = aggregate(lines, lit(0), (acc, l) => acc + length(l))
    // Chars inside duplicated lines, every occurrence counted: for each
    // DISTINCT line with ≥2 occurrences, occurrences × length.
    val dupLineChars = aggregate(array_distinct(lines), lit(0), (acc, l) => {
      val cnt = size(filter(lines, x => x === l))
      acc + when(cnt >= 2, cnt * length(l)).otherwise(0)
    })
    val normChars =
      length(concat_ws(" ", Analyzer.standard(text))).as("_norm_chars")
    val perRow = df.select(
      col(idCol),
      nLines.as("n_lines"),
      round((nLines - size(array_distinct(lines))).cast("double") /
        greatest(nLines, lit(1)), 6).as("dup_line_frac"),
      round(dupLineChars.cast("double") / greatest(lineChars, lit(1)), 6)
        .as("dup_line_char_frac"),
      normChars)

    val ns = (topNs ++ dupNs).distinct
    // One exploded (id, n, gram) frame for every requested n: linear in
    // Σ_n tokens, one shuffle to count, one to pivot back per-document.
    val grams = ns.map { n =>
      df.select(col(idCol), lit(n).as("_n"),
        explode(TextOps.shingles(text, n)).as("_gram"))
    }.reduce(_ unionByName _)
    val counted = grams.groupBy(col(idCol), col("_n"), col("_gram"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_chars", col("_cnt") * length(col("_gram")))
    val pivoted = counted.groupBy(col(idCol))
      .pivot("_n", ns.map(_.toString))
      .agg(max(col("_chars")).as("top_chars"),
        sum(when(col("_cnt") >= 2, col("_chars")).otherwise(lit(0L)))
          .as("dup_chars"))

    val gramCols =
      topNs.map(n => round(col(s"${n}_top_chars").cast("double") /
        greatest(col("_norm_chars"), lit(1)), 6)
        .as(s"top${n}_gram_char_frac")) ++
      dupNs.map(n => round(coalesce(col(s"${n}_dup_chars"), lit(0L))
        .cast("double") / greatest(col("_norm_chars"), lit(1)), 6)
        .as(s"dup${n}_gram_char_frac"))
    perRow.join(pivoted, Seq(idCol))
      .select(col(idCol) +: col("n_lines") +: col("dup_line_frac") +:
        col("dup_line_char_frac") +: gramCols: _*)
  }

  /** Gopher-style repetition filter: keep documents under every
    * threshold. Defaults follow the published MassiveText cutoffs for
    * the features we compute (dup-line 0.30, top-2-gram 0.20,
    * top-3-gram 0.18, top-4-gram 0.16, dup-5-gram 0.15). Returns the
    * input rows (idCol + passthrough columns) with a `keep` flag so
    * callers can audit the drop set instead of losing it.
    */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDupLineFrac: Double = 0.30,
      maxTopGramFrac: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      maxDupGramFrac: Map[Int, Double] = Map(5 -> 0.15)): DataFrame = {
    val feats = features(df, textCol, idCol,
      topNs = maxTopGramFrac.keys.toSeq.sorted,
      dupNs = maxDupGramFrac.keys.toSeq.sorted)
    val checks =
      (col("dup_line_frac") <= maxDupLineFrac) +:
        (maxTopGramFrac.toSeq.sortBy(_._1).map { case (n, t) =>
          col(s"top${n}_gram_char_frac") <= t
        } ++
        maxDupGramFrac.toSeq.sortBy(_._1).map { case (n, t) =>
          col(s"dup${n}_gram_char_frac") <= t
        })
    df.join(feats.select(col(idCol),
      checks.reduce(_ && _).as("keep")), Seq(idCol))
  }
}
