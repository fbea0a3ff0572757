package graft.dedup

import graft.text.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SUBSTRING detection across a corpus — the span
  * (not document) granularity of dedup from "Deduplicating Training
  * Data Makes Language Models Better" (Lee et al., 2022): a boilerplate
  * license header or templated paragraph repeated verbatim across
  * thousands of otherwise-distinct pages should be cut once per corpus,
  * not left in because each HOST document is unique.
  *
  * The suffix-array construction of the paper is single-machine; the
  * distributed shape here reaches the same spans for a fixed minimum
  * length `w` via shingle hashing:
  *
  *   1. every w-token window of every document is hashed ONCE
  *      (xxhash64 of the joined window) — a per-row transform, linear
  *      in corpus tokens, no shuffle;
  *   2. windows whose hash occurs in ≥ 2 DISTINCT documents are the
  *      duplicated seeds — one hash aggregation on the 8-byte key (the
  *      only corpus-sized shuffle, map-side combine absorbs the skew of
  *      hot boilerplate) and a semi-join back;
  *   3. per document, overlapping/adjacent seed windows merge into
  *      maximal spans (gaps-and-islands over a per-DOC window — bounded
  *      by document length, never corpus-sized).
  *
  * Any duplicated run of length L ≥ w is covered by its w-token
  * sub-windows, all of which collide, so the merged island reproduces
  * the full maximal span — equality with a suffix-array scan for spans
  * ≥ w, without ever materializing suffixes. Hash collisions
  * (~2^-64 per window pair) are the usual accepted false-positive rate.
  */
object SubstringDedup {

  /** (_doc, start, e) seed windows — 0-based token ordinal intervals
    * [start, e] whose w-token shingle occurs in at least two distinct
    * documents.
    */
  private def dupSeeds(docs: DataFrame, textCol: String, idCol: String,
      w: Int): DataFrame = {
    require(w >= 2, "minTokens must be >= 2")
    // Tokenize + per-window hashing is the corpus-linear work and fuses
    // into the scan stage — and `sh` is re-executed by both the dup agg
    // and the semi-join below. Spread the (id, text) projection so both
    // passes run at full width instead of on one scan task.
    val sh = graft.operators.Par
      .spread(docs.select(col(idCol).as("_doc"), col(textCol)))
      .select(col("_doc"), Analyzer.standard(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= w)
      .select(col("_doc"), explode(expr(
        s"""transform(sequence(0, size(_t) - $w),
           |  i -> struct(i AS start,
           |    xxhash64(concat_ws(' ', slice(_t, i + 1, $w))) AS h))"""
          .stripMargin)).as("_sh"))
      .select(col("_doc"), col("_sh.start").as("start"), col("_sh.h").as("h"))
    val dup = sh.groupBy("h")
      .agg(countDistinct("_doc").as("_nd")).filter(col("_nd") >= 2)
      .select("h")
    sh.join(dup, Seq("h"), "left_semi")
      .select(col("_doc"), col("start"), (col("start") + w - 1).as("e"))
  }

  /** Merge seed intervals into maximal spans per document. Adjacent
    * windows ([a,b], [b+1,c]) merge too: contiguous duplicated text is
    * one span.
    */
  private def mergeSpans(seeds: DataFrame): DataFrame = {
    val byStart = Window.partitionBy("_doc").orderBy("start")
    seeds
      .withColumn("_prevMax", max("e").over(
        byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_brk",
        when(col("start") > coalesce(col("_prevMax"), lit(-2L)) + 1, 1)
          .otherwise(0))
      .withColumn("_grp", sum("_brk").over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("_doc", "_grp")
      .agg(min("start").cast("long").as("span_start"),
        max("e").cast("long").as("span_end"))
      .select(col("_doc"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Maximal cross-document duplicated spans of ≥ `minTokens` tokens:
    * (idCol, span_start, span_end, span_tokens), ordinals 0-based
    * inclusive in the standard-analyzer token stream. EVERY occurrence
    * is reported (the canonical copy included) — this is the audit
    * view; [[cutSpans]] applies the keep-one policy.
    */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20): DataFrame =
    mergeSpans(dupSeeds(docs, textCol, idCol, minTokens))
      .withColumnRenamed("_doc", idCol)

  /** Cut duplicated spans, keeping the copy in the LOWEST-id document
    * per shingle (deterministic "keep one occurrence"): documents lose
    * exactly the token positions covered by seed windows whose shingle
    * already appears in an earlier document. Returns
    * (idCol, text_clean, tokens_removed) for EVERY input document —
    * text_clean is the surviving tokens re-joined with single spaces
    * (token-space rebuild: original whitespace/punctuation between cut
    * tokens is not preserved).
    */
  def cutSpans(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 20): DataFrame = {
    val w = minTokens
    require(w >= 2, "minTokens must be >= 2")
    val sh = graft.operators.Par
      .spread(docs.select(col(idCol).as("_doc"), col(textCol)))
      .select(col("_doc"), Analyzer.standard(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= w)
      .select(col("_doc"), explode(expr(
        s"""transform(sequence(0, size(_t) - $w),
           |  i -> struct(i AS start,
           |    xxhash64(concat_ws(' ', slice(_t, i + 1, $w))) AS h))"""
          .stripMargin)).as("_sh"))
      .select(col("_doc"), col("_sh.start").as("start"), col("_sh.h").as("h"))
    // per shingle: duplicated across docs AND this doc is not the keeper
    val keeper = sh.groupBy("h").agg(
      countDistinct("_doc").as("_nd"), min("_doc").as("_keep"))
    val seeds = sh.join(keeper, Seq("h"))
      .filter(col("_nd") >= 2 && col("_doc") =!= col("_keep"))
      .select(col("_doc"), col("start"), (col("start") + w - 1).as("e"))
    val spans = mergeSpans(seeds)
      .groupBy("_doc")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
    // Rebuild note: the per-token `exists` below is an interpreted HOF
    // (the repo's measured ~2x-slower pattern), but MEASURED at bench
    // SF it does not dominate — bench_substring_cut reads ~0.4 s vs
    // ~1.9 s for span detection alone (the span list per doc is short,
    // so the O(T x S) lambda stays cheap). Revisit only if span counts
    // per doc grow by orders of magnitude.
    // NOT spread: the rebuild pass is one cheap tokenize + a broadcast
    // join with the (small) span table — measured, the extra exchange
    // costs more than the serial tokenize it parallelizes (d11 +39%).
    docs
      .select(col(idCol), Analyzer.standard(col(textCol)).as("_t"))
      .join(spans.withColumnRenamed("_doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        expr("""concat_ws(' ', transform(
          |  filter(transform(_t, (t, i) -> struct(t AS t, i AS i)),
          |    x -> _spans IS NULL OR NOT exists(_spans,
          |      sp -> x.i >= sp.span_start AND x.i <= sp.span_end)),
          |  x -> x.t))""".stripMargin).as("text_clean"),
        coalesce(expr(
          """aggregate(_spans, 0L,
            |  (acc, sp) -> acc + sp.span_end - sp.span_start + 1)"""
            .stripMargin), lit(0L)).as("tokens_removed"))
  }
}
