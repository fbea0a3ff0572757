package graft.text

import graft.Functions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage chunking — the split-before-embed stage of every
  * retrieval/embedding pipeline (and of context-window-bounded
  * training-data prep): long documents become bounded, optionally
  * overlapping passages with stable `(doc, chunk_id)` addresses.
  *
  * Both operators are PURE PROJECTIONS plus a per-row generator: a doc
  * produces its own chunks with no shuffle at all, so chunking 100 TB
  * is embarrassingly parallel and composes with any downstream
  * embed/index stage without a repartition. (The naive
  * explode-tokens-then-window alternative shuffles every token of the
  * corpus by doc id just to compute per-doc offsets.)
  *
  * The reference's harness embeds fixed-size synthetic strings and
  * never chunks (2.6/common.py gen_* builds rows directly); these
  * operators are part of the beyond-the-reference LLM-pipeline
  * surface, same family as [[Packing]] (which packs the TRAINING side;
  * chunking bounds the RETRIEVAL side).
  */
object Chunker {

  /** Overlapping sliding token windows: window `i` covers tokens
    * `[i*stride, i*stride + size)` of the `delimiter`-split text; the
    * last window starts at the final multiple of `stride` that still
    * reaches past `n - size`, so every token lands in >= 1 window and
    * consecutive windows share `size - stride` tokens of overlap.
    * A doc with <= `size` tokens yields exactly one window.
    *
    * Output: `(idCol, chunk_id, chunk_text, n_tokens)` — one row per
    * window. `stride <= size` is required (gapless coverage; it also
    * makes `n_tokens = min(size, n - start)` exact).
    */
  def tokenWindows(docs: DataFrame, textCol: String, idCol: String,
      size: Int, stride: Int, delimiter: String = " "): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size], got $stride")
    // NULL text is treated as empty: the doc comes back as one empty
    // window rather than silently vanishing from the chunk output (a
    // generator over a null array emits zero rows — id loss).
    val toks = split(coalesce(col(textCol), lit("")),
      java.util.regex.Pattern.quote(delimiter), -1)
    val nTok = org.apache.spark.sql.functions.size(col("_toks"))
    // Integer window count: 1 + ceil((n - size) / stride) when n > size.
    // floor of a double ratio is exact far beyond any real doc length.
    val nw = when(col("_n") <= size, lit(1)).otherwise(
      floor((col("_n") - size + (stride - 1)) / lit(stride))
        .cast("int") + 1)
    val start = col("pos") * stride
    docs.select(col(idCol), toks.as("_toks"))
      .withColumn("_n", nTok)
      .select(col(idCol), col("_toks"), col("_n"),
        posexplode(sequence(lit(0), nw - 1)))
      .select(col(idCol),
        col("pos").cast("int").as("chunk_id"),
        array_join(slice(col("_toks"), start + 1, lit(size)), delimiter)
          .as("chunk_text"),
        least(lit(size), col("_n") - start).cast("int").as("n_tokens"))
  }

  /** Boundary-aligned chunks under a character budget: the text splits
    * on the literal `delimiter` (word, sentence, or paragraph marker —
    * the caller picks the boundary granularity), and each unit joins
    * the chunk `floor(charsBefore / budgetChars)`, so breaks always
    * land on unit boundaries and a chunk overruns the budget by at
    * most one unit. One codegen-stage per-row pass
    * ([[org.apache.spark.sql.graft.functions.ChunkByBudget]]) — no
    * token explode, no window, no shuffle.
    *
    * Output: `(idCol, chunk_id, chunk_text, n_units, n_chars)`.
    */
  def boundaryChunks(docs: DataFrame, textCol: String, idCol: String,
      budgetChars: Int, delimiter: String = " "): DataFrame =
    // coalesce for the same no-id-loss contract as tokenWindows: the
    // expression is null-intolerant and inline(NULL) drops the row.
    docs.select(col(idCol),
      inline(Functions.chunkByBudget(
        coalesce(col(textCol), lit("")), budgetChars, delimiter)))
}
