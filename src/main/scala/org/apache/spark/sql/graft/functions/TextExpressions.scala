package org.apache.spark.sql.graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.unsafe.types.UTF8String

/** Custom-dictionary tokenizer — the analyzer the reference's 3.0 plan
  * gates on a user-supplied "custom dictionary file resource"
  * (feature-inventory §3; jieba-style segmentation): greedy
  * longest-match against the dictionary, left to right, lowercased.
  * Unmatched alphanumeric characters emit as single-character tokens
  * (the unknown-CJK-char behavior); everything else separates. Meant
  * for unsegmented text — whitespace languages keep the standard
  * analyzer.
  *
  * Matching is a hash-set probe per candidate length, so a position
  * costs O(maxWordLen) regardless of dictionary size. CodegenFallback:
  * the tokenizer runs once per ingest/index row, not in a scoring hot
  * loop.
  */
case class DictTokenize(child: Expression, words: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {

  override def prettyName: String = "dict_tokenize"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val dict: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(w => if (w.nonEmpty) s.add(w.toLowerCase))
    s
  }
  @transient private lazy val maxLen: Int =
    if (words.isEmpty) 0 else words.map(_.length).max

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      var matched: String = null
      var l = math.min(maxLen, n - i)
      while (matched == null && l >= 1) {
        val cand = text.substring(i, i + l)
        if (dict.contains(cand)) matched = cand
        l -= 1
      }
      if (matched != null) {
        out += UTF8String.fromString(matched)
        i += matched.length
      } else {
        if (Character.isLetterOrDigit(text.charAt(i)))
          out += UTF8String.fromString(text.substring(i, i + 1))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): DictTokenize =
    copy(child = c)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — the CCNet-style text
  * canonicalization step that runs BEFORE fingerprinting and dedup:
  * composed vs decomposed encodings of the same visible text ("é" as
  * one codepoint vs "e"+combining-acute) must hash identically or
  * every dedup stage under-merges on real web text. Spark ships no
  * normalizer, so this wraps `java.text.Normalizer` as a proper
  * codegen'd expression (a static call per row inside whole-stage
  * codegen — no UDF boundary, no fallback iterator).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes
    with Serializable {

  // Validated eagerly so a typo fails at plan time, not per row.
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def prettyName: String = "unicode_normalize"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, f))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    f // force validation at codegen time too
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")
  }

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

/** Character-budget boundary chunking in ONE per-row pass — the
  * passage-splitting stage every embedding/RAG pipeline runs before
  * vectorizing a corpus. The text is split on the literal `delim`
  * (empties kept, like SQL string_split); unit `i` is assigned to
  * chunk `floor(charsBefore_i / budget)` where `charsBefore` counts
  * codepoints of all earlier units plus one delimiter each — so chunk
  * boundaries always land on unit (word/sentence/paragraph)
  * boundaries and a chunk overruns the budget by at most one unit.
  * Returns `array<struct<chunk_id, chunk_text, n_units, n_chars>>`
  * for `inline()`.
  *
  * This shape exists so chunking is a pure projection: the
  * explode-then-window alternative shuffles every TOKEN of the corpus
  * by doc id just to compute per-doc prefix sums — a corpus-sized
  * shuffle for per-row-computable state. CodegenFallback: the pass is
  * allocation-dominated (substring + join), which generated code
  * would not change; it runs once per ingest row, not in a scoring
  * loop. Lengths count CODEPOINTS (matching SQL `length()`), not
  * UTF-16 units.
  */
case class ChunkByBudget(child: Expression, budget: Int, delim: String)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback
    with Serializable {
  require(budget > 0, s"budget must be positive, got $budget")
  require(delim.nonEmpty, "delimiter must be non-empty")

  override def prettyName: String = "chunk_by_budget"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_units", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  private def cp(s: String): Int = s.codePointCount(0, s.length)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val delimCp = cp(delim)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder
    var nUnits = 0
    var curId = 0
    var cum = 0L
    // Every text yields >= 1 unit (empty text splits to [""]), so the
    // final flush always emits; mid-loop flushes only on a chunk break.
    def flush(): Unit = if (nUnits > 0) {
      val s = sb.toString
      out += new GenericInternalRow(Array[Any](
        curId, UTF8String.fromString(s), nUnits, cp(s)))
      sb.setLength(0)
      nUnits = 0
    }
    // Literal split, trailing empties kept: walk delimiter positions.
    var start = 0
    var done = false
    while (!done) {
      val at = text.indexOf(delim, start)
      val unit =
        if (at < 0) { done = true; text.substring(start) }
        else text.substring(start, at)
      val id = (cum / budget).toInt
      if (nUnits > 0 && id != curId) flush()
      if (nUnits == 0) curId = id
      if (nUnits > 0) sb.append(delim)
      sb.append(unit)
      nUnits += 1
      cum += cp(unit) + delimCp
      start = at + delim.length
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ChunkByBudget =
    copy(child = c)
}
