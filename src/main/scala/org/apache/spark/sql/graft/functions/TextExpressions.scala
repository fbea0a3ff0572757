package org.apache.spark.sql.graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
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
