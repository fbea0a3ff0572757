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
