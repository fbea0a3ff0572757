package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization strategies mirroring the reference's analyzer params
  * (`analyzer_params {type: standard}`, common/schema.py:25-26,331-334;
  * schema_matrix_2_6.yaml:54). All Column-level (codegen'd built-ins).
  */
object Analyzer {
  /** Standard analyzer: lowercase, split on non-alphanumerics, drop
    * empty tokens. Unicode-aware (\p{L}\p{N}).
    */
  def standard(c: Column): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** Whitespace analyzer: split on runs of whitespace, keep case. */
  def whitespace(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def byName(name: String): Column => Column = name.toLowerCase match {
    case "standard" => standard
    case "whitespace" => whitespace
    case other => throw new IllegalArgumentException(s"unknown analyzer $other")
  }

  /** Character n-gram tokenizer with `token_chars` classes (the 3.0
    * `ngram` analyzer / NGRAM index params `min_gram`/`max_gram`,
    * schema_matrix_2_6.yaml:39): text lowercases, splits into runs of
    * allowed characters, and each run emits every n-gram for
    * n in [minGram, maxGram]. Runs shorter than minGram emit nothing.
    */
  def ngram(minGram: Int, maxGram: Int,
      tokenChars: Seq[String] = Seq("letter", "digit")): Column => Column = {
    require(0 < minGram && minGram <= maxGram, "need 0 < min_gram <= max_gram")
    val classes = tokenChars.map {
      case "letter" => "\\p{L}"
      case "digit" => "\\p{N}"
      case "whitespace" => "\\s"
      case "punctuation" => "\\p{P}"
      case "symbol" => "\\p{S}"
      case other => throw new IllegalArgumentException(
        s"unknown token_chars class $other")
    }.mkString
    c =>
      flatten(transform(
        filter(split(lower(c), s"[^$classes]+"), r => length(r) >= minGram),
        run => flatten(transform(
          sequence(lit(minGram), lit(maxGram)),
          // sequence() descends when stop < start, so clamp to 1 and
          // filter out starts past the last valid n-gram position
          // (covers runs shorter than n for n > minGram).
          n => transform(
            filter(sequence(lit(1), greatest(length(run) - n + 1, lit(1))),
              i => i <= length(run) - n + 1),
            i => substring(run, i, n))))))
  }

  /** Custom-dictionary tokenizer (the 3.0 plan's "jieba/custom
    * dictionary file resource" analyzer): greedy longest-match
    * segmentation against a user-supplied word list — load the list
    * from a dictionary file resource and pass it here. Unmatched
    * alphanumerics emit as single-character tokens (unknown-CJK-char
    * behavior); other characters separate.
    */
  def dictionary(words: Seq[String]): Column => Column =
    c => graft.Functions.dictTokenize(c, words)

  /** Synonym token filter (3.0 analyzer `synonym` filter): tokens
    * rewrite to their canonical form through the mapping; unmapped
    * tokens pass through. Applied AFTER a base tokenizer.
    */
  def withSynonyms(base: Column => Column,
      synonyms: Map[String, String]): Column => Column = {
    val m = typedlit(synonyms)
    c => transform(base(c), t => coalesce(element_at(m, t), t))
  }

  /** Pinyin token filter (3.0 analyzer `pinyin` filter, feature
    * inventory §3): each token transliterates character-by-character
    * through a hanzi→syllable table — CJK characters found in the
    * table rewrite to their pinyin syllable, everything else passes
    * through unchanged, and the syllables join back into one token
    * (the joined-full-pinyin output mode). The table is a
    * deterministic dictionary resource, same loading surface as the
    * custom-dictionary tokenizer; [[Pinyin.table]] ships a stand-in
    * covering the test corpus — a deployment loads the full Unihan
    * readings file through the same parameter. Applied AFTER a base
    * tokenizer, like the synonym filter.
    */
  def withPinyin(base: Column => Column,
      table: Map[String, String] = Pinyin.table): Column => Column = {
    val m = typedlit(table)
    c => transform(base(c), t =>
      array_join(
        transform(filter(split(t, ""), ch => ch =!= ""),
          ch => coalesce(element_at(m, ch), ch)), ""))
  }
}
