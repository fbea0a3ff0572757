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
}
