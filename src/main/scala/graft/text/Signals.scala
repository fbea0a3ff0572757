package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass per-document signal bundle — the Dolma-style "attributes"
  * record (one tagger pass, many signals) that downstream mixing /
  * filtering stages consume without re-reading the text: content
  * fingerprint, size and quality features, composite quality score,
  * language guess, PII counts, and the C4 document-keep verdict, all
  * under ONE `signals` struct column.
  *
  * Everything here is a pure projection composed from the individual
  * operators ([[TextOps]], [[Pii]], [[C4Filters]]) — zero shuffle, one
  * pass over the text, whole-stage-codegen'd except the documented
  * HOF-based features. Annotate once, persist, and every later
  * filter/mix decision is a column read instead of a text re-scan —
  * at 100 TB the text is read once, not once per signal.
  */
object Signals {

  /** Append `signals` to `docs`. Fields: fingerprint (portable md5 of
    * normalized text), n_chars, n_tokens, mean_token_len, punct_ratio,
    * stopword_ratio, distinct_ratio, quality ([0,1] composite), lang,
    * n_emails, n_ips, n_phones, c4_keep.
    */
  def annotate(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // The feature struct is materialized as its OWN projection step:
    // it holds lambda subtrees, which Catalyst excludes from both
    // subexpression elimination and CollapseProject inlining, so
    // referencing `qualityFeatures(t)` eight times below would run
    // the per-char/per-token scans eight times per row. One named
    // column + getField reads = one feature pass.
    val qf = col("_qf")
    docs.withColumn("_qf", TextOps.qualityFeatures(t))
      .withColumn("signals", struct(
        TextOps.fingerprint(t).as("fingerprint"),
        qf.getField("n_chars").as("n_chars"),
        qf.getField("n_tokens").as("n_tokens"),
        qf.getField("mean_token_len").as("mean_token_len"),
        qf.getField("punct_ratio").as("punct_ratio"),
        qf.getField("stopword_ratio").as("stopword_ratio"),
        qf.getField("distinct_ratio").as("distinct_ratio"),
        TextOps.qualityScoreFrom(qf).as("quality"),
        TextOps.langId(t).as("lang"),
        Pii.emailCount(t).as("n_emails"),
        Pii.ipv4Count(t).as("n_ips"),
        Pii.phoneCount(t).as("n_phones"),
        C4Filters.docKeep(t).as("c4_keep")))
      .drop("_qf")
  }
}
