package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-count providers for the packing / shard-manifest / budget
  * operators. A training-data pipeline bills by TOKENS, and which
  * tokenizer defines "token" must be a first-class parameter: shard
  * manifests cut at `budget` tokens and token-budget heads stop at a
  * token ceiling, so a whitespace count and a subword count give
  * materially different datasets for the same budget.
  *
  * [[WhitespaceTokenizer]] is a pure per-row projection (zero extra
  * shuffle — the historical default of every packing entry);
  * [[BpeTokenizer]] is BPE-exact under a learned merge list: the
  * corpus is encoded with [[Bpe.encode]]'s word-dictionary equi-join
  * and the count is the encoded piece count. Both attach ONE long
  * column, so every downstream operator stays tokenizer-agnostic.
  */
sealed trait Tokenizer {

  /** `df` plus a long column `out` holding this tokenizer's token
    * count of `textCol` (`idCol` keys the join for dictionary-based
    * tokenizers).
    */
  def withCounts(df: DataFrame, textCol: String, idCol: String,
      out: String): DataFrame
}

/** Whitespace-delimited counting — [[TextOps.tokenCount]] as a
  * projection; no shuffle, no dictionary.
  */
case object WhitespaceTokenizer extends Tokenizer {
  def withCounts(df: DataFrame, textCol: String, idCol: String,
      out: String): DataFrame =
    df.withColumn(out, TextOps.tokenCount(col(textCol)).cast("long"))
}

/** BPE-exact counting under a learned merge list
  * ([[Bpe.learnMerges]]). Scale shape: one distinct-word dictionary
  * build plus a word-keyed equi-join (the [[Bpe.encode]] plan,
  * broadcastable when the vocabulary is small); the count projection
  * drops the token arrays before anything downstream shuffles, so the
  * packing prefix sums move longs, not token lists.
  */
final case class BpeTokenizer(merges: Seq[(String, String)])
    extends Tokenizer {
  def withCounts(df: DataFrame, textCol: String, idCol: String,
      out: String): DataFrame = {
    val counts = Bpe.encode(df.select(idCol, textCol), textCol, idCol, merges)
      .select(col(idCol), size(col("tokens")).cast("long").as(out))
    df.join(counts, Seq(idCol))
  }
}
