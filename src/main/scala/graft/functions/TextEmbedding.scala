package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Deterministic text -> dense-vector encoder backing the
  * TEXT_EMBEDDING schema function (the engine-meaningful slice of the
  * reference's "Function / model provider" capability,
  * docs/plans/2026-07-07-milvus-3-feature-inventory.md P2 list: remote
  * providers need credentials, but the schema surface — declare a
  * function, have the engine populate the vector field at write time
  * and encode query text at search time — is provider-independent).
  *
  * The `deterministic` provider is a signed bag-of-words: each token
  * (standard analyzer: lowercase, split on non-alphanumerics) adds
  * +/-1 to one bucket, with bucket and sign pure integer functions of
  * the token's first code point and length. Components are therefore
  * small integers — exactly representable in Float32 and exactly
  * reproducible by the DuckDB oracle in plain SQL, so search results
  * over the encoded space are hash-comparable end to end.
  *
  * Both encode paths (the Column used for stored rows and the
  * driver-side mirror used for query text) implement the same spec:
  *   bucket(t) = (ascii(t) * 31 + length(t)) mod dim
  *   sign(t)   = +1 if (ascii(t) + length(t)) even else -1
  *   emb[j]    = sum over tokens t with bucket(t) == j of sign(t)
  * where `length` counts CODE POINTS (Spark's length() semantics) —
  * the local mirror must not use String.length (UTF-16 units), or any
  * token containing a supplementary-plane letter would land in a
  * different bucket at query time than at write time.
  */
object TextEmbedding {

  /** Column form — runs inside WholeStageCodegen on the stored rows. */
  def encode(text: Column, dim: Int): Column = {
    val toks = graft.text.Analyzer.standard(text)
    transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(toks, lit(0), (acc, t) =>
        acc + when(pmod(ascii(t) * 31 + length(t), lit(dim)) === j,
          when(pmod(ascii(t) + length(t), lit(2)) === 0, 1).otherwise(-1))
          .otherwise(0))
        .cast(FloatType))
  }

  /** Driver-side mirror for query text (no Spark job — the reference's
    * search path encodes the query string before the search RPC).
    */
  def encodeLocal(text: String, dim: Int): Seq[Float] = {
    val emb = new Array[Float](dim)
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).foreach { t =>
      val a = t.codePointAt(0)
      val len = t.codePointCount(0, t.length)
      val b = Math.floorMod(a * 31 + len, dim)
      emb(b) += (if (Math.floorMod(a + len, 2) == 0) 1f else -1f)
    }
    emb.toSeq
  }
}
