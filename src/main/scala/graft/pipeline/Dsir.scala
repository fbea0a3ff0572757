package graft.pipeline

import graft.text.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents that look like a small TARGET domain by
  * importance weights under two bag-of-hashed-n-grams models.
  *
  *   log w(doc) = Σ_b f_b(doc) · (log p̂_target(b) − log p̂_raw(b))
  *
  * with f_b = the doc's count of hashed-(uni+bi)gram bucket b and p̂ the
  * add-α-smoothed bucket distribution of each training set. Selection
  * is Gumbel top-k — sampling WITHOUT replacement ∝ exp(log w), made
  * deterministic (and engine-portable) by drawing each doc's Gumbel
  * from the md5 coin instead of an RNG.
  *
  * 100 TB shape: both models are ≤ `numBuckets` rows (thousands), so
  * scoring is the doc→bucket stream (explode + hash agg, linear in
  * tokens) joined against two BROADCAST count tables — one corpus
  * pass, one doc-keyed agg, no corpus-sized shuffle beyond it. The
  * hash trick is the whole point of the paper's estimator: the feature
  * space is fixed at B regardless of vocabulary, so "fit" is a single
  * bounded aggregation even on a web crawl. Top-k selection at
  * corpus-scale k should go through [[Mixing.topFraction]]'s
  * quantile-edge buckets; [[resampleTop]]'s TakeOrdered form is for
  * k that fits a driver merge (the paper's
  * select-100k-from-a-billion regime works either way).
  *
  * Portability pin: bucket = first-8-hex-digits(md5(gram)) mod B and
  * coin = (first-8-hex-digits(md5(salt‖id)) + 0.5) / 2^32 — both exactly
  * reproducible in ANSI SQL, which is what the DuckDB oracle entries
  * recompute end-to-end (the +0.5 keeps the coin strictly inside
  * (0,1), so the double-log Gumbel never sees 0).
  */
object Dsir {

  /** Bucketed model of one training set: `buckets` = (bucket, logp)
    * with at most `numBuckets` rows (broadcastable by construction);
    * `logUnseen` covers buckets with zero observed mass.
    */
  final case class Model(buckets: DataFrame, logUnseen: Double,
      numBuckets: Int)

  /** (idCol, bucket, cnt): the doc's hashed uni+bigram bucket counts.
    * Linear in tokens — one projection + explode + hash agg; documents
    * with no tokens are absent (weight callers re-join them in).
    */
  def docBuckets(docs: DataFrame, textCol: String, idCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    docs
      .select(col(idCol), Analyzer.standard(col(textCol)).as("_t"))
      .select(col(idCol), explode(concat(col("_t"), expr(
        "CASE WHEN size(_t) < 2 THEN cast(array() AS array<string>) " +
          "ELSE transform(sequence(1, size(_t) - 1), " +
          "i -> concat(_t[i-1], ' ', _t[i])) END"))).as("gram"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("gram").cast("binary")), 1, 8),
          16, 10).cast("long"), lit(numBuckets)).as("bucket"))
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fit the add-α bucket distribution of a training set: one corpus
    * aggregation down to ≤ B rows, which then live DRIVER-SIDE — the
    * hash trick bounds the model at `numBuckets` rows regardless of
    * corpus size, so the log-probs are computed locally and the model
    * rides as a LocalRelation (no persist to leak, broadcast for
    * free). Pick B accordingly (the paper uses 10k; a million is still
    * driver-trivial).
    */
  def fit(docs: DataFrame, textCol: String, idCol: String,
      numBuckets: Int, alpha: Double = 1.0): Model = {
    require(alpha > 0, "add-alpha smoothing needs alpha > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docBuckets(docs, textCol, idCol, numBuckets)
      .groupBy("bucket").agg(sum("cnt").as("c"))
      .collect()
    val tot = rows.map(_.getLong(1)).sum
    val denom = tot + alpha * numBuckets
    val buckets = rows.toSeq
      .map(r => (r.getLong(0), math.log((r.getLong(1) + alpha) / denom)))
      .toDF("bucket", "logp")
    Model(buckets, math.log(alpha / denom), numBuckets)
  }

  /** Per-document log importance weight: `(idCol, log_weight)` for
    * EVERY input doc (token-free docs weigh 0 — no evidence either
    * way). The two model tables ride as broadcasts; the only
    * corpus-sized shuffle is the per-doc sum.
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      target: Model, raw: Model): DataFrame = {
    require(target.numBuckets == raw.numBuckets,
      "target and raw models must share the bucket space")
    val t = broadcast(target.buckets
      .select(col("bucket"), col("logp").as("_lt")))
    val r = broadcast(raw.buckets
      .select(col("bucket"), col("logp").as("_lr")))
    val w = docBuckets(docs, textCol, idCol, target.numBuckets)
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .select(col(idCol), (col("cnt").cast("double") *
        (coalesce(col("_lt"), lit(target.logUnseen)) -
          coalesce(col("_lr"), lit(raw.logUnseen)))).as("_c"))
      .groupBy(idCol).agg(sum("_c").as("log_weight"))
    docs.select(col(idCol))
      .join(w, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** The doc's deterministic Gumbel draw: −log(−log(u)) with u the
    * md5 coin nudged to the bucket midpoint — strictly inside (0,1),
    * so both logs are finite on every engine.
    */
  private def gumbel(idCol: String, salt: String) = {
    val u = (conv(substring(md5(concat(lit(salt),
      col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    -log(-log(u))
  }

  /** Gumbel top-k resample: the `n` docs maximizing
    * log_weight + Gumbel(id) — an exact without-replacement sample
    * ∝ exp(log_weight), reproducible across engines and runs. Returns
    * `(idCol, log_weight, key)`. TakeOrdered keeps per-partition
    * top-n then merges n·P rows on the driver — bound n accordingly
    * (corpus-scale fractions: rank `key` through
    * [[Mixing.topFraction]] instead).
    */
  def resampleTop(docs: DataFrame, textCol: String, idCol: String,
      target: Model, raw: Model, n: Int,
      salt: String = "dsir"): DataFrame =
    importanceWeights(docs, textCol, idCol, target, raw)
      .select(col(idCol), col("log_weight"),
        (col("log_weight") + gumbel(idCol, salt)).as("key"))
      .orderBy(col("key").desc, col(idCol).asc)
      .limit(n)
}
