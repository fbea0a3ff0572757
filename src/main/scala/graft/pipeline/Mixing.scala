package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus composition operators — deterministic sampling and source
  * mixing for training-data pipelines (the "data mixtures" stage:
  * down-sample over-represented sources, up-weight scarce
  * high-quality ones, temperature-flatten the source distribution).
  *
  * Every sample here is a HASH GATE, not `rand()`: a row is kept iff
  * uniform(md5(salt || id)) < rate, where uniform() reads the first 8
  * hex digits as a uint32 scaled to [0,1). That makes sampling (a)
  * reproducible run-to-run and engine-to-engine (DuckDB's md5 agrees
  * byte-for-byte — the oracle recomputes the exact member set), (b) a
  * pure projection — no shuffle, no state, trivially parallel at any
  * scale, and (c) stable under re-partitioning and retries, which
  * `rand(seed)` is not (its draw depends on partition layout).
  */
object Mixing {

  /** uniform(md5(salt || id)) in [0, 1) as a Column — the portable
    * per-row coin.
    */
  def hashUniform(idCol: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))
      .cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Deterministic sample of ~`rate` of the rows (exact membership is
    * the hash gate, so the same ids are kept on every engine and
    * every run).
    */
  def hashSample(
      df: DataFrame,
      idCol: String,
      rate: Double,
      salt: String = ""): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    df.filter(hashUniform(col(idCol), salt) < rate)
  }

  /** Mix sources to target proportions: keep source s at rate
    * min(1, targetRows·w_s / count_s) — i.e. aim for targetRows·w_s
    * rows of source s, capped by availability (a scarce source is
    * taken whole rather than over-sampled; upsampling is an epoch
    * decision, not a filter's). Sources absent from `weights` are
    * dropped. One count aggregation over the input (shuffle on the
    * source key — bounded by #sources); the per-source rates ride in a
    * broadcast when-chain, so the pass over the corpus stays a pure
    * projection.
    */
  def mixBySource(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      targetRows: Long,
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one source")
    val counts = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(sourceCol).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = weights.flatMap { case (s, w) =>
      counts.get(s).map(c => s -> math.min(1.0, targetRows * w / c))
    }
    if (rates.isEmpty) return df.limit(0)
    val rateCol = rates.foldLeft(lit(Double.NaN)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(col(sourceCol).isin(rates.keys.toSeq: _*))
      .filter(hashUniform(col(idCol), salt) < rateCol)
  }

  /** Deterministic fractional UPSAMPLING: each row is replicated
    * floor(factor) times, plus one more when its hash coin falls below
    * the fractional part — E[copies] = factor exactly, and the copy
    * count per row is stable under corpus growth, repartitioning, and
    * engine swaps (the same coin discipline as [[split]]). This is the
    * epoch-decision counterpart [[mixBySource]]'s scaladoc defers to:
    * a scarce source gets REPEATED here, never over-filtered there.
    * Output = the input columns plus `copy` (0-based replica index,
    * so downstream epoch shuffles can salt per copy). Pure per-row
    * explode — no shuffle at any corpus size.
    */
  def upsample(
      df: DataFrame,
      idCol: String,
      factor: Double,
      salt: String = ""): DataFrame = {
    require(factor >= 0, "factor must be nonnegative")
    require(!df.columns.contains("copy") && !df.columns.contains("_copies"),
      "upsample emits a `copy` column (and uses `_copies` internally); " +
        "rename the input's conflicting column first")
    val base = math.floor(factor).toLong
    val frac = factor - base
    df.withColumn("_copies", lit(base) +
        when(hashUniform(col(idCol), salt) < frac, 1L).otherwise(0L))
      .filter(col("_copies") > 0)
      .select(col("*"),
        explode(sequence(lit(0L), col("_copies") - 1)).as("copy"))
      .drop("_copies")
  }

  /** Deterministic epoch shuffle: the global training order for one
    * epoch, as a sort on the per-row hash coin salted by the epoch
    * number (ties broken by id). Different epochs permute
    * independently; the same epoch reproduces the same order on every
    * engine, run, and partition layout. Physically a range-partitioned
    * sort on a uniform key — balanced and all-parallel at any scale,
    * with no global row-numbering step (consumers read the sorted
    * output in partition order).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame =
    df.orderBy(hashUniform(col(idCol), s"epoch:$epoch").asc, col(idCol).asc)

  /** Curriculum training order: best-quality stage first, shuffled
    * WITHIN each stage by the epoch's hash-coin permutation (the
    * staged-curriculum schedule — train on the cleanest slice first,
    * anneal toward the tail — with [[epochShuffle]]'s determinism
    * inside each stage). `score` must be in [0, 1] (a quality score
    * or selection coin); stage = `floor(score * stages)` clamped, a
    * pure projection, so membership is growth- and layout-stable.
    * Physically one range-partitioned sort on (stage, coin, id) —
    * balanced and all-parallel at any scale, no global row numbering.
    */
  def curriculumOrder(df: DataFrame, idCol: String, score: Column,
      stages: Int, epoch: Int): DataFrame = {
    require(stages > 0, s"stages must be positive, got $stages")
    val stage = greatest(lit(0),
      least(floor(score * stages), lit(stages - 1))).cast("int")
    df.orderBy(stage.desc,
      hashUniform(col(idCol), s"epoch:$epoch").asc, col(idCol).asc)
  }

  /** Deterministic train/val/test split: each row is assigned the
    * first split whose cumulative weight range contains its hash coin.
    * Membership is a pure per-row projection — stable under
    * re-partitioning, retries, engine swaps, and corpus GROWTH (a row's
    * split never changes when other rows are added, the property that
    * matters for eval-set hygiene across crawl refreshes; a
    * row_number-based split has none of these). Weights must sum to 1.
    */
  def split(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "bad split weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val coin = hashUniform(col(idCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // last split takes the [cum_{n-1}, 1) remainder exactly, so a coin
    // of 0.999999999 can't fall through on float accumulation error
    val labelCol = splits.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(splits.last._1): Column) { case ((name, hi), acc) =>
        when(coin < hi, name).otherwise(acc)
      }
    df.withColumn("split", labelCol)
  }

  /** Token-budget head selection — the "rank by quality, keep the best
    * documents until the training-token budget is hit" stage of
    * quality-pruned pipelines (FineWeb/DCLM shape): rows are ordered by
    * (`score` DESC, id ASC) and a row is kept iff the cumulative token
    * sum up to and INCLUDING it is <= `budget`. The kept set is an
    * exact prefix of the global quality order — deterministic on every
    * engine and partition layout.
    *
    * Scale shape: the naive `sum(tokens) OVER (ORDER BY score DESC)`
    * is a single-partition window — dead at 100 TB. This runs the
    * two-pass distributed prefix sum over score-quantile BUCKETS:
    * driver-constant quantile edges split the score axis, one
    * hash-agg job collects per-bucket token totals (#buckets rows),
    * and each bucket windows only its own slice with the broadcast
    * bucket prefix added. Buckets whose exclusive prefix already
    * exceeds the budget are dropped BEFORE the window — the pass over
    * the corpus tail is a filter-pruned no-op, so the window cost
    * scales with the kept head, not the corpus.
    *
    * Output: the input columns plus `cum_tokens` (the inclusive
    * running total, handy for budget reporting).
    */
  /** Tokenizer-parameterized budget head: the token ceiling is counted
    * by the given [[graft.text.Tokenizer]] over `textCol` (BPE-exact
    * with [[graft.text.BpeTokenizer]]) instead of a caller-supplied
    * count column.
    */
  def tokenBudgetHead(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      textCol: String,
      tokenizer: graft.text.Tokenizer,
      budget: Long): DataFrame =
    tokenBudgetHead(spark,
      tokenizer.withCounts(df, textCol, idCol, "_tok_nt"), idCol,
      scoreCol, col("_tok_nt"), budget).drop("_tok_nt")

  def tokenBudgetHead(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      tokensCol: Column,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val buckets =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // Null score sorts LAST (worst), null tokens count as zero-length.
    val scoreExpr = coalesce(scoreCol.cast("double"),
      lit(Double.NegativeInfinity))
    val tokExpr = coalesce(tokensCol.cast("long"), lit(0L))
    // Bucket by DRIVER-CONSTANT score quantile edges, NOT
    // repartitionByRange + spark_partition_id: a range shuffle samples
    // its boundaries per EXECUTION (seeded by the rdd id), and this
    // operator executes its input twice (the pass-1 totals collect and
    // the returned plan) — re-sampled boundaries between the two runs
    // would attach the broadcast prefixes to the wrong rows. The edges
    // are collected once and baked into both passes as literals, so
    // the bucket of a row is a pure function of the row — identical
    // in every execution, partition layout, and retry. (The edges'
    // exact values only affect balance, never the result.)
    val nEdges = math.max(buckets - 1, 0)
    val edges: Seq[Double] =
      if (nEdges == 0) Seq.empty
      else {
        val r = df.agg(percentile_approx(scoreExpr,
          array((1 to nEdges).map(i => lit(i.toDouble / buckets)): _*),
          lit(10000)).as("e")).head()
        if (r.isNullAt(0)) Seq.empty
        else r.getSeq[Double](0).distinct.sorted(Ordering[Double].reverse)
      }
    // pid 0 holds the best scores: pid = #edges strictly above score.
    val pidExpr = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(lit(e) > col("_tbh_score"), 1).otherwise(0)
    }
    val base = df
      .withColumn("_tbh_score", scoreExpr)
      .withColumn("_tbh_tok", tokExpr)
      .withColumn("_tbh_pid", pidExpr)
    // Pass 1: per-bucket totals (one row per bucket).
    val partSums = base.groupBy("_tbh_pid")
      .agg(sum("_tbh_tok").as("_s"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val prefixRows = partSums.map { case (pid, s) =>
      val p = acc; acc += s; (pid, p)
    }
    // A bucket whose EXCLUSIVE prefix is already OVER budget
    // contributes nothing: every row in it has cum > budget. A bucket
    // whose prefix lands EXACTLY on the budget can still contribute
    // zero-token rows (cum == prefix == budget satisfies the
    // documented `cum <= budget`), so prune with <=, not < — the
    // final cum filter discards the rest and the boundary bucket
    // costs at most one more window slice.
    val keptPids = prefixRows.filter(_._2 <= budget).map(_._1)
    if (keptPids.isEmpty)
      return df.withColumn("cum_tokens", lit(0L)).limit(0)
    import spark.implicits._
    val prefix = broadcast(prefixRows.toSeq.toDF("_tbh_pid", "_tbh_prefix"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_tbh_pid")
      .orderBy(col("_tbh_score").desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.filter(col("_tbh_pid").isin(keptPids.toSeq: _*))
      .join(prefix, "_tbh_pid")
      .withColumn("cum_tokens", col("_tbh_prefix") + sum("_tbh_tok").over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("_tbh_pid", "_tbh_prefix", "_tbh_score", "_tbh_tok")
  }

  /** Keep the top `fraction` of rows by score (ties broken by id) —
    * the classifier-threshold selection of DCLM-style pipelines
    * ("keep the best X% by quality score"). Exactly the first
    * ceil(fraction * n) rows of the (score DESC, id ASC) order, via
    * [[tokenBudgetHead]] with unit weights — same bucketed prefix sum,
    * same budget-pruned tail, no global window. One count job sizes
    * the budget.
    */
  def topFraction(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      fraction: Double,
      numPartitions: Int = 0): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val budget = math.ceil(df.count() * fraction).toLong
    tokenBudgetHead(spark, df, idCol, scoreCol, lit(1L), budget,
      numPartitions).drop("cum_tokens")
  }

  /** Temperature-flattened mixture weights from observed source counts:
    * w_s ∝ count_s^alpha, normalized. alpha = 1 reproduces the natural
    * distribution, alpha → 0 approaches uniform — the standard
    * multilingual/multi-source re-balancing knob. Driver-side: the
    * count map is one row per source.
    */
  def temperatureWeights(
      counts: Map[String, Long],
      alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0,1]")
    val raw = counts.map { case (s, c) => s -> math.pow(c.toDouble, alpha) }
    val z = raw.values.sum
    raw.map { case (s, v) => s -> v / z }
  }
}
