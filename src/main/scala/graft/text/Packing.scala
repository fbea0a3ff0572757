package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the concat-and-chunk layout every
  * large-scale pre-training pipeline performs between filtering and
  * tokenized shard writing: documents are laid end-to-end in a
  * deterministic global order and the token stream is cut into
  * fixed-size training sequences ("bins") of `budget` tokens; a
  * document may span a cut.
  *
  * Scale shape: the naive expression — `sum(count) over (order by id)`
  * with no partition — collapses Spark onto a SINGLE task for the
  * whole corpus, which is exactly the kind of plan that works at sf0.1
  * and dies at 100 TB. Instead this runs the classic two-pass
  * distributed prefix sum:
  *   1. range-repartition by the id (partitions are ordered: every id
  *      in partition i sorts before every id in partition i+1);
  *   2. one tiny job computes per-partition token totals (one row per
  *      partition — thousands of rows, driver-safe);
  *   3. the exclusive per-partition prefix broadcasts back and each
  *      row's global offset = partition prefix + a WITHIN-partition
  *      running sum (Window partitioned by the partition id, so every
  *      task windows its own slice).
  * The result is exact and deterministic even though the sampled range
  * boundaries are not: offsets depend only on the id ORDER, not on
  * where the cuts landed.
  */
object Packing {

  /** Per-document packing assignment. Output: idCol, the token count,
    * `start_offset` (global token offset where the document begins),
    * `first_bin`/`last_bin` (budget-sized sequence indexes the
    * document's tokens land in) and `n_bins`. `tokenCountCol` is any
    * integral expression over the input row (e.g.
    * [[TextOps.tokenCount]] of the text column).
    */
  def pack(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokenCountCol: org.apache.spark.sql.Column,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint PINS the range partitioning: a range shuffle
    // samples its boundaries per EXECUTION (seeded by the rdd id), and
    // this operator executes `base` twice (the pass-1 totals collect
    // and the returned plan) — re-sampled boundaries between the two
    // runs would attach the broadcast prefixes to the wrong rows. The
    // eager checkpoint materializes the partitioned rows once; both
    // passes read the same blocks (freed by the ContextCleaner when
    // the frame becomes unreachable).
    val base = df.select(col(idCol), tokenCountCol.cast("long").as("n_tokens"))
      .repartitionByRange(parts, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    // Pass 1: per-partition totals — one row per partition, safe to
    // collect at any corpus size (#partitions, not #rows).
    val partSums = base.groupBy("_pid")
      .agg(sum("n_tokens").as("_psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val prefixRows = partSums.map { case (pid, s) =>
      val p = acc; acc += s; (pid, p)
    }
    import spark.implicits._
    val prefix = broadcast(prefixRows.toSeq.toDF("_pid", "_prefix"))
    // Pass 2: within-partition exclusive running sum + broadcast prefix.
    val w = Window.partitionBy("_pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(prefix, "_pid")
      .withColumn("start_offset",
        col("_prefix") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_bin", floor(col("start_offset") / budget))
      .withColumn("last_bin",
        floor((col("start_offset") + greatest(col("n_tokens"), lit(1L)) - 1)
          / budget))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1)
      .drop("_pid", "_prefix")
  }

  /** The training-sequence manifest: one row per (bin, document span)
    * — each document exploded into the budget-sized sequences it
    * overlaps, with the span's offset inside the document, its length,
    * and `bin_offset` (where the span sits inside the bin).
    * Concatenating spans of a bin in `bin_offset` order reproduces the
    * bin's `budget` tokens exactly (the last bin may be short).
    */
  def chunks(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokenCountCol: org.apache.spark.sql.Column,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    val packed = pack(spark, df, idCol, tokenCountCol, budget, numPartitions)
    packed
      .withColumn("bin",
        explode(sequence(col("first_bin"), col("last_bin"))))
      .withColumn("span_start",
        greatest(col("bin") * budget - col("start_offset"), lit(0L)))
      .withColumn("span_len",
        least((col("bin") + 1) * budget - col("start_offset"),
          col("n_tokens")) - col("span_start"))
      .select(col("bin"), col(idCol), col("span_start"), col("span_len"),
        greatest(col("start_offset") - col("bin") * budget, lit(0L))
          .as("bin_offset"))
  }
}
