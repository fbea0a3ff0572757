package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.text.Packing

/** Training-shard writer — the end-to-end composition the packing
  * stage exists for: deterministic epoch order ([[Mixing.epochShuffle]]
  * semantics) -> concat-and-chunk span layout ([[Packing.chunks]]) ->
  * fixed-size shards written `partitionBy(shard)`.
  *
  * The manifest has one row per (bin, document span): `shard` (the
  * output file group), `bin` (the `budget`-token training sequence),
  * the document id, `span_start`/`span_len` (the slice of the document
  * that lands in the bin) and `bin_offset` (where the slice sits
  * INSIDE the bin) — concatenating a bin's spans by `bin_offset`
  * reproduces its `budget` tokens exactly, so a trainer can stream
  * shards without re-deriving anything.
  *
  * Scale shape: the epoch order is a salted-hash range sort (balanced,
  * no global row numbering), offsets come from Packing's two-pass
  * distributed prefix sum (per-partition totals -> broadcast), and the
  * shard write is a single partitioned write whose fan-out is
  * bins/binsPerShard. Nothing here collects rows or windows globally.
  */
object Shards {

  /** The epoch-ordered span manifest (no write). The packing order is
    * (epoch hash coin, id) — [[Mixing.epochShuffle]]'s exact order —
    * carried through [[Packing.pack]] as a struct sort key, so offsets
    * are deterministic for a given (corpus, epoch) on any partition
    * layout.
    */
  def manifest(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Long,
      epoch: Int,
      binsPerShard: Int,
      numPartitions: Int = 0): DataFrame = {
    require(binsPerShard > 0, "binsPerShard must be positive")
    val keyed = df.withColumn("_ekey", struct(
      Mixing.hashUniform(col(idCol), s"epoch:$epoch").as("h"),
      col(idCol).as("id")))
    Packing.chunks(spark, keyed, "_ekey", tokenCountCol, budget,
        numPartitions)
      .withColumn("shard", floor(col("bin") / binsPerShard))
      .select(col("shard"), col("bin"), col("_ekey.id").as(idCol),
        col("span_start"), col("span_len"), col("bin_offset"))
  }

  /** Tokenizer-parameterized manifest: counts come from the given
    * [[graft.text.Tokenizer]] over `textCol` (e.g.
    * [[graft.text.BpeTokenizer]] for BPE-exact budgets — what a real
    * pipeline's shard manifests bill by) instead of a caller-supplied
    * count column.
    */
  def manifest(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, tokenizer: graft.text.Tokenizer, budget: Long,
      epoch: Int, binsPerShard: Int): DataFrame =
    manifest(spark, tokenizer.withCounts(df, textCol, idCol, "_n_tok"),
      idCol, col("_n_tok"), budget, epoch, binsPerShard)

  /** Tokenizer-parameterized [[write]] (see the manifest overload). */
  def write(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, tokenizer: graft.text.Tokenizer, budget: Long,
      epoch: Int, binsPerShard: Int, outDir: String): DataFrame =
    write(spark, tokenizer.withCounts(df, textCol, idCol, "_n_tok"),
      idCol, col("_n_tok"), budget, epoch, binsPerShard, outDir)

  /** Write the manifest partitioned by shard and return the re-read
    * frame (the durable artifact a trainer consumes).
    */
  def write(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Long,
      epoch: Int,
      binsPerShard: Int,
      outDir: String,
      numPartitions: Int = 0): DataFrame = {
    val m = manifest(spark, df, idCol, tokenCountCol, budget, epoch,
      binsPerShard, numPartitions)
    m.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // A partitioned read appends the partition column LAST; re-project
    // to the manifest's column order so write() and manifest() agree
    // for positional consumers.
    spark.read.parquet(outDir)
      .withColumn("shard", col("shard").cast("long"))
      .select(m.columns.map(col).toIndexedSeq: _*)
  }
}
