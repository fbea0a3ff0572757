package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer, trained and applied as
  * DataFrame plans (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units" — the algorithm every
  * GPT/SentencePiece-family tokenizer descends from).
  *
  * The scale trick is the classic one: BPE never iterates over the
  * corpus. The corpus reduces ONCE to its distinct-word frequency
  * table (`wordVocab` — one map-side-combined hash agg), and both
  * training and encoding then run over that vocab, whose size is
  * bounded by the language, not the corpus. A 100 TB crawl and a 1 GB
  * sample have vocabs within a small factor of each other; production
  * trainers additionally hash-gate a sample first (compose with
  * [[graft.pipeline.Mixing.split]]), which changes nothing below.
  *
  * Training: `numMerges` rounds; each round is one weighted
  * adjacent-pair count over the vocab (explode + hash agg) and a
  * 1-row driver collect of the argmax pair (count desc, then
  * lexicographic — deterministic). The merge rewrite is a per-row
  * left-to-right fold (interpreted HOF — measured fine here because it
  * runs over the VOCAB, not the corpus; the corpus-sized paths in this
  * repo deliberately avoid HOFs, see Dedup.minhashSignatures).
  *
  * Encoding: applying the ranked merge list in order to each distinct
  * word builds a word→pieces dictionary; the corpus is encoded by an
  * equi-join against that dictionary and an order-preserving per-doc
  * reassembly. No per-document iteration, no UDF.
  *
  * Reference anchor: the reference's analyzers stop at word/ngram
  * granularity (2.6/common.py analyzer params); subword tokenization
  * is the training-pipeline extension (token counting for mixture
  * budgeting uses TextOps.subwordCount's regex approximation — this is
  * the real thing).
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): lets merges distinguish
    * word-final from word-internal contexts and makes decoding exact.
    * Input words are assumed not to contain the marker (true of
    * whitespace-tokenized natural text; guaranteed for the testdata).
    */
  val Eow = "</w>"

  /** Distinct-word frequency table of a corpus: `(word, weight,
    * symbols)` where symbols is the initial character sequence plus
    * the end-of-word marker. The ONLY corpus-sized job in this file.
    */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Analyzer.whitespace(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("weight"))
      .withColumn("symbols", initialSymbols(col("word")))

  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(Eow)))

  /** Weighted adjacent-pair counts over a `(symbols, weight)` vocab:
    * one explode + one hash agg. `(left, right, cnt)`.
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val pairs = zip_with(
      slice(col("symbols"), lit(1), size(col("symbols")) - 1),
      slice(col("symbols"), lit(2), size(col("symbols")) - 1),
      (a, b) => struct(a.as("left"), b.as("right")))
    vocab.select(explode(pairs).as("p"), col("weight"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("weight").as("cnt"))
  }

  /** Repartition a vocab to its measured size: the merge loop runs
    * tens of rounds of tiny keyed ops, and session-default-width
    * rounds pay ~32 tasks of pure scheduling each (AQE cannot coalesce
    * cache-populating plans). Natural-language vocabs are ≪100k rows,
    * so this is usually 1 partition; the clamp saturates to
    * defaultParallelism for adversarially huge vocabs.
    */
  private def sizedVocab(vocab: DataFrame): DataFrame = {
    val v = vocab.persist()
    val defaultPar = v.sparkSession.sparkContext.defaultParallelism
    val parts = math.max(1L, math.min(defaultPar.toLong,
      (v.count() + 99999L) / 100000L)).toInt
    val out = (if (parts < defaultPar) v.repartition(parts) else v)
      .localCheckpoint(true)
    v.unpersist(false)
    out
  }

  /** One merge applied to a symbol array: the standard left-to-right
    * non-overlapping rewrite ("aaa" + (a,a) → ["aa","a"]), as a fold —
    * if the accumulator's last element is `left` and the current
    * symbol is `right`, replace the last element with the merged
    * symbol, else append.
    */
  private def mergeOnce(sym: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(sym, typedlit(Seq.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `numMerges` ranked merges from a corpus.
    *
    * The corpus-sized work — reducing text to the distinct-word
    * frequency table — is always distributed. The merge loop itself is
    * O(vocab × merges) and runs DRIVER-SIDE whenever the vocab fits
    * `driverVocabLimit` rows (the same sample-to-driver trainer shape
    * as [[graft.ann.Ivf.train]]'s k-means; every production BPE
    * trainer works this way — 30k+ merge rounds as cluster jobs would
    * be scheduling-bound at ~0.1 s/round). Vocabs beyond the limit
    * fall back to distributed rounds: one vocab-sized pair agg + a
    * 1-row collect per merge, identical semantics (the spec pins
    * parity on the Sennrich fixture).
    *
    * Tie-break everywhere: highest count, then (left, right)
    * lexicographic ascending. Stops early when no pair occurs twice.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 8,
      driverVocabLimit: Long = 2000000L): Seq[(String, String)] = {
    val v0 = wordVocab(docs, textCol).select("word", "weight").persist()
    val n = v0.count()
    if (n <= driverVocabLimit) {
      val words = v0.collect()
        .map(r => (r.getString(0), r.getLong(1)))
      v0.unpersist(false)
      learnMergesLocal(words, numMerges)
    } else {
      val out = learnMergesDistributed(
        sizedVocab(v0.withColumn("symbols", initialSymbols(col("word")))),
        numMerges, checkpointEvery)
      v0.unpersist(false)
      out
    }
  }

  /** Driver-side merge loop over a collected `(word, weight)` vocab.
    * Naive full pair-recount per round — O(vocab symbols) per merge,
    * plenty under the row limit; an incremental-count heap is the
    * upgrade path if merge counts grow to real tokenizer sizes.
    */
  private[text] def learnMergesLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, c) =>
      (w.split("").toVector :+ Eow, c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) exhausted = true
      else {
        val (l, ri) = best.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += ((l, ri))
        vocab = vocab.map { case (syms, c) =>
          (mergeOnceLocal(syms, l, ri), c)
        }
      }
      r += 1
    }
    out.toSeq
  }

  private def mergeOnceLocal(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (out.nonEmpty && out.last == l && s == r) out(out.size - 1) = l + r
      else out += s
    }
    out.toVector
  }

  /** Distributed fallback for vocabs too large to collect: each round
    * re-counts pairs over the (persisted) vocab and collects exactly
    * one row; lineage is truncated with an eager localCheckpoint every
    * `checkpointEvery` rounds so the plan never deepens past a bounded
    * window.
    */
  private def learnMergesDistributed(vocab0: DataFrame, numMerges: Int,
      checkpointEvery: Int): Seq[(String, String)] = {
    var vocab = vocab0
    // The superseded generation must be released once its successor is
    // materialized — persist() entries are never GC-reclaimed, and a
    // long merge run would otherwise pin every multi-GB vocab
    // generation in the block manager (the exact path this fallback
    // exists for). Checkpointed generations self-release via the
    // ContextCleaner once unreachable.
    var cached: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = pairCounts(vocab).filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, ri) = (top(0).getString(0), top(0).getString(1))
        out += ((l, ri))
        val next = vocab.withColumn("symbols",
          mergeOnce(col("symbols"), l, ri))
        vocab =
          if ((r + 1) % checkpointEvery == 0) {
            val c = next.localCheckpoint(true)
            cached.foreach(_.unpersist(false)); cached = None
            c
          } else {
            val p = next.persist()
            p.count()
            cached.foreach(_.unpersist(false)); cached = Some(p)
            p
          }
      }
      r += 1
    }
    cached.foreach(_.unpersist(false))
    out.toSeq
  }

  /** The ranked merge table as a DataFrame `(rank, left, right)` —
    * the persistable model artifact.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }

  /** word→pieces dictionary: the ranked merges applied IN ORDER to
    * each word's initial symbols (Sennrich's encoder). Runs over
    * distinct words only; lineage/expression depth bounded by periodic
    * checkpoints.
    */
  def wordPieces(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)], checkpointEvery: Int = 8): DataFrame = {
    var df = sizedVocab(
      words.withColumn("pieces", initialSymbols(col(wordCol))))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      df = df.withColumn("pieces", mergeOnce(col("pieces"), l, r))
      if ((i + 1) % checkpointEvery == 0) df = df.localCheckpoint(true)
    }
    df
  }

  /** Encode a corpus: `(id, tokens)` where tokens is the concatenation
    * of each word's pieces in document order. The dictionary join is a
    * word-keyed equi-join (broadcastable when the vocab is small);
    * per-doc reassembly is one sort_array over (position, pieces)
    * structs. Documents with no words encode to the empty array.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(Analyzer.whitespace(col(textCol))))
      .toDF(idCol, "pos", "word")
    val dict = wordPieces(words.select("word").distinct(), "word", merges)
    val encoded = words.join(dict, "word")
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("pieces"))).as("wp"))
      .select(col(idCol),
        flatten(transform(array_sort(col("wp")), s => s.getField("pieces")))
          .as("tokens"))
    docs.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), typedlit(Seq.empty[String])).as("tokens"))
  }

  /** Decode a token array back to whitespace-normalized text: concat,
    * turn each end-of-word marker into a space, trim. Exact inverse of
    * encode up to whitespace normalization (runs of whitespace → one
    * space), for any merge list.
    */
  def decode(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens), Eow, " "))
}
