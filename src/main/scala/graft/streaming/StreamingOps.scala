package graft.streaming

import graft.store.Collection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming surface (§2.9: the reference's continuous
  * workloads, recast as real streams): streaming ingest into a
  * collection, event-time windowed aggregation with watermarks, and
  * custom sessionization state via mapGroupsWithState.
  */
object StreamingOps {

  /** Continuous ingest: any streaming DataFrame appended into a store
    * collection per micro-batch (the insert_slowly / trickle-insert
    * brick, insert_slowly.py). Each micro-batch is one sequenced delta
    * write — idempotent per batch run, atomic per job.
    */
  def startIngest(stream: DataFrame, coll: Collection,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) coll.insert(batch.sparkSession, batch): Unit
      }
      .start()

  /** Rate-source driven deterministic row stream (rate value -> pk ->
    * stable fields), the streaming twin of StableGen.
    */
  def rateRows(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").as("id"),
        (col("value") % 1000).as("category"),
        concat(lit("stream_"), col("value")).as("content"),
        lit(0L).as("version"))

  /** Event-time windowed counts with a watermark — late data beyond
    * the watermark is dropped, state is bounded (the scale-safe
    * streaming aggregation shape).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"))

  final case class DedupInput(fp: Long, docId: Long)
  final case class DedupState(firstId: Long, dups: Long)
  final case class DedupOutput(docId: Long, fp: Long, isDuplicate: Boolean,
      firstId: Long)

  /** Streaming exact dedup over a document stream: keyed by content
    * fingerprint via flatMapGroupsWithState — the first document per
    * fingerprint emits as unique, later arrivals emit flagged as
    * duplicates of it. Within one micro-batch the smallest doc id
    * becomes canonical (deterministic regardless of partition order).
    * State per key is O(1) — first id + duplicate count, never
    * buffered documents — so state scales with DISTINCT content, not
    * stream length; bound it further with a state TTL matched to the
    * dedup window when the corpus is unbounded.
    */
  /** Streaming corpus cleaning: the batch cleaning stack (C4 keep
    * rules + cleaned text, PII redaction, language id, quality score)
    * applied to a document stream. Every column is a stateless per-row
    * expression — the SAME Columns the batch pipeline uses — so the
    * stage runs in append mode with no state store and no shuffle, at
    * any ingest rate.
    */
  def cleanStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("keep", graft.text.C4Filters.docKeep(col(textCol)))
      .withColumn("clean_text", graft.text.C4Filters.cleanText(col(textCol)))
      .withColumn("redacted", graft.text.Pii.redact(col(textCol)))
      .withColumn("lang_id", graft.text.TextOps.langId(col(textCol)))
      .withColumn("quality", graft.text.TextOps.qualityScore(col(textCol)))

  def dedupStream(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        xxhash64(graft.text.TextOps.fingerprint(col(textCol))).as("fp"),
        col(idCol).cast("long").as("docId"))
      .as[DedupInput]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (fp: Long, rows: Iterator[DedupInput], state: GroupState[DedupState]) =>
          val batch = rows.toSeq.sortBy(_.docId)
          val out = Seq.newBuilder[DedupOutput]
          var s = state.getOption
          batch.foreach { r =>
            s match {
              case None =>
                s = Some(DedupState(r.docId, 0L))
                out += DedupOutput(r.docId, fp, isDuplicate = false, r.docId)
              case Some(st) =>
                s = Some(st.copy(dups = st.dups + 1))
                out += DedupOutput(r.docId, fp, isDuplicate = true, st.firstId)
            }
          }
          s.foreach(state.update)
          out.result().iterator
      }
      .toDF()
  }

  final case class BandInput(band: Int, bucket: Long, docId: Long)
  final case class BucketState(ids: Seq[Long])
  final case class CandidateOutput(idA: Long, idB: Long, band: Int)

  /** Streaming NEAR-dup candidate generation: banded-MinHash LSH over
    * a document stream, one stateful stage. Each arriving document's
    * signature is a pure per-row projection (see the shape note below),
    * exploded to its `bands` bucket keys; a bucket's state holds the
    * ids already seen in it, and an arrival emits a candidate pair
    * against each of them. Emitted pairs are an at-least-once feed
    * (identical docs collide in every band) — consumers distinct +
    * exact-verify per micro-batch, exactly like the batch pipeline
    * verifies [[graft.dedup.Dedup.lshCandidatePairs]].
    *
    * Signature shape: the batch path's explode + codegen'd min
    * aggregations cannot run inside an append-mode stream (stateful
    * agg), so the signature folds each hash table over the row's own
    * shingle set with higher-order functions — interpreted, ~2x the
    * per-row CPU of the batch shape (measured round 4, see the
    * Dedup.minhashSignatures note), which a stream amortizes over
    * arrival rate. The VALUES are identical to the batch signature
    * (same base-hash chain), so batch and stream bucket the same.
    *
    * State is bounded: at most `maxBucket` ids per (band, bucket) —
    * beyond the cap new arrivals still pair against the stored ids
    * but are not themselves remembered (a cap that deep means the
    * bucket is a degenerate hot key; the docs are still caught as
    * duplicates OF the stored members). Within a micro-batch, ids are
    * processed in ascending order, so output is deterministic
    * regardless of partition layout.
    */
  def nearDupCandidatesStream(docs: DataFrame, textCol: String,
      idCol: String, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16, maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    // Identical hash chain to Dedup.minhashSignatures: base =
    // xxhash64(shingle), h_i = xxhash64(i, base) — materialized once
    // per row behind a projection boundary, folded per hash table.
    val based = docs.select(col(idCol).cast("long").as("docId"),
      transform(
        array_distinct(graft.text.TextOps.shingles(col(textCol), shingleSize)),
        s => xxhash64(s)).as("_bases"))
    val sig = based.select(col("docId"),
      array((0 until numHashes).map(i =>
        array_min(transform(col("_bases"), b => xxhash64(lit(i), b)))): _*)
        .as("signature"))
    // Same bucket key derivation as the batch lshCandidatePairs.
    val buckets = sig.select(col("docId"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), concat_ws("_",
          (0 until rows).map(r => col("signature")(b * rows + r)): _*))): _*))
        .as(Seq("band", "bucket")))
    buckets
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("docId"))
      .as[BandInput]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandInput],
            state: GroupState[BucketState]) =>
          val batch = rows.map(_.docId).toSeq.sorted
          var ids = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val out = Seq.newBuilder[CandidateOutput]
          batch.foreach { id =>
            // Canonical (min, max) orientation — arrival order must
            // not leak into the pair shape (a later-arriving SMALLER
            // id still emits id_a < id_b, matching the batch
            // lshCandidatePairs contract and downstream DISTINCT).
            ids.foreach(prev =>
              if (prev != id)
                out += CandidateOutput(math.min(prev, id),
                  math.max(prev, id), key._1))
            // Membership check: a replayed micro-batch (at-least-once
            // sources) or a duplicate doc id must not be stored twice
            // — duplicates would re-emit every pair per copy and burn
            // the cap on one document.
            if (!ids.contains(id) && ids.size < maxBucket) ids = ids :+ id
          }
          state.update(BucketState(ids))
          out.result().iterator
      }
      .toDF()
      .select(col("idA").as("id_a"), col("idB").as("id_b"), col("band"))
  }

  final case class ContamInput(docId: Long, grams: Seq[Long])
  final case class ContamOutput(docId: Long, nHitGrams: Long,
      contaminated: Boolean)

  /** Streaming decontamination — the ingest-time twin of
    * [[graft.dedup.Decontaminate.contaminated]]: flag arriving
    * documents sharing an n-token gram with the benchmark set, so
    * leaked eval items never land in the lake at all.
    *
    * Stateless by construction (append mode, no state store, no
    * shuffle): the BENCHMARK side is bounded by design (eval suites,
    * not corpora), so its distinct gram hashes collect once at stream
    * definition and ride a broadcast; each arriving row's distinct
    * grams are a pure projection probed against the broadcast set in
    * a typed mapPartitions. Gram identity is xxhash64 — identical to
    * the batch path's documented high-cardinality mode; a collision
    * can only ADD a flagged doc, never hide one. Emits
    * `(docId, nHitGrams, contaminated)` per arrival; run on a batch
    * frame it produces the batch verdicts unchanged.
    */
  def decontaminateStream(docs: DataFrame, textCol: String,
      idCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchGrams: Set[Long] = bench
      .select(explode(array_distinct(
        graft.text.TextOps.shingles(col(benchTextCol), n))).as("g"))
      .select(xxhash64(col("g")).as("h")).distinct()
      .as[Long].collect().toSet
    val bc = spark.sparkContext.broadcast(benchGrams)
    docs
      .select(col(idCol).cast("long").as("docId"),
        transform(array_distinct(
          graft.text.TextOps.shingles(col(textCol), n)),
          g => xxhash64(g)).as("grams"))
      .as[ContamInput]
      .mapPartitions { it =>
        val g = bc.value
        it.map { r =>
          val hits = r.grams.count(g.contains).toLong
          ContamOutput(r.docId, hits, hits > 0)
        }
      }
      .toDF()
      .select(col("docId").as("doc_id"), col("nHitGrams").as("n_hit_grams"),
        col("contaminated"))
  }

  final case class SessionInput(userId: Long, ts: java.sql.Timestamp)
  final case class SessionState(count: Long, startMs: Long, lastMs: Long)
  final case class SessionOutput(userId: Long, events: Long, durationMs: Long,
      closed: Boolean)

  /** Custom per-key state via mapGroupsWithState: user sessions close
    * after `gapMs` of inactivity (processing-time timeout). State per
    * key is O(1) — counts and bounds, never buffered events.
    *
    * `useTimeout=false` disables the inactivity timeout (sessions never
    * auto-close) — needed by tests: with ProcessingTimeTimeout the
    * query re-triggers on the wall clock and `processAllAvailable`
    * never settles.
    */
  def sessionize(events: DataFrame, gapMs: Long = 30000,
      useTimeout: Boolean = true): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.select(col("user_id").as("userId"), col("ts"))
      .as[SessionInput]
      .groupByKey(_.userId)
      .mapGroupsWithState(timeout) {
        (userId: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOutput(userId, s.count, s.lastMs - s.startMs, closed = true)
          } else {
            val times = rows.map(_.ts.getTime).toSeq
            val prev = state.getOption
            val s = SessionState(
              prev.map(_.count).getOrElse(0L) + times.length,
              prev.map(_.startMs).getOrElse(times.min),
              math.max(prev.map(_.lastMs).getOrElse(0L), times.max))
            state.update(s)
            if (useTimeout) state.setTimeoutDuration(gapMs)
            SessionOutput(userId, s.count, s.lastMs - s.startMs, closed = false)
          }
      }
      .toDF()
  }
}
