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
