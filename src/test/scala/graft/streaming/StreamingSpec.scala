package graft.streaming

import graft.SparkSpec
import graft.functions.HalfFloat
import graft.operators.CollectionSearch
import graft.store.{Catalog, CollectionDef, FieldDef, IndexDef}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("streaming ingest appends micro-batches into a collection") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-si").toString)
    val c = cat.createCollection(CollectionDef("stream_in", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType),
      FieldDef("version", LongType))))
    implicit val sq = s.sqlContext
    val mem = MemoryStream[Long]
    val stream = mem.toDF()
      .select(col("value").as("id"), (col("value") % 10).as("category"),
        concat(lit("s_"), col("value")).as("content"), lit(0L).as("version"))
    val cp = Files.createTempDirectory("graft-si-cp").toString
    // AvailableNow snapshots offsets at start: feed data first.
    mem.addData(0L until 25L: _*)
    val q = StreamingOps.startIngest(stream, c, cp, Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(c.numEntities(s) == 25)
    // second run picks up only new data (checkpointed offsets)
    mem.addData(25L until 40L: _*)
    val q2 = StreamingOps.startIngest(stream, c, cp, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(c.numEntities(s) == 40)
  }

  test("streaming change feed: committed deltas arrive as micro-batches " +
      "with ops and partitions; checkpointed resume sees only new ones") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-cfs").toString)
    val c = cat.createCollection(CollectionDef("cf_stream", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("content", StringType)),
      partitions = Seq("p0", "p1")))
    c.insert(s, Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "content"))
    c.delete(s, "id == 1")
    val cp = Files.createTempDirectory("graft-cfs-cp").toString
    val seen = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, String, String)]()
    def drain(): Unit = {
      val q = c.changeFeedStream(s).writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id", "_op", "_part").collect().foreach(r =>
            seen.add((r.getLong(0), r.getString(1), r.getString(2)))): Unit
        }
        .start()
      q.awaitTermination(60000): Unit
    }
    drain()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set((0L, "upsert", "p0"),
      (1L, "upsert", "p1"), (2L, "upsert", "p0"), (1L, "delete", "p1")))
    // resume from the checkpoint: only the NEW delta arrives
    seen.clear()
    c.insert(s, Seq((7L, "later")).toDF("id", "content"))
    drain()
    assert(seen.asScala.toSet == Set((7L, "upsert", "p1")))
  }

  test("windowed counts with watermark over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val out = StreamingOps.windowedCounts(events, "ts", "event_type",
      windowDur = "1 minute", watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    def t(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    mem.addData((t(0, 10), "click"), (t(0, 40), "click"), (t(1, 5), "view"))
    q.processAllAvailable()
    val rows = s.sql("SELECT event_type, cnt FROM wc ORDER BY window_start, event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    assert(rows == Seq(("click", 2L), ("view", 1L)))
  }

  test("streaming dedup: first doc per fingerprint unique, later ones flagged") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = StreamingOps.dedupStream(docs, "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    // batch 1: two copies of A (min id canonical), one B
    mem.addData((2L, "doc A"), (1L, "doc A"), (3L, "doc B"))
    q.processAllAvailable()
    // batch 2: another A (dup of 1, state crosses batches), new C
    mem.addData((4L, "doc A"), (5L, "doc C"))
    q.processAllAvailable()
    val rows = s.sql("SELECT docId, isDuplicate, firstId FROM sd ORDER BY docId")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    q.stop()
    assert(rows == Seq(
      (1L, false, 1L), (2L, true, 1L), (3L, false, 3L),
      (4L, true, 1L), (5L, false, 5L)))
    // whitespace-normalized variants share a fingerprint
    val mem2 = MemoryStream[(Long, String)]
    val out2 = StreamingOps.dedupStream(mem2.toDF().toDF("doc_id", "text"),
      "text", "doc_id")
    val q2 = out2.writeStream.format("memory").queryName("sd2")
      .outputMode("append").start()
    mem2.addData((1L, "Hello  World"), (2L, "hello world"))
    q2.processAllAvailable()
    val dups = s.sql("SELECT count(*) FROM sd2 WHERE isDuplicate").head().getLong(0)
    q2.stop()
    assert(dups == 1L)
  }

  test("streaming chunking: stateless append windows match the batch chunker") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val fixture = Seq(
      (1L, "a b c d e f g h i j"),   // 10 toks: windows at 0, 3, 6
      (2L, "one two three"),          // short: one window
      (3L, (1 to 14).map("w" + _).mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val out = graft.text.Chunker.tokenWindows(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", 6, 3)
    val q = out.writeStream.format("memory").queryName("sc")
      .outputMode("append").start()
    mem.addData(fixture(0), fixture(1))
    q.processAllAvailable()
    mem.addData(fixture(2)) // second micro-batch, no state expected
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql(
        "SELECT doc_id, chunk_id, chunk_text, n_tokens FROM sc")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).sortBy(x => (x._1, x._2)).toSeq
    val batch = graft.text.Chunker.tokenWindows(
        fixture.toDF("doc_id", "text"), "text", "doc_id", 6, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).sortBy(x => (x._1, x._2)).toSeq
    assert(streamed == batch)
    assert(streamed.count(_._1 == 1L) == 3) // 10 toks -> starts 0, 3, 6
  }

  test("streaming decontam: bench-gram hits flagged, clean docs pass, matches batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val leak = "the secret benchmark answer is forty two exactly here"
    val bench = Seq(s"remember $leak ok", "clean prompt").toDF("text")
    val mem = MemoryStream[(Long, String)]
    val out = StreamingOps.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", bench, "text")
    val q = out.writeStream.format("memory").queryName("sdc")
      .outputMode("append").start()
    mem.addData(
      (1L, s"this page quietly leaks $leak into the corpus"),
      (2L, "an entirely innocent page about sourdough starter care"))
    q.processAllAvailable()
    mem.addData((3L, s"another leak later on $leak wrapped differently"))
    q.processAllAvailable()
    val rows = s.sql(
      "SELECT doc_id, n_hit_grams, contaminated FROM sdc ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    q.stop()
    // the 9-token leak run shares 9-8+1 = 2 distinct 8-grams
    assert(rows == Seq((1L, 2L, true), (2L, 0L, false), (3L, 2L, true)))
    // batch parity: the same frame run non-streaming gives identical
    // verdicts to Decontaminate.contaminated
    val docs = Seq((1L, s"x $leak y"), (2L, "nothing shared")).toDF("doc_id", "text")
    val streamed = StreamingOps.decontaminateStream(
      docs, "text", "doc_id", bench, "text")
      .filter(col("contaminated")).select("doc_id", "n_hit_grams")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.dedup.Decontaminate.contaminated(
      docs, "text", "doc_id", bench, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("blocklist: distinct-word hits and the C4 drop policy") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a perfectly Fine page"),
      (2L, "badword one badword twice"),
      (3L, "mixes badword and another blocked term")).toDF("doc_id", "text")
    val hits = docs.select(col("doc_id"),
      graft.text.C4Filters.blocklistHits(col("text"),
        Seq("badword", "Blocked")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // repeated word counts once; blocklist casing is normalized
    assert(hits == Map(1L -> 0, 2L -> 1, 3L -> 2))
    val kept = graft.text.C4Filters.blocklistFilter(docs, "text",
      Seq("badword", "blocked")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("streaming near-dup: cross-batch LSH candidates match batch, verified exactly") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val mem = MemoryStream[(Long, String)]
    val out = StreamingOps.nearDupCandidatesStream(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("snd")
      .outputMode("append").start()
    // batch 1: the original + two unrelated docs
    mem.addData((1L, base),
      (4L, "completely different text about database systems and planning"),
      (6L, "another unrelated document discussing machine learning models"))
    q.processAllAvailable()
    // batch 2: an exact copy (cross-batch dup), a case/whitespace
    // variant, one more unrelated doc
    mem.addData((2L, base),
      (5L, "THE  QUICK  Brown fox jumps over the lazy dog near the river bank today"),
      (7L, "graphs and streams and windows are entirely other topics"))
    q.processAllAvailable()
    val cands = s.sql("SELECT DISTINCT id_a, id_b FROM snd")
    val candPairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // normalized-identical docs collide in every band; cross-batch
    // pair (1,2) proves the bucket state survives micro-batches
    assert(Set((1L, 2L), (1L, 5L), (2L, 5L)).subsetOf(candPairs), candPairs)
    // exact verification over the static corpus prunes to true near-dups
    val statics = Seq((1L, base), (2L, base),
      (4L, "completely different text about database systems and planning"),
      (5L, "THE  QUICK  Brown fox jumps over the lazy dog near the river bank today"),
      (6L, "another unrelated document discussing machine learning models"),
      (7L, "graphs and streams and windows are entirely other topics"))
      .toDF("doc_id", "text")
    val verified = graft.dedup.Dedup.jaccardVerify(statics, "text", "doc_id",
        cands, shingleSize = 3)
      .filter(col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == Set((1L, 2L), (1L, 5L), (2L, 5L)), verified)
    // and the stream's buckets agree with the batch LSH: the batch
    // candidate set over the same corpus is the same pair set
    val batchCands = graft.dedup.Dedup.lshCandidatePairs(
      graft.dedup.Dedup.minhashSignatures(statics, "text", "doc_id",
        shingleSize = 3, numHashes = 64), "doc_id", bands = 16, rows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candPairs == batchCands,
      s"stream $candPairs != batch $batchCands")
  }

  test("streaming near-dup: later-arriving smaller id still emits id_a < id_b; replays not re-stored") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val txt = "a long enough shared sentence about stream ordering and state"
    val mem = MemoryStream[(Long, String)]
    val out = StreamingOps.nearDupCandidatesStream(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("snd2")
      .outputMode("append").start()
    mem.addData((10L, txt))          // big id first
    q.processAllAvailable()
    mem.addData((10L, txt), (3L, txt)) // replayed 10 + smaller dup id
    q.processAllAvailable()
    val pairs = s.sql("SELECT DISTINCT id_a, id_b FROM snd2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs == Set((3L, 10L)),
      s"expected canonical (3,10) only, got $pairs")
  }

  test("sessionize keeps O(1) per-key state and counts events per user") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val out = StreamingOps.sessionize(events, gapMs = 60000, useTimeout = false)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:30")
    mem.addData((1L, t0), (1L, t1), (2L, t0))
    q.processAllAvailable()
    val rows = s.sql("SELECT userId, events, durationMs FROM sess ORDER BY userId")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    q.stop()
    assert(rows == Seq((1L, 2L, 30000L), (2L, 1L, 0L)))
  }

  test("index-aware collection search uses IVF when declared, exact otherwise") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-cs").toString)
    val c = cat.createCollection(CollectionDef("vecs", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(8))),
      indexes = Seq(IndexDef("embedding", "IVF_FLAT", Some("L2"),
        Map("nlist" -> "4")))))
    val rows = (0L until 64L).map(i =>
      (i, graft.datagen.StableGen.floatVector(7, i, 8).toSeq))
    c.insert(s, rows.toDF("id", "embedding"))
    val qv = rows(5)._2.map(x => x: Float)
    // exact path (no nprobe): top-1 is the vector itself
    val exact = CollectionSearch.search(s, c, "embedding", qv, k = 3)
    assert(exact.select("id").head().getLong(0) == 5L)
    // IVF path with nprobe honors the declared index; self-hit guaranteed
    val ivf = CollectionSearch.search(s, c, "embedding", qv, k = 3,
      searchParams = Map("nprobe" -> "1"))
    assert(ivf.select("id").head().getLong(0) == 5L)
    // search-by-PK (3.0 surface)
    val byPk = CollectionSearch.searchByPk(s, c, "embedding", 9L, k = 1)
    assert(byPk.select("id").head().getLong(0) == 9L)
  }

  test("fp16/bf16 round-trips preserve the stored bit pattern") {
    val v = Array(1.5f, -0.25f, 3.1415927f, 0.0f, 1e-3f)
    val bf = HalfFloat.unpackBf16(HalfFloat.packBf16(v))
    // bf16 keeps ~7 bits of mantissa
    v.zip(bf).foreach { case (a, b) =>
      assert(math.abs(a - b) <= math.abs(a) * 0.01 + 1e-6, s"$a vs $b")
    }
    val fp = HalfFloat.unpackFp16(HalfFloat.packFp16(v))
    v.zip(fp).foreach { case (a, b) =>
      assert(math.abs(a - b) <= math.abs(a) * 0.001 + 1e-6, s"$a vs $b")
    }
    // pack/unpack is byte-stable (checksum fidelity)
    val bytes = HalfFloat.packBf16(v)
    assert(HalfFloat.packBf16(HalfFloat.unpackBf16(bytes)).sameElements(bytes))
  }
}
