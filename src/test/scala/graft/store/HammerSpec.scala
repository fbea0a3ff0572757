package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.LongType

import java.nio.file.Files

/** Regression guard for the StorePath atomic-replace discipline: the
  * Hadoop local layer refuses replacing renames and its FileContext
  * OVERWRITE is delete-then-rename, so a naive port makes meta.json
  * transiently vanish under concurrent readers (and a stat-then-open
  * read can straddle a swap and return torn JSON). This hammers 2000
  * meta swaps against 4 spinning readers and requires zero misses.
  */
class HammerSpec extends SparkSpec {
  test("concurrent meta swap never loses visibility or tears") {
    val cat = new Catalog(Files.createTempDirectory("graft-hammer").toString)
    cat.createCollection(CollectionDef("h", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true)))): Unit
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val firstMiss = new java.util.concurrent.atomic.AtomicReference[String]()
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try { cat.describeCollection("h"); () }
          catch {
            case e: Exception =>
              misses.incrementAndGet()
              firstMiss.compareAndSet(null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
          }
        }
      })
    }
    readers.foreach(_.start())
    (0 until 2000).foreach(_ => cat.nextSeq("h"))
    stop.set(true)
    readers.foreach(_.join())
    assert(misses.get() == 0,
      s"${misses.get()} reader misses; first: ${firstMiss.get()}")
  }

  test("shared handle stays consistent under concurrent DML and loaded reads") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-hshare").toString)
    cat.createCollection(CollectionDef("sh", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)))): Unit
    // Two independently-fetched handles must be the SAME instance, so
    // the loaded snapshot one brick builds serves the other, and a
    // write through either refreshes the shared cache.
    val a = cat.collection("sh")
    val b = cat.collection("sh")
    assert(a eq b, "catalog returned distinct handles for one collection")
    a.insert(s, (0L until 100L).map(i => (i, i)).toDF("id", "v")): Unit
    a.load(s)
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writer = new Thread(() => {
      try (1 to 5).foreach { batch =>
        cat.collection("sh").insert(s,
          (0L until 20L).map(i => (1000L * batch + i, i))
            .toDF("id", "v")): Unit
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"writer: ${e.getMessage}"): Unit }
    })
    val reader = new Thread(() => {
      try (1 to 20).foreach { _ =>
        // Counts move monotonically (inserts only) and never throw:
        // a read racing the lazy cache refresh must see either the
        // pre- or post-write snapshot, never a torn/unpersisted one.
        val n = cat.collection("sh").read(s).count()
        assert(n >= 100, s"lost rows: $n")
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    writer.start(); reader.start()
    writer.join(); reader.join()
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Read-your-writes through the shared cached handle.
    assert(cat.collection("sh").read(s).count() == 200)
    // Drop evicts the handle; recreate must yield a FRESH one.
    cat.dropCollection("sh")
    cat.createCollection(CollectionDef("sh", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)))): Unit
    val c2 = cat.collection("sh")
    assert(!(c2 eq a), "dropped handle resurrected")
    assert(c2.read(s).count() == 0, "recreated collection saw stale cache")
  }

  test("leveled auto-compaction under concurrent DML and readers loses nothing") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-hlvl").toString)
    val c = cat.createCollection(CollectionDef("hl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("pad", org.apache.spark.sql.types.StringType)),
      properties = Map("compaction.maxDeltas" -> "3")))
    // A real base so every subsequent trigger takes the MINOR path —
    // the new code: merged tail visible before the folded dirs retire.
    val pad = "x" * 100
    c.insert(s, (0L until 2000L).map(i => (i, pad)).toDF("id", "pad")): Unit
    c.compact(s)
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writers = (0 until 3).map { t =>
      new Thread(() => {
        try (0 until 6).foreach { b =>
          cat.collection("hl").insert(s,
            (0L until 10L).map(i => (100000L * (t + 1) + b * 100L + i, "w"))
              .toDF("id", "pad")): Unit
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    val reader = new Thread(() => {
      try (1 to 25).foreach { _ =>
        // Monotone count (insert-only workload): a read racing a minor
        // fold may see the merged tail AND the not-yet-retired folded
        // dirs (identical winner rows — LWW ties), but never fewer
        // rows than the base, and never a torn chain.
        val n = cat.collection("hl").read(s).count()
        assert(n >= 2000, s"lost rows under minor folds: $n")
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    (writers :+ reader).foreach(_.start())
    (writers :+ reader).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    assert(cat.collection("hl").read(s).count() == 2000 + 3 * 6 * 10,
      "writes lost across concurrent minor folds")
    // distinct ids prove no duplicate VISIBLE rows survive the folds
    assert(cat.collection("hl").read(s).select("id").distinct().count()
      == 2000 + 3 * 6 * 10)
  }

  test("clustered major compaction under concurrent DML and readers loses nothing") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-hcl").toString)
    val c = cat.createCollection(CollectionDef("hc", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("k", LongType)),
      properties = Map("clustering.key" -> "k",
        "clustering.partitions" -> "4")))
    c.insert(s, s.range(2000).select(col("id"),
      pmod(col("id") * 2654435761L, lit(100L)).as("k"))): Unit
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    // Writers race the clustered fold; a delta committed mid-fold is
    // either not folded (untouched) or folded AND left on disk (LWW
    // ties) — same contract as the pk-sorted rewrite, now exercised
    // through the range-shuffle layout path.
    val writers = (0 until 2).map { t =>
      new Thread(() => {
        try (0 until 5).foreach { b =>
          cat.collection("hc").insert(s,
            (0L until 10L).map(i => (100000L * (t + 1) + b * 100L + i,
              i % 100L)).toDF("id", "k")): Unit
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    val compactor = new Thread(() => {
      try (1 to 3).foreach { _ => cat.collection("hc").compact(s) }
      catch { case e: Exception =>
        errors.compareAndSet(null, s"compactor: ${e.getMessage}"): Unit }
    })
    val reader = new Thread(() => {
      try (1 to 15).foreach { _ =>
        val n = cat.collection("hc").read(s).count()
        assert(n >= 2000, s"lost rows under clustered folds: $n")
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    (writers :+ compactor :+ reader).foreach(_.start())
    (writers :+ compactor :+ reader).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    assert(cat.collection("hc").read(s).count() == 2000 + 2 * 5 * 10,
      "writes lost across concurrent clustered folds")
    assert(cat.collection("hc").read(s).select("id").distinct().count()
      == 2000 + 2 * 5 * 10)
    // A final quiesced fold leaves a clustered unique base: band
    // queries stay exact over the post-hammer corpus.
    cat.collection("hc").compact(s)
    val got = cat.collection("hc").read(s).filter(col("k") === 7L).count()
    val expect = cat.collection("hc").read(s)
      .collect().count(_.getLong(1) == 7L)
    assert(got == expect)
  }

  test("two Catalogs on one root stay chain-consistent with the cross-process retire lease") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-h2cat").toString
    val catA = new Catalog(root)
    catA.createCollection(CollectionDef("xp", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("pad", org.apache.spark.sql.types.StringType)),
      properties = Map(
        "compaction.maxDeltas" -> "3",
        "compaction.retireGraceMs" -> "0",
        "compaction.crossProcessLock" -> "true",
        "compaction.lockStaleMs" -> "500"))): Unit
    // A second Catalog over the SAME root — a separate handle with its
    // own caches, the two-driver deployment the lease exists for (the
    // JVM-local compactLock still serializes in-process; the lease
    // code path runs on every retire because the property is on).
    val catB = new Catalog(root)
    catA.collection("xp").insert(s,
      (0L until 1000L).map(i => (i, "x")).toDF("id", "pad")): Unit
    catA.collection("xp").compact(s)
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writers = Seq(catA, catB).zipWithIndex.map { case (cat, t) =>
      new Thread(() => {
        try (0 until 6).foreach { b =>
          val c = cat.collection("xp")
          c.insert(s, (0L until 10L)
            .map(i => (100000L * (t + 1) + b * 100L + i, "w"))
            .toDF("id", "pad")): Unit
          if (b % 2 == 1) c.compactMinor(s)
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Both handles converge on the same exact chain.
    Seq(catA, catB).foreach { cat =>
      val c = cat.collection("xp")
      assert(c.read(s).count() == 1000 + 2 * 6 * 10)
      assert(c.read(s).select("id").distinct().count() == 1000 + 2 * 6 * 10)
    }
    // No lease left behind, and the zero-grace sweeps actually
    // reclaimed: every remaining delta dir is live (none marked
    // retired-but-lingering in the ledger past the final sweep).
    val dataDir = catA.collectionDir("xp").resolve("data")
    assert(!dataDir.resolve("_retire_lock").exists, "lease file leaked")
  }

  test("retire lease: a stale lock is taken over, a live one blocks until released") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-hlease").toString)
    val c = cat.createCollection(CollectionDef("ls", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true)),
      properties = Map(
        "compaction.retireGraceMs" -> "0",
        "compaction.crossProcessLock" -> "true",
        "compaction.lockStaleMs" -> "300")))
    c.insert(s, (0L until 50L).map(Tuple1(_)).toDF("id")): Unit
    c.insert(s, (50L until 100L).map(Tuple1(_)).toDF("id")): Unit
    val lock = cat.collectionDir("ls").resolve("data")
      .resolve("_retire_lock")
    // Simulate a DEAD holder from another process: lock present, mtime
    // aging past lockStaleMs. The compact must take it over instead of
    // wedging, and release cleanly.
    assert(lock.createExclusive("9999999 0".getBytes))
    Thread.sleep(400)
    c.compact(s)
    assert(!lock.exists, "takeover did not release the lease")
    assert(c.read(s).count() == 100)
    // Simulate a LIVE holder: fresh lock (age < lockStaleMs), released
    // 150 ms in by its owner. The next retire must wait for the
    // release — a takeover would need the 300 ms stale age — and then
    // proceed.
    c.insert(s, (100L until 150L).map(Tuple1(_)).toDF("id")): Unit
    assert(lock.createExclusive("9999999 1".getBytes))
    val releaser = new Thread(() => {
      Thread.sleep(150); lock.deleteRecursively()
    })
    val t0 = System.currentTimeMillis()
    releaser.start()
    c.compact(s)
    releaser.join()
    assert(System.currentTimeMillis() - t0 >= 120,
      "compact did not wait for the live lease")
    assert(!lock.exists && c.read(s).count() == 150)
  }

  test("BM25 delta serving under concurrent DML: no torn search, final parity with a fresh index") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.StringType
    val cat = new Catalog(Files.createTempDirectory("graft-hbm").toString)
    val c = cat.createCollection(CollectionDef("hbm", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("text", StringType))))
    c.insert(s, (0L until 500L).map(i => (i,
      if (i % 2 == 0) s"page $i about vector stream processing engines"
      else s"page $i about batch table scans and joins"))
      .toDF("doc_id", "text")): Unit
    c.createIndex(s, graft.store.IndexDef("text", "BM25"))
    graft.operators.CollectionSearch
      .searchText(s, c, "text", "vector stream", 5).collect()
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    // Writers mutate DISJOINT id ranges, so the final corpus is the
    // same set regardless of interleaving; every search mid-flight is
    // served from sealed + whatever deltas have landed.
    val writers = (0 until 2).map { t =>
      new Thread(() => {
        try (0 until 4).foreach { b =>
          val h = cat.collection("hbm")
          h.insert(s, (0L until 5L).map(i =>
            (100000L * (t + 1) + b * 10L + i,
              s"fresh vector stream delta page $t $b $i"))
            .toDF("doc_id", "text")): Unit
          h.delete(s, s"doc_id in [${t * 8 + b * 2}, ${t * 8 + b * 2 + 1}]"): Unit
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    val reader = new Thread(() => {
      try (1 to 12).foreach { _ =>
        val hits = graft.operators.CollectionSearch
          .searchText(s, cat.collection("hbm"), "text", "vector stream", 10)
          .collect()
        assert(hits.length <= 10, s"k overflow: ${hits.length}")
        hits.foreach { r =>
          val (id, score) = (r.getLong(0), r.getDouble(1))
          assert(java.lang.Double.isFinite(score) && score > 0,
            s"bad score $score for $id")
          assert(id < 500L || (id >= 100000L && id < 300000L),
            s"doc id $id outside any written universe")
        }
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    (writers :+ reader).foreach(_.start())
    (writers :+ reader).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Quiesced: the served search must match a from-scratch BM25 over
    // the final corpus exactly (same contract as IndexLifecycleSpec,
    // now after 8 interleaved insert+delete generations).
    val h = cat.collection("hbm")
    val served = graft.operators.CollectionSearch
      .searchText(s, h, "text", "vector stream", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val fresh = graft.text.Bm25.topK(h.read(s), "text", "doc_id",
        "vector stream", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.map(_._1).toSeq == fresh.map(_._1).toSeq,
      s"served=${served.toSeq} fresh=${fresh.toSeq}")
    served.zip(fresh).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"score drift: $a vs $b")
    }
  }

  test("HNSW graph serving under concurrent DML: no torn search, final parity with exact") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cat = new Catalog(Files.createTempDirectory("graft-hhnsw").toString)
    val c = cat.createCollection(CollectionDef("hg", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("emb", ArrayType(FloatType), dim = Some(8)))))
    def vec(i: Long): Seq[Float] = Seq((i % 7).toFloat, (i % 11).toFloat,
      (i % 13).toFloat, (i % 5).toFloat, 1f, (i % 3).toFloat,
      (i % 17).toFloat, (i % 19).toFloat)
    c.insert(s, (0L until 600L).map(i => (i, vec(i))).toDF("id", "emb")): Unit
    c.createIndex(s, IndexDef("emb", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "4")))
    val q7 = vec(7)
    graft.operators.CollectionSearch.search(s, c, "emb", q7, 5,
      searchParams = Map("ef" -> "64")).collect()
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    // Writers mutate DISJOINT id ranges (inserts + deletes), so the
    // final corpus is interleaving-independent; searches mid-flight
    // serve sealed graphs + whatever growing deltas have landed.
    val writers = (0 until 2).map { t =>
      new Thread(() => {
        try (0 until 4).foreach { b =>
          val h = cat.collection("hg")
          h.insert(s, (0L until 5L).map(i =>
            (100000L * (t + 1) + b * 10L + i, vec(i + b)))
            .toDF("id", "emb")): Unit
          h.delete(s, s"id in [${t * 8 + b * 2}, ${t * 8 + b * 2 + 1}]"): Unit
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    val reader = new Thread(() => {
      try (1 to 12).foreach { _ =>
        val hits = graft.operators.CollectionSearch
          .search(s, cat.collection("hg"), "emb", q7, 10,
            searchParams = Map("ef" -> "1000000"))
          .collect()
        assert(hits.length == 10, s"k underflow: ${hits.length}")
        hits.foreach { r =>
          val (id, score) = (r.getLong(0), r.getDouble(1))
          assert(java.lang.Double.isFinite(score) && score >= 0,
            s"bad score $score for $id")
          assert(id < 600L || (id >= 100000L && id < 300000L),
            s"id $id outside any written universe")
        }
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    (writers :+ reader).foreach(_.start())
    (writers :+ reader).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Quiesced, full beam: the served graph route must equal the exact
    // brute force over the final corpus bit-for-bit.
    val h = cat.collection("hg")
    val served = graft.operators.CollectionSearch
      .search(s, h, "emb", q7, 10, searchParams = Map("ef" -> "1000000"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val exact = graft.operators.Knn.searchOne(h.read(s), q7, "emb", "id",
      "L2", 10).select("id").collect().map(_.getLong(0)).toSeq
    assert(served == exact, s"served=$served exact=$exact")
  }

  test("range search under concurrent DML: in-band mid-flight, final parity with exact") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cat = new Catalog(Files.createTempDirectory("graft-hrange").toString)
    val c = cat.createCollection(CollectionDef("rg", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("emb", ArrayType(FloatType), dim = Some(8)))))
    def vec(i: Long): Seq[Float] = Seq((i % 7).toFloat, (i % 11).toFloat,
      (i % 13).toFloat, (i % 5).toFloat, 1f, (i % 3).toFloat,
      (i % 17).toFloat, (i % 19).toFloat)
    c.insert(s, (0L until 600L).map(i => (i, vec(i))).toDF("id", "emb")): Unit
    c.createIndex(s, IndexDef("emb", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q7 = vec(7)
    val (rf, radius) = (2.0, 8.0)
    graft.operators.CollectionSearch.rangeSearch(s, c, "emb", q7, radius,
      rangeFilter = Some(rf)).collect()
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writers = (0 until 2).map { t =>
      new Thread(() => {
        try (0 until 4).foreach { b =>
          val h = cat.collection("rg")
          h.insert(s, (0L until 5L).map(i =>
            (100000L * (t + 1) + b * 10L + i, vec(i + b)))
            .toDF("id", "emb")): Unit
          h.delete(s, s"id in [${t * 8 + b * 2}, ${t * 8 + b * 2 + 1}]"): Unit
        } catch { case e: Exception =>
          errors.compareAndSet(null, s"writer$t: ${e.getMessage}"): Unit }
      })
    }
    val reader = new Thread(() => {
      try (1 to 12).foreach { _ =>
        val hits = graft.operators.CollectionSearch
          .rangeSearch(s, cat.collection("rg"), "emb", q7, radius,
            rangeFilter = Some(rf))
          .collect()
        hits.foreach { r =>
          val (id, score) = (r.getLong(0), r.getDouble(1))
          assert(score >= rf && score < radius,
            s"out-of-band score $score for $id")
          assert(id < 600L || (id >= 100000L && id < 300000L),
            s"id $id outside any written universe")
        }
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"reader: ${e.getMessage}"): Unit }
    })
    (writers :+ reader).foreach(_.start())
    (writers :+ reader).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Quiesced: the pruned route must equal the exact band over the
    // final corpus, row for row.
    val h = cat.collection("rg")
    val served = graft.operators.CollectionSearch
      .rangeSearch(s, h, "emb", q7, radius, rangeFilter = Some(rf))
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = h.read(s).select("id", "emb").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d = math.sqrt(v.zip(q7).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum)
        (r.getLong(0), d)
      }.filter { case (_, d) => d >= rf && d < radius }.map(_._1).toSet
    assert(served == exact,
      s"served band ${served.size} != exact band ${exact.size}")
  }

  test("CDC replication under concurrent DML: promote converges to the source") {
    // Writer hammers the source while a replication loop drains feed
    // windows onto the replica; whatever the interleaving, the final
    // catch-up promote must leave the replica row-for-row equal to the
    // source — the invariant the whole apply/promote design rests on.
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-cdch").toString)
    def ndef(n: String) = CollectionDef(n, Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)))
    val src = cat.createCollection(ndef("hs"))
    val rep = cat.createCollection(ndef("hr"))
    cat.createAlias("hserv", "hs")
    src.insert(s, (0L until 50L).map(i => (i, i)).toDF("id", "v")): Unit
    rep.restoreFrom(s, src.changeFeed(s)): Unit
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try {
        (1 to 12).foreach { round =>
          src.insert(s, (0L until 10L).map(i =>
            (1000L * round + i, round.toLong)).toDF("id", "v")): Unit
          if (round % 3 == 0) src.delete(s, s"id == ${1000 * round}")
          src.upsert(s, Seq((round.toLong, -round.toLong))
            .toDF("id", "v")): Unit
        }
      } catch { case t: Throwable => writerErr.set(t) }
      finally writerDone.set(true)
    })
    writer.start()
    // replication loop: drain whatever window exists, repeatedly
    while (!writerDone.get()) {
      val cursor = rep.definition.properties
        .get("cdc.cursor").map(_.toLong).getOrElse(0L)
      rep.applyFeed(s, src.changeFeed(s, cursor)): Unit
    }
    writer.join()
    assert(writerErr.get() == null, s"writer failed: ${writerErr.get()}")
    // final catch-up promote drains the tail behind the fence
    cat.promoteReplica(s, "hs", "hr", "hserv"): Unit
    def snap(c: Collection) = c.read(s).select("id", "v")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val (a, b) = (snap(src), snap(cat.collection("hserv")))
    assert(a == b, s"replica diverged: src=${a.size} rows, rep=${b.size} rows; " +
      s"diff=${(a.toSet -- b.toSet).take(5)} / ${(b.toSet -- a.toSet).take(5)}")
  }

  test("filtered ANN under concurrent writes + auto-folds holds the monotone completeness band") {
    // The bench_qps_search_dml SLO at spec scale: a narrow-band
    // filtered top-k (matching << topk, so write visibility is inside
    // the assertion) served while a writer lands band-matching inserts
    // and count-neutral upserts on an auto-compacting collection. No
    // deletes => the matching set only grows, and every mid-flight
    // search must count inside expect0 <= hits <= expect0 + committed
    // (committed bumped BEFORE each write is issued, so at every
    // instant counter >= rows visible to any search snapshot — rows
    // become searchable inside insert(), before it returns).
    val s = spark
    import s.implicits._
    import graft.operators.CollectionSearch
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cat = new Catalog(Files.createTempDirectory("graft-hqdml").toString)
    val c = cat.createCollection(CollectionDef("hq", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(4))),
      properties = Map("compaction.maxDeltas" -> "3")))
    def vec(i: Long): Seq[Float] =
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat, 1.0f)
    c.insert(s, (0L until 400L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")): Unit
    // Base compacted before indexing, the qpsDml discipline: in-test
    // auto-folds stay MINOR, so the sealed build serves sealed+growing.
    c.compact(s)
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "4")))
    val filter = "vec_id % 100 == 7"
    val expect0 = c.query(s, filter).count()
    val committed = new java.util.concurrent.atomic.AtomicLong(0)
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writer = new Thread(() => {
      try (0 until 8).foreach { b =>
        committed.addAndGet(5): Unit
        c.insert(s, (0 until 5)
          .map(j => (1000000L + (b * 5 + j) * 100L + 7L, vec(b * 5 + j)))
          .toDF("vec_id", "embedding")): Unit
        // count-neutral on an existing pk; still counted in the bound
        // (an absent pk would be inserted — Milvus upsert semantics)
        committed.addAndGet(1): Unit
        c.upsert(s, Seq((7L, vec(b))).toDF("vec_id", "embedding"))
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"writer: ${e.getMessage}"): Unit }
    })
    val searchers = (0 until 2).map { t =>
      new Thread(() => {
        try (1 to 10).foreach { _ =>
          val hits = CollectionSearch.searchBatch(s, c, "embedding",
            Seq(s"q$t" -> vec(7)), 10000, filterExpr = filter,
            searchParams = Map("nprobe" -> "4")).count()
          val hi = expect0 + committed.get()
          assert(hits >= expect0 && hits <= hi,
            s"completeness band violated: $hits not in [$expect0, $hi]")
        } catch { case e: Throwable =>
          errors.compareAndSet(null, s"searcher$t: ${e.getMessage}"): Unit }
      })
    }
    (writer +: searchers).foreach(_.start())
    (writer +: searchers).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Post-quiesce exactness: every landed insert is served.
    val finalHits = CollectionSearch.searchBatch(s, c, "embedding",
      Seq("qf" -> vec(7)), 10000, filterExpr = filter,
      searchParams = Map("nprobe" -> "4")).count()
    assert(finalHits == expect0 + 40,
      s"final filtered top-k missed landed writes: $finalHits")
  }

  test("filtered ANN under concurrent inserts + DELETES holds the band " +
      "and reconciles exactly") {
    // The bench_qps_search_dml_delete SLO at spec scale. The SAME band
    // as the insert-only test holds with deletes mixed in: the upper
    // bound because the insert counter still bumps before each write;
    // the LOWER bound (hits >= expect0) because deletes only target
    // writer-inserted pks and any snapshot containing a tombstone also
    // contains the earlier-committed insert it masks — deltas commit
    // by atomic rename in seq order, so listings are prefix-
    // consistent. What only deletes can drive: the post-quiesce exact
    // reconciliation — final == expect0 + inserts − deletes — which a
    // fold that loses tombstones would fail.
    val s = spark
    import s.implicits._
    import graft.operators.CollectionSearch
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cat = new Catalog(Files.createTempDirectory("graft-hqdel").toString)
    val c = cat.createCollection(CollectionDef("hqd", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(4))),
      properties = Map("compaction.maxDeltas" -> "3")))
    def vec(i: Long): Seq[Float] =
      Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat, 1.0f)
    c.insert(s, (0L until 400L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")): Unit
    c.compact(s)
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "4")))
    val filter = "vec_id % 100 == 7"
    val expect0 = c.query(s, filter).count()
    val inserted = new java.util.concurrent.atomic.AtomicLong(0)
    val deleted = new java.util.concurrent.atomic.AtomicLong(0)
    val errors = new java.util.concurrent.atomic.AtomicReference[String]()
    val writer = new Thread(() => {
      try (0 until 8).foreach { b =>
        inserted.addAndGet(5): Unit
        c.insert(s, (0 until 5)
          .map(j => (1000000L + (b * 5 + j) * 100L + 7L, vec(b * 5 + j)))
          .toDF("vec_id", "embedding")): Unit
        if (b >= 2) {
          // delete 2 pks of batch b-2 — committed two batches ago
          deleted.addAndGet(2): Unit
          val pks = (3 until 5).map(j => 1000000L + ((b - 2) * 5 + j) * 100L + 7L)
          c.delete(s, s"vec_id in [${pks.mkString(", ")}]"): Unit
        }
      } catch { case e: Exception =>
        errors.compareAndSet(null, s"writer: ${e.getMessage}"): Unit }
    })
    val searchers = (0 until 2).map { t =>
      new Thread(() => {
        try (1 to 10).foreach { _ =>
          val hits = CollectionSearch.searchBatch(s, c, "embedding",
            Seq(s"q$t" -> vec(7)), 10000, filterExpr = filter,
            searchParams = Map("nprobe" -> "4")).count()
          val hi = expect0 + inserted.get()
          assert(hits >= expect0 && hits <= hi,
            s"band violated under deletes: $hits not in [$expect0, $hi]")
        } catch { case e: Throwable =>
          errors.compareAndSet(null, s"searcher$t: ${e.getMessage}"): Unit }
      })
    }
    (writer +: searchers).foreach(_.start())
    (writer +: searchers).foreach(_.join())
    assert(errors.get() == null, String.valueOf(errors.get()))
    // Post-quiesce exact reconciliation: 40 inserts, 12 deletes.
    val finalHits = CollectionSearch.searchBatch(s, c, "embedding",
      Seq("qf" -> vec(7)), 10000, filterExpr = filter,
      searchParams = Map("nprobe" -> "4")).count()
    assert(finalHits == expect0 + 40 - 12,
      s"final count != expect0 + inserts - deletes: $finalHits")
    // The tombstoned pks really are the ones suppressed.
    val served = CollectionSearch.searchBatch(s, c, "embedding",
      Seq("qf" -> vec(7)), 10000, filterExpr = filter,
      searchParams = Map("nprobe" -> "4"), outputFields = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    (2 until 8).foreach { b =>
      (3 until 5).foreach { j =>
        assert(!served.contains(1000000L + ((b - 2) * 5 + j) * 100L + 7L),
          s"deleted pk of batch ${b - 2} still served")
      }
    }
  }
}
