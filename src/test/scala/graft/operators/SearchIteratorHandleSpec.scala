package graft.operators

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef, IndexDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** The search-iterator checkpoint-file contract (v65) plus the
  * round-13 call-time guards: crash-resume from the persisted
  * (score, pk) cursor must reproduce the uninterrupted page sequence
  * exactly; a checkpoint written for a different search must be
  * rejected; malformed queries and bands must fail loudly at the call
  * site, never as silent empty pages or deep Catalyst errors.
  */
class SearchIteratorHandleSpec extends SparkSpec {

  private lazy val cat =
    new Catalog(Files.createTempDirectory("graft-sihs").toString)

  private def denseCollection(name: String) = {
    val s = spark
    import s.implicits._
    val c = cat.createCollection(CollectionDef(name, Seq(
      FieldDef("pk", LongType, nullable = false, isPrimary = true),
      FieldDef("v", ArrayType(FloatType), dim = Some(4)))))
    // Integer coordinates with dense ties: score order is exact in
    // doubles and the pk tiebreak carries most of the ordering.
    c.insert(s, (0L until 60L).map(i =>
      (i * 37 % 60 * 100 + i,
        Seq((i % 3).toFloat, (i % 5).toFloat, (i % 2).toFloat, 1.0f)))
      .toDF("pk", "v"))
    c
  }

  private def pks(rows: Seq[org.apache.spark.sql.Row]): Seq[Long] =
    rows.map(r => r.getLong(r.fieldIndex("pk")))

  test("checkpoint file resume reproduces the uninterrupted pages exactly") {
    val s = spark
    val c = denseCollection("cp1")
    val q = Seq(1.0f, 2.0f, 0.0f, 1.0f)
    val params = Map("metric_type" -> "L2")
    val ref = new SearchIterator(s, c, "v", q, 7, searchParams = params)
    val refPages = Iterator.continually(pks(ref.next()))
      .takeWhile(_.nonEmpty).toList
    val cp = Files.createTempDirectory("graft-sihs-cp")
      .resolve("cp.json").toString
    // Crash after every prefix length: each run consumes k pages
    // through a fresh handle chain and the concatenation must equal
    // the uninterrupted sequence.
    (1 until refPages.size).foreach { k =>
      Files.deleteIfExists(java.nio.file.Paths.get(cp))
      val h1 = new SearchIterator(s, c, "v", q, 7,
        searchParams = params, checkpointFile = Some(cp))
      val prefix = (0 until k).map(_ => pks(h1.next()))
      // h1 discarded here — the simulated crash.
      val h2 = new SearchIterator(s, c, "v", q, 7,
        searchParams = params, checkpointFile = Some(cp))
      val suffix = Iterator.continually(pks(h2.next()))
        .takeWhile(_.nonEmpty).toList
      assert((prefix ++ suffix) == refPages,
        s"crash after page $k: resumed pages diverged")
    }
  }

  test("sparse checkpoint resume through the family dispatch") {
    val s = spark
    import s.implicits._
    val c = cat.createCollection(CollectionDef("cpsp", Seq(
      FieldDef("pk", LongType, nullable = false, isPrimary = true),
      FieldDef("sv", MapType(IntegerType, DoubleType)))))
    c.insert(s, (0L until 40L).map(i =>
      (i, Map((i % 4).toInt -> (i % 3 + 1).toDouble))).toDF("pk", "sv"))
    val q = Map(0 -> 2.0, 1 -> 1.0, 2 -> 3.0)
    val cp = Files.createTempDirectory("graft-sihs-sp")
      .resolve("cp.json").toString
    val ref = new SearchIterator(s, c, "sv", q, 6)
    val refPages = Iterator.continually(pks(ref.next()))
      .takeWhile(_.nonEmpty).toList
    val h1 = new SearchIterator(s, c, "sv", q, 6, checkpointFile = Some(cp))
    val first = pks(h1.next())
    val h2 = new SearchIterator(s, c, "sv", q, 6, checkpointFile = Some(cp))
    val rest = Iterator.continually(pks(h2.next()))
      .takeWhile(_.nonEmpty).toList
    assert((first +: rest) == refPages)
  }

  test("banded checkpoint resume pages exactly the band") {
    val s = spark
    val c = denseCollection("cpband")
    val q = Seq(1.0f, 2.0f, 0.0f, 1.0f)
    // An interior L2 band over the tied fixture: boundary scores land
    // on ties, so the resume must hold the strict/inclusive edge
    // conventions AND the pk tiebreak through the persisted cursor.
    val params = Map("metric_type" -> "L2",
      "radius" -> "2.5", "range_filter" -> "1.0")
    val ref = new SearchIterator(s, c, "v", q, 5, searchParams = params)
    val refPages = Iterator.continually(pks(ref.next()))
      .takeWhile(_.nonEmpty).toList
    assert(refPages.nonEmpty, "fixture broken: empty band")
    val cp = Files.createTempDirectory("graft-sihs-band")
      .resolve("cp.json").toString
    val h1 = new SearchIterator(s, c, "v", q, 5,
      searchParams = params, checkpointFile = Some(cp))
    val first = pks(h1.next())
    val h2 = new SearchIterator(s, c, "v", q, 5,
      searchParams = params, checkpointFile = Some(cp))
    val rest = Iterator.continually(pks(h2.next()))
      .takeWhile(_.nonEmpty).toList
    assert((first +: rest) == refPages,
      "banded file-resume diverged from the uninterrupted band pages")
  }

  test("binary checkpoint resume through the family dispatch") {
    val s = spark
    import s.implicits._
    val c = cat.createCollection(CollectionDef("cpbin", Seq(
      FieldDef("pk", LongType, nullable = false, isPrimary = true),
      FieldDef("bv", BinaryType))))
    c.insert(s, (0L until 50L).map(i =>
      (i, Array(((i * 37) % 256).toByte, ((i * 11) % 256).toByte)))
      .toDF("pk", "bv"))
    val q: Array[Byte] = Array(0x2a.toByte, 0x15.toByte)
    val cp = Files.createTempDirectory("graft-sihs-bin")
      .resolve("cp.json").toString
    val ref = new SearchIterator(s, c, "bv", q, 8)
    val refPages = Iterator.continually(pks(ref.next()))
      .takeWhile(_.nonEmpty).toList
    val h1 = new SearchIterator(s, c, "bv", q, 8, checkpointFile = Some(cp))
    val first = pks(h1.next())
    val h2 = new SearchIterator(s, c, "bv", q, 8, checkpointFile = Some(cp))
    val rest = Iterator.continually(pks(h2.next()))
      .takeWhile(_.nonEmpty).toList
    assert((first +: rest) == refPages)
  }

  test("a checkpoint written for a different search is rejected") {
    val s = spark
    val c = denseCollection("cp2")
    val cp = Files.createTempDirectory("graft-sihs-sig")
      .resolve("cp.json").toString
    val h1 = new SearchIterator(s, c, "v", Seq(1.0f, 2.0f, 0.0f, 1.0f), 7,
      searchParams = Map("metric_type" -> "L2"), checkpointFile = Some(cp))
    h1.next()
    val e = intercept[IllegalStateException] {
      new SearchIterator(s, c, "v", Seq(0.0f, 0.0f, 1.0f, 1.0f), 7,
        searchParams = Map("metric_type" -> "L2"),
        checkpointFile = Some(cp))
    }
    assert(e.getMessage.contains("different search"))
  }

  test("call-time guards: empty / wrong-dim queries and inverted bands fail loudly") {
    val s = spark
    val c = denseCollection("cp3")
    // empty dense query (would otherwise score every L2 distance 0
    // via zip truncation)
    intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorAny(s, c, "v", Seq.empty[Float], 5)
    }
    // dense dim mismatch vs the declared dim
    val dimErr = intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorAny(s, c, "v", Seq(1.0f, 2.0f), 5)
    }
    assert(dimErr.getMessage.contains("dim"))
    // empty sparse query
    intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorAny(s, c, "v", Map.empty[Int, Double], 5)
    }
    // inverted L2 band: range_filter must be < radius
    val bandErr = intercept[IllegalArgumentException] {
      CollectionSearch.searchIterator(s, c, "v",
        Seq(1.0f, 2.0f, 0.0f, 1.0f), 5,
        searchParams = Map("metric_type" -> "L2",
          "radius" -> "1.0", "range_filter" -> "2.0")).collect()
    }
    assert(bandErr.getMessage.contains("band"))
    // non-numeric band value: descriptive, not a bare
    // NumberFormatException
    val numErr = intercept[IllegalArgumentException] {
      CollectionSearch.searchIterator(s, c, "v",
        Seq(1.0f, 2.0f, 0.0f, 1.0f), 5,
        searchParams = Map("metric_type" -> "L2",
          "radius" -> "wide")).collect()
    }
    assert(numErr.getMessage.contains("radius"))
  }

  test("concurrent saves to one checkpoint path never tear or race") {
    // Round-14 ADVICE fix: the old fixed '<file>.tmp' let two writers
    // interleave Files.write with the other's ATOMIC_MOVE
    // (NoSuchFileException) or publish a body torn across writers.
    // With a unique temp per save, every observable state of the file
    // is one writer's complete body.
    val cp = Files.createTempDirectory("graft-sihs-race")
      .resolve("cp.json").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (0 until 4).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until 200).foreach { i =>
          try CheckpointFile.save(cp, s"sig$w",
            Seq("score" -> s"$i.0", "pk" -> CheckpointFile.pkJson(i.toLong)))
          catch { case _: Throwable => errs.incrementAndGet() }
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(errs.get() == 0)
    // The final file is a complete body from ONE writer: parseable
    // score + pk, and a sig that is exactly one of the writers'.
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cp)))
    val sig = "\"sig\": \"(sig\\d)\"".r.findFirstMatchIn(body).map(_.group(1))
    assert(sig.exists(Set("sig0", "sig1", "sig2", "sig3")))
    assert("\"score\": (\\d+)\\.0".r.findFirstMatchIn(body).nonEmpty)
    // No orphaned temp files linger in the directory.
    val dir = java.nio.file.Paths.get(cp).getParent
    val leftovers = java.nio.file.Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(names == Seq("cp.json"), s"unexpected files: $names")
  }
}
