package graft.workload

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef, IndexDef}
import graft.validate.Validators
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.time.Instant

class BrickSpec extends SparkSpec {

  test("brick result JSON carries the unified field set and round-trips") {
    val args = BrickProtocol.BrickArgs(
      outputJson = Some(Files.createTempDirectory("graft-brick")
        .resolve("r.json").toString))
    val report = Validators.report(Seq.empty,
      Map("requests_total" -> 1000.0, "requests_failed" -> 0.0,
        "p99_latency_ms" -> 120.5))
    val r = BrickProtocol.fromReport("mixed_rw_pressure", args,
      Instant.parse("2026-08-12T00:00:00Z"), report)
    BrickProtocol.writeResult(r)
    val body = new String(Files.readAllBytes(
      java.nio.file.Paths.get(args.outputJson.get)))
    Seq("\"brick\" : \"mixed_rw_pressure\"", "\"status\" : \"passed\"",
      "\"requests_total\" : 1000", "\"p99_latency_ms\" : 120.5",
      "\"feature_set\" : \"compat_2_6\"", "\"failures\" : [ ]")
      .foreach(f => assert(body.contains(f), s"missing $f in\n$body"))
  }

  test("failed report produces failed status with failures listed") {
    val r = BrickProtocol.fromReport("q", BrickProtocol.BrickArgs(),
      Instant.now(), Validators.report(Seq("count mismatch")))
    assert(r.status == "failed")
    assert(BrickProtocol.resultJson(r).contains("count mismatch"))
  }

  test("phase checkpoints persist and read back across 'restarts'") {
    val dir = Files.createTempDirectory("graft-phase").toString
    val p = BrickProtocol.writePhaseCheckpoint(dir, "after_upgrade",
      Map("collection" -> "qa_brick_1", "checksum" -> "abc123", "rows" -> "500"))
    assert(Files.exists(java.nio.file.Paths.get(p)))
    val state = BrickProtocol.readPhaseCheckpoint(dir, "after_upgrade")
    assert(state == Map("collection" -> "qa_brick_1",
      "checksum" -> "abc123", "rows" -> "500"))
    intercept[IllegalArgumentException](
      BrickProtocol.readPhaseCheckpoint(dir, "nope"))
  }

  test("capability evaluation mirrors the reference gate semantics") {
    // Never assume an unimplemented probe passes (test_capability.py).
    val catalog = Map(
      "StorageV3" -> Capability.CapabilitySpec("StorageV3",
        Map("config_probe" -> "common.storage.useLoonFFI")),
      "NoProbe" -> Capability.CapabilitySpec("NoProbe"),
      "Versioned" -> Capability.CapabilitySpec("Versioned",
        Map("server_version_min" -> "3.0.0")))
    val ev = Capability.evaluate(
      Seq("StorageV3", "NoProbe", "Versioned", "Bogus"), catalog, "3.0.0")
    assert(ev.unsupported.contains("StorageV3"))
    assert(ev.supported.contains("NoProbe"))
    assert(ev.supported.contains("Versioned"))
    assert(ev.unsupported.contains("Bogus"), "unknown id must be unsupported")
    // version comparison (parse_version/version_at_least semantics)
    assert(Capability.versionAtLeast("3.0.0", "3.0.0"))
    assert(Capability.versionAtLeast("v3.1-beta", "3.0.9"))
    assert(!Capability.versionAtLeast("2.6.4", "3.0.0"))
    assert(!Capability.versionAtLeast("", "3.0.0"))
    assert(Capability.versionAtLeast("3", "3.0.0"), "3 pads to 3.0.0")
  }

  test("capability gate skips (not fails) bricks requiring unsupported features") {
    val args = BrickProtocol.BrickArgs()
    var ran = false
    // StorageV3 has a config-only probe -> unsupported -> skipped
    val r = BrickProtocol.gated("needs_loon", args, Seq("StorageV3")) {
      ran = true
      BrickProtocol.fromReport("needs_loon", args, Instant.now(),
        Validators.report(Seq.empty))
    }
    assert(!ran, "gated brick body must not run when skipped")
    assert(r.status == "skipped")
    assert(r.skipReason.exists(_.contains("StorageV3")))
    val body = BrickProtocol.resultJson(r)
    assert(body.contains("\"status\" : \"skipped\""))
    assert(body.contains("StorageV3"))
    // supported requirements run and carry the evaluation in the result
    val ok = BrickProtocol.gated("orderby_brick", args,
      Seq("OrderBy", "EntityTTL")) {
      BrickProtocol.fromReport("orderby_brick", args, Instant.now(),
        Validators.report(Seq.empty))
    }
    assert(ok.status == "passed")
    assert(ok.capabilities.exists(_.supported == Seq("OrderBy", "EntityTTL")))
    // --capability-probe=false bypasses the gate entirely
    val bypass = BrickProtocol.gated("raw", args.copy(capabilityProbe = false),
      Seq("StorageV3")) {
      BrickProtocol.fromReport("raw", args, Instant.now(),
        Validators.report(Seq.empty))
    }
    assert(bypass.status == "passed")
    // --skip-unsupported=false: the brick runs (and may fail on its own)
    val strict = BrickProtocol.gated("strict",
      args.copy(skipUnsupported = false), Seq("StorageV3")) {
      BrickProtocol.fromReport("strict", args, Instant.now(),
        Validators.report(Seq("probe failed")))
    }
    assert(strict.status == "failed")
    assert(strict.capabilities.exists(_.unsupported == Seq("StorageV3")))
  }

  test("data integrity: seed checkpoint validates clean, flags drift") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-di").toString)
    val c = cat.createCollection(CollectionDef("di", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType))))
    c.insert(s, (0L until 50L).map(i => (i, i % 7, s"c$i"))
      .toDF("id", "category", "content"))
    val dir = Files.createTempDirectory("graft-di-cp").toString
    val state = DataIntegrity.seedCheckpoint(s, c, dir)
    assert(state("expected_count") == "50")
    assert(state("min_pk") == "0" && state("max_pk") == "49")
    // clean validation passes (including across a 'restart': re-read
    // the checkpoint from disk, fresh collection handle)
    val r1 = DataIntegrity.validate(s, cat.collection("di"), dir)
    assert(r1.passed, r1.failures.mkString("; "))
    // drift: delete the min sample pk -> count + sample + checksum fail
    c.delete(s, "id == 0")
    val r2 = DataIntegrity.validate(s, c, dir)
    assert(!r2.passed)
    assert(r2.failures.exists(_.startsWith("COUNT_MISMATCH")))
    assert(r2.failures.exists(_.startsWith("MISSING_PK")))
    assert(r2.failures.exists(_.startsWith("CHECKSUM_MISMATCH")))
    // scalar mutation only: count passes, checksum catches it
    val c2 = cat.createCollection(CollectionDef("di2", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType))))
    c2.insert(s, (0L until 20L).map(i => (i, i)).toDF("id", "category"))
    DataIntegrity.seedCheckpoint(s, c2, dir)
    c2.upsert(s, Seq((5L, 999L)).toDF("id", "category"))
    val r3 = DataIntegrity.validate(s, c2, dir)
    assert(!r3.passed)
    assert(r3.failures.forall(_.startsWith("CHECKSUM_MISMATCH")),
      r3.failures.mkString("; "))
  }

  test("precheck gates on version family; serviceability wait polls to verdict") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-pc").toString)
    cat.createCollection(CollectionDef("pc1", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true))))
    val args = BrickProtocol.BrickArgs()
    val ok = BrickProtocol.precheck(cat, args, expectedServerVersion = "3.0.1")
    assert(ok.status == "passed")
    assert(ok.metrics("collections_total") == 1.0)
    val bad = BrickProtocol.precheck(cat, args, expectedServerVersion = "2.6.18")
    assert(bad.status == "failed")
    assert(bad.failures.exists(_.startsWith("SERVER_VERSION_MISMATCH")))
    // serviceability: passes immediately on intact data, times out on drift
    val c = cat.collection("pc1")
    c.insert(s, (0L until 10L).map(i => Tuple1(i)).toDF("id"))
    val cp = Files.createTempDirectory("graft-pc-cp").toString
    DataIntegrity.seedCheckpoint(s, c, cp)
    val w1 = DataIntegrity.waitServiceability(s, c, cp, args, timeoutSec = 5)
    assert(w1.status == "passed" && w1.metrics("polls") == 1.0)
    c.delete(s, "id == 0")
    val w2 = DataIntegrity.waitServiceability(s, c, cp, args,
      timeoutSec = 0, intervalMs = 1)
    assert(w2.status == "failed")
    assert(w2.failures.head.startsWith("SERVICEABILITY_TIMEOUT"))
    // the wait result feeds the gate verdict's serviceability slot
    val rd = Files.createTempDirectory("graft-pc-res").toString
    val c2names = Gates.requiredValidationNames(Gates.GateConfig())
    c2names.foreach { n =>
      BrickProtocol.writeResult(BrickProtocol.BrickResult(n,
        args.copy(outputJson = Some(s"$rd/$n.json")), "passed",
        Instant.now(), Instant.now(), Map.empty, Seq.empty))
    }
    BrickProtocol.writeResult(w1.copy(args =
      args.copy(outputJson = Some(s"$rd/wait_rollback_serviceability.json"))))
    assert(Gates.evaluateResultsDir(Gates.GateConfig(), rd).status == "passed")
  }

  test("concurrent index builds are consistent (S7)") {
    val cat = new Catalog(Files.createTempDirectory("graft-cix").toString)
    val c = cat.createCollection(CollectionDef("cix", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("a", LongType), FieldDef("b", LongType),
      FieldDef("c", LongType), FieldDef("d", LongType))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val fields = Seq("a", "b", "c", "d")
    // In-process serialization only: Catalog.updateDef synchronizes on
    // this Catalog instance, so use one shared instance per field set.
    val futures = (0 until 16).map { i =>
      pool.submit(new Runnable {
        def run(): Unit =
          c.createIndex(IndexDef(fields(i % 4), "INVERTED"))
      })
    }
    pool.shutdown()
    pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
    assert(c.listIndexes().map(_.field).sorted == fields.sorted)
  }

  test("resource groups gate execution through scheduler pools") {
    val s = spark
    ResourceGroups.create("rg1")
    assert(ResourceGroups.list() == Seq("rg1"))
    val n = ResourceGroups.withGroup(s, "rg1") {
      assert(s.sparkContext.getLocalProperty("spark.scheduler.pool") == "rg1")
      s.range(10).count()
    }
    assert(n == 10)
    assert(s.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
    intercept[IllegalArgumentException](
      ResourceGroups.withGroup(s, "nope")(()))
    ResourceGroups.drop("rg1")
  }

  test("write quota denies with the reference's message; deny loop counts") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-quota").toString)
    val c = cat.createCollection(CollectionDef("q", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)),
      properties = Map("quota.rows" -> "100")))
    def batch(r: Int) =
      (0 until 40).map(i => (r * 100L + i, i.toLong)).toDF("id", "v")
    // High-water semantics: 40, 80 are under quota; the batch landing
    // at 120 crosses it; the next insert is denied.
    val res = Workload.insertUntilDenied(s, c, batch, maxDenyTimes = 2)
    assert(res.batchesInserted == 3)
    assert(res.denyTimes == 2)
    assert(res.entities == 120)
    val e = intercept[graft.store.QuotaExceededException](
      c.insert(s, batch(99)))
    assert(e.getMessage.contains("memory quota exceeded"))
    // clearing the quota property re-opens the collection for writes
    cat.alterCollectionProperties("q", Map("quota.rows" -> ""))
    c.insert(s, batch(50))
    assert(c.numEntities(s) == 160)
    // byte quota: 1-byte quota denies immediately once any delta exists
    val cb = cat.createCollection(CollectionDef("qb", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true)),
      properties = Map("quota.bytes" -> "1")))
    cb.insert(s, Seq(1L).toDF("id"))
    assert(cb.storageBytes >= 1)
    intercept[graft.store.QuotaExceededException](
      cb.insert(s, Seq(2L).toDF("id")))
  }
}
