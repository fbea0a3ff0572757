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
}
