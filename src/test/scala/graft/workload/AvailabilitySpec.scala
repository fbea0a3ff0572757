package graft.workload

import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

class AvailabilitySpec extends AnyFunSuite {

  private def sample(file: String, brick: String, status: String,
      start: String, end: String,
      metrics: Map[String, Double] = Map.empty): Availability.Sample =
    Availability.Sample(file, brick, status,
      Some(Instant.parse(start)), Some(Instant.parse(end)), metrics,
      Seq.empty)

  test("connectivity classification mirrors the reference patterns") {
    assert(Availability.isConnectivityTransient("rpc Deadline Exceeded"))
    assert(Availability.isConnectivityTransient("connection refused by peer"))
    assert(!Availability.isConnectivityTransient("schema mismatch on field x"))
  }

  test("stats: totals, success rate, failure span, impacted bricks") {
    val ok = sample("a.json", "search_pressure", "passed",
      "2026-01-01T00:00:00Z", "2026-01-01T00:10:00Z",
      Map("operations_total" -> 100.0))
    val bad = sample("b.json", "query_pressure", "passed",
      "2026-01-01T00:05:00Z", "2026-01-01T00:15:00Z",
      Map("operations_total" -> 50.0, "failed_query" -> 5.0))
    val crashed = sample("c.json", "upsert_pressure", "failed",
      "2026-01-01T00:20:00Z", "2026-01-01T00:25:00Z",
      Map("operations_total" -> 10.0, "requests_failed" -> 10.0))
    val st = Availability.stats(Seq(ok, bad, crashed))
    assert(st.operationsTotal == 160)
    assert(st.requestsFailed == 15)
    assert(st.operationsSucceeded == 145)
    assert(st.successRate.contains(0.90625))
    assert(st.failedSampleCount == 2)
    assert(st.impactedBricks == Seq("query_pressure", "upsert_pressure"))
    // failure span: earliest failing-sample start to latest end
    assert(st.firstFailureAt.contains(Instant.parse("2026-01-01T00:05:00Z")))
    assert(st.lastFailureAt.contains(Instant.parse("2026-01-01T00:25:00Z")))
    assert(st.failureSpanSec == 1200.0)
    assert(st.complete && st.calibrationEligible)
  }

  test("incomplete samples (no operations_total) block calibration") {
    val partial = sample("p.json", "count_pressure", "passed",
      "2026-01-01T00:00:00Z", "2026-01-01T00:01:00Z")
    val st = Availability.stats(Seq(partial))
    assert(st.incompleteSampleCount == 1)
    assert(!st.complete && !st.calibrationEligible)
    assert(st.successRate.isEmpty)
  }

  test("summary slices rollout windows from steady state") {
    val w = Availability.Window("upgrade-rollout",
      Instant.parse("2026-01-01T00:10:00Z"),
      Instant.parse("2026-01-01T00:20:00Z"))
    val ignored = Availability.Window("warmup",
      Instant.parse("2026-01-01T00:00:00Z"),
      Instant.parse("2026-01-01T23:00:00Z"))
    val before = sample("a.json", "search_pressure", "passed",
      "2026-01-01T00:00:00Z", "2026-01-01T00:05:00Z",
      Map("operations_total" -> 10.0))
    val during = sample("b.json", "search_pressure", "passed",
      "2026-01-01T00:12:00Z", "2026-01-01T00:18:00Z",
      Map("operations_total" -> 20.0, "failed_search" -> 2.0))
    val unstamped = Availability.syntheticSample("x.json", "query_pressure",
      "missing", "no result json")
    val sm = Availability.summary(Seq(before, during, unstamped), Seq(w, ignored))
    assert(sm.mode == "observational" && !sm.gateEnforced)
    assert(sm.unassignedSampleCount == 1)
    assert(sm.rolloutWindows.map(_._1.label) == Seq("upgrade-rollout"))
    val (_, ws) = sm.rolloutWindows.head
    assert(ws.sampleCount == 1 && ws.requestsFailed == 2)
    // steady state excludes the in-window sample AND the unstamped one
    assert(sm.steadyState.sampleCount == 1)
    assert(sm.steadyState.operationsTotal == 10)
    // overall counts everything, incl. the synthetic failure sample
    assert(sm.overall.sampleCount == 3)
    assert(sm.overall.failedSampleCount == 2)
  }

  test("result JSONs parse into samples; synthetic kinds carry failure types") {
    val r = BrickProtocol.BrickResult("search_pressure",
      BrickProtocol.BrickArgs(), "passed",
      Instant.parse("2026-01-01T00:00:00Z"),
      Instant.parse("2026-01-01T00:10:00Z"),
      Map("operations_total" -> 42.0, "failed_search" -> 1.0), Seq.empty)
    val s = Availability.parseSample("r.json", BrickProtocol.resultJson(r))
    assert(s.brick == "search_pressure" && s.status == "passed")
    assert(s.metrics("operations_total") == 42.0)
    assert(Availability.failedMetricCount(s) == 1)
    assert(s.startedAt.contains(Instant.parse("2026-01-01T00:00:00Z")))
    val pend = Availability.syntheticSample("p.json", "b", "pending", "m")
    assert(pend.status == "pending_result" &&
      pend.failures.head.ftype == "PRESSURE_ATTEMPT_PENDING")
    val unread = Availability.syntheticSample("u.json", "b", "unreadable", "m")
    assert(unread.failures.head.ftype == "PRESSURE_RESULT_UNREADABLE")
  }

  test("workflow report: gate verdict + result detail + markdown artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wr")
    def write(name: String, status: String, failures: Seq[String]): Unit = {
      val r = BrickProtocol.BrickResult(name, BrickProtocol.BrickArgs(),
        status, Instant.parse("2026-01-01T00:00:00Z"),
        Instant.parse("2026-01-01T00:05:00Z"),
        Map("operations_total" -> 10.0), failures)
      java.nio.file.Files.write(dir.resolve(s"$name.json"),
        BrickProtocol.resultJson(r).getBytes("UTF-8"))
    }
    write("validate_before_upgrade", "passed", Seq.empty)
    write("validate_after_upgrade", "failed", Seq("CHECKSUM_MISMATCH: drift"))
    // rollback requirements deliberately not written -> missing entries
    val cfg = Gates.GateConfig(rollbackEnabled = true)
    val avail = Availability.summary(Seq(
      sample("p.json", "search_pressure", "passed",
        "2026-01-01T00:00:00Z", "2026-01-01T00:05:00Z",
        Map("operations_total" -> 100.0, "failed_search" -> 1.0))),
      Seq.empty)
    val report = WorkflowReport.build(cfg, dir.toString, Some(avail),
      parameters = Map("scenario_id" -> "upgrade_rollback"))
    assert(report.status == "failed")
    assert(report.gate.missingValidations.contains("validate_after_rollback"))
    assert(report.results.exists(v =>
      v.name == "validate_after_upgrade" && v.status == "failed"))
    assert(report.results.exists(v =>
      v.name == "wait_rollback_serviceability" && v.status == "missing"))
    val md = WorkflowReport.markdown(report)
    assert(md.startsWith("# Workflow report — FAILED"))
    assert(md.contains("## Failed results"))
    assert(md.contains("validate_after_upgrade"))
    assert(md.contains("## Pressure availability"))
    assert(md.contains("0.990000")) // 99/100 overall success rate
    val jsonOut = dir.resolve("report/report.json").toString
    val mdOut = dir.resolve("report/report.md").toString
    WorkflowReport.write(report, jsonOut, mdOut)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(jsonOut)))
    val parsed = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(jsonOut))))
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    assert((parsed \ "status").extract[String] == "failed")
  }
}
