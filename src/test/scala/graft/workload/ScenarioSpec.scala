package graft.workload

import graft.SparkSpec
import graft.store.Catalog

import java.nio.file.Files

class ScenarioSpec extends SparkSpec {

  test("plan mirrors the reference step sequence") {
    val plan = Scenario.buildPlan(Scenario.Manifest(cycles = 2))
    assert(plan.take(5).map(_.name) == Seq("precheck",
      "create_compat_schema", "seed_compat_data",
      "start_mixed_rw_pressure", "start_validator_loop"))
    assert(plan.count(_.name == "wait_upgrade") == 2)
    assert(plan.last.name == "final_validate_compat")
    // 5 pre + 9 per cycle + 2 post
    assert(plan.length == 5 + 2 * 9 + 2)
  }

  test("full scenario run: all steps pass, gate verdict passes, report written") {
    val s = spark
    val root = Files.createTempDirectory("graft-scen")
    val cat = new Catalog(root.resolve("cat").toString)
    val out = Scenario.execute(s, cat, Scenario.Manifest(
      rowsPerCollection = 200, batchSize = 100, pressureOpsPerSlice = 12),
      root.resolve("cp").toString, root.resolve("results").toString)
    assert(out.passed, out.steps.filterNot(st =>
      Set("passed", "skipped").contains(st.status)).toString)
    // canonical step set present
    val names = out.steps.map(_.name)
    Seq("precheck", "create_compat_schema", "seed_compat_data",
      "validate_before_upgrade", "mixed_rw_pressure_loop_1",
      "validate_compat_loop_1", "wait_upgrade", "validate_after_upgrade",
      "create_forward_schema_1", "seed_forward_data_1",
      "validate_forward_after_upgrade_1", "wait_rollback",
      "validate_after_rollback", "wait_rollback_serviceability",
      "final_validate_compat").foreach(n =>
      assert(names.contains(n), s"missing step $n in $names"))
    // no-op actions are recorded as skipped waits (reference :97-105)
    assert(out.steps.find(_.name == "wait_upgrade").get.status == "skipped")
    // the gate verdict over the written result JSONs passes
    assert(out.gate.status == "passed", out.gate.toString)
    assert(out.gate.validationPassed)
    assert(out.gate.missingValidations.isEmpty)
    // compat data survived pressure + validations byte-identically
    assert(cat.collection("scenario_compat").numEntities(s) == 200)
    // markdown renders with the passed headline
    assert(WorkflowReport.markdown(out.report)
      .startsWith("# Workflow report — PASSED"))
  }

  test("a failing upgrade hook fails the scenario and the gate sees it") {
    val s = spark
    val root = Files.createTempDirectory("graft-scen2")
    val cat = new Catalog(root.resolve("cat").toString)
    val out = Scenario.execute(s, cat, Scenario.Manifest(
      rowsPerCollection = 100, batchSize = 100, pressureOpsPerSlice = 8),
      root.resolve("cp").toString, root.resolve("results").toString,
      onUpgrade = _ => {
        // the "upgrade" corrupts the compat collection -> validations fail
        cat.collection("scenario_compat").delete(s, "id >= 0"): Unit
      },
      hasUpgradeAction = true)
    assert(!out.passed)
    assert(out.steps.find(_.name == "validate_after_upgrade")
      .get.status == "failed")
    assert(out.gate.status == "failed")
  }
}
