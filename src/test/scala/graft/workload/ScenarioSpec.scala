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
    // 5 pre + 13 per cycle + 2 post (9 reference scenario steps + the
    // 4 Argo-DAG index-compatibility / phase-DML-DQL validations)
    assert(plan.length == 5 + 2 * 13 + 2)
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
      "validate_index_compatibility_after_upgrade",
      "validate_phase_dml_dql_after_upgrade",
      "create_forward_schema_1", "seed_forward_data_1",
      "validate_forward_after_upgrade_1", "wait_rollback",
      "validate_index_compatibility_after_rollback",
      "validate_phase_dml_dql_after_rollback",
      "validate_after_rollback", "wait_rollback_serviceability",
      "final_validate_compat").foreach(n =>
      assert(names.contains(n), s"missing step $n in $names"))
    // no-op actions are recorded as skipped waits (reference :97-105)
    assert(out.steps.find(_.name == "wait_upgrade").get.status == "skipped")
    // the gate verdict over the written result JSONs passes — with the
    // FULL canonical validation set (index compatibility + phase
    // DML/DQL on both sides of the rollback) enabled
    assert(out.gate.status == "passed", out.gate.toString)
    assert(out.gate.validationPassed)
    assert(out.gate.missingValidations.isEmpty)
    // compat SEED data survived pressure + phase DML + validations
    // byte-identically (phase DML adds its own rows beyond the seeded
    // pk range, exactly like the reference's 50M/70M start ids)
    import org.apache.spark.sql.functions.col
    assert(cat.collection("scenario_compat").read(s)
      .filter(col("id") <= 199).count() == 200)
    // the phase-new collections from both phases exist and were seeded
    assert(cat.hasCollection("scenario_phase_new_1"))
    assert(cat.hasCollection("scenario_phase_rb_1"))
    // markdown renders with the passed headline
    assert(WorkflowReport.markdown(out.report)
      .startsWith("# Workflow report — PASSED"))
  }

  test("scenario runs end-to-end on a scheme-qualified Hadoop checkpoint root") {
    // checkpoint + results roots as file:// URIs: every brick
    // checkpoint, result JSON, and the gate's results-dir glob go
    // through the Hadoop FileSystem (CheckpointIO/StorePath), the
    // same path a cluster pointing at hdfs:// or s3a:// takes.
    val s = spark
    val root = Files.createTempDirectory("graft-scen3")
    val cat = new Catalog(root.resolve("cat").toString)
    val out = Scenario.execute(s, cat, Scenario.Manifest(
      rowsPerCollection = 100, batchSize = 100, pressureOpsPerSlice = 8),
      root.resolve("cp").toUri.toString,
      root.resolve("results").toUri.toString)
    assert(out.passed, out.steps.filterNot(st =>
      Set("passed", "skipped").contains(st.status)).toString)
    assert(out.gate.status == "passed")
    assert(out.gate.missingValidations.isEmpty)
    // the checkpoints + result JSONs actually landed under the URI roots
    assert(Files.exists(root.resolve("cp")
      .resolve("index_compatibility.json")))
    assert(Files.exists(root.resolve("results")
      .resolve("final_validate_compat.json")))
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
