package graft.workload

import org.scalatest.funsuite.AnyFunSuite

class GatesSpec extends AnyFunSuite {

  private val manifestYaml =
    """version: "1"
      |defaults:
      |  rows_per_collection: 5000
      |  index_compatibility_validation_enabled: true
      |  phase_dml_dql_validation_enabled: true
      |workflow_templates:
      |  standalone: engine-standalone-upgrade-rollback
      |deploy_profiles:
      |  standalone: profiles/standalone.yaml
      |schema_matrices:
      |  "2.6": matrices/matrix_2_6.yaml
      |  "3.0": matrices/matrix_3_0.yaml
      |image_aliases:
      |  base-2-6:
      |    image: registry.example.com/engine:v2.6.18
      |    version: "2.6.18"
      |  target-3-0:
      |    image: registry.example.com/engine:v3.0.0@sha256:49371c30af46b1013e4d3e0b980e691d81376d69cdbe1b372725baf1d7255862
      |    version: "3.0.0"
      |  rollback-2-6-latest:
      |    image: registry.example.com/engine:2.6-latest-placeholder
      |    version: "2.6.0"
      |scenarios:
      |  - id: up-down-gate
      |    mode: standalone
      |    classification: gate
      |    support_status: supported
      |    collection_prefix: qa_gate_updown
      |    workflow_template_ref: standalone
      |    deploy_profile_ref: standalone
      |    schema_matrix_ref: "2.6"
      |    forward_workload_enabled: false
      |    forbidden_after_upgrade: [storage_v3, vortex]
      |    base:
      |      image_ref: base-2-6
      |      loon_ffi_enabled: false
      |    target:
      |      image_ref: target-3-0
      |      loon_ffi_enabled: false
      |      vortex_enabled: false
      |    rollback:
      |      image_ref: rollback-2-6-latest
      |      vortex_enabled: false
      |""".stripMargin

  test("version helpers mirror common/version.py") {
    assert(Gates.versionFamily("v2.6.18") == "2.6")
    assert(Gates.versionFamily("3.0.0-rc1") == "3.0")
    intercept[IllegalArgumentException](Gates.versionFamily("latest"))
    assert(Gates.imageVersionFamily("r.io/engine:v2.6.18").contains("2.6"))
    assert(Gates.imageVersionFamily("r.io/engine:nightly").isEmpty)
    assert(Gates.imageVersionFamily("engine").isEmpty)
    // digest always immutable; mutable tokens/tags are not
    assert(Gates.imageIsImmutable(
      "r.io/e:x@sha256:" + "0" * 64))
    assert(Gates.imageIsImmutable("r.io/engine:v2.6.18"))
    assert(!Gates.imageIsImmutable("r.io/engine:2.6-latest-placeholder"))
    assert(!Gates.imageIsImmutable("r.io/engine:main"))
    assert(!Gates.imageIsImmutable("engine"))
  }

  test("manifest parses, validates, and resolves refs/aliases") {
    val m = Gates.parseManifest(manifestYaml)
    val s = Gates.resolveScenario(m, "up-down-gate")
    assert(s.workflowTemplate == "engine-standalone-upgrade-rollback")
    assert(s.deployProfile == "profiles/standalone.yaml")
    assert(s.schemaMatrix == "matrices/matrix_2_6.yaml")
    assert(s.forwardSchemaMatrix == s.schemaMatrix, "defaults to schema_matrix")
    assert(s.base.version == "2.6.18" && s.base.family == "2.6")
    assert(s.target.family == "3.0")
    assert(s.config.rollbackEnabled && !s.config.forwardWorkloadEnabled)
    intercept[IllegalArgumentException](Gates.resolveScenario(m, "nope"))
    // manifest-level validation failures
    intercept[IllegalArgumentException](
      Gates.parseManifest(manifestYaml.replace("version: \"1\"", "version: \"2\"")))
    intercept[IllegalArgumentException](
      Gates.parseManifest(manifestYaml.replace(
        "forward_workload_enabled: false", "forward_workload_enabled: nope")))
    intercept[IllegalArgumentException]( // undefined image alias
      Gates.parseManifest(manifestYaml.replace("image_ref: base-2-6",
        "image_ref: missing-alias")))
    intercept[IllegalArgumentException]( // 2.6->3.0->2.6 gate flag rule
      Gates.parseManifest(manifestYaml.replace(
        "  vortex_enabled: false\n    rollback:",
        "  vortex_enabled: true\n    rollback:")))
  }

  test("phase overrides: gate images must be immutable, versions stay in family") {
    val m = Gates.parseManifest(manifestYaml)
    val s = Gates.resolveScenario(m, "up-down-gate",
      Map("rollback" -> Map(
        "image" -> "registry.example.com/engine:v2.6.19",
        "version" -> "2.6.19")))
    assert(s.rollback.version == "2.6.19")
    intercept[IllegalArgumentException]( // mutable override on a gate
      Gates.resolveScenario(m, "up-down-gate",
        Map("rollback" -> Map("image" -> "r.io/engine:latest"))))
    intercept[IllegalArgumentException]( // family change
      Gates.resolveScenario(m, "up-down-gate",
        Map("rollback" -> Map("version" -> "3.0.1"))))
    intercept[IllegalArgumentException]( // unknown phase
      Gates.resolveScenario(m, "up-down-gate",
        Map("sideways" -> Map("version" -> "2.6.19"))))
    // placeholder check: the UNOVERRIDDEN scenario's rollback image is
    // a placeholder tag
    val placeheld = Gates.resolveScenario(
      Gates.parseManifest(manifestYaml), "up-down-gate")
    intercept[IllegalArgumentException](
      Gates.validateNoPlaceholders(placeheld))
    Gates.validateNoPlaceholders(placeheld, allowPlaceholder = true)
  }

  test("required validation names follow the config toggles") {
    val all = Gates.requiredValidationNames(Gates.GateConfig(
      forwardWorkloadEnabled = true, rollbackEnabled = true,
      rollbackForwardValidationEnabled = true))
    assert(all == Seq(
      "validate_before_upgrade", "validate_after_upgrade",
      "validate_forward_after_upgrade", "validate_forward_indexes_after_upgrade",
      "validate_index_compatibility_after_upgrade",
      "validate_phase_dml_dql_after_upgrade",
      "validate_after_rollback",
      "validate_index_compatibility_after_rollback",
      "validate_phase_dml_dql_after_rollback",
      "validate_forward_after_rollback",
      "validate_forward_indexes_after_rollback"))
    val noRb = Gates.requiredValidationNames(
      Gates.GateConfig(rollbackEnabled = false))
    assert(noRb == Seq("validate_before_upgrade", "validate_after_upgrade"))
    assert(Gates.requiredServiceabilityNames(
      Gates.GateConfig(rollbackEnabled = false)).isEmpty)
    assert(Gates.requiredServiceabilityNames(Gates.GateConfig()) ==
      Seq("wait_rollback_serviceability"))
  }

  test("forward rollback safety: non-rollback_safe schemas block downgrades") {
    import graft.store.{CollectionDef, FieldDef, SchemaMatrix}
    import org.apache.spark.sql.types.LongType
    def entry(name: String, mode: String) = SchemaMatrix.MatrixEntry(
      CollectionDef(name, Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true))),
      Seq.empty, mode, Seq.empty, Seq.empty)
    val m30 = SchemaMatrix.Matrix("3.0",
      Seq(entry("safe", "rollback_safe"), entry("fwd", "forward_only")))
    // rolling back to 2.6: the forward_only 3.0 schema is incompatible
    assert(SchemaMatrix.rollbackIncompatible(m30, "2.6.4")
      .map(_.collection.name) == Seq("fwd"))
    // rolling back within 3.0: fine
    assert(SchemaMatrix.rollbackIncompatible(m30, "3.0.1").isEmpty)
    // unparseable versions are conservatively incompatible
    assert(SchemaMatrix.rollbackIncompatible(m30, "latest")
      .map(_.collection.name) == Seq("fwd"))
    // wired into the resolved-scenario validation
    val manifest = Gates.parseManifest(manifestYaml
      .replace("forward_workload_enabled: false",
        "forward_workload_enabled: true\n    rollback_forward_validation_enabled: true"))
    val sc = Gates.resolveScenario(manifest, "up-down-gate")
    intercept[IllegalArgumentException](
      Gates.validateForwardRollback(sc, m30)) // rollback is 2.6
    Gates.validateForwardRollback(sc,
      SchemaMatrix.Matrix("2.6", Seq(entry("fwd", "forward_only"))))
  }

  test("gate verdict: missing/failed results fail; skipped passes; pressure warns") {
    val c = Gates.GateConfig()
    val complete = (Gates.requiredValidationNames(c) ++
      Gates.requiredServiceabilityNames(c)).map(_ -> "passed").toMap
    assert(Gates.evaluate(c, complete).status == "passed")
    // skipped (capability skip) is not a failure
    assert(Gates.evaluate(c,
      complete + ("validate_after_rollback" -> "skipped")).status == "passed")
    // a failed brick fails the gate
    val failedRun = Gates.evaluate(c,
      complete + ("validate_after_upgrade" -> "failed"))
    assert(failedRun.status == "failed")
    assert(failedRun.failedResults.contains("validate_after_upgrade"))
    // a missing required validation is injected and fails the gate
    val missingRun = Gates.evaluate(c, complete - "validate_after_rollback")
    assert(missingRun.status == "failed")
    assert(missingRun.missingValidations == Seq("validate_after_rollback"))
    // pressure failures: fail-on-error fails, otherwise warning
    assert(Gates.evaluate(c, complete, pressureFailed = 2).status == "failed")
    assert(Gates.evaluate(c, complete, pressureFailed = 2,
      pressureFailOnError = false).status == "warning")
  }

  test("evaluate from a results directory of brick JSONs") {
    val c = Gates.GateConfig()
    val dir = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val names = Gates.requiredValidationNames(c) ++
      Gates.requiredServiceabilityNames(c)
    names.foreach { n =>
      val args = BrickProtocol.BrickArgs(
        outputJson = Some(s"$dir/$n.json"))
      BrickProtocol.writeResult(BrickProtocol.BrickResult(
        n, args, "passed", java.time.Instant.now(), java.time.Instant.now(),
        Map.empty, Seq.empty))
    }
    assert(Gates.evaluateResultsDir(c, dir).status == "passed")
    // corrupt one file -> unreadable -> failed
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "validate_after_upgrade.json"),
      "not json".getBytes)
    val r = Gates.evaluateResultsDir(c, dir)
    assert(r.status == "failed")
    assert(r.failedResults("validate_after_upgrade") == "unreadable")
  }
}
