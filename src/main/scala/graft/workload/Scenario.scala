package graft.workload

import graft.store.{Catalog, Collection, CollectionDef, FieldDef, IndexDef}
import graft.validate.Validators.ValidationReport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType}

import java.time.Instant

/** Upgrade/rollback compatibility scenario runner
  * (scenarios/upgrade_rollback_compatibility.py): the end-to-end
  * composition of precheck → schema create → seed → integrity
  * validation → background pressure/validator slices → per-cycle
  * upgrade/rollback actions with post-phase validations → final
  * validation, each step writing a brick result JSON into a results
  * directory the gate verdict and workflow report evaluate.
  *
  * Differences from the subprocess reference, by design:
  *  - steps run in-process against the engine (no subprocess bricks);
  *  - upgrade/rollback are caller-provided hooks (the reference waits
  *    on files an external operator touches — wait_for_action,
  *    :97-105; an empty action is recorded as skipped, same as there);
  *  - background loops run a BOUNDED number of deterministic slices
  *    between phases instead of wall-clock threads, and pressure
  *    targets its own collection so the integrity checksum of the
  *    compat collection stays byte-stable across the scenario.
  */
object Scenario {

  final case class Manifest(
      name: String = "upgrade_rollback_compatibility",
      cycles: Int = 1,
      rowsPerCollection: Int = 1000,
      batchSize: Int = 100,
      forwardEnabled: Boolean = true,
      failOnBackgroundFailure: Boolean = true,
      pressureOpsPerSlice: Int = 20,
      observeAfterUpgradeSec: Int = 0,
      observeAfterRollbackSec: Int = 0,
      // validate_phase_dml_dql sizing (the Argo template's
      // phase-existing-dml-rows / phase-existing-delete-rows /
      // phase-new-collection-rows parameters).
      phaseDmlRows: Int = 100,
      phaseDeleteRows: Int = 10,
      phaseNewRows: Int = 50)

  final case class PlanStep(name: String, phase: String, cycle: Int = 0)

  /** Mirrors build_plan (:21-47): the declared step sequence. */
  def buildPlan(m: Manifest): Seq[PlanStep] = {
    val pre = Seq(
      PlanStep("precheck", "before_upgrade"),
      PlanStep("create_compat_schema", "before_upgrade"),
      PlanStep("seed_compat_data", "before_upgrade"),
      PlanStep("start_mixed_rw_pressure", "before_upgrade"),
      PlanStep("start_validator_loop", "before_upgrade"))
    val cycles = (1 to m.cycles).flatMap { c =>
      Seq(
        PlanStep("wait_upgrade", "before_upgrade", c),
        PlanStep("observe_after_upgrade", "after_upgrade", c),
        PlanStep("validate_compat_after_upgrade", "after_upgrade", c),
        // The Argo DAG's post-upgrade validation chain
        // (standalone-2-6-upgrade-rollback.yaml:396-419):
        // validate-after-upgrade → index compatibility → phase DML/DQL.
        PlanStep("validate_index_compatibility_after_upgrade", "after_upgrade", c),
        PlanStep("validate_phase_dml_dql_after_upgrade", "after_upgrade", c),
        PlanStep("create_forward_schema", "after_upgrade", c),
        PlanStep("seed_forward_data", "after_upgrade", c),
        PlanStep("validate_forward_after_upgrade", "after_upgrade", c),
        PlanStep("wait_rollback", "before_rollback", c),
        PlanStep("observe_after_rollback", "after_rollback", c),
        // Post-rollback chain (yaml:739-764): index compatibility →
        // phase DML/DQL → validate-after-rollback.
        PlanStep("validate_index_compatibility_after_rollback", "after_rollback", c),
        PlanStep("validate_phase_dml_dql_after_rollback", "after_rollback", c),
        PlanStep("validate_compat_only", "after_rollback", c))
    }
    pre ++ cycles ++ Seq(
      PlanStep("stop_background_workloads", "steady_state"),
      PlanStep("final_validate_compat", "steady_state"))
  }

  final case class StepResult(name: String, phase: String, status: String,
      background: Option[String] = None)

  final case class Outcome(passed: Boolean, steps: Seq[StepResult],
      gate: Gates.GateReport, report: WorkflowReport.Report)

  // The compat collection declares a scalar index AND an indexed
  // vector field so the index-compatibility brick exercises both probe
  // legs — scalar point filter and vector self-search — inside every
  // scenario run (the reference's schema matrices always index a
  // vector plus at least one scalar). FLAT routes to the exact scan,
  // so the scenario pays no index-build cost for the fidelity.
  private def compatSchema(name: String) = CollectionDef(name, Seq(
    FieldDef("id", LongType, nullable = false, isPrimary = true),
    FieldDef("category", LongType),
    FieldDef("content", StringType),
    FieldDef("version", LongType),
    FieldDef("embedding", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType), dim = Some(4))),
    indexes = Seq(IndexDef("category", "INVERTED"),
      IndexDef("embedding", "FLAT", Some("L2"))))

  /** Deterministic per-id vector for the compat schema's probe leg. */
  private[workload] def compatVec(id: Long): Array[Float] =
    Array((id % 7).toFloat, (id % 11).toFloat, (id % 13).toFloat, 1f)

  /** Run the scenario. Upgrade/rollback hooks default to no-ops
    * (recorded as skipped waits, the reference's empty-action path).
    */
  def execute(
      spark: SparkSession,
      catalog: Catalog,
      m: Manifest,
      checkpointDir: String,
      resultsDir: String,
      onUpgrade: Int => Unit = _ => (),
      onRollback: Int => Unit = _ => (),
      hasUpgradeAction: Boolean = false,
      hasRollbackAction: Boolean = false): Outcome = {
    CheckpointIO.mkdirs(resultsDir)
    val args = BrickProtocol.BrickArgs(
      collectionPrefix = "scenario",
      checkpointDir = Some(checkpointDir))
    val steps = Seq.newBuilder[StepResult]

    def writeStep(name: String, phase: String, r: BrickProtocol.BrickResult,
        background: Option[String] = None): StepResult = {
      val named = r.copy(brick = name,
        args = r.args.copy(lifecyclePhase = phase,
          outputJson = Some(s"$resultsDir/$name.json")))
      BrickProtocol.writeResult(named)
      val st = StepResult(name, phase, named.status, background)
      steps += st
      st
    }

    def runStep(name: String, phase: String,
        background: Option[String] = None)(body: => ValidationReport): StepResult = {
      val started = Instant.now()
      val result =
        try BrickProtocol.fromReport(name, args, started, body)
        catch {
          case e: Exception => BrickProtocol.BrickResult(name, args,
            status = "failed", startedAt = started,
            finishedAt = Instant.now(), metrics = Map.empty,
            failures = Seq(s"STEP_EXCEPTION: ${e.getMessage}"))
        }
      writeStep(name, phase, result, background)
    }

    def waitAction(name: String, has: Boolean, act: => Unit): StepResult = {
      val started = Instant.now()
      val status = if (has) { act; "passed" } else "skipped"
      writeStep(s"wait_$name", "before_" +
        (if (name.startsWith("upgrade")) "upgrade" else "rollback"),
        BrickProtocol.BrickResult(s"wait_$name", args, status,
          started, Instant.now(), Map.empty, Seq.empty,
          skipReason = if (has) None else Some("no action configured")))
    }

    def ok(report: Boolean, msg: String) = ValidationReport(
      passed = report, metrics = Map.empty,
      failures = if (report) Seq.empty else Seq(msg))

    // --- before_upgrade ---------------------------------------------------
    writeStep("precheck", "before_upgrade",
      BrickProtocol.precheck(catalog, args))
    val compatName = s"${args.collectionPrefix}_compat"
    runStep("create_compat_schema", "before_upgrade") {
      if (catalog.hasCollection(compatName)) catalog.dropCollection(compatName)
      catalog.createCollection(compatSchema(compatName))
      ok(catalog.hasCollection(compatName), "CREATE_FAILED")
    }
    val compat = catalog.collection(compatName)
    // Serve the compat collection LOADED for the whole scenario (the
    // reference keeps validated collections loaded between bricks):
    // every seed-checkpoint/validator/probe read hits the cached
    // snapshot — refreshed lazily in place by the DML writes — instead
    // of re-merging the delta chain per job.
    compat.load(spark)
    runStep("seed_compat_data", "before_upgrade") {
      seed(spark, compat, 0L, m.rowsPerCollection, m.batchSize)
      DataIntegrity.seedCheckpoint(spark, compat, checkpointDir)
      ok(compat.numEntities(spark) == m.rowsPerCollection, "SEED_SHORT")
    }
    runStep("validate_before_upgrade", "before_upgrade") {
      DataIntegrity.validate(spark, compat, checkpointDir)
    }
    if (steps.result().exists(s =>
      !Set("passed", "skipped").contains(s.status)))
      return finish(m, steps.result(), resultsDir)

    // --- background slices (bounded, deterministic; :122-183) -------------
    val pressureName = s"${args.collectionPrefix}_pressure"
    if (!catalog.hasCollection(pressureName))
      catalog.createCollection(compatSchema(pressureName)): Unit
    val pressure = catalog.collection(pressureName)
    def backgroundSlice(iteration: Int): Unit = {
      val started = Instant.now()
      val pr = Workload.runPressure(spark, pressure,
        Seq("insert", "upsert", "query", "count"),
        numOps = m.pressureOpsPerSlice, concurrency = 4,
        seed = 42L + iteration)
      writeStep(s"mixed_rw_pressure_loop_$iteration", "steady_state",
        BrickProtocol.BrickResult(s"mixed_rw_pressure_loop_$iteration",
          args,
          status = if (pr.stats("failed") == 0.0) "passed" else "failed",
          startedAt = started, finishedAt = Instant.now(),
          metrics = Map(
            "operations_total" -> pr.stats("total"),
            "requests_failed" -> pr.stats("failed")),
          failures = pr.errors.take(5)),
        background = Some("mixed_rw_pressure")): Unit
      runStep(s"validate_compat_loop_$iteration", "steady_state",
        background = Some("validator")) {
        DataIntegrity.validate(spark, compat, checkpointDir)
      }: Unit
    }
    backgroundSlice(1)

    // --- cycles -----------------------------------------------------------
    (1 to m.cycles).foreach { cycle =>
      waitAction(if (cycle == 1) "upgrade" else s"upgrade_$cycle",
        hasUpgradeAction, onUpgrade(cycle))
      if (m.observeAfterUpgradeSec > 0)
        Thread.sleep(m.observeAfterUpgradeSec * 1000L)
      runStep(
        if (cycle == 1) "validate_after_upgrade"
        else s"validate_after_upgrade_$cycle", "after_upgrade") {
        DataIntegrity.validate(spark, compat, checkpointDir)
      }
      // Post-upgrade validation chain (Argo DAG order,
      // standalone-2-6-upgrade-rollback.yaml:396-419): record the
      // actual index metadata + prove every index serves, then the
      // phase's own DML/DQL cycle (which persists the phase
      // checkpoint the rollback side re-validates).
      def suffixed(base: String) =
        if (cycle == 1) base else s"${base}_$cycle"
      writeStep(suffixed("validate_index_compatibility_after_upgrade"),
        "after_upgrade",
        IndexCompat.run(spark, catalog, Seq(compatName), checkpointDir,
          phase = "after-upgrade", args = args,
          probeVec = (_, id) => Some(compatVec(id).toSeq)))
      val phaseNewName = s"${args.collectionPrefix}_phase_new_$cycle"
      writeStep(suffixed("validate_phase_dml_dql_after_upgrade"),
        "after_upgrade",
        PhaseDmlDql.run(spark, catalog,
          existing = Seq(compatName),
          newCollectionNames = Seq(phaseNewName),
          defFor = compatSchema, gen = PhaseDmlDql.compatRowGen,
          rows = m.phaseDmlRows, deleteRows = m.phaseDeleteRows,
          newRows = m.phaseNewRows, batchSize = m.batchSize,
          existingStartId = 5000000L + (cycle - 1) * 1000000L,
          newStartId = 6000000L + (cycle - 1) * 1000000L,
          seed = 42L + cycle, phase = "after-upgrade",
          checkpointDir = checkpointDir, args = args))
      if (m.forwardEnabled) {
        val fwdName = s"${args.collectionPrefix}_forward_$cycle"
        val fwdCp = s"$checkpointDir/forward_cycle_$cycle"
        runStep(s"create_forward_schema_$cycle", "after_upgrade") {
          if (catalog.hasCollection(fwdName)) catalog.dropCollection(fwdName)
          catalog.createCollection(compatSchema(fwdName))
          ok(catalog.hasCollection(fwdName), "CREATE_FAILED")
        }
        val fwd = catalog.collection(fwdName)
        fwd.load(spark) // same loaded-serving discipline as compat
        runStep(s"seed_forward_data_$cycle", "after_upgrade") {
          seed(spark, fwd, cycle * 1000000L, m.rowsPerCollection, m.batchSize)
          DataIntegrity.seedCheckpoint(spark, fwd, fwdCp)
          ok(fwd.numEntities(spark) == m.rowsPerCollection, "SEED_SHORT")
        }
        runStep(s"validate_forward_after_upgrade_$cycle", "after_upgrade") {
          DataIntegrity.validate(spark, fwd, fwdCp)
        }
      }
      waitAction(if (cycle == 1) "rollback" else s"rollback_$cycle",
        hasRollbackAction, onRollback(cycle))
      if (m.observeAfterRollbackSec > 0)
        Thread.sleep(m.observeAfterRollbackSec * 1000L)
      // Post-rollback chain (yaml:739-764): index metadata must still
      // match the after-upgrade checkpoint, the phase checkpoint state
      // must have survived, and the rollback phase runs its own fresh
      // DML/DQL cycle (including a carried pass over the collection
      // the upgrade phase created).
      writeStep(suffixed("validate_index_compatibility_after_rollback"),
        "after_rollback",
        IndexCompat.run(spark, catalog, Seq(compatName), checkpointDir,
          phase = "after-rollback", args = args,
          probeVec = (_, id) => Some(compatVec(id).toSeq)))
      writeStep(suffixed("validate_phase_dml_dql_after_rollback"),
        "after_rollback",
        PhaseDmlDql.run(spark, catalog,
          existing = Seq(compatName),
          newCollectionNames = Seq(s"${args.collectionPrefix}_phase_rb_$cycle"),
          defFor = compatSchema, gen = PhaseDmlDql.compatRowGen,
          rows = m.phaseDmlRows, deleteRows = m.phaseDeleteRows,
          newRows = m.phaseNewRows, batchSize = m.batchSize,
          existingStartId = 7000000L + (cycle - 1) * 1000000L,
          newStartId = 8000000L + (cycle - 1) * 1000000L,
          seed = 42L + cycle, phase = "after-rollback",
          carried = Seq(phaseNewName),
          checkpointDir = checkpointDir, args = args))
      runStep(
        if (cycle == 1) "validate_after_rollback"
        else s"validate_after_rollback_$cycle", "after_rollback") {
        DataIntegrity.validate(spark, compat, checkpointDir)
      }
      // Post-rollback serviceability wait — the wait_* result the gate
      // verdict requires (wait_data_serviceability protocol).
      val wait = DataIntegrity.waitServiceability(spark, compat,
        checkpointDir, args, timeoutSec = 60)
      writeStep(
        if (cycle == 1) "wait_rollback_serviceability"
        else s"wait_rollback_serviceability_$cycle", "after_rollback", wait)
      backgroundSlice(cycle + 1)
    }

    runStep("final_validate_compat", "steady_state") {
      DataIntegrity.validate(spark, compat, checkpointDir)
    }
    finish(m, steps.result(), resultsDir)
  }

  private def seed(spark: SparkSession, coll: Collection, startId: Long,
      rows: Int, batchSize: Int): Unit = {
    import spark.implicits._
    (0 until rows by batchSize).foreach { off =>
      val n = math.min(batchSize, rows - off)
      coll.insert(spark, (0 until n).map { i =>
        val id = startId + off + i
        (id, id % 100, s"seed_$id", 0L, compatVec(id))
      }.toDF("id", "category", "content", "version", "embedding")): Unit
    }
  }

  private def finish(m: Manifest, steps: Seq[StepResult],
      resultsDir: String): Outcome = {
    val required =
      if (m.failOnBackgroundFailure) steps
      else steps.filter(_.background.isEmpty)
    val passed = required.forall(s =>
      Set("passed", "skipped").contains(s.status))
    // Gate verdict + workflow report over the results dir the steps
    // populated (rollback always exercised; forward validations are
    // scenario-internal, so the gate checks the canonical set —
    // including, as of the full brick set, index compatibility and
    // phase DML/DQL on both sides of the rollback).
    val cfg = Gates.GateConfig(
      forwardWorkloadEnabled = false,
      rollbackEnabled = true,
      indexCompatibilityValidationEnabled = true,
      phaseDmlDqlValidationEnabled = true)
    val report = WorkflowReport.build(cfg, resultsDir,
      parameters = Map("scenario_id" -> m.name,
        "cycles" -> m.cycles.toString))
    Outcome(passed, steps, report.gate, report)
  }
}
