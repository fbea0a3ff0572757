package graft.workload

import graft.validate.Validators.ValidationReport
import org.json4s.JsonDSL._
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** The brick result/checkpoint protocol (reference
  * docs/plans/2026-07-07-milvus-client-bricks-expansion.md:100-133 and
  * common/args.py:29-42): a unified result JSON per brick run and
  * phase checkpoints persisted between engine restarts
  * (validate_phase_dml_dql.py:775-957).
  */
object BrickProtocol {

  /** The common brick argument set (common/args.py:29-42). */
  final case class BrickArgs(
      uri: String = "local",
      dbName: String = "default",
      collectionPrefix: String = "qa_brick",
      durationSec: Int = 60,
      seed: Long = 42L,
      featureSet: String = "compat_2_6",
      compatMode: String = "rollback_safe",
      lifecyclePhase: String = "steady_state",
      capabilityProbe: Boolean = true,   // --capability-probe
      skipUnsupported: Boolean = true,   // --skip-unsupported
      checkpointDir: Option[String] = None,
      outputJson: Option[String] = None)

  final case class BrickResult(
      brick: String,
      args: BrickArgs,
      status: String, // passed | failed | skipped
      startedAt: Instant,
      finishedAt: Instant,
      metrics: Map[String, Double],
      failures: Seq[String],
      skipReason: Option[String] = None,
      checkpointPath: Option[String] = None,
      capabilities: Option[Capability.Evaluation] = None)

  /** Run a brick behind the capability gate (the reference's
    * probe -> supported/unsupported -> skip-not-fail protocol,
    * common/capability.py + requests/create_schema_matrix.py:98-113):
    * with `--capability-probe`, required capabilities are evaluated
    * first; any unsupported one yields a `skipped` result (with the
    * evaluation attached) when `--skip-unsupported`, instead of
    * running the brick to a failure.
    */
  def gated(brick: String, args: BrickArgs, required: Seq[String])
      (run: => BrickResult): BrickResult = {
    if (!args.capabilityProbe) run
    else {
      val ev = Capability.evaluate(required)
      if (ev.unsupported.nonEmpty && args.skipUnsupported) {
        val now = Instant.now()
        BrickResult(brick, args, status = "skipped",
          startedAt = now, finishedAt = now,
          metrics = Map.empty, failures = Seq.empty,
          skipReason = Some(
            s"unsupported capabilities: ${ev.unsupported.mkString(", ")}"),
          capabilities = Some(ev))
      } else run.copy(capabilities = Some(ev))
    }
  }

  def fromReport(brick: String, args: BrickArgs, started: Instant,
      report: ValidationReport): BrickResult =
    BrickResult(brick, args,
      status = if (report.passed) "passed" else "failed",
      startedAt = started, finishedAt = Instant.now(),
      metrics = report.metrics, failures = report.failures)

  /** Connection precheck (requests/precheck.py): list collections,
    * probe the engine version, and fail on a version-FAMILY mismatch
    * against the expected phase version — the first brick every gate
    * workflow runs per phase.
    */
  def precheck(catalog: graft.store.Catalog, args: BrickArgs,
      expectedServerVersion: String = ""): BrickResult = {
    val started = Instant.now()
    val collections = catalog.listCollections()
    val family = Gates.versionFamily(Capability.engineVersion)
    val failures =
      if (expectedServerVersion.isEmpty) Seq.empty
      else {
        val expected = Gates.versionFamily(expectedServerVersion)
        if (expected != family)
          Seq(s"SERVER_VERSION_MISMATCH: expected family $expected, " +
            s"actual $family (version ${Capability.engineVersion})")
        else Seq.empty
      }
    BrickResult("precheck", args,
      status = if (failures.isEmpty) "passed" else "failed",
      startedAt = started, finishedAt = Instant.now(),
      metrics = Map("collections_total" -> collections.size.toDouble),
      failures = failures,
      capabilities = Some(Capability.evaluate(Seq.empty)))
  }

  private val iso = DateTimeFormatter.ISO_OFFSET_DATE_TIME.withZone(ZoneOffset.UTC)

  /** Render the unified result JSON (same field set as the spec). */
  def resultJson(r: BrickResult): String = {
    val json: JObject =
      ("brick" -> r.brick) ~
      ("feature_set" -> r.args.featureSet) ~
      ("compat_mode" -> r.args.compatMode) ~
      ("lifecycle_phase" -> r.args.lifecyclePhase) ~
      ("status" -> r.status) ~
      ("started_at" -> iso.format(r.startedAt)) ~
      ("finished_at" -> iso.format(r.finishedAt)) ~
      ("target" ->
        (("uri" -> r.args.uri) ~
         ("db_name" -> r.args.dbName) ~
         ("collection_prefix" -> r.args.collectionPrefix))) ~
      ("metrics" -> r.metrics.map { case (k, v) =>
        k -> (if (v == v.floor && !v.isInfinite) JLong(v.toLong) else JDouble(v))
      }) ~
      ("failures" -> r.failures) ~
      ("capabilities" ->
        (("server_version" ->
           r.capabilities.map(_.serverVersion).getOrElse(Capability.engineVersion)) ~
         ("sdk_version" -> "graft-0.1") ~
         ("supported" -> r.capabilities.map(_.supported).getOrElse(Seq.empty)) ~
         ("unsupported" -> r.capabilities.map(_.unsupported).getOrElse(Seq.empty)))) ~
      ("skip_reason" -> r.skipReason) ~
      ("artifacts" -> Seq.empty[String]) ~
      ("checkpoint" -> r.checkpointPath.map(p =>
        (("path" -> p) ~ ("version" -> 1)): JObject))
    JsonMethods.pretty(JsonMethods.render(json))
  }

  /** Write the result JSON to `args.outputJson` (atomic). */
  def writeResult(r: BrickResult): Unit =
    r.args.outputJson.foreach { out =>
      CheckpointIO.writeAtomic(out, resultJson(r))
    }

  /** Phase checkpoint (validate_phase_dml_dql.py:775-796): arbitrary
    * string→value state persisted under `<dir>/<phase>.json`, read back
    * after an engine restart for cross-phase validation.
    */
  def writePhaseCheckpoint(dir: String, phase: String,
      state: Map[String, String]): String = {
    val path = CheckpointIO.resolve(dir, s"$phase.json")
    val json: JObject = ("phase" -> phase) ~ ("version" -> 1) ~ ("state" -> state)
    CheckpointIO.writeAtomic(path, JsonMethods.pretty(JsonMethods.render(json)))
    path
  }

  def readPhaseCheckpoint(dir: String, phase: String): Map[String, String] = {
    implicit val fmt: Formats = DefaultFormats
    val path = CheckpointIO.resolve(dir, s"$phase.json")
    require(CheckpointIO.exists(path), s"no checkpoint for phase $phase in $dir")
    val j = JsonMethods.parse(CheckpointIO.readString(path))
    (j \ "state").extract[Map[String, String]]
  }
}
