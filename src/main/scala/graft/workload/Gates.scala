package graft.workload

import org.yaml.snakeyaml.Yaml

import scala.collection.JavaConverters._

/** Upgrade/rollback gate manifests and their evaluation — the
  * reference's `common/gates.py` (manifest load/validate/resolve,
  * :29-113,274-535) plus the report-side gate rules of
  * `requests/generate_workflow_report.py:24-190` that decide whether a
  * gate run PASSED from its brick result JSONs. The Argo-rendering
  * half of gates.py is deployment tooling with no engine equivalent;
  * what matters to an engine user is (a) scenario resolution with the
  * safety validations and (b) the verdict over results, both here.
  */
object Gates {

  // ---- version helpers (common/version.py) ------------------------------

  private val VersionPrefix = "^v?(\\d+)\\.(\\d+)([.\\-+].*)?$".r
  private val Sha256Digest = "@sha256:[0-9a-fA-F]{64}$".r.unanchored

  /** `major.minor` family of a version string (version_family). */
  def versionFamily(value: String): String = value.trim match {
    case VersionPrefix(maj, min, _) => s"$maj.$min"
    case other => throw new IllegalArgumentException(
      s"version must start with numeric major.minor: $other")
  }

  /** Family parsed from an image tag, if any (image_version_family). */
  def imageVersionFamily(image: String): Option[String] = {
    val name = image.split("/").last.split("@").head
    if (!name.contains(":")) None
    else name.split(":").last match {
      case VersionPrefix(maj, min, _) => Some(s"$maj.$min")
      case _ => None
    }
  }

  /** A digest-pinned or concrete-tag image (image_is_immutable):
    * sha256 digests always; tags unless they are/contain a mutable
    * token (latest/head/edge, or are master/main/nightly/dev).
    */
  def imageIsImmutable(image: String): Boolean = {
    val v = image.trim
    if (Sha256Digest.findFirstIn(v).isDefined) true
    else {
      val name = v.split("/").last
      if (!name.contains(":")) false
      else {
        val tag = name.split(":").last.toLowerCase
        val tokens = tag.split("[-_.]").filter(_.nonEmpty).toSet
        !Set("master", "main", "nightly", "dev").contains(tag) &&
          tokens.intersect(Set("latest", "head", "edge")).isEmpty
      }
    }
  }

  // ---- manifest model ----------------------------------------------------

  final case class PhasePlan(image: String, version: String,
      flags: Map[String, Boolean]) {
    def family: String = versionFamily(version)
  }

  final case class ResolvedScenario(
      id: String,
      mode: String,
      classification: String,
      supportStatus: String,
      collectionPrefix: String,
      workflowTemplate: String,
      deployProfile: String,
      schemaMatrix: String,
      forwardSchemaMatrix: String,
      base: PhasePlan,
      target: PhasePlan,
      rollback: PhasePlan,
      forbiddenAfterUpgrade: Set[String],
      config: GateConfig)

  /** The boolean toggles the report's required-validation list keys on
    * (generate_workflow_report.py config_matrix subset).
    */
  final case class GateConfig(
      forwardWorkloadEnabled: Boolean = false,
      rollbackEnabled: Boolean = true,
      rollbackForwardValidationEnabled: Boolean = false,
      indexCompatibilityValidationEnabled: Boolean = true,
      phaseDmlDqlValidationEnabled: Boolean = true)

  final case class Manifest(
      defaults: Map[String, Any],
      workflowTemplates: Map[String, String],
      deployProfiles: Map[String, String],
      schemaMatrices: Map[String, String],
      imageAliases: Map[String, (String, String)], // ref -> (image, version)
      scenarios: Seq[Map[String, Any]])

  private def asStrMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> (x: Any) }.toMap
    case _ => Map.empty
  }

  /** Load + validate a gate manifest (validate_gate_manifest rules:
    * version pin, non-empty sections, required scenario keys, unique
    * ids, strict YAML booleans, resolvable refs and phases).
    */
  def loadManifest(path: String): Manifest =
    parseManifest(CheckpointIO.readString(path), source = path)

  def parseManifest(yamlText: String, source: String = "<manifest>"): Manifest = {
    val root = asStrMap(new Yaml().load[Any](yamlText))
    require(String.valueOf(root.getOrElse("version", "")) == "1",
      s"$source: version must be '1'")
    def section(name: String): Map[String, Any] = {
      val m = asStrMap(root.getOrElse(name, null))
      require(m.nonEmpty, s"$source: $name must be a non-empty mapping")
      m
    }
    val aliases = section("image_aliases").map { case (k, v) =>
      val m = asStrMap(v)
      require(m.contains("image") && m.contains("version"),
        s"$source: image alias $k needs image+version")
      k -> (String.valueOf(m("image")), String.valueOf(m("version")))
    }
    val scenarios = root.get("scenarios") match {
      case Some(l: java.util.List[_]) if !l.isEmpty =>
        l.asScala.map(asStrMap).toSeq
      case _ => throw new IllegalArgumentException(
        s"$source: scenarios must be a non-empty list")
    }
    val ids = scenarios.map(s => String.valueOf(s.getOrElse("id",
      throw new IllegalArgumentException(s"$source: every scenario requires id"))))
    require(ids.distinct.length == ids.length,
      s"$source: duplicate scenario ids: ${ids.diff(ids.distinct).mkString(",")}")
    val manifest = Manifest(section("defaults"),
      section("workflow_templates").map { case (k, v) => k -> String.valueOf(v) },
      section("deploy_profiles").map { case (k, v) => k -> String.valueOf(v) },
      section("schema_matrices").map { case (k, v) => k -> String.valueOf(v) },
      aliases, scenarios)
    scenarios.foreach { sc =>
      val id = String.valueOf(sc("id"))
      Seq("mode", "classification", "support_status", "collection_prefix")
        .foreach(k => require(sc.contains(k), s"$source: scenario $id missing $k"))
      boolFields.foreach { f =>
        sc.get(f).foreach {
          case _: java.lang.Boolean => ()
          case other => throw new IllegalArgumentException(
            s"$source: scenario $id: $f must be a YAML boolean, got $other")
        }
      }
      // refs and phases must resolve even before a scenario is run
      resolveScenario(manifest, id): Unit
    }
    manifest
  }

  private val boolFields = Seq(
    "forward_workload_enabled", "rollback_enabled",
    "rollback_forward_validation_enabled",
    "index_compatibility_validation_enabled",
    "phase_dml_dql_validation_enabled",
    "schema_evolution_existing_enabled", "schema_evolution_forward_enabled")

  private val phaseFlagFields =
    Seq("json_shredding_enabled", "loon_ffi_enabled", "vortex_enabled")

  /** Resolve a scenario: refs → values, phases via image aliases,
    * optional per-phase overrides (gate classification requires
    * immutable override images; version overrides must stay in the
    * declared family), then the resolved-scenario safety validations.
    */
  def resolveScenario(manifest: Manifest, scenarioId: String,
      phaseOverrides: Map[String, Map[String, String]] = Map.empty)
      : ResolvedScenario = {
    val sc = manifest.scenarios
      .find(s => String.valueOf(s.getOrElse("id", "")) == scenarioId)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown scenario id $scenarioId; available: " +
          manifest.scenarios.map(_.getOrElse("id", "?")).mkString(", ")))
    def ref(section: Map[String, String], field: String): String =
      sc.get(field).map(String.valueOf).getOrElse {
        val r = String.valueOf(sc.getOrElse(s"${field}_ref",
          throw new IllegalArgumentException(
            s"$scenarioId: missing $field or ${field}_ref")))
        section.getOrElse(r, throw new IllegalArgumentException(
          s"$scenarioId: ${field}_ref '$r' is not defined"))
      }
    def bool(name: String, default: Boolean): Boolean =
      sc.get(name).map(_.asInstanceOf[Boolean]).getOrElse(
        manifest.defaults.get(name).map(_.asInstanceOf[Boolean])
          .getOrElse(default))

    val unknownPhases = phaseOverrides.keySet -- Set("base", "target", "rollback")
    require(unknownPhases.isEmpty,
      s"$scenarioId: unsupported phase overrides: ${unknownPhases.mkString(", ")}")

    val classification = String.valueOf(sc("classification"))

    def phase(name: String): PhasePlan = {
      val p = asStrMap(sc.getOrElse(name, null))
      val (image0, version0) = p.get("image_ref").map(String.valueOf) match {
        case Some(r) =>
          manifest.imageAliases.getOrElse(r,
            throw new IllegalArgumentException(
              s"$scenarioId: $name.image_ref '$r' is not defined"))
        case None =>
          (p.get("image").map(String.valueOf).getOrElse(""),
            p.get("version").map(String.valueOf).getOrElse(""))
      }
      require(image0.nonEmpty && version0.nonEmpty,
        s"$scenarioId: $name requires image_ref or image+version")
      val ov = phaseOverrides.getOrElse(name, Map.empty)
      val unknown = ov.keySet -- Set("image", "version")
      require(unknown.isEmpty,
        s"$scenarioId: unsupported $name override fields: ${unknown.mkString(", ")}")
      val image = ov.get("image") match {
        case Some(i) =>
          require(classification != "gate" || imageIsImmutable(i),
            s"$scenarioId: $name image override must be immutable; got $i")
          i
        case None => image0
      }
      val version = ov.get("version") match {
        case Some(v) =>
          require(versionFamily(v) == versionFamily(version0),
            s"$scenarioId: $name version override must remain in " +
              s"${versionFamily(version0)}; got $v")
          v
        case None => version0
      }
      val flags = phaseFlagFields.flatMap(f =>
        p.get(f).map(v => f -> v.asInstanceOf[Boolean])).toMap
      PhasePlan(image, version, flags)
    }

    val resolved = ResolvedScenario(
      id = scenarioId,
      mode = String.valueOf(sc("mode")),
      classification = classification,
      supportStatus = String.valueOf(sc("support_status")),
      collectionPrefix = String.valueOf(sc("collection_prefix")),
      workflowTemplate = ref(manifest.workflowTemplates, "workflow_template"),
      deployProfile = ref(manifest.deployProfiles, "deploy_profile"),
      schemaMatrix = ref(manifest.schemaMatrices, "schema_matrix"),
      forwardSchemaMatrix =
        if (sc.contains("forward_schema_matrix") ||
          sc.contains("forward_schema_matrix_ref"))
          ref(manifest.schemaMatrices, "forward_schema_matrix")
        else ref(manifest.schemaMatrices, "schema_matrix"),
      base = phase("base"), target = phase("target"),
      rollback = phase("rollback"),
      forbiddenAfterUpgrade = sc.get("forbidden_after_upgrade") match {
        case Some(l: java.util.List[_]) => l.asScala.map(String.valueOf).toSet
        case _ => Set.empty
      },
      config = GateConfig(
        forwardWorkloadEnabled = bool("forward_workload_enabled", false),
        rollbackEnabled = bool("rollback_enabled", true),
        rollbackForwardValidationEnabled =
          bool("rollback_forward_validation_enabled", false),
        indexCompatibilityValidationEnabled =
          bool("index_compatibility_validation_enabled", true),
        phaseDmlDqlValidationEnabled =
          bool("phase_dml_dql_validation_enabled", true)))
    validateResolved(resolved)
    resolved
  }

  /** validate_resolved_gate_scenario: phase image families must match
    * declared versions; a 2.6 → 3.0 → 2.6 gate must forbid
    * storage_v3/vortex and keep the phase flags disabled.
    */
  private def validateResolved(s: ResolvedScenario): Unit = {
    Seq("base" -> s.base, "target" -> s.target, "rollback" -> s.rollback)
      .foreach { case (name, p) =>
        imageVersionFamily(p.image).foreach(f =>
          require(f == p.family,
            s"${s.id}: $name image version family $f does not match " +
              s"declared version family ${p.family}"))
      }
    if (s.classification == "gate" &&
      s.base.family == "2.6" && s.target.family == "3.0" &&
      s.rollback.family == "2.6") {
      require(Set("storage_v3", "vortex").subsetOf(s.forbiddenAfterUpgrade),
        s"${s.id}: 2.6 -> 3.0 -> 2.6 gate must forbid storage_v3 and vortex")
      val enabled = Seq("base" -> s.base, "target" -> s.target,
        "rollback" -> s.rollback).flatMap { case (name, p) =>
        Seq("loon_ffi_enabled", "vortex_enabled")
          .filter(f => p.flags.getOrElse(f, false)).map(f => s"$name.$f")
      }
      require(enabled.isEmpty,
        s"${s.id}: 2.6 -> 3.0 -> 2.6 gate must keep storage v3/vortex " +
          s"disabled; invalid phase flags: ${enabled.mkString(", ")}")
    }
  }

  /** Forward-workload rollback safety (validate_resolved_gate_scenario
    * :339-368): when the scenario runs forward workloads, rolls back,
    * and validates them after rollback, the forward schema matrix must
    * contain no rollback-incompatible entries for the rollback
    * version. Takes the LOADED matrix — scenario paths may point at
    * deployment-repo files this engine cannot resolve.
    */
  def validateForwardRollback(s: ResolvedScenario,
      forwardMatrix: graft.store.SchemaMatrix.Matrix): Unit = {
    if (s.config.rollbackEnabled && s.config.forwardWorkloadEnabled &&
      s.config.rollbackForwardValidationEnabled) {
      val bad = graft.store.SchemaMatrix.rollbackIncompatible(
        forwardMatrix, s.rollback.version)
      require(bad.isEmpty,
        s"${s.id}: forward schemas cannot be required after rollback to " +
          s"${s.rollback.version}; incompatible schemas: " +
          bad.map(_.collection.name).mkString(", "))
    }
  }

  /** validate_no_gate_placeholders: a runnable scenario must not carry
    * placeholder images, and a runnable GATE only immutable ones.
    */
  def validateNoPlaceholders(s: ResolvedScenario,
      allowPlaceholder: Boolean = false): Unit = {
    if (allowPlaceholder) return
    val phases = Seq("base" -> s.base, "target" -> s.target,
      "rollback" -> s.rollback)
    val placeholders = phases.collect {
      case (n, p) if p.image.contains("placeholder") && !imageIsImmutable(p.image) =>
        s"$n.image=${p.image}"
    }
    require(placeholders.isEmpty,
      s"${s.id}: runnable scenario contains placeholder images: " +
        placeholders.mkString(", "))
    if (s.classification == "gate") {
      val mutable = phases.collect {
        case (n, p) if !imageIsImmutable(p.image) => s"$n.image=${p.image}"
      }
      require(mutable.isEmpty,
        s"${s.id}: runnable gate contains mutable images: " +
          mutable.mkString(", "))
    }
  }

  // ---- gate verdict over result JSONs -----------------------------------
  // generate_workflow_report.py:24-190: the required validation /
  // serviceability result names are a function of the config toggles;
  // missing ones are injected as failures; any result outside
  // {passed, skipped} fails the gate; pressure failures fail it only
  // with fail-on-error, else downgrade to warning.

  /** _required_validation_names. */
  def requiredValidationNames(c: GateConfig): Seq[String] = {
    val b = Seq.newBuilder[String]
    b += "validate_before_upgrade"
    b += "validate_after_upgrade"
    if (c.forwardWorkloadEnabled) {
      b += "validate_forward_after_upgrade"
      b += "validate_forward_indexes_after_upgrade"
    }
    if (c.rollbackEnabled && c.indexCompatibilityValidationEnabled)
      b += "validate_index_compatibility_after_upgrade"
    if (c.rollbackEnabled && c.phaseDmlDqlValidationEnabled)
      b += "validate_phase_dml_dql_after_upgrade"
    if (c.rollbackEnabled) b += "validate_after_rollback"
    if (c.rollbackEnabled && c.indexCompatibilityValidationEnabled)
      b += "validate_index_compatibility_after_rollback"
    if (c.rollbackEnabled && c.phaseDmlDqlValidationEnabled)
      b += "validate_phase_dml_dql_after_rollback"
    if (c.rollbackEnabled && c.forwardWorkloadEnabled &&
      c.rollbackForwardValidationEnabled) {
      b += "validate_forward_after_rollback"
      b += "validate_forward_indexes_after_rollback"
    }
    b.result()
  }

  /** _required_serviceability_names. */
  def requiredServiceabilityNames(c: GateConfig): Seq[String] =
    if (!c.rollbackEnabled) Seq.empty
    else if (c.forwardWorkloadEnabled && c.rollbackForwardValidationEnabled)
      Seq("wait_rollback_serviceability", "wait_forward_rollback_serviceability")
    else Seq("wait_rollback_serviceability")

  final case class GateReport(
      status: String, // passed | warning | failed
      missingValidations: Seq[String],
      missingServiceability: Seq[String],
      failedResults: Map[String, String], // name -> status
      validationPassed: Boolean)

  /** Evaluate the gate from result-name → status (the stems and
    * `status` fields of the per-brick result JSONs in the run's
    * results directory).
    */
  def evaluate(config: GateConfig, results: Map[String, String],
      pressureFailed: Int = 0,
      pressureFailOnError: Boolean = true): GateReport = {
    val ok = Set("passed", "skipped")
    val missingV = requiredValidationNames(config)
      .filterNot(results.contains)
    val missingS = requiredServiceabilityNames(config)
      .filterNot(results.contains)
    val withMissing = results ++
      (missingV ++ missingS).map(_ -> "missing").toMap
    val failed = withMissing.filter { case (_, st) => !ok.contains(st) }
    val validations = withMissing.filter(_._1.startsWith("validate_"))
    val validationPassed =
      validations.nonEmpty && validations.values.forall(ok.contains)
    val status =
      if (failed.nonEmpty || !validationPassed ||
        (pressureFailOnError && pressureFailed > 0)) "failed"
      else if (pressureFailed > 0) "warning"
      else "passed"
    GateReport(status, missingV, missingS, failed, validationPassed)
  }

  /** Evaluate from a directory of `<name>.json` brick results (reads
    * each file's `status` field — the same inputs the reference report
    * builder globs).
    */
  def evaluateResultsDir(config: GateConfig, resultsDir: String,
      pressureFailed: Int = 0,
      pressureFailOnError: Boolean = true): GateReport = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val results: Map[String, String] =
      CheckpointIO.listJson(resultsDir).map { case (stem, path) =>
        val st =
          try (org.json4s.jackson.JsonMethods.parse(
            CheckpointIO.readString(path)) \ "status")
            .extractOpt[String].getOrElse("unreadable")
          catch { case _: Exception => "unreadable" }
        stem -> st
      }.toMap
    evaluate(config, results, pressureFailed, pressureFailOnError)
  }
}
