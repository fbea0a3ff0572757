package graft.workload

/** Capability gate — the protocol every brick run passes through in
  * the reference (common/capability.py:19-65, driven by the
  * `--capability-probe` / `--skip-unsupported` flags of
  * common/args.py:29-42 and manifests/capability_catalog.yaml): a
  * brick declares the capabilities it requires; the gate probes the
  * engine and classifies each as supported or unsupported; an
  * unsupported requirement yields a `skipped` (not `failed`) result.
  *
  * Detection semantics (mirrored exactly, incl. the reference's own
  * regression test test_capability.py): a capability missing from the
  * catalog is unsupported; one with a `server_version_min` probe is
  * supported iff the engine version is at least that; one with only
  * probes this engine cannot evaluate (sdk/config probes) is
  * unsupported — never assume an unimplemented probe passes; one with
  * no probes at all is supported.
  */
object Capability {

  /** One catalog entry (capability_catalog.yaml item). `detect` keys:
    * `server_version_min`, `sdk_probe`, `config_probe`.
    */
  final case class CapabilitySpec(
      id: String,
      detect: Map[String, String] = Map.empty,
      unsupportedBehavior: String = "skip",
      requiresClusterAdmin: Boolean = false)

  final case class Evaluation(
      serverVersion: String,
      supported: Seq[String],
      unsupported: Seq[String])

  /** This engine's probe-able version. The 3.0 feature surface
    * (OrderBy, QueryAggregation, EntityTTL, Geometry, ...) is native
    * here, so version-gated capabilities evaluate as supported.
    */
  val engineVersion = "3.0.0"

  /** Built-in catalog mirroring manifests/capability_catalog.yaml.
    * StorageV3 keeps its config-only probe: this engine has no such
    * config surface, so the gate honestly reports it unsupported and
    * bricks requiring it skip.
    */
  val defaultCatalog: Map[String, CapabilitySpec] = Seq(
    CapabilitySpec("QueryAggregation",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "query_aggregation")),
    CapabilitySpec("OrderBy",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "order_by")),
    CapabilitySpec("NullableVector",
      Map("server_version_min" -> "3.0.0",
        "sdk_probe" -> "create_nullable_vector_schema")),
    CapabilitySpec("Geometry",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "geometry_field")),
    CapabilitySpec("TimeSeries",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "timestamptz_field")),
    CapabilitySpec("EntityTTL",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "entity_ttl")),
    CapabilitySpec("StructArray",
      Map("server_version_min" -> "3.0.0", "sdk_probe" -> "struct_array_schema")),
    CapabilitySpec("ElementHybridSearch",
      Map("server_version_min" -> "3.0.0",
        "sdk_probe" -> "element_hybrid_search")),
    CapabilitySpec("StorageV3",
      Map("config_probe" -> "common.storage.useLoonFFI"),
      requiresClusterAdmin = true)
  ).map(s => s.id -> s).toMap

  /** Leading numeric components of a version string (parse_version). */
  def parseVersion(v: String): Seq[Int] = {
    val parts = "\\d+".r.findAllIn(Option(v).getOrElse("")).map(_.toInt).toSeq
    if (parts.isEmpty) Seq(0) else parts.take(3)
  }

  def versionAtLeast(current: String, minimum: String): Boolean = {
    val c = parseVersion(current)
    val m = parseVersion(minimum)
    val w = math.max(c.length, m.length)
    val cp = c.padTo(w, 0)
    val mp = m.padTo(w, 0)
    // lexicographic over padded components
    cp.zip(mp).find { case (a, b) => a != b }
      .forall { case (a, b) => a > b }
  }

  /** evaluate_capabilities (common/capability.py:47-65). */
  def evaluate(required: Seq[String],
      catalog: Map[String, CapabilitySpec] = defaultCatalog,
      serverVersion: String = engineVersion): Evaluation = {
    val (sup, unsup) = required.foldLeft(
      (Vector.empty[String], Vector.empty[String])) { case ((s, u), id) =>
      catalog.get(id) match {
        case None => (s, u :+ id)
        case Some(spec) => spec.detect.get("server_version_min") match {
          case Some(min) =>
            if (versionAtLeast(serverVersion, min)) (s :+ id, u) else (s, u :+ id)
          case None =>
            if (spec.detect.nonEmpty) (s, u :+ id) else (s :+ id, u)
        }
      }
    }
    Evaluation(serverVersion, sup, unsup)
  }
}
