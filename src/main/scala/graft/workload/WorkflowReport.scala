package graft.workload

import scala.collection.JavaConverters._

/** Workflow-level report artifact
  * (requests/generate_workflow_report.py:73-420): composes the gate
  * verdict over the run's brick results with the pressure-availability
  * summary into one JSON-shaped structure plus a markdown rendering.
  * The reference's k8s/argo parameter echo (workflow uid, images,
  * configmap snapshots) is deployment boilerplate and intentionally
  * reduced to a free-form `parameters` map.
  */
object WorkflowReport {

  final case class ResultView(name: String, status: String,
      failures: Seq[String], metrics: Map[String, Double])

  final case class Report(
      status: String, // passed | warning | failed
      gate: Gates.GateReport,
      results: Seq[ResultView],
      availability: Option[Availability.Summary],
      parameters: Map[String, String])

  /** Build the report from a results directory (the same
    * `<name>.json` files [[Gates.evaluateResultsDir]] globs), wiring
    * the gate verdict, per-result detail, and the optional
    * availability summary together. The overall status is the gate's
    * (generate_workflow_report.py:184-192 computes it identically).
    */
  def build(config: Gates.GateConfig, resultsDir: String,
      availability: Option[Availability.Summary] = None,
      pressureFailed: Int = 0,
      pressureFailOnError: Boolean = true,
      parameters: Map[String, String] = Map.empty): Report = {
    val gate = Gates.evaluateResultsDir(config, resultsDir,
      pressureFailed, pressureFailOnError)
    val views =
      CheckpointIO.listJson(resultsDir).map { case (stem, path) =>
        val sample =
          try Availability.parseSample(stem, CheckpointIO.readString(path))
          catch {
            case e: Exception => Availability.syntheticSample(
              stem, stem, "unreadable", e.getMessage)
          }
        ResultView(stem, sample.status,
          sample.failures.map(f => s"${f.ftype}: ${f.message}"),
          sample.metrics)
      }
    val missing = (gate.missingValidations ++ gate.missingServiceability)
      .map(n => ResultView(n, "missing",
        Seq("RESULT_MISSING: required result json is missing"), Map.empty))
    Report(gate.status, gate, views ++ missing, availability, parameters)
  }

  private def statsLine(label: String, st: Availability.Stats): String = {
    val rate = st.successRate.map(r => f"$r%.6f").getOrElse("n/a")
    s"| $label | ${st.sampleCount} | ${st.operationsTotal} | " +
      s"${st.requestsFailed} | $rate | ${st.failedSampleCount} |"
  }

  /** Markdown rendering (build_markdown,
    * generate_workflow_report.py:273-420): status headline, failed
    * results first, then the full result table and the availability
    * slices.
    */
  def markdown(r: Report): String = {
    val b = new StringBuilder
    b ++= s"# Workflow report — ${r.status.toUpperCase}\n\n"
    if (r.parameters.nonEmpty) {
      b ++= "## Parameters\n\n"
      r.parameters.toSeq.sortBy(_._1).foreach { case (k, v) =>
        b ++= s"- $k: $v\n"
      }
      b ++= "\n"
    }
    val failed = r.results.filterNot(v =>
      Set("passed", "skipped").contains(v.status))
    if (failed.nonEmpty) {
      b ++= "## Failed results\n\n"
      failed.foreach { v =>
        b ++= s"- **${v.name}** (${v.status})\n"
        v.failures.foreach(f => b ++= s"  - $f\n")
      }
      b ++= "\n"
    }
    b ++= "## Results\n\n| result | status | failures |\n|---|---|---|\n"
    r.results.foreach { v =>
      b ++= s"| ${v.name} | ${v.status} | ${v.failures.size} |\n"
    }
    b ++= "\n"
    r.availability.foreach { a =>
      b ++= "## Pressure availability (observational)\n\n"
      b ++= "| window | samples | ops | failed | success rate | failed samples |\n"
      b ++= "|---|---|---|---|---|---|\n"
      b ++= statsLine("overall", a.overall) + "\n"
      b ++= statsLine("steady state", a.steadyState) + "\n"
      a.rolloutWindows.foreach { case (w, st) =>
        b ++= statsLine(w.label, st) + "\n"
      }
      if (a.unassignedSampleCount > 0)
        b ++= s"\nUnassigned samples (no interval): ${a.unassignedSampleCount}\n"
    }
    b.result()
  }

  /** Write both artifacts (report JSON is rendered via the result
    * views' fields; the markdown is the human gate summary).
    */
  def write(r: Report, jsonPath: String, mdPath: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json =
      ("status" -> r.status) ~
      ("validation_passed" -> r.gate.validationPassed) ~
      ("missing_validations" -> r.gate.missingValidations) ~
      ("missing_serviceability" -> r.gate.missingServiceability) ~
      ("failed_results" -> r.gate.failedResults) ~
      ("results" -> r.results.map(v =>
        ("name" -> v.name) ~ ("status" -> v.status) ~
          ("failures" -> v.failures))) ~
      ("parameters" -> r.parameters)
    CheckpointIO.writeAtomic(jsonPath,
      JsonMethods.pretty(JsonMethods.render(json)))
    CheckpointIO.writeAtomic(mdPath, markdown(r))
  }
}
