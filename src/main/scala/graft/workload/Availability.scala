package graft.workload

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.time.Instant

/** Observational availability analytics over pressure-brick result
  * JSONs (common/pressure_maintenance.py:1-235): classify failures as
  * connectivity-transient, sum the failed-request metrics, and slice
  * sample windows into rollout vs steady-state availability. Pure
  * driver-side metadata analysis — the inputs are the (small) result
  * JSONs the bricks already write, never row data.
  */
object Availability {

  /** common/pressure_maintenance.py:10-25. */
  val ConnectivityPatterns: Seq[String] = Seq(
    "fail connecting to server", "failed to connect", "server unavailable",
    "connection refused", "connection reset", "connection aborted",
    "connection closed", "deadline exceeded", "temporarily unavailable",
    "transport is closing", "timed out", "timeout", "unavailable", "eof")

  /** common/pressure_maintenance.py:27-36. */
  val FailedMetricKeys: Seq[String] = Seq(
    "requests_failed", "failed_search", "failed_query", "failed_insert",
    "failed_upsert", "failed_delete", "failed_count",
    "failed_query_iterator")

  val RolloutWindowLabels: Set[String] = Set(
    "upgrade-rollout", "post-upgrade-config-rollout", "rollback-rollout")

  def isConnectivityTransient(message: String): Boolean = {
    val m = message.toLowerCase
    ConnectivityPatterns.exists(m.contains)
  }

  final case class Failure(ftype: String, message: String,
      startedAt: Option[Instant] = None, finishedAt: Option[Instant] = None)

  final case class Sample(
      file: String,
      brick: String,
      status: String,
      startedAt: Option[Instant],
      finishedAt: Option[Instant],
      metrics: Map[String, Double],
      failures: Seq[Failure])

  final case class Window(label: String, startedAt: Instant,
      finishedAt: Instant)

  final case class Stats(
      sampleCount: Int,
      incompleteSampleCount: Int,
      complete: Boolean,
      calibrationEligible: Boolean,
      operationsTotal: Long,
      operationsSucceeded: Long,
      requestsFailed: Long,
      successRate: Option[Double],
      failedSampleCount: Int,
      impactedBricks: Seq[String],
      firstFailureAt: Option[Instant],
      lastFailureAt: Option[Instant],
      failureSpanSec: Double)

  final case class Summary(
      mode: String,
      gateEnforced: Boolean,
      unassignedSampleCount: Int,
      overall: Stats,
      steadyState: Stats,
      rolloutWindows: Seq[(Window, Stats)])

  private def parseInstant(v: JValue): Option[Instant] = v match {
    case JString(s) => scala.util.Try(Instant.parse(s)).toOption
    case _ => None
  }

  /** Parse a brick result JSON (the [[BrickProtocol.resultJson]] field
    * set; tolerant of missing fields so foreign result files degrade
    * to incomplete samples instead of parse failures).
    */
  def parseSample(file: String, text: String): Sample = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    val metrics = (j \ "metrics") match {
      case JObject(kvs) => kvs.collect {
        case (k, JLong(v)) => k -> v.toDouble
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JDouble(v)) => k -> v
      }.toMap
      case _ => Map.empty[String, Double]
    }
    val failures = (j \ "failures") match {
      case JArray(items) => items.map {
        case JString(s) => Failure("FAILURE", s)
        case o: JObject => Failure(
          (o \ "type").extractOrElse[String]("FAILURE"),
          (o \ "message").extractOrElse[String](""),
          parseInstant(o \ "started_at"), parseInstant(o \ "finished_at"))
        case other => Failure("FAILURE", JsonMethods.compact(other))
      }
      case _ => Seq.empty
    }
    Sample(file,
      (j \ "brick").extractOrElse[String](""),
      (j \ "status").extractOrElse[String](""),
      parseInstant(j \ "started_at"), parseInstant(j \ "finished_at"),
      metrics, failures)
  }

  /** Synthetic failure samples for attempts whose result JSON never
    * landed or can't be read (pressure_availability_samples,
    * pressure_maintenance.py:128-188): availability math must count
    * a crashed brick against the window it ran in, not ignore it.
    */
  def syntheticSample(file: String, brick: String, kind: String,
      message: String): Sample = {
    val (status, ftype) = kind match {
      case "unreadable" => ("unreadable", "PRESSURE_RESULT_UNREADABLE")
      case "pending" => ("pending_result", "PRESSURE_ATTEMPT_PENDING")
      case _ => ("missing_result", "PRESSURE_RESULT_MISSING")
    }
    Sample(file, brick, status, None, None, Map.empty,
      Seq(Failure(ftype, message)))
  }

  def failedMetricCount(s: Sample): Long =
    FailedMetricKeys.map(k =>
      math.max(0L, s.metrics.getOrElse(k, 0.0).toLong)).sum

  private def overlaps(s: Sample, w: Window): Boolean =
    (s.startedAt, s.finishedAt) match {
      case (Some(a), Some(b)) =>
        !a.isAfter(w.finishedAt) && !b.isBefore(w.startedAt)
      case _ => false
    }

  /** _availability_stats (pressure_maintenance.py:59-125). */
  def stats(samples: Seq[Sample]): Stats = {
    var operationsTotal = 0L
    var requestsFailed = 0L
    var incomplete = 0
    var failedSamples = 0
    val impacted = scala.collection.mutable.SortedSet.empty[String]
    val failureStarts = scala.collection.mutable.ArrayBuffer.empty[Instant]
    val failureEnds = scala.collection.mutable.ArrayBuffer.empty[Instant]
    samples.foreach { s =>
      if (!s.metrics.contains("operations_total")) incomplete += 1
      operationsTotal +=
        math.max(0L, s.metrics.getOrElse("operations_total", 0.0).toLong)
      val sampleFailed = failedMetricCount(s)
      requestsFailed += sampleFailed
      val failed = sampleFailed > 0 ||
        !Set("passed", "skipped").contains(s.status)
      if (failed) {
        failedSamples += 1
        if (s.brick.nonEmpty) impacted += s.brick
        val intervals = {
          val fi = s.failures.collect {
            case f if f.startedAt.isDefined || f.finishedAt.isDefined =>
              (f.startedAt.orElse(s.startedAt),
                f.finishedAt.orElse(s.finishedAt))
          }
          if (fi.nonEmpty) fi else Seq((s.startedAt, s.finishedAt))
        }
        intervals.foreach { case (a, b) =>
          a.foreach(failureStarts += _)
          b.foreach(failureEnds += _)
        }
      }
    }
    val succeeded = math.max(0L, operationsTotal - requestsFailed)
    val first = failureStarts.minOption
    val last = failureEnds.maxOption
    val span = (first, last) match {
      case (Some(a), Some(b)) =>
        math.max(0.0, (b.toEpochMilli - a.toEpochMilli) / 1000.0)
      case _ => 0.0
    }
    val complete = samples.nonEmpty && incomplete == 0
    Stats(
      sampleCount = samples.size,
      incompleteSampleCount = incomplete,
      complete = complete,
      calibrationEligible = complete && operationsTotal > 0,
      operationsTotal = operationsTotal,
      operationsSucceeded = succeeded,
      requestsFailed = requestsFailed,
      successRate =
        if (operationsTotal > 0)
          Some(math.rint(succeeded.toDouble / operationsTotal * 1e6) / 1e6)
        else None,
      failedSampleCount = failedSamples,
      impactedBricks = impacted.toSeq,
      firstFailureAt = first,
      lastFailureAt = last,
      failureSpanSec = span)
  }

  /** build_pressure_availability_summary
    * (pressure_maintenance.py:191-235): availability per rollout
    * window (samples sliced by interval overlap), steady-state
    * availability outside every rollout window, and the overall view.
    * Observational — never gate-enforced.
    */
  def summary(samples: Seq[Sample], windows: Seq[Window]): Summary = {
    val rollout = windows.filter(w => RolloutWindowLabels.contains(w.label))
    val windowStats = rollout.map(w =>
      (w, stats(samples.filter(overlaps(_, w)))))
    val steady = samples.filter(s =>
      s.startedAt.isDefined && s.finishedAt.isDefined &&
        !rollout.exists(overlaps(s, _)))
    val unassigned = samples.count(s =>
      s.startedAt.isEmpty || s.finishedAt.isEmpty)
    Summary(
      mode = "observational",
      gateEnforced = false,
      unassignedSampleCount = unassigned,
      overall = stats(samples),
      steadyState = stats(steady),
      rolloutWindows = windowStats)
  }
}
