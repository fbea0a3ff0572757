package graft.workload

import graft.store.Collection
import graft.validate.Validators
import graft.validate.Validators.ValidationReport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Seed-checkpoint data-integrity cycle — the reference's
  * `seed_data.py` / `validate_data_integrity.py` pair: at seed time a
  * collection's integrity fingerprint (expected count, pk range, pk
  * samples, stable scalar checksum) is persisted as a phase
  * checkpoint; after an engine restart/upgrade the validator re-derives
  * each quantity and reports count mismatches, missing sample pks, and
  * checksum drift (validate_data_integrity.py:60-101 over
  * common/validators.py count/pk/checksum primitives).
  */
object DataIntegrity {

  val Phase = "seed_data"

  /** Record the integrity fingerprint (seed_data.py). `checksumFields`
    * defaults to every non-vector scalar column.
    */
  def seedCheckpoint(spark: SparkSession, coll: Collection,
      checkpointDir: String,
      checksumFields: Seq[String] = Seq.empty): Map[String, String] = {
    val d = coll.definition
    val pk = d.primaryField.name
    val df = coll.read(spark)
    val fields =
      if (checksumFields.nonEmpty) checksumFields
      else d.fields.filterNot(f =>
        f.dataType.typeName.contains("array") ||
          f.dataType.typeName.contains("map") ||
          f.dataType.typeName.contains("binary")).map(_.name)
    val stats = df.agg(count(lit(1)), min(col(pk)), max(col(pk))).head()
    val (cnt, minPk, maxPk) =
      (stats.getLong(0), stats.get(1), stats.get(2))
    // Sample pks that actually exist: min, the first at/after the
    // midpoint, max (the reference seeds dense ranges; ours may not be
    // dense, so the mid sample snaps to a real key).
    val midTarget = (minPk, maxPk) match {
      case (a: Long, b: Long) => Some(a + (b - a) / 2)
      case _ => None
    }
    val midPk = midTarget.map(t =>
      df.filter(col(pk) >= t).agg(min(col(pk))).head().get(0)).getOrElse(minPk)
    val checksum = Validators.stableChecksum(
      df.select((pk +: fields).distinct.map(col): _*), pk)
    val state = Map(
      "collection" -> coll.name,
      "expected_count" -> cnt.toString,
      "primary_field" -> pk,
      "min_pk" -> String.valueOf(minPk),
      "mid_pk" -> String.valueOf(midPk),
      "max_pk" -> String.valueOf(maxPk),
      "checksum" -> checksum,
      "checksum_fields" -> fields.mkString(","))
    BrickProtocol.writePhaseCheckpoint(checkpointDir, s"${Phase}_${coll.name}",
      state)
    state
  }

  /** Poll the integrity validation until it passes or the deadline
    * (wait_data_serviceability.py:91-190) — the post-rollback
    * serviceability wait whose `wait_*` result JSON the gate verdict
    * requires. Spark batch reads have no async loading phase, so the
    * first poll normally passes; the loop exists for protocol fidelity
    * and for stores fronted by eventually-visible object listings.
    */
  def waitServiceability(spark: SparkSession, coll: Collection,
      checkpointDir: String, args: BrickProtocol.BrickArgs,
      timeoutSec: Int = 900,
      intervalMs: Long = 200L): BrickProtocol.BrickResult = {
    require(timeoutSec >= 0, "timeout must be non-negative")
    val started = java.time.Instant.now()
    val deadline = System.nanoTime() + timeoutSec.toLong * 1000000000L
    var report = validate(spark, coll, checkpointDir)
    var polls = 1
    while (!report.passed && System.nanoTime() < deadline) {
      Thread.sleep(intervalMs)
      report = validate(spark, coll, checkpointDir)
      polls += 1
    }
    BrickProtocol.BrickResult("wait_data_serviceability", args,
      status = if (report.passed) "passed" else "failed",
      startedAt = started, finishedAt = java.time.Instant.now(),
      metrics = report.metrics ++ Map(
        "polls" -> polls.toDouble, "timeout_sec" -> timeoutSec.toDouble),
      failures =
        if (report.passed) Seq.empty
        else ("SERVICEABILITY_TIMEOUT: checkpoint data did not become " +
          "query-serviceable before timeout") +: report.failures)
  }

  /** Re-derive and compare (validate_data_integrity.py:60-101):
    * count over the checkpointed pk range, each sample pk present,
    * stable checksum over the checkpointed fields.
    */
  def validate(spark: SparkSession, coll: Collection,
      checkpointDir: String): ValidationReport = {
    val state = BrickProtocol.readPhaseCheckpoint(checkpointDir,
      s"${Phase}_${coll.name}")
    val pk = state("primary_field")
    val df = coll.read(spark)
    val failures = Seq.newBuilder[String]

    val expected = state("expected_count").toLong
    // Range/sample comparisons in the pk's own type (a string compare
    // would order "9" after "10" for numeric pks).
    val pkType = df.schema(pk).dataType
    def pkLit(v: String) = lit(v).cast(pkType)
    // Count + the three sample-pk probes in ONE aggregation job — the
    // samples are inside the checkpointed range by construction.
    val sampleKeys = Seq("min_pk", "mid_pk", "max_pk")
    val (actual, present) = Validators.countAndPresence(df,
      Some(col(pk) >= pkLit(state("min_pk")) &&
        col(pk) <= pkLit(state("max_pk"))),
      sampleKeys.map(k => col(pk) === pkLit(state(k))))
    if (actual != expected)
      failures += s"COUNT_MISMATCH: expected $expected rows in " +
        s"[${state("min_pk")}, ${state("max_pk")}], found $actual"
    sampleKeys.zip(present).foreach { case (k, there) =>
      if (!there) failures += s"MISSING_PK: sample $k=${state(k)} absent"
    }

    // Checksum over the CHECKPOINTED pk range, not the whole table —
    // the reference's validate_scalar_checksum pages rows by pk range
    // (common/validators.py:168-198), so rows later phases insert
    // beyond the seeded range (validate_phase_dml_dql's DML) don't
    // invalidate the seed fingerprint.
    val fields = state("checksum_fields").split(",").toSeq
    val checksum = Validators.stableChecksum(
      df.filter(col(pk) >= pkLit(state("min_pk")) &&
          col(pk) <= pkLit(state("max_pk")))
        .select((pk +: fields).distinct.map(col): _*), pk)
    if (checksum != state("checksum"))
      failures += s"CHECKSUM_MISMATCH: expected ${state("checksum")}, " +
        s"computed $checksum"

    Validators.report(failures.result(), Map(
      "expected_count" -> expected.toDouble,
      "actual_count" -> actual.toDouble))
  }
}
