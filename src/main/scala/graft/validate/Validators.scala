package graft.validate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row}

import java.security.MessageDigest

/** Validation machinery mirroring the reference's validators
  * (milvus_client/common/validators.py): count checks, PK sample
  * presence/absence, and the stable sha256 checksum over rows sorted by
  * PK with per-type normalization (common/data.py:78-118).
  */
object Validators {

  final case class ValidationReport(
      passed: Boolean,
      failures: Seq[String],
      metrics: Map[String, Double])

  def report(failures: Seq[String],
      metrics: Map[String, Double] = Map.empty): ValidationReport =
    ValidationReport(failures.isEmpty, failures, metrics)

  /** count(filter) == expected (validators.py:68-90). */
  def validateCount(df: DataFrame, filter: Option[Column],
      expected: Long): Option[String] = {
    val got = filter.map(df.filter).getOrElse(df).count()
    if (got == expected) None
    else Some(s"count mismatch: expected $expected, got $got")
  }

  /** Sampled PKs present (validators.py:93-113). */
  def validatePksPresent(df: DataFrame, pkCol: String,
      pks: Seq[Any]): Option[String] = {
    val found = df.filter(col(pkCol).isin(pks: _*))
      .select(pkCol).distinct().count()
    if (found == pks.distinct.length) None
    else Some(s"pk samples missing: expected ${pks.distinct.length} found $found")
  }

  /** One-job probe batch: row count under `pred` plus a presence flag
    * per `presence` predicate, all from a single aggregation pass.
    * The DQL validators (data-integrity, phase DML/DQL, index
    * compatibility) probe tiny collections where each Spark job costs
    * far more than the data it touches — a count, three sample-pk
    * lookups and a deleted-range count as five jobs is 5× the fixed
    * cost of one.
    */
  def countAndPresence(df: DataFrame, pred: Option[Column],
      presence: Seq[Column]): (Long, Seq[Boolean]) = {
    val base = pred.map(df.filter).getOrElse(df)
    val aggs = count(lit(1)).as("_cnt") +: presence.zipWithIndex.map {
      case (p, i) => max(when(p, lit(1)).otherwise(lit(0))).as(s"_p$i")
    }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    (row.getLong(0),
      presence.indices.map(i => !row.isNullAt(i + 1) && row.getInt(i + 1) == 1))
  }

  /** One-job count batch: a row count per predicate, one pass. */
  def counts(df: DataFrame, preds: Seq[Column]): Seq[Long] = {
    val aggs = preds.zipWithIndex.map { case (p, i) =>
      sum(when(p, lit(1L)).otherwise(lit(0L))).as(s"_c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    preds.indices.map(i => if (row.isNullAt(i)) 0L else row.getLong(i))
  }

  /** Deleted PKs absent (validate_phase_dml_dql.py:245-276). */
  def validatePksAbsent(df: DataFrame, pkCol: String,
      pks: Seq[Any]): Option[String] = {
    val found = df.filter(col(pkCol).isin(pks: _*)).count()
    if (found == 0) None else Some(s"$found deleted pks still present")
  }

  /** Stable checksum (A7): sha256 over rows sorted by PK, each row
    * normalized and serialized as compact JSON with sorted keys —
    * the reference's `stable_checksum` rules: floats rounded to 5
    * decimals, bytes as lowercase hex under `__bytes__`, map keys
    * sorted, nulls sort first.
    *
    * The digest is inherently sequential, so rows stream through
    * `toLocalIterator` (one partition in memory at a time) after a
    * distributed sort — this is a validator for bounded samples, not a
    * data-path aggregate.
    */
  def stableChecksum(df: DataFrame, pkCol: String,
      fields: Seq[String] = Seq.empty): String = {
    val selected = if (fields.isEmpty) df else df.select(fields.map(col): _*)
    val sorted = selected.sort(col(pkCol).asc_nulls_first)
    val schema = sorted.schema
    val digest = MessageDigest.getInstance("SHA-256")
    val it = sorted.toLocalIterator()
    while (it.hasNext) {
      digest.update(rowJson(it.next(), schema).getBytes("UTF-8"))
    }
    digest.digest().map("%02x".format(_)).mkString
  }

  private def rowJson(row: Row, schema: StructType): String = {
    val sb = new StringBuilder("{")
    val names = schema.fields.map(_.name).zipWithIndex.sortBy(_._1)
    var first = true
    names.foreach { case (name, i) =>
      if (!first) sb += ','
      first = false
      sb ++= jsonString(name)
      sb += ':'
      writeValue(sb, row.get(i), schema.fields(i).dataType)
    }
    sb += '}'
    sb.toString
  }

  private def writeValue(sb: StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb ++= "null"; return }
    (dt, v) match {
      case (FloatType | DoubleType, n: Number) =>
        sb ++= normFloat(n.doubleValue())
      case (_: DecimalType, d: java.math.BigDecimal) =>
        sb ++= normFloat(d.doubleValue())
      case (BinaryType, b: Array[Byte]) =>
        sb ++= "{\"__bytes__\":" ++= jsonString(b.map("%02x".format(_)).mkString) += '}'
      case (StringType, s: String) => sb ++= jsonString(s)
      case (BooleanType, b: Boolean) => sb ++= b.toString
      case (at: ArrayType, seq: scala.collection.Seq[_]) =>
        sb += '['
        var first = true
        seq.foreach { e =>
          if (!first) sb += ','
          first = false
          writeValue(sb, e, at.elementType)
        }
        sb += ']'
      case (mt: MapType, m: scala.collection.Map[_, _]) =>
        sb += '{'
        var first = true
        m.toSeq.map { case (k, mv) => (String.valueOf(k), mv) }
          .sortBy(_._1).foreach { case (k, mv) =>
            if (!first) sb += ','
            first = false
            sb ++= jsonString(k) += ':'
            writeValue(sb, mv, mt.valueType)
          }
        sb += '}'
      case (st: StructType, r: Row) => sb ++= rowJson(r, st)
      case (TimestampType, t) => sb ++= jsonString(t.toString)
      case (DateType, d) => sb ++= jsonString(d.toString)
      case (_, other) => sb ++= other.toString
    }
  }

  /** Float normalization: round-half-even to 5 decimals, shortest plain
    * rendering (no scientific notation, no trailing zeros, "-0" -> "0").
    */
  private[graft] def normFloat(d: Double): String = {
    if (d.isNaN) return "\"NaN\""
    if (d.isInfinite) return if (d > 0) "\"Infinity\"" else "\"-Infinity\""
    val bd = new java.math.BigDecimal(d)
      .setScale(5, java.math.RoundingMode.HALF_EVEN)
      .stripTrailingZeros()
    val plain = bd.toPlainString
    if (plain == "-0") "0" else plain
  }

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.toString
  }
}
