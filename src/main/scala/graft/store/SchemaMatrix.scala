package graft.store

import org.apache.spark.sql.types._
import org.yaml.snakeyaml.Yaml

import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/** Declarative YAML "schema matrix" loader — the reference's second
  * collection-declaration path (load_schema_matrix,
  * milvus_client/common/schema.py:123-156; matrices like
  * manifests/schema_matrix_2_6.yaml). Each entry becomes a
  * [[CollectionDef]]; Milvus dtypes map to Spark types per SURVEY.md
  * §1.2 (JSON → string column + JSON-path expressions, vectors →
  * array/binary/map columns with dim recorded).
  *
  * BM25 `functions` blocks are carried as derived-column metadata: the
  * output sparse field is excluded from inserts (the reference skips
  * function outputs in datagen, common/data.py:203-208) and served by
  * the Bm25 module at query time.
  */
object SchemaMatrix {

  final case class MatrixEntry(
      collection: CollectionDef,
      featureTags: Seq[String],
      compatMode: String,
      validators: Seq[String],
      functions: Seq[FunctionDef])

  final case class Matrix(version: String, entries: Seq[MatrixEntry])

  def dtypeToSpark(dtype: String, elementType: Option[String]): DataType =
    dtype.toUpperCase match {
      case "BOOL" => BooleanType
      case "INT8" => ByteType
      case "INT16" => ShortType
      case "INT32" => IntegerType
      case "INT64" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "VARCHAR" => StringType
      case "JSON" => StringType // JSON text + get_json_object paths
      case "TIMESTAMPTZ" => TimestampType
      case "GEOMETRY" => StringType // WKT + ST_CONTAINS expression
      case "ARRAY" =>
        ArrayType(dtypeToSpark(elementType.getOrElse(
          throw new IllegalArgumentException("ARRAY needs element_type")), None))
      case "FLOAT_VECTOR" => ArrayType(FloatType)
      case "FLOAT16_VECTOR" | "BFLOAT16_VECTOR" =>
        BinaryType // raw 2-byte lanes (HalfFloat packs/unpacks)
      case "INT8_VECTOR" => ArrayType(ByteType)
      case "BINARY_VECTOR" => BinaryType
      case "SPARSE_FLOAT_VECTOR" => MapType(IntegerType, DoubleType)
      case other => throw new IllegalArgumentException(s"unknown dtype $other")
    }

  /** Schemas that cannot be REQUIRED after rolling back to
    * `rollbackVersion` (common/schema.py:272-296): any entry not
    * `rollback_safe` whose matrix version exceeds the rollback target
    * — or whose version strings fail to parse at all.
    */
  def rollbackIncompatible(m: Matrix,
      rollbackVersion: String): Seq[MatrixEntry] = {
    def parses(v: String): Boolean =
      try { graft.workload.Gates.versionFamily(v); true }
      catch { case _: IllegalArgumentException => false }
    m.entries.filterNot(_.compatMode == "rollback_safe").filter { _ =>
      !parses(rollbackVersion) || !parses(m.version) ||
        !graft.workload.Capability.versionAtLeast(rollbackVersion, m.version)
    }
  }

  def load(path: String): Matrix = {
    val payload = new Yaml().load[java.util.Map[String, Any]](
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    require(payload != null, s"$path: empty schema matrix")
    val version = String.valueOf(payload.get("version"))
    require(version.matches("\\d+\\.\\d+.*"),
      s"$path: schema matrix requires a parseable major.minor version")
    val schemas = Option(payload.get("schemas"))
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala)
      .getOrElse(Seq.empty)
    Matrix(version, schemas.map(parseEntry).toSeq)
  }

  private def parseEntry(item: java.util.Map[String, Any]): MatrixEntry = {
    val m = item.asScala
    def str(k: String, default: String = ""): String =
      m.get(k).map(String.valueOf).getOrElse(default)
    def strSeq(k: String): Seq[String] = m.get(k)
      .map(_.asInstanceOf[java.util.List[Any]].asScala.map(String.valueOf).toSeq)
      .getOrElse(Seq.empty)
    def bool(v: Any): Boolean = v match {
      case b: java.lang.Boolean => b
      case s => String.valueOf(s).toBoolean
    }

    val functions = m.get("functions")
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala)
      .getOrElse(Seq.empty)
      .map { fj =>
        val f = fj.asScala
        FunctionDef(
          String.valueOf(f("name")),
          String.valueOf(f.getOrElse("function_type", "BM25")),
          f.get("input_fields").map(_.asInstanceOf[java.util.List[Any]]
            .asScala.map(String.valueOf).toSeq).getOrElse(Seq.empty),
          f.get("output_fields").map(_.asInstanceOf[java.util.List[Any]]
            .asScala.map(String.valueOf).toSeq).getOrElse(Seq.empty),
          f.get("params").map(_.asInstanceOf[java.util.Map[String, Any]]
            .asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap)
            .getOrElse(Map.empty))
      }.toSeq
    val functionOutputs = functions.flatMap(_.outputFields).toSet

    val fields = m("fields").asInstanceOf[java.util.List[java.util.Map[String, Any]]]
      .asScala.map { fj =>
        val f = fj.asScala
        val name = String.valueOf(f("name"))
        val primary = f.get("primary").exists(bool)
        FieldDef(
          name = name,
          dataType = dtypeToSpark(String.valueOf(f("dtype")),
            f.get("element_type").map(String.valueOf)),
          nullable = !primary && f.get("nullable").exists(bool) ||
            // function-output fields are engine-computed, never inserted
            functionOutputs.contains(name),
          isPrimary = primary,
          autoId = f.get("auto_id").exists(bool),
          isPartitionKey = f.get("is_partition_key").exists(bool),
          maxLength = f.get("max_length").map(v => String.valueOf(v).toInt),
          dim = f.get("dim").map(v => String.valueOf(v).toInt))
      }.toSeq

    val indexes = m.get("indexes")
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala)
      .getOrElse(Seq.empty)
      .map { ij =>
        val ix = ij.asScala
        IndexDef(
          field = String.valueOf(ix("field")),
          indexType = String.valueOf(ix("index_type")),
          metricType = ix.get("metric_type").map(String.valueOf),
          params = ix.get("params")
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala
              .map { case (k, v) => k -> String.valueOf(v) }.toMap)
            .getOrElse(Map.empty))
      }.toSeq

    val d = CollectionDef(
      name = str("name"),
      fields = fields,
      enableDynamicField = m.get("enable_dynamic_field").exists(bool),
      partitions = strSeq("partitions"),
      numPartitions = m.get("num_partitions").map(v => String.valueOf(v).toInt),
      indexes = indexes,
      functions = functions,
      description = str("description"))
    d.validate()
    MatrixEntry(d, strSeq("feature_tags"), str("compat_mode", "rollback_safe"),
      strSeq("validators"), functions)
  }
}
