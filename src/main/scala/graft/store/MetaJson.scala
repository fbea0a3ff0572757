package graft.store

import org.apache.spark.sql.types.DataType
import org.json4s.JsonDSL._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON (de)serialization for catalog metadata, using the json4s that
  * ships with Spark. Field data types round-trip through Spark's own
  * DataType JSON format.
  */
private[store] object MetaJson {

  def write(m: CatalogMeta): String = {
    val d = m.d
    val json: JObject =
      ("name" -> d.name) ~
      ("description" -> d.description) ~
      ("enableDynamicField" -> d.enableDynamicField) ~
      ("partitions" -> d.partitions) ~
      ("numPartitions" -> d.numPartitions) ~
      ("ttlSeconds" -> d.ttlSeconds) ~
      ("shardsNum" -> d.shardsNum) ~
      ("properties" -> d.properties) ~
      ("seq" -> m.seq) ~
      ("loadState" -> m.loadState) ~
      ("fields" -> d.fields.map { f =>
        ("name" -> f.name) ~
        ("type" -> f.dataType.json) ~
        ("nullable" -> f.nullable) ~
        ("isPrimary" -> f.isPrimary) ~
        ("autoId" -> f.autoId) ~
        ("isPartitionKey" -> f.isPartitionKey) ~
        ("maxLength" -> f.maxLength) ~
        ("dim" -> f.dim) ~
        ("defaultValue" -> f.defaultValue)
      }) ~
      ("indexes" -> d.indexes.map { ix =>
        ("field" -> ix.field) ~
        ("indexType" -> ix.indexType) ~
        ("metricType" -> ix.metricType) ~
        ("params" -> ix.params)
      }) ~
      ("functions" -> d.functions.map { f =>
        ("name" -> f.name) ~
        ("functionType" -> f.functionType) ~
        ("inputFields" -> f.inputFields) ~
        ("outputFields" -> f.outputFields) ~
        ("params" -> f.params)
      })
    JsonMethods.pretty(JsonMethods.render(json))
  }

  def read(s: String): CatalogMeta = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    val fields = (j \ "fields").extract[Seq[JValue]].map { fj =>
      FieldDef(
        name = (fj \ "name").extract[String],
        dataType = DataType.fromJson((fj \ "type").extract[String]),
        nullable = (fj \ "nullable").extract[Boolean],
        isPrimary = (fj \ "isPrimary").extract[Boolean],
        autoId = (fj \ "autoId").extract[Boolean],
        isPartitionKey = (fj \ "isPartitionKey").extract[Boolean],
        maxLength = (fj \ "maxLength").extractOpt[Int],
        dim = (fj \ "dim").extractOpt[Int],
        defaultValue = (fj \ "defaultValue").extractOpt[String])
    }
    val indexes = (j \ "indexes").extract[Seq[JValue]].map { ij =>
      IndexDef(
        field = (ij \ "field").extract[String],
        indexType = (ij \ "indexType").extract[String],
        metricType = (ij \ "metricType").extractOpt[String],
        params = (ij \ "params").extract[Map[String, String]])
    }
    val functions = (j \ "functions").extractOpt[Seq[JValue]]
      .getOrElse(Seq.empty).map { fj =>
        FunctionDef(
          name = (fj \ "name").extract[String],
          functionType = (fj \ "functionType").extract[String],
          inputFields = (fj \ "inputFields").extract[Seq[String]],
          outputFields = (fj \ "outputFields").extract[Seq[String]],
          params = (fj \ "params").extractOpt[Map[String, String]]
            .getOrElse(Map.empty))
      }
    val d = CollectionDef(
      name = (j \ "name").extract[String],
      fields = fields,
      enableDynamicField = (j \ "enableDynamicField").extract[Boolean],
      partitions = (j \ "partitions").extract[Seq[String]],
      numPartitions = (j \ "numPartitions").extractOpt[Int],
      ttlSeconds = (j \ "ttlSeconds").extractOpt[Long],
      shardsNum = (j \ "shardsNum").extract[Int],
      indexes = indexes,
      functions = functions,
      description = (j \ "description").extract[String],
      properties = (j \ "properties").extractOpt[Map[String, String]]
        .getOrElse(Map.empty))
    CatalogMeta(d, (j \ "seq").extract[Long], (j \ "loadState").extract[String])
  }

  def writeAliases(m: Map[String, String]): String =
    JsonMethods.pretty(JsonMethods.render(m))

  def writeUsers(m: Map[String, Map[String, String]]): String =
    JsonMethods.pretty(JsonMethods.render(m))

  def readUsers(s: String): Map[String, Map[String, String]] = {
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(s).extract[Map[String, Map[String, String]]]
  }

  def readAliases(s: String): Map[String, String] = {
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(s).extract[Map[String, String]]
  }
}
