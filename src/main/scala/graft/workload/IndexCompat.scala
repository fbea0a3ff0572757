package graft.workload

import graft.operators.CollectionSearch
import graft.store.{Catalog, Collection, IndexDef}
import graft.validate.Validators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s.JsonDSL._
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.time.Instant

/** Rollback index-compatibility validation — the reference's
  * `validate_index_compatibility` brick
  * (requests/validate_index_compatibility.py:40-56 failure codes,
  * :806-993 main flow; design doc
  * docs/plans/2026-07-23-rollback-index-compatibility-validation.md):
  * after an upgrade, flush + load each checkpointed collection, record
  * the ACTUAL index metadata as an index-compatibility checkpoint, and
  * prove every index still serves (vector self-search per indexed
  * vector field, point filter per indexed scalar field, count + pk
  * samples from the seed checkpoint); after a rollback, re-enumerate
  * the metadata and compare it against the after-upgrade checkpoint —
  * any drift is the compatibility boundary the gate exists to catch.
  * `rebuildIndex` (the manual-diagnosis `--rebuild-index` path) drops
  * and recreates each declared index before validating.
  */
object IndexCompat {

  val IndexSearchFailed = "INDEX_SEARCH_FAILED"
  val IndexScalarQueryFailed = "INDEX_SCALAR_QUERY_FAILED"
  val IndexRebuildFailed = "INDEX_REBUILD_FAILED"
  val IndexMetadataMismatch = "INDEX_METADATA_MISMATCH"
  val CheckpointNotFound = "INDEX_COMPATIBILITY_CHECKPOINT_NOT_FOUND"
  val CheckpointEmpty = "INDEX_COMPATIBILITY_CHECKPOINT_EMPTY"
  val SeedCheckpointNotFound = "CHECKPOINT_NOT_FOUND"

  /** The identity fields compared across phases
    * (_index_identity, validate_index_compatibility.py:252-265: name,
    * field, type, metric, plus the JSON-path params when present).
    */
  final case class IndexIdentity(
      indexName: String,
      fieldName: String,
      indexType: String,
      metricType: String,
      jsonParams: Map[String, String]) {
    def render: String =
      s"$fieldName/$indexName:$indexType:$metricType" +
        (if (jsonParams.isEmpty) ""
         else jsonParams.toSeq.sorted.map { case (k, v) => s"$k=$v" }
           .mkString(":", ",", ""))
  }

  /** Our index names are per-field (one index per field in the store),
    * so the identity's index_name is `<field>_idx`.
    */
  def identity(ix: IndexDef): IndexIdentity = IndexIdentity(
    indexName = s"${ix.field}_idx",
    fieldName = ix.field,
    indexType = ix.indexType.toUpperCase,
    metricType = ix.metricType.map(_.toUpperCase).getOrElse(""),
    jsonParams = ix.params.filter { case (k, _) =>
      k == "json_path" || k == "json_cast_type" })

  private def sortedIdentities(ixs: Seq[IndexDef]): Seq[IndexIdentity] =
    ixs.map(identity).sortBy(i => (i.fieldName, i.indexName, i.indexType))

  private def checkpointPath(checkpointDir: String): String =
    CheckpointIO.resolve(checkpointDir, "index_compatibility.json")

  private def writeCheckpoint(checkpointDir: String, phase: String,
      collections: Seq[(String, Seq[IndexIdentity], Seq[String], String)])
      : String = {
    val path = checkpointPath(checkpointDir)
    val json: JObject =
      ("version" -> 1) ~
      ("phase" -> phase) ~
      ("collections" -> collections.map {
        case (name, ixs, vectorFields, releaseStatus) =>
          name -> (
            ("schema_name" -> name) ~
            ("actual_indexes" -> ixs.map(i =>
              ("index_name" -> i.indexName) ~
              ("field_name" -> i.fieldName) ~
              ("index_type" -> i.indexType) ~
              ("metric_type" -> i.metricType) ~
              ("params" -> i.jsonParams))) ~
            ("indexed_fields" -> ixs.map(_.fieldName)) ~
            ("indexed_vector_fields" -> vectorFields) ~
            ("release_status" -> releaseStatus))
      }.foldLeft(JObject()) { case (acc, (k, v)) => acc ~ (k -> v) })
    CheckpointIO.writeAtomic(path,
      JsonMethods.pretty(JsonMethods.render(json)))
    path
  }

  private def readCheckpoint(checkpointDir: String)
      : Option[Map[String, Seq[IndexIdentity]]] = {
    val path = checkpointPath(checkpointDir)
    if (!CheckpointIO.exists(path)) None
    else {
      val j = JsonMethods.parse(CheckpointIO.readString(path))
      val colls = (j \ "collections") match {
        case JObject(fields) => fields.map { case (name, body) =>
          val ixs = (body \ "actual_indexes") match {
            case JArray(items) => items.map { item =>
              implicit val fmt: Formats = DefaultFormats
              IndexIdentity(
                (item \ "index_name").extract[String],
                (item \ "field_name").extract[String],
                (item \ "index_type").extract[String],
                (item \ "metric_type").extract[String],
                (item \ "params").extractOpt[Map[String, String]]
                  .getOrElse(Map.empty))
            }
            case _ => Seq.empty[IndexIdentity]
          }
          name -> ixs
        }.toMap
        case _ => Map.empty[String, Seq[IndexIdentity]]
      }
      Some(colls)
    }
  }

  /** Run the brick over `collections` against the seed checkpoints in
    * `checkpointDir` (one [[DataIntegrity]] phase checkpoint per
    * collection). `phase` is `after-upgrade` or `after-rollback`.
    */
  def run(
      spark: SparkSession,
      catalog: Catalog,
      collections: Seq[String],
      checkpointDir: String,
      phase: String,
      rebuildIndex: Boolean = false,
      args: BrickProtocol.BrickArgs = BrickProtocol.BrickArgs(),
      brickName: String = "validate_index_compatibility",
      probeVec: (String, Long) => Option[Seq[Float]] = (_, _) => None)
      : BrickProtocol.BrickResult = {
    require(phase == "after-upgrade" || phase == "after-rollback",
      s"unknown phase $phase")
    val started = Instant.now()
    val failures = Seq.newBuilder[String]
    var collectionsChecked, collectionsWithIndex, indexesDropped,
      indexesRebuilt, actualIndexesTotal, searchesTotal, scalarQueries = 0

    def fail(code: String, detail: String): Unit =
      failures += s"$code: $detail"

    def result(status: String, cpPath: Option[String]) =
      BrickProtocol.BrickResult(brickName, args, status, started,
        Instant.now(),
        metrics = Map(
          "collections_checked" -> collectionsChecked.toDouble,
          "collections_with_index" -> collectionsWithIndex.toDouble,
          "indexes_dropped" -> indexesDropped.toDouble,
          "indexes_rebuilt" -> indexesRebuilt.toDouble,
          "actual_indexes_total" -> actualIndexesTotal.toDouble,
          "searches_total" -> searchesTotal.toDouble,
          "scalar_index_queries_total" -> scalarQueries.toDouble),
        failures = failures.result(),
        checkpointPath = cpPath)

    // after-rollback requires the after-upgrade checkpoint (:826-846).
    val previous = readCheckpoint(checkpointDir)
    if (phase == "after-rollback") {
      if (previous.isEmpty) {
        fail(CheckpointNotFound,
          s"index compatibility checkpoint does not exist: " +
            s"${checkpointPath(checkpointDir)}")
        return result("failed", None)
      }
      if (previous.exists(_.isEmpty)) {
        fail(CheckpointEmpty,
          "index compatibility checkpoint has no collections to validate")
        return result("failed", None)
      }
    }
    // after-rollback validates the checkpointed collection set only.
    val targets = phase match {
      case "after-rollback" =>
        collections.filter(c => previous.exists(_.contains(c)))
      case _ => collections
    }

    val out = Seq.newBuilder[(String, Seq[IndexIdentity], Seq[String], String)]
    targets.foreach { name =>
      val coll = catalog.collection(name)
      val d = coll.definition
      val pk = d.primaryField.name
      val seedState =
        try Some(BrickProtocol.readPhaseCheckpoint(checkpointDir,
          s"${DataIntegrity.Phase}_$name"))
        catch { case _: Exception => None }
      if (seedState.isEmpty) {
        fail(SeedCheckpointNotFound,
          s"seed checkpoint for $name does not exist in $checkpointDir")
      } else {
        val state = seedState.get
        collectionsChecked += 1
        val indexedFields = d.indexes.map(_.field).distinct
        if (indexedFields.nonEmpty) collectionsWithIndex += 1
        coll.flush()
        var releaseStatus = "not_requested"
        if (rebuildIndex) {
          releaseStatus =
            try { coll.release(); "released" }
            catch { case e: Exception => s"release_failed: ${e.getMessage}" }
          val declared = d.indexes
          declared.foreach { ix =>
            try { coll.dropIndex(ix.field); indexesDropped += 1 }
            catch { case e: Exception =>
              fail(IndexRebuildFailed, s"failed to drop $name.${ix.field}: " +
                e.getMessage)
            }
          }
          declared.foreach { ix =>
            try { coll.createIndex(spark, ix); indexesRebuilt += 1 }
            catch { case e: Exception =>
              fail(IndexRebuildFailed,
                s"failed to recreate $name.${ix.field}: ${e.getMessage}")
            }
          }
        }
        coll.load(spark)
        val actual = sortedIdentities(coll.listIndexes())
        actualIndexesTotal += actual.size
        // Expected indexed fields all present (:301-318).
        val actualFields = actual.map(_.fieldName).toSet
        val missing = indexedFields.filterNot(actualFields.contains)
        if (missing.nonEmpty)
          fail(IndexMetadataMismatch,
            s"$name: expected indexed fields missing from actual " +
              s"metadata: ${missing.mkString(", ")}")
        // after-rollback: byte-compare identities vs checkpoint (:270-299).
        if (phase == "after-rollback") {
          val expected = previous.get.getOrElse(name, Seq.empty)
            .sortBy(i => (i.fieldName, i.indexName, i.indexType))
          if (expected != actual)
            fail(IndexMetadataMismatch,
              s"$name: actual index metadata differs from after-upgrade " +
                s"checkpoint; expected " +
                s"[${expected.map(_.render).mkString("; ")}], actual " +
                s"[${actual.map(_.render).mkString("; ")}]")
        }
        // Query serviceability: count over the seeded pk range + the
        // three sample pks (:740-776).
        val df = coll.read(spark)
        val pkType = df.schema(pk).dataType
        def pkLit(v: String) = lit(v).cast(pkType)
        // Count + all three sample probes in one aggregation job.
        val sampleKeys = Seq("min_pk", "mid_pk", "max_pk")
        val (gotCount, present) = Validators.countAndPresence(df,
          Some(col(pk) >= pkLit(state("min_pk")) &&
            col(pk) <= pkLit(state("max_pk"))),
          sampleKeys.map(k => col(pk) === pkLit(state(k))))
        if (gotCount != state("expected_count").toLong)
          fail(IndexScalarQueryFailed, s"$name: count mismatch: expected " +
            s"${state("expected_count")}, got $gotCount")
        sampleKeys.zip(present).foreach { case (k, there) =>
          if (!there)
            fail(IndexScalarQueryFailed,
              s"$name: sample $k=${state(k)} absent")
        }
        val probePk = state("min_pk")
        val fieldsByName = d.fields.map(f => f.name -> f).toMap
        val functionOutputs = d.functionOutputFields
        val vectorFields = indexedFields.filter(f =>
          fieldsByName.get(f).exists(_.dim.isDefined) &&
            !functionOutputs.contains(f))
        // Indexed vector self-search (:441-580): the probe row's own
        // vector, filtered to its pk, must hit with a perfect score.
        vectorFields.foreach { vf =>
          val ix = d.indexes.find(_.field == vf).get
          try {
            // Deterministic probe vector, generated client-side like the
            // reference's generate_field_value (:498-517); reading it
            // back from the collection is the fallback when no
            // generator is supplied.
            val vec = scala.util.Try(probePk.toLong).toOption
              .flatMap(id => probeVec(vf, id)).getOrElse(
                coll.query(spark, s"$pk == $probePk", Seq(vf))
                  .head().getSeq[Float](0))
            val metric = ix.metricType.getOrElse("L2").toUpperCase
            val params = ix.params.get("nlist")
              .map(n => Map("nprobe" -> n)).getOrElse(Map.empty) ++
              Map("metric_type" -> metric)
            val hits = CollectionSearch.search(spark, coll, vf, vec, k = 5,
              filterExpr = s"$pk == $probePk", searchParams = params,
              outputFields = Seq(pk))
              .select(col(pk).cast("string"), col("score"))
              .collect()
            val hit = hits.find(_.getString(0) == probePk)
            if (hit.isEmpty)
              fail(IndexSearchFailed,
                s"$name.$vf: self-search did not return pk $probePk " +
                  s"(got ${hits.map(_.getString(0)).mkString(", ")})")
            else {
              val dist = hit.get.getDouble(1)
              if (Set("L2", "HAMMING", "JACCARD").contains(metric) &&
                  dist > 1e-3)
                fail(IndexSearchFailed,
                  s"$name.$vf: self-search distance $dist > 1e-3 ($metric)")
              if (Set("COSINE", "IP").contains(metric) && dist < 0.9)
                fail(IndexSearchFailed,
                  s"$name.$vf: self-search score $dist < 0.9 ($metric)")
            }
            searchesTotal += 1
          } catch {
            case e: Exception =>
              fail(IndexSearchFailed, s"$name.$vf: ${e.getMessage}")
          }
        }
        // Indexed scalar point filters (:612-737): the probe row's own
        // value must come back, alone and pk-conjoined.
        d.indexes.filterNot(ix => vectorFields.contains(ix.field))
          .filterNot(ix => functionOutputs.contains(ix.field))
          .foreach { ix =>
            try {
              val v = coll.query(spark, s"$pk == $probePk", Seq(ix.field))
                .head().get(0)
              val filterValue = v match {
                case s: String => "\"" + s.replace("\"", "\\\"") + "\""
                case other => String.valueOf(other)
              }
              // GEOMETRY fields probe geometrically, not by string
              // equality; a null probe value falls back to `is null`
              // (requests/validate_index_compatibility.py:629-637).
              val scalarFilter =
                if (v == null) s"${ix.field} is null"
                else if (ix.indexType.toUpperCase == "RTREE")
                  s"ST_EQUALS(${ix.field}, $filterValue)"
                else s"${ix.field} == $filterValue"
              if (coll.query(spark, scalarFilter, Seq(pk), limit = Some(1))
                  .isEmpty)
                fail(IndexScalarQueryFailed,
                  s"$name.${ix.field}: filter [$scalarFilter] returned " +
                    "no matches")
              val combined = s"($scalarFilter) && $pk == $probePk"
              val got = coll.query(spark, combined, Seq(pk), limit = Some(1))
                .collect().map(r => String.valueOf(r.get(0)))
              if (!got.contains(probePk))
                fail(IndexScalarQueryFailed,
                  s"$name.${ix.field}: filter [$combined] did not return " +
                    s"pk $probePk")
              scalarQueries += 1
            } catch {
              case e: Exception =>
                fail(IndexScalarQueryFailed,
                  s"$name.${ix.field}: ${e.getMessage}")
            }
          }
        out += ((name, actual, vectorFields, releaseStatus))
      }
    }

    val cpPath = writeCheckpoint(checkpointDir, phase, out.result())
    result(if (failures.result().isEmpty) "passed" else "failed",
      Some(cpPath))
  }
}
