package graft.workload

import graft.operators.CollectionSearch
import graft.store.{Catalog, Collection, CollectionDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.JsonDSL._
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.time.Instant

/** Per-phase DML/DQL validation — the reference's
  * `validate_phase_dml_dql` brick (requests/validate_phase_dml_dql.py):
  * in each lifecycle phase, run a full DML cycle (insert → upsert →
  * delete → flush) against every EXISTING seeded collection plus a
  * phase-NEW collection, then prove the results query back correctly
  * (remaining count over the phase's pk range, sample pks present,
  * deleted pks absent, upserted values applied, vector searches
  * serviceable). The after-upgrade run persists a phase checkpoint
  * (:775-796); the after-rollback run first re-validates that
  * checkpoint state survived the rollback (:902-957), then runs its
  * own fresh cycle with rollback-phase start ids, including a
  * "carried" pass over the collections the after-upgrade phase
  * created (:1060-1082).
  */
object PhaseDmlDql {

  val PhaseDmlFailed = "PHASE_DML_FAILED"
  val PhaseDqlFailed = "PHASE_DQL_FAILED"
  val PhaseNewCollectionFailed = "PHASE_NEW_COLLECTION_FAILED"
  val PhaseUpsertNotApplied = "PHASE_UPSERT_NOT_APPLIED"
  val PhaseCheckpointNotFound = "PHASE_CHECKPOINT_NOT_FOUND"

  /** Deterministic row generation for a collection schema — the
    * engine-side analog of the reference's seeded `generate_rows`:
    * `make(spark, startId, count, seed)` yields the batch;
    * `upsertValue(id, seed)` is the expected post-upsert value of
    * `upsertField` (used to verify the upsert actually applied).
    */
  final case class RowGen(
      make: (SparkSession, Long, Int, Long) => DataFrame,
      upsertField: String,
      upsertValue: (Long, Long) => String,
      // Deterministic probe vector per (vector field, pk) — the
      // client-side generate_field_value the reference's search probe
      // uses; None falls back to reading the vector from the store.
      vecFor: (String, Long) => Option[Seq[Float]] = (_, _) => None)

  /** Row generator for the scenario's compat schema
    * (id, category, content, version, embedding — the vector feeds the
    * phase brick's indexed-vector serviceability probe).
    */
  def compatRowGen: RowGen = RowGen(
    make = (s, start, count, seed) => {
      import s.implicits._
      (0 until count).map { i =>
        val id = start + i
        (id, id % 100, s"phase_${seed}_$id", seed, Scenario.compatVec(id))
      }.toDF("id", "category", "content", "version", "embedding")
    },
    upsertField = "content",
    upsertValue = (id, seed) => s"phase_${seed}_$id",
    vecFor = (_, id) => Some(Scenario.compatVec(id).toSeq))

  private def checkpointFile(dir: String): String =
    CheckpointIO.resolve(dir, "phase_dml_dql_after_upgrade.json")

  private final case class ExistingState(
      collection: String, primaryField: String, startId: Long, rows: Int,
      inserted: Int, upserted: Int, deleted: Int,
      deletedValues: Seq[Long], remainingCount: Long,
      remainingMinPk: Long, remainingMaxPk: Long,
      remainingValues: Seq[Long], upsertField: String,
      upsertSamples: Seq[(Long, String)])

  private final case class NewState(
      collection: String, primaryField: String, startId: Long,
      inserted: Int, minPk: Long, maxPk: Long, sampleValues: Seq[Long])

  /** One DML/DQL cycle against an existing collection
    * (_run_existing_collection_dml_dql, :554-688).
    */
  private def existingCycle(spark: SparkSession, coll: Collection,
      gen: RowGen, rows: Int, deleteRows: Int, batchSize: Int,
      startId: Long, seed: Long, fail: (String, String) => Unit,
      searches: () => Unit): Option[ExistingState] = {
    val pk = coll.definition.primaryField.name
    val deleted =
      try {
        (0 until rows by batchSize).foreach { off =>
          val n = math.min(batchSize, rows - off)
          coll.insert(spark, gen.make(spark, startId + off, n, seed)): Unit
        }
        (0 until rows by batchSize).foreach { off =>
          val n = math.min(batchSize, rows - off)
          coll.upsert(spark, gen.make(spark, startId + off, n, seed + 101)): Unit
        }
        val del = math.min(deleteRows, rows)
        coll.delete(spark,
          s"$pk >= $startId && $pk < ${startId + del}")
        coll.flush()
        del
      } catch {
        case e: Exception =>
          fail(PhaseDmlFailed,
            s"${coll.name}: existing collection phase DML failed: " +
              e.getMessage)
          return None
      }
    val deletedValues = (0 until deleted).map(startId + _)
    val remainingMin = startId + deleted
    val remainingMax = startId + rows - 1
    val remainingCount = (rows - deleted).toLong
    // Load for the DQL block (the reference's _load_collection before
    // validation): the merged view materializes ONCE and the probe
    // aggregation, upsert fetch and vector searches all read the cache
    // instead of re-paying the pk merge window per job. Restore the
    // caller-visible load state afterwards.
    val wasLoaded = coll.loadState == "Loaded"
    if (!wasLoaded) coll.load(spark)
    try {
    // All four phase-DQL probes (remaining count, min/max presence,
    // deleted-range residue) in ONE aggregation job over the phase's
    // pk range — per-probe jobs would each pay the full fixed job
    // cost on a tiny collection.
    val df = coll.read(spark)
      .filter(col(pk) >= startId && col(pk) <= remainingMax)
    val probes = graft.validate.Validators.counts(df, Seq(
      col(pk) >= remainingMin && col(pk) <= remainingMax,
      col(pk) === remainingMin,
      col(pk) === remainingMax,
      col(pk) >= startId && col(pk) < remainingMin))
    val Seq(got, minThere, maxThere, stillThere) = probes
    if (got != remainingCount)
      fail(PhaseDqlFailed, s"${coll.name}: phase DML remaining count " +
        s"mismatch: expected $remainingCount in " +
        s"[$remainingMin, $remainingMax], found $got")
    val remainingValues = Seq(remainingMin, remainingMax)
    remainingValues.zip(Seq(minThere, maxThere)).foreach { case (v, there) =>
      if (there == 0L)
        fail(PhaseDqlFailed, s"${coll.name}: remaining pk $v absent")
    }
    if (stillThere != 0)
      fail(PhaseDqlFailed,
        s"${coll.name}: $stillThere deleted pks still present")
    // Upsert applied (_validate_upserted_values, :406-467): the
    // surviving sample rows must carry the seed+101 generation —
    // both samples fetched in one query.
    val samples = remainingValues.map { id =>
      id -> gen.upsertValue(id, seed + 101)
    }
    val backByPk = coll.query(spark,
      s"$pk == $remainingMin || $pk == $remainingMax",
      Seq(pk, gen.upsertField)).collect()
      .map(r => String.valueOf(r.get(0)) -> String.valueOf(r.get(1))).toMap
    samples.foreach { case (id, expected) =>
      backByPk.get(String.valueOf(id)) match {
        case None =>
          fail(PhaseDqlFailed, s"${coll.name}: upsert sample pk $id absent")
        case Some(v) if v != expected =>
          fail(PhaseUpsertNotApplied,
            s"${coll.name}.$pk=$id: ${gen.upsertField} = " +
              s"'$v', expected '$expected'")
        case _ => ()
      }
    }
    runSearches(spark, coll, remainingMax, gen, fail, searches)
    Some(ExistingState(coll.name, pk, startId, rows, rows, rows, deleted,
      deletedValues, remainingCount, remainingMin, remainingMax,
      remainingValues, gen.upsertField, samples))
    } finally if (!wasLoaded) coll.release()
  }

  /** Vector-search serviceability probe (_run_searches, :332-370):
    * each indexed vector field must return results for the probe
    * row's own vector.
    */
  private def runSearches(spark: SparkSession, coll: Collection,
      probePk: Long, gen: RowGen, fail: (String, String) => Unit,
      searches: () => Unit): Unit = {
    val d = coll.definition
    val fieldsByName = d.fields.map(f => f.name -> f).toMap
    val functionOutputs = d.functionOutputFields
    d.indexes.map(_.field).distinct
      .filter(f => fieldsByName.get(f).exists(_.dim.isDefined) &&
        !functionOutputs.contains(f))
      .foreach { vf =>
        try {
          val pk = d.primaryField.name
          val vec = gen.vecFor(vf, probePk).getOrElse(
            coll.query(spark, s"$pk == $probePk", Seq(vf))
              .head().getSeq[Float](0))
          val ix = d.indexes.find(_.field == vf).get
          val params = ix.params.get("nlist")
            .map(n => Map("nprobe" -> n)).getOrElse(Map.empty) ++
            Map("metric_type" -> ix.metricType.getOrElse("L2"))
          if (CollectionSearch.search(spark, coll, vf, vec, k = 5,
              searchParams = params).isEmpty)
            fail(PhaseDqlFailed,
              s"${coll.name}.$vf: phase vector search returned no hits")
          searches()
        } catch {
          case e: Exception =>
            fail(PhaseDqlFailed,
              s"${coll.name}.$vf: phase vector search failed: " +
                e.getMessage)
        }
      }
  }

  /** Create + seed + validate a phase-new collection
    * (_run_new_collection_dml_dql, :691-773).
    */
  private def newCycle(spark: SparkSession, catalog: Catalog,
      name: String, defFor: String => CollectionDef, gen: RowGen,
      rows: Int, batchSize: Int, startId: Long, seed: Long,
      fail: (String, String) => Unit,
      searches: () => Unit): Option[NewState] = {
    val coll =
      try {
        if (catalog.hasCollection(name)) catalog.dropCollection(name)
        val c = catalog.createCollection(defFor(name))
        (0 until rows by batchSize).foreach { off =>
          val n = math.min(batchSize, rows - off)
          c.insert(spark, gen.make(spark, startId + off, n, seed)): Unit
        }
        c.flush()
        c
      } catch {
        case e: Exception =>
          fail(PhaseNewCollectionFailed,
            s"$name: new collection phase setup/DML failed: ${e.getMessage}")
          return None
      }
    val pk = coll.definition.primaryField.name
    val minPk = startId
    val maxPk = startId + rows - 1
    val samples = Seq(minPk, maxPk)
    // Same load-for-DQL discipline as the existing-collection cycle.
    val wasLoaded = coll.loadState == "Loaded"
    if (!wasLoaded) coll.load(spark)
    try {
      // Count + both sample probes in one aggregation job.
      val (got, present) = graft.validate.Validators.countAndPresence(
        coll.read(spark),
        Some(col(pk) >= minPk && col(pk) <= maxPk),
        samples.map(v => col(pk) === v))
      if (got != rows)
        fail(PhaseDqlFailed, s"$name: new collection count mismatch: " +
          s"expected $rows in [$minPk, $maxPk], found $got")
      samples.zip(present).foreach { case (v, there) =>
        if (!there) fail(PhaseDqlFailed, s"$name: sample pk $v absent")
      }
      runSearches(spark, coll, maxPk, gen, fail, searches)
      Some(NewState(name, pk, startId, rows, minPk, maxPk, samples))
    } finally if (!wasLoaded) coll.release()
  }

  private def writeCheckpoint(dir: String, phase: String,
      existing: Seq[ExistingState], fresh: Seq[NewState]): String = {
    val path = checkpointFile(dir)
    val json: JObject =
      ("version" -> 1) ~
      ("phase" -> phase) ~
      ("existing_collections" -> existing.map { e =>
        e.collection -> (
          ("collection" -> e.collection) ~
          ("primary_field" -> e.primaryField) ~
          ("start_id" -> e.startId) ~
          ("rows" -> e.rows) ~
          ("inserted" -> e.inserted) ~
          ("upserted" -> e.upserted) ~
          ("deleted" -> e.deleted) ~
          ("deleted_values" -> e.deletedValues) ~
          ("remaining_count" -> e.remainingCount) ~
          ("remaining_min_pk" -> e.remainingMinPk) ~
          ("remaining_max_pk" -> e.remainingMaxPk) ~
          ("remaining_values" -> e.remainingValues) ~
          ("upsert_field" -> e.upsertField) ~
          ("upsert_samples" -> e.upsertSamples.map { case (id, v) =>
            (("pk" -> id) ~ ("value" -> v)): JObject }))
      }.foldLeft(JObject()) { case (acc, (k, v)) => acc ~ (k -> v) }) ~
      ("new_collections" -> fresh.map { n =>
        n.collection -> (
          ("collection" -> n.collection) ~
          ("primary_field" -> n.primaryField) ~
          ("start_id" -> n.startId) ~
          ("inserted" -> n.inserted) ~
          ("min_pk" -> n.minPk) ~
          ("max_pk" -> n.maxPk) ~
          ("sample_values" -> n.sampleValues))
      }.foldLeft(JObject()) { case (acc, (k, v)) => acc ~ (k -> v) })
    CheckpointIO.writeAtomic(path,
      JsonMethods.pretty(JsonMethods.render(json)))
    path
  }

  /** Re-validate the after-upgrade checkpoint state after a rollback
    * (_validate_phase_checkpoint_before_rollback, :902-957).
    */
  private def validateCheckpoint(spark: SparkSession, catalog: Catalog,
      dir: String, fail: (String, String) => Unit): Boolean = {
    implicit val fmt: Formats = DefaultFormats
    val path = checkpointFile(dir)
    if (!CheckpointIO.exists(path)) {
      fail(PhaseCheckpointNotFound,
        s"after-upgrade phase checkpoint does not exist: $path")
      return false
    }
    val j = JsonMethods.parse(CheckpointIO.readString(path))
    def entries(key: String): Seq[JValue] = (j \ key) match {
      case JObject(fields) => fields.map(_._2)
      case _ => Seq.empty
    }
    entries("existing_collections").foreach { e =>
      val name = (e \ "collection").extract[String]
      val pk = (e \ "primary_field").extract[String]
      val coll = catalog.collection(name)
      val df = coll.read(spark)
      val minPk = (e \ "remaining_min_pk").extract[Long]
      val maxPk = (e \ "remaining_max_pk").extract[Long]
      val expected = (e \ "remaining_count").extract[Long]
      val remainingValues = (e \ "remaining_values").extract[Seq[Long]]
      val deletedValues = (e \ "deleted_values").extract[Seq[Long]]
      // Remaining count, remaining-pk presence, and deleted-pk residue
      // in ONE aggregation job (the deleted range sits outside the
      // remaining range, so this pass scans the union of both).
      val probes = graft.validate.Validators.counts(df,
        (col(pk) >= minPk && col(pk) <= maxPk) +:
          remainingValues.map(v => col(pk) === v) :+
          (if (deletedValues.nonEmpty) col(pk).isin(deletedValues: _*)
           else lit(false)))
      val got = probes.head
      if (got != expected)
        fail(PhaseDqlFailed, s"$name: phase checkpoint remaining count " +
          s"mismatch: expected $expected in [$minPk, $maxPk], found $got")
      remainingValues.zip(probes.slice(1, 1 + remainingValues.size))
        .foreach { case (v, there) =>
          if (there == 0L)
            fail(PhaseDqlFailed,
              s"$name: phase checkpoint remaining pk $v absent")
        }
      if (deletedValues.nonEmpty && probes.last != 0)
        fail(PhaseDqlFailed,
          s"$name: ${probes.last} phase-deleted pks reappeared after rollback")
      val upsertField = (e \ "upsert_field").extract[String]
      (e \ "upsert_samples") match {
        case JArray(items) =>
          // One query fetches every checkpointed upsert sample.
          val ids = items.map(it => (it \ "pk").extract[Long])
          val backByPk =
            if (ids.isEmpty) Map.empty[String, String]
            else coll.query(spark,
              ids.map(id => s"$pk == $id").mkString(" || "),
              Seq(pk, upsertField)).collect()
              .map(r => String.valueOf(r.get(0)) -> String.valueOf(r.get(1)))
              .toMap
          items.foreach { it =>
            val id = (it \ "pk").extract[Long]
            val expectedV = (it \ "value").extract[String]
            backByPk.get(String.valueOf(id)) match {
              case None =>
                fail(PhaseDqlFailed,
                  s"$name: phase checkpoint upserted pk $id is missing")
              case Some(v) if v != expectedV =>
                fail(PhaseUpsertNotApplied,
                  s"$name.$pk=$id: $upsertField = '$v' after " +
                    s"rollback, checkpoint expected '$expectedV'")
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    entries("new_collections").foreach { e =>
      val name = (e \ "collection").extract[String]
      val pk = (e \ "primary_field").extract[String]
      val coll = catalog.collection(name)
      val minPk = (e \ "min_pk").extract[Long]
      val maxPk = (e \ "max_pk").extract[Long]
      val expected = (e \ "inserted").extract[Long]
      val sampleValues = (e \ "sample_values").extract[Seq[Long]]
      val (got, present) = graft.validate.Validators.countAndPresence(
        coll.read(spark),
        Some(col(pk) >= minPk && col(pk) <= maxPk),
        sampleValues.map(v => col(pk) === v))
      if (got != expected)
        fail(PhaseDqlFailed, s"$name: phase checkpoint new-collection " +
          s"count mismatch: expected $expected, found $got")
      sampleValues.zip(present).foreach { case (v, there) =>
        if (!there)
          fail(PhaseDqlFailed, s"$name: phase checkpoint sample pk $v absent")
      }
    }
    true
  }

  /** Run the brick. `phase` is `after-upgrade` or `after-rollback`;
    * the rollback run validates the after-upgrade checkpoint first
    * (when `validatePhaseCheckpoint`), then runs its own fresh cycle —
    * `carried` names the collections the upgrade phase created, which
    * get an existing-style pass at `existingStartId + 10_000_000`
    * with `seed + 31` (:1057-1082).
    */
  def run(
      spark: SparkSession,
      catalog: Catalog,
      existing: Seq[String],
      newCollectionNames: Seq[String],
      defFor: String => CollectionDef,
      gen: RowGen,
      rows: Int,
      deleteRows: Int,
      newRows: Int,
      batchSize: Int,
      existingStartId: Long,
      newStartId: Long,
      seed: Long,
      phase: String,
      carried: Seq[String] = Seq.empty,
      validatePhaseCheckpoint: Boolean = true,
      checkpointDir: String,
      args: BrickProtocol.BrickArgs = BrickProtocol.BrickArgs(),
      brickName: String = "validate_phase_dml_dql")
      : BrickProtocol.BrickResult = {
    require(phase == "after-upgrade" || phase == "after-rollback",
      s"unknown phase $phase")
    val started = Instant.now()
    val failures = Seq.newBuilder[String]
    def fail(code: String, detail: String): Unit =
      failures += s"$code: $detail"
    var searchesTotal = 0
    var inserted, upserted, deleted, newInserted, carriedInserted = 0L

    def result(status: String, cpPath: Option[String]) =
      BrickProtocol.BrickResult(brickName, args, status, started,
        Instant.now(),
        metrics = Map(
          "existing_collections_total" -> existing.size.toDouble,
          "new_collections_total" -> newCollectionNames.size.toDouble,
          "carried_collections_total" -> carried.size.toDouble,
          "existing_inserted_total" -> inserted.toDouble,
          "existing_upserted_total" -> upserted.toDouble,
          "existing_deleted_total" -> deleted.toDouble,
          "carried_inserted_total" -> carriedInserted.toDouble,
          "new_collection_inserted_total" -> newInserted.toDouble,
          "searches_total" -> searchesTotal.toDouble),
        failures = failures.result(), checkpointPath = cpPath)

    if (phase == "after-rollback" && validatePhaseCheckpoint) {
      val found = validateCheckpoint(spark, catalog, checkpointDir, fail)
      // Checkpoint validation failures end the run before fresh DML,
      // like the reference's early return (:1017-1022).
      if (!found || failures.result().nonEmpty)
        return result("failed", None)
    }

    val existingStates = existing.flatMap { name =>
      val st = existingCycle(spark, catalog.collection(name), gen, rows,
        deleteRows, batchSize, existingStartId, seed, fail,
        () => searchesTotal += 1)
      st.foreach { s =>
        inserted += s.inserted; upserted += s.upserted; deleted += s.deleted
      }
      st
    }
    carried.filter(catalog.hasCollection).foreach { name =>
      val st = existingCycle(spark, catalog.collection(name), gen, rows,
        deleteRows, batchSize, existingStartId + 10000000L, seed + 31,
        fail, () => searchesTotal += 1)
      st.foreach(s => carriedInserted += s.inserted)
    }
    val newStates = newCollectionNames.flatMap { name =>
      val st = newCycle(spark, catalog, name, defFor, gen, newRows,
        batchSize, newStartId, seed + 17, fail, () => searchesTotal += 1)
      st.foreach(s => newInserted += s.inserted)
      st
    }

    val ok = failures.result().isEmpty
    // Only the passing after-upgrade run persists the checkpoint
    // (:1085-1090) — a failed upgrade phase must not seed rollback
    // validation with bad expectations.
    val cpPath =
      if (phase == "after-upgrade" && ok)
        Some(writeCheckpoint(checkpointDir, phase, existingStates, newStates))
      else None
    result(if (ok) "passed" else "failed", cpPath)
  }
}
