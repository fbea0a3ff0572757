package graft.store

import graft.expr.MilvusExpr
import graft.operators.QueryOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Result of [[Collection.insert]]: the committed row count plus the
  * written primary keys as a LAZY DataFrame read back from the
  * committed delta files — returned ids are provably the written ids
  * (no nondeterministic recompute) and bulk ETL never collects an
  * unbounded id list to the driver.
  */
final case class InsertResult(count: Long, ids: DataFrame) {
  /** Driver-side ids for validator-scale batches (the reference's
    * insert_entities returns ids, validate_phase_dml_dql.py:92-102).
    * Guarded so a bulk load can't OOM the driver by accident.
    */
  def idSeq(maxRows: Int = 1000000): Seq[Any] = {
    require(count <= maxRows,
      s"insert wrote $count rows; use .ids (DataFrame) for bulk loads")
    ids.collect().map(_.get(0)).toSeq
  }
}

/** Write denied because the collection crossed a configured quota —
  * message text matches what the reference's deny-retry loops string-
  * match on (create_n_insert_until_denied.py:124,
  * mc_create_rabitq_mmap.py max-deny-times).
  */
final class QuotaExceededException(msg: String) extends RuntimeException(msg)

/** A schema'd, mutable collection over sequenced parquet deltas —
  * merge-on-read (the Spark-native equivalent of the reference's
  * insert/upsert/delete surface, 2.6/common.py:804-856, :202-238).
  *
  * Storage layout under `<catalog>/<name>/data/`:
  * one parquet directory per write batch, each row carrying
  *   `_seq`   — monotonically increasing write-batch sequence,
  *   `_del`   — tombstone flag,
  *   `_ts`    — insert wall-clock (millis) for TTL expiry,
  *   `_part`  — partition name (explicit partitions or partition-key hash).
  *
  * Read = union of deltas → last `_seq` per PK wins → drop tombstones →
  * TTL filter. At 100 TB this is the standard LSM-on-object-store shape:
  * the per-PK window shuffles once on the PK (hash-partitioned, AQE
  * sized), `_part` is a physical partition column so partition_names
  * prune directories at the scan, and compaction (`compact()`) folds
  * deltas back to a single base to bound read amplification.
  *
  * `partial_update` upserts (2.6/common.py:824-827) are resolved at
  * WRITE time: the incoming batch is joined against the current
  * snapshot and absent columns are coalesced from the old row
  * (upsert3.py:184-226 semantics), so the read path stays pure
  * last-write-wins.
  */
final class Collection(private[graft] val catalog: Catalog, val name: String) {

  def definition: CollectionDef = catalog.describeCollection(name)

  private def dataDir = catalog.collectionDir(name).resolve("data")

  private val SEQ = "_seq"
  private val DEL = "_del"
  private val TS = "_ts"
  private val PART = "_part"
  private val DEFAULT_PART = "_default"
  /** Change-feed commit position (the delta DIRECTORY seq). Differs
    * from the stored `_seq` only for imports committed after later DML
    * (2PC prepare-time visibility): `_seq` resolves last-writer-wins,
    * `_commit_seq` orders the changelog.
    */
  private val COMMIT_SEQ = "_commit_seq"
  /** Dynamic-field column: undeclared insert columns are packed into a
    * JSON object here (the reference's `$meta`, common/data.py:216-221);
    * the expression compiler resolves unknown names through it
    * (search_permanently.py:128-132 `Tenant == "user_17"` filters).
    */
  private val DYN = "_dynamic"

  // ---- DDL-ish ---------------------------------------------------------

  def createPartition(p: String): Unit =
    catalog.mutateDef(name) { d =>
      require(d.partitionKeyField.isEmpty, "collection uses a partition key")
      if (d.partitions.contains(p)) d
      else d.copy(partitions = d.partitions :+ p)
    }

  def dropPartition(spark: SparkSession, p: String): Unit = {
    val d = definition
    require(d.partitions.contains(p), s"no partition $p")
    // Drop = delete every entity whose GLOBALLY visible row lives in p.
    // A partition-SCOPED read resolves last-writer-wins within p alone,
    // so it lists pks whose p-copy is superseded by a later write in
    // another partition — tombstoning those would kill the entity the
    // OTHER partition is still serving. The global merge here is a
    // DDL-rate cost, not a query-path one.
    val live = readWithPartition(spark).filter(col(PART) === p)
    delete(spark, lit(true), preFiltered = Some(live))
    catalog.updateDef(name, d.copy(partitions = d.partitions.filterNot(_ == p)))
  }

  def listPartitions(): Seq[String] = {
    val d = definition
    if (d.partitions.nonEmpty) d.partitions
    else d.numPartitions.map(n => (0 until n).map(i => s"_bucket_$i"))
      .getOrElse(Seq(DEFAULT_PART))
  }

  // ---- index lifecycle (S4-S6): metadata + physical build ---------------

  def createIndex(ix: IndexDef): Unit =
    catalog.mutateDef(name) { d =>
      require(d.fields.exists(_.name == ix.field), s"no field ${ix.field}")
      ix.validateParams()
      d.copy(indexes = d.indexes.filterNot(_.field == ix.field) :+ ix)
    }

  /** create_index with eager physical materialization (IVF data
    * partitioned by cell / BM25 postings bucketed by term — see
    * [[IndexStore]]). The metadata-only overload defers the build to
    * the first search.
    */
  def createIndex(spark: SparkSession, ix: IndexDef): Unit = {
    createIndex(ix)
    IndexStore.materialize(spark, this, ix)
  }

  def dropIndex(field: String): Unit = {
    catalog.mutateDef(name)(d =>
      d.copy(indexes = d.indexes.filterNot(_.field == field)))
    IndexStore.drop(this, field)
  }

  /** Rebuild the physical index at the current snapshot
    * (scalar_index_cycle.py:124-174 drop/recreate cycle).
    */
  def rebuildIndex(spark: SparkSession, field: String): Unit =
    IndexStore.rebuild(spark, this, field)

  def listIndexes(): Seq[IndexDef] = definition.indexes

  /** describe_index (milvus_client/scalar_index_cycle.py:91-93 reads
    * field_name / index_type / params off it): the declared definition
    * plus the physical build state — `state` is "built" with the
    * committed pointer's facts when a persisted build exists, else
    * "declared" (the index serves lazily on first search; scalar
    * index kinds are subsumed by parquet stats and never persist).
    */
  def describeIndex(field: String): Map[String, String] = {
    val ix = definition.indexes.find(_.field == field).getOrElse(
      throw new IllegalArgumentException(s"no index declared on $field"))
    Map("field_name" -> field, "index_type" -> ix.indexType) ++
      ix.metricType.map("metric_type" -> _) ++ ix.params ++
      IndexStore.describe(this, field)
        .map(b => b + ("state" -> "built"))
        .getOrElse(Map("state" -> "declared"))
  }

  // ---- schema evolution (schema_evolution_workload.py:44-124) -----------

  def addField(f: FieldDef): Unit = {
    catalog.mutateDef(name) { d =>
      require(f.nullable || f.defaultValue.isDefined,
        "added fields must be nullable or carry a default_value " +
          "(existing rows have no stored value for them)")
      require(!d.fields.exists(_.name == f.name), s"field ${f.name} exists")
      f.defaultValue.foreach(Collection.validateDefault(f, _))
      d.copy(fields = d.fields :+ f)
    }
    refreshCachedSchema()
  }

  /** Dynamic StructArray subfield add (feature inventory §1
    * "StructArray 动态加字段"): widen an `array<struct>` field's
    * element type with a new nullable subfield. No data rewrite:
    * committed deltas were written without the subfield, and the
    * store's explicit read schema (rawDeltas) projects missing nested
    * fields as null — the same mechanism top-level [[addField]] rides.
    */
  def addStructSubfield(structArrayField: String,
      sub: org.apache.spark.sql.types.StructField): Unit = {
    catalog.mutateDef(name) { d =>
      val f = d.fields.find(_.name == structArrayField).getOrElse(
        throw new IllegalArgumentException(s"no field $structArrayField"))
      f.dataType match {
        case org.apache.spark.sql.types.ArrayType(st: StructType, n) =>
          require(sub.nullable, "added subfields must be nullable")
          require(!st.fieldNames.contains(sub.name),
            s"subfield ${sub.name} exists on $structArrayField")
          val widened = org.apache.spark.sql.types.ArrayType(
            StructType(st.fields :+ sub), n)
          d.copy(fields = d.fields.map(x =>
            if (x.name == structArrayField) x.copy(dataType = widened)
            else x))
        case other => throw new IllegalArgumentException(
          s"$structArrayField is $other, not a StructArray")
      }
    }
    refreshCachedSchema()
  }

  def dropField(fieldName: String): Unit = {
    catalog.mutateDef(name) { d =>
      val f = d.fields.find(_.name == fieldName)
        .getOrElse(throw new IllegalArgumentException(s"no field $fieldName"))
      require(!f.isPrimary, "cannot drop the primary field")
      d.copy(fields = d.fields.filterNot(_.name == fieldName))
    }
    refreshCachedSchema()
  }

  // ---- function lifecycle (schema_evolution_workload.py:93-124) ---------

  /** Bind a function (BM25 text -> sparse vector). Output fields are
    * engine-computed: declared if missing, never inserted, and served
    * as derived columns while the function is bound
    * (add_collection_function semantics).
    */
  def addFunction(f: FunctionDef): Unit = {
    catalog.mutateDef(name) { d =>
      val kind = f.functionType.toUpperCase
      require(kind == "BM25" || kind == "TEXT_EMBEDDING",
        s"unsupported function type ${f.functionType}")
      require(!d.functions.exists(_.name == f.name),
        s"function ${f.name} exists")
      require(f.inputFields.nonEmpty && f.outputFields.nonEmpty,
        "function needs input and output fields")
      f.inputFields.foreach { in =>
        val fd = d.fields.find(_.name == in).getOrElse(
          throw new IllegalArgumentException(s"no input field $in"))
        require(fd.dataType == StringType, s"$kind input $in must be VARCHAR")
      }
      val extra =
        if (kind == "BM25")
          f.outputFields.filterNot(o => d.fields.exists(_.name == o))
            .map(o => FieldDef(o, MapType(IntegerType, DoubleType)))
        else {
          // TEXT_EMBEDDING (model-provider surface): only the local
          // deterministic provider runs in-engine; remote providers are
          // a credentialed deployment concern (P2), rejected up front.
          val provider = f.params.getOrElse("provider", "deterministic")
          require(provider == "deterministic",
            s"text-embedding provider '$provider' needs external " +
              "credentials; only 'deterministic' runs in-engine")
          val dimStr = f.params.getOrElse("dim",
            throw new IllegalArgumentException(
              "TEXT_EMBEDDING needs a 'dim' param"))
          val dim = try dimStr.toInt catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"TEXT_EMBEDDING dim '$dimStr' is not an integer")
          }
          require(dim > 0, s"dim must be positive, got $dim")
          // batch_factor (feature-inventory §6): the remote-provider
          // RPC batching knob. Validated for API fidelity; a no-op
          // here — the in-engine encoder is a codegen'd expression, so
          // "batching" is whatever the vectorized scan already does.
          f.params.get("batch_factor").foreach { bf =>
            val v = try bf.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"batch_factor '$bf' is not an integer")
            }
            require(v > 0, s"batch_factor must be positive, got $v")
          }
          f.outputFields.filterNot(o => d.fields.exists(_.name == o))
            .map(o => FieldDef(o, ArrayType(FloatType), dim = Some(dim)))
        }
      d.copy(fields = d.fields ++ extra, functions = d.functions :+ f)
    }
    refreshCachedSchema()
  }


  /** Re-parameterize a bound function in place (alter_function,
    * feature-inventory §6): the function keeps its name, type and
    * field bindings, but its params are REPLACED — e.g. a
    * TEXT_EMBEDDING dim change re-declares the output field at the new
    * dim. Indexes on the output fields are invalidated (their builds
    * encode the OLD function's values) but input-field indexes stay:
    * the stored input column is untouched by a param change.
    */
  def alterFunction(fn: String, params: Map[String, String]): Unit = {
    val f = definition.functions.find(_.name == fn).getOrElse(
      throw new IllegalArgumentException(s"no function $fn"))
    catalog.mutateDef(name) { d =>
      val cur = d.functions.find(_.name == fn).getOrElse(
        throw new IllegalArgumentException(s"no function $fn"))
      val kind = cur.functionType.toUpperCase
      val fields =
        if (kind == "TEXT_EMBEDDING") {
          val provider = params.getOrElse("provider", "deterministic")
          require(provider == "deterministic",
            s"text-embedding provider '$provider' needs external " +
              "credentials; only 'deterministic' runs in-engine")
          val dim = try params.getOrElse("dim",
            throw new IllegalArgumentException(
              "TEXT_EMBEDDING needs a 'dim' param")).toInt
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"TEXT_EMBEDDING dim '${params("dim")}' is not an integer")
          }
          require(dim > 0, s"dim must be positive, got $dim")
          d.fields.map(fd =>
            if (cur.outputFields.contains(fd.name)) fd.copy(dim = Some(dim))
            else fd)
        } else d.fields
      d.copy(fields = fields,
        functions = d.functions.map(g =>
          if (g.name == fn) g.copy(params = params) else g),
        indexes = d.indexes.filterNot(ix =>
          cur.outputFields.contains(ix.field)))
    }
    f.outputFields.foreach(IndexStore.drop(this, _))
    refreshCachedSchema()
  }

  /** Unbind a function: its output fields stop being served (dropped
    * from the schema — drop_collection_function + drop_function_field
    * semantics) and indexes touching its input/output fields are
    * invalidated, so a dropped function's output can't keep serving
    * from a stale build.
    */
  def dropFunction(fn: String): Unit = {
    val f = definition.functions.find(_.name == fn).getOrElse(
      throw new IllegalArgumentException(s"no function $fn"))
    catalog.mutateDef(name) { d =>
      d.copy(
        functions = d.functions.filterNot(_.name == fn),
        fields = d.fields.filterNot(fd => f.outputFields.contains(fd.name)),
        indexes = d.indexes.filterNot(ix =>
          f.outputFields.contains(ix.field) || f.inputFields.contains(ix.field)))
    }
    (f.inputFields ++ f.outputFields).distinct
      .foreach(IndexStore.drop(this, _))
    refreshCachedSchema()
  }

  /** Engine-computed function output columns. TEXT_EMBEDDING maps the
    * input text to a dense vector via the deterministic provider
    * ([[graft.functions.TextEmbedding]]). BM25 maps the tokenized
    * input to a sparse term-frequency vector — `hash(term) -> tf` for
    * the conventional MapType(Int, Double) sparse encoding (collisions
    * merge by summed tf, so duplicate map keys are impossible), or
    * `term -> tf` when the declared output type is string-keyed. Bound
    * through a single-element transform so tokenization runs once per
    * row (Catalyst does no CSE across lambda bodies).
    */
  private def functionOutputColumns(d: CollectionDef): Map[String, Column] = {
    val embedding = d.functions
      .filter(_.functionType.toUpperCase == "TEXT_EMBEDDING").flatMap { f =>
        val in = col(f.inputFields.head)
        val dim = f.params("dim").toInt
        f.outputFields.map { o =>
          o -> when(in.isNotNull,
            graft.functions.TextEmbedding.encode(in, dim))
        }
      }.toMap
    embedding ++ d.functions.filter(_.functionType.toUpperCase == "BM25").flatMap { f =>
      val in = col(f.inputFields.head)
      val toks = graft.text.Analyzer.standard(in)
      f.outputFields.map { o =>
        val stringKeyed = d.fields.find(_.name == o).map(_.dataType).exists {
          case MapType(StringType, _, _) => true
          case _ => false
        }
        val sparse =
          if (stringKeyed)
            element_at(transform(array(toks), ts =>
              map_from_entries(transform(array_distinct(ts), t =>
                struct(t, size(filter(ts, x => x === t)).cast(DoubleType))))), 1)
          else
            element_at(transform(array(toks), ts =>
              map_from_entries(
                transform(array_distinct(transform(ts, t => hash(t))), h =>
                  struct(h, size(filter(ts, x => hash(x) === h))
                    .cast(DoubleType))))), 1)
        o -> when(in.isNotNull, sparse)
      }
    }.toMap
  }

  // ---- external collections (3.0 feature-inventory plan §5) -------------

  /** True when this collection maps external data (read-only): either a
    * parquet source URI (`external.source`) or another collection's
    * snapshot (`external.snapshot` = "srcCollection:snapshotId").
    */
  def isExternal: Boolean = {
    val p = definition.properties
    p.contains("external.source") || p.contains("external.snapshot")
  }

  private def requireWritable(d: CollectionDef): Unit = {
    require(!d.properties.contains("external.source") &&
      !d.properties.contains("external.snapshot"),
      s"collection $name is external (read-only)")
    // Demoted CDC source (see Catalog.promoteReplica): writes denied so
    // a client still pointed at the old primary can't split-brain it.
    require(!d.properties.get("cdc.standby").contains("true"),
      s"collection $name is standby (demoted by a CDC promote)")
    requireAccessible(d)
  }

  /** Encryption-key revocation fence (feature-inventory §7
    * `kms_revocation_guard`: "deny reads and writes once the key is
    * revoked"). The KMS itself is a deployment concern; the
    * engine-meaningful contract is the fence — `access.revoked=true`
    * denies READS (the merged-read entry, snapshots, feeds, and the
    * index-build read) and WRITES (via requireWritable), takes effect
    * immediately on alterCollectionProperties (the "config hot
    * update" analog: property changes drop the pinned snapshot, and
    * this guard reads the live definition), and clearing the property
    * restores access with no rebuild — data was never touched, only
    * fenced. Boundary: index files ALREADY persisted before the
    * revocation keep serving routed searches until invalidated — a
    * real KMS revocation makes the underlying FILES unreadable at the
    * storage layer; this engine-level fence gates the data-path APIs.
    */
  private def requireAccessible(d: CollectionDef): Unit =
    require(!d.properties.get("access.revoked").contains("true"),
      s"collection $name access revoked (encryption key revoked)")

  private def externalManifestFile: StorePath =
    catalog.collectionDir(name).resolve("external_manifest.txt")

  /** Manual refresh (the reference's External Collection refresh
    * policy): re-list the source's parquet files and pin the new set.
    * Files added to the source AFTER the last refresh are invisible
    * until the next one — reads serve the pinned manifest, never a
    * live listing. Returns the pinned file count.
    */
  def refreshExternal(spark: SparkSession): Int = {
    val d = definition
    val src = d.properties.getOrElse("external.source",
      throw new IllegalStateException(
        s"$name is not a source-mapped external collection"))
    val files = listParquetFiles(StorePath(src)).sorted
    // Bump the seq: external committedSeq tracks it, so persisted index
    // builds (keyed on committedSeq) self-invalidate on refresh.
    catalog.nextSeq(name): Unit
    // meta.json discipline: temp + atomic overwrite-rename, so a
    // concurrent read never sees a torn manifest.
    val tmp = catalog.collectionDir(name).resolve(
      s"external_manifest.tmp.${Thread.currentThread().getId}")
    tmp.writeBytes(files.mkString("\n").getBytes)
    tmp.moveOver(externalManifestFile)
    refreshCachedSnapshot(spark)
    files.size
  }

  private def listParquetFiles(p: StorePath): Seq[String] =
    p.list.flatMap { c =>
      if (c.isDirectory) {
        if (c.name.startsWith("_") || c.name.startsWith(".")) Seq.empty
        else listParquetFiles(c)
      }
      else if (c.name.endsWith(".parquet")) Seq(c.toString)
      else Seq.empty
    }

  /** Read path for external collections: pinned files (or the source
    * snapshot), with the declared column mapping applied — no merge
    * window, no internal columns; the mapped frame IS the snapshot.
    */
  private def externalRead(spark: SparkSession): DataFrame = {
    val d = definition
    d.properties.get("external.snapshot") match {
      case Some(ref) =>
        val Array(src, sid) = ref.split(":", 2)
        applyMapping(catalog.collection(src).readSnapshot(spark, sid.toLong), d)
      case None =>
        val files =
          if (!externalManifestFile.exists) Seq.empty
          else new String(externalManifestFile.readBytes)
            .split("\n").toSeq.filter(_.nonEmpty)
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], d.structType)
        else applyMapping(spark.read.parquet(files: _*), d)
    }
  }

  /** `external.mapping` is "srcCol=field;srcCol2=field2" — data mapping
    * from source columns onto declared fields; unmapped fields read the
    * source column of the same name.
    */
  private def applyMapping(src: DataFrame, d: CollectionDef): DataFrame = {
    val mapping = d.properties.get("external.mapping")
      .map(_.split(";").toSeq.filter(_.nonEmpty).map { kv =>
        val Array(s, t) = kv.split("=", 2); t -> s
      }.toMap).getOrElse(Map.empty)
    val fieldCols = d.fields.map { f =>
      col(mapping.getOrElse(f.name, f.name)).cast(f.dataType).as(f.name)
    }
    val dynCols =
      if (!d.enableDynamicField) Nil
      else if (src.columns.contains(DYN)) Seq(col(DYN))
      else Seq(lit("{}").as(DYN))
    src.select(fieldCols ++ dynCols: _*)
  }

  // ---- collection snapshots (3.0 feature-inventory plan §5) -------------

  private def snapshotsDir: StorePath =
    catalog.collectionDir(name).resolve("snapshots")
  private def pinnedDir: StorePath = dataDir.resolve("_pinned")
  private def snapshotFile(id: Long): StorePath =
    snapshotsDir.resolve(f"snap_$id%012d.txt")

  /** Point-in-time snapshot: a manifest of the committed delta
    * directory NAMES — O(deltas) metadata, zero data copied (deltas are
    * immutable; [[compact]] parks folded-but-referenced deltas in
    * `_pinned/` instead of deleting them, so a snapshot's files outlive
    * compaction). Returns the snapshot id.
    */
  def createSnapshot(): Long = {
    // Read-side DR operation: a DEMOTED (cdc.standby) source must stay
    // snapshot/backup-able — preserving the un-replayed tail after a
    // failover is exactly when you need it — so this is deliberately
    // NOT requireWritable. External collections have no delta log to
    // pin, and a revoked key fences snapshots like any read.
    val d = definition
    requireAccessible(d)
    require(!isExternal, s"external collection $name has no delta log")
    val id = catalog.nextSeq(name)
    snapshotsDir.createDirectories()
    snapshotFile(id).writeBytes(deltaPaths.map(_.name).mkString("\n").getBytes)
    id
  }

  def listSnapshots(): Seq[Long] =
    snapshotsDir.list.map(_.name)
      .filter(n => n.startsWith("snap_") && n.endsWith(".txt"))
      .map(_.stripPrefix("snap_").stripSuffix(".txt").toLong).sorted

  /** Drop the snapshot and garbage-collect pinned deltas no remaining
    * snapshot references.
    */
  def dropSnapshot(id: Long): Unit = {
    require(snapshotFile(id).exists, s"no snapshot $id")
    snapshotFile(id).deleteRecursively()
    val stillPinned = allSnapshotDeltaNames
    pinnedDir.list.foreach(p =>
      if (!stillPinned.contains(p.name)) p.deleteRecursively())
  }

  /** Query the collection AS OF a snapshot: the standard merge-on-read
    * assemble over exactly the manifest's deltas (live or pinned).
    * Data-level time travel — the CURRENT schema serves (fields added
    * since read null; fields dropped since don't read back).
    */
  def readSnapshot(spark: SparkSession, id: Long): DataFrame = {
    // A pre-revocation snapshot must not bypass the access fence — it
    // reads the same data the merged read does.
    requireAccessible(definition)
    require(snapshotFile(id).exists, s"no snapshot $id")
    val paths = snapshotDeltaNames(id).map { n =>
      val live = dataDir.resolve(n)
      if (live.exists) live else pinnedDir.resolve(n)
    }
    paths.find(!_.exists).foreach(p =>
      throw new IllegalStateException(s"snapshot $id delta missing: $p"))
    assemble(spark, Seq.empty, None, None, deltaOverride = Some(paths))
  }

  /** Cold backup (the DR complement of the hot path — snapshots pin,
    * replicas fail over, THIS survives losing the whole catalog root):
    * writes `backup_meta.json` (the full definition: fields, indexes,
    * functions, properties, seq) plus ONE folded parquet copy of the
    * visible rows with their partition placement, under `destDir`.
    * Consistency comes from a snapshot taken for the duration of the
    * copy (dropped afterward — backups don't pin storage); the data
    * copy is a distributed write of the merged read, so the backup is
    * compact (no tombstones, no superseded versions) and restores in
    * one delta regardless of the source's delta-chain length.
    * Function outputs are not copied — they are virtual columns and
    * recompute on the restored collection. Returns the row count.
    */
  def backupTo(spark: SparkSession, destDir: String): Long = {
    val id = createSnapshot()
    try {
      val dest = StorePath(destDir)
      dest.createDirectories()
      dest.resolve("backup_meta.json").writeBytes(
        MetaJson.write(catalog.readMeta(name)).getBytes)
      val d = definition
      // `_ts` is copied so a restore preserves the TTL insert clock
      // (restoreFrom keeps a provided `_ts`): a restored TTL collection
      // must expire rows when the source would have, not TTL-from-
      // restore-time.
      val stored = d.fields.filterNot(f =>
        d.functionOutputFields.contains(f.name)).map(_.name) ++
        (if (d.enableDynamicField) Seq(DYN) else Nil) ++ Seq(TS, PART)
      val paths = snapshotDeltaNames(id).map(dataDir.resolve)
      val out = dest.resolve("data").toString
      assemble(spark, Seq.empty, None, None, keepInternals = true,
          deltaOverride = Some(paths))
        .select(stored.map(col): _*)
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    } finally dropSnapshot(id)
  }

  private def snapshotDeltaNames(id: Long): Seq[String] =
    new String(snapshotFile(id).readBytes).split("\n").toSeq.filter(_.nonEmpty)

  private def allSnapshotDeltaNames: Set[String] =
    listSnapshots().flatMap(snapshotDeltaNames).toSet

  /** Retire superseded deltas: LOGICAL removal now, PHYSICAL removal
    * after a grace period (the MVCC vacuum discipline). A `_retired`
    * marker drops the directory from every new listing ([[deltaPaths]])
    * immediately, but the files stay on disk so an in-flight scan that
    * planned against the pre-fold listing keeps reading them — deleting
    * eagerly failed concurrent readers with FILE_NOT_EXIST (caught by
    * HammerSpec). Markers past `compaction.retireGraceMs` (default
    * 5 min — longer than any sane query; a scan outliving it sees the
    * standard vacuumed-snapshot error) are swept on the next retire or
    * compaction: snapshot-referenced dirs park in `_pinned/`, the rest
    * delete. Shared by compact, compactMinor and truncate.
    */
  private def retireDeltas(deltas: Seq[StorePath]): Unit =
    // Serialized with compactions (re-entrant from compact/compactMinor,
    // which hold the same per-directory lock; truncate enters here too)
    // so two retire/sweep cycles can never lose each other's index
    // update.
    Collection.compactLock(dataDir.toString).synchronized {
      withRetireLease {
        val now = System.currentTimeMillis()
        writeRetiredIndex(readRetiredIndex() ++ deltas.map(_.name -> now))
        sweepRetired()
      }
    }

  /** Cross-PROCESS lease around the retirement ledger's
    * read-modify-write — the multi-process writer story the
    * single-writer assumption below documents (the reference's Argo
    * matrix runs concurrent bricks against one server). Opt-in via
    * collection property `compaction.crossProcessLock` (default off:
    * the embedded one-driver-owns-the-root model needs no filesystem
    * round-trips per retire).
    *
    * Protocol: create-exclusive `_retire_lock` file
    * ([[StorePath.createExclusive]] — atomic on local/HDFS); a holder
    * that died leaves a stale lock, taken over once its age exceeds
    * `compaction.lockStaleMs` (default 60 s — far above any ledger
    * write, far below the retire grace period, so a takeover cannot
    * race a LIVE holder's in-flight write). Two takeover racers both
    * delete-then-create; exactly one create wins, the loser re-loops.
    * Acquisition is bounded by staleMs + 10 s — past that something is
    * genuinely wedged and failing loudly beats silently losing ledger
    * entries.
    */
  private def withRetireLease[T](body: => T): T = {
    val enabled = definition.properties
      .get("compaction.crossProcessLock").exists(_.toBoolean)
    if (!enabled) return body
    val lock = dataDir.resolve("_retire_lock")
    val staleMs = definition.properties.get("compaction.lockStaleMs")
      .map(_.toLong).getOrElse(60000L)
    val deadline = System.currentTimeMillis() + staleMs + 10000L
    var acquired = false
    while (!acquired) {
      acquired = lock.createExclusive(
        s"${ProcessHandle.current().pid()} ${System.currentTimeMillis()}"
          .getBytes)
      if (!acquired) {
        val stale =
          try lock.exists &&
            System.currentTimeMillis() - lock.modifiedAt > staleMs
          catch { case _: Exception => false } // lock vanished mid-check
        if (stale) lock.deleteRecursively()
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"retire lease on ${lock} not acquirable within " +
              s"${staleMs + 10000L} ms — another process is wedged " +
              "holding it with a live mtime")
        else Thread.sleep(50)
      }
    }
    try body finally lock.deleteRecursively()
  }

  /** The retirement ledger: ONE file naming the logically-removed
    * delta dirs (with retire timestamps), read once per [[deltaPaths]]
    * listing. A per-dir marker file would cost a metadata HEAD per
    * delta per listing — and the chain is consulted on every search
    * (committedSeq) — so the ledger keeps the listing overhead
    * constant on object stores.
    *
    * SINGLE-WRITER-PROCESS DEFAULT: the ledger's read-modify-write is
    * serialized by the JVM-local [[Collection.compactLock]] only.
    * Two PROCESSES compacting the same collection directory could
    * interleave writeRetiredIndex calls and lose each other's entries
    * — value-safe (seqs and tombstones are preserved, a resurrected
    * delta just re-folds under LWW) but the superseded dirs would
    * linger un-reclaimed. This mirrors the embedded-engine deployment
    * model (one driver owns a catalog root, like Milvus's single
    * datacoord owning compaction for a collection). Multi-process
    * writers opt into the filesystem lease around retireDeltas via the
    * `compaction.crossProcessLock` property ([[withRetireLease]]).
    */
  private def retiredIndexFile: StorePath = dataDir.resolve("_retired_index")

  private def readRetiredIndex(): Map[String, Long] =
    if (!retiredIndexFile.exists) Map.empty
    else new String(retiredIndexFile.readBytes).split("\n").toSeq
      .filter(_.nonEmpty).flatMap { line =>
        line.split(" ") match {
          case Array(n, ts) => scala.util.Try(n -> ts.toLong).toOption
          case _ => None
        }
      }.toMap

  private def writeRetiredIndex(m: Map[String, Long]): Unit = {
    val tmp = dataDir.resolve(
      s"_retired_index.tmp.${Thread.currentThread().getId}")
    tmp.writeBytes(m.toSeq.sortBy(_._1)
      .map { case (n, t) => s"$n $t" }.mkString("\n").getBytes)
    tmp.moveOver(retiredIndexFile)
  }

  /** Physically remove retired delta dirs whose grace period elapsed
    * (park the snapshot-referenced ones), and drop them from the
    * ledger. Caller holds the compaction lock.
    */
  private def sweepRetired(): Unit = {
    val graceMs = definition.properties.get("compaction.retireGraceMs")
      .map(_.toLong).getOrElse(300000L)
    val now = System.currentTimeMillis()
    val ledger = readRetiredIndex()
    val expired = ledger.filter { case (_, ts) => now - ts >= graceMs }
    if (expired.isEmpty) return
    val pinned = allSnapshotDeltaNames
    expired.keys.foreach { name =>
      val p = dataDir.resolve(name)
      if (p.exists) {
        if (pinned.contains(name)) {
          pinnedDir.createDirectories()
          val target = pinnedDir.resolve(name)
          if (!target.exists) p.moveTo(target) else p.deleteRecursively()
        } else p.deleteRecursively()
      }
    }
    writeRetiredIndex(ledger -- expired.keys)
  }

  // ---- DML --------------------------------------------------------------

  /** On-disk bytes of the committed deltas — the engine-side analog of
    * the server memory footprint the reference's quotas meter. A
    * filesystem-metadata walk, no Spark job.
    */
  def storageBytes: Long = deltaPaths.map(_.totalSize).sum

  /** Deny DML once the committed store has crossed a configured quota
    * (high-water-mark semantics: the write that crosses the line
    * lands; the NEXT one is denied — matching a server that meters
    * after ingest). `quota.rows` counts visible entities (exact,
    * deterministic); `quota.bytes` meters delta bytes on disk. The
    * messages are the strings the reference's deny-retry loops match
    * (create_n_insert_until_denied.py:124-125).
    */
  private def checkWriteQuota(spark: SparkSession, d: CollectionDef): Unit = {
    d.properties.get("quota.rows").map(_.toLong).foreach { q =>
      if (numEntities(spark) >= q)
        throw new QuotaExceededException(
          s"memory quota exceeded: collection $name holds >= $q rows")
    }
    d.properties.get("quota.bytes").map(_.toLong).foreach { q =>
      if (storageBytes >= q)
        throw new QuotaExceededException(
          s"memory quota exceeded: collection $name stores >= $q bytes")
    }
  }

  /** Insert a batch. Missing nullable columns are filled with null;
    * auto_id primary keys are assigned `(seq << 40) | batch_row_index`
    * (unique across batches without driver coordination; each batch
    * owns a dense 2^40 id space, so ids can never spill into the next
    * batch's range the way partition-encoded ids would at >=128 input
    * partitions). Returns an [[InsertResult]] whose ids are read back
    * from the committed delta (insert_entities returns ids,
    * validate_phase_dml_dql.py:92-102).
    */
  def insert(spark: SparkSession, rows: DataFrame,
      partition: Option[String] = None): InsertResult = {
    val d = definition
    requireWritable(d)
    checkWriteQuota(spark, d)
    val seq = catalog.nextSeq(name)
    val pk = d.primaryField
    var df = conformToSchema(rows, d, allowMissingPk = pk.autoId)
    if (pk.autoId) {
      require(!rows.columns.contains(pk.name),
        "auto_id collection must not supply primary keys")
      require(pk.dataType == LongType, "auto_id requires an INT64 primary key")
      // zipWithIndex: dense per-batch row numbering (one extra job to
      // size partitions — a write-path cost, not a query-path one).
      val base = seq << 40
      val schema = StructType(df.schema.fields :+
        StructField(pk.name, LongType, nullable = false))
      df = spark.createDataFrame(
        df.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base | i))
        }, schema)
        .select(userColumns(d).map(col): _*)
    }
    // A driver-known batch size (LocalRelation under projections —
    // the client insert protocol shape) makes the returned count free:
    // the read-back count job only runs for scan-backed bulk inserts.
    val knownCount = localBatchRows(df, exact = true)
    val deltaPath = writeDelta(spark, df, d, seq, partition, deleted = false)
    val written0 = spark.read.parquet(deltaPath).select(pk.name)
    // With auto-compaction on, the delta this lazy frame points at can
    // be folded away by a later DML — detach the ids from the file.
    val written =
      if (d.properties.contains("compaction.maxDeltas"))
        written0.localCheckpoint(true)
      else written0
    val res = InsertResult(
      knownCount.map(_.toLong).getOrElse(written.count()), written)
    maybeAutoCompact(spark, d)
    res
  }

  /** Row count of a client-supplied batch, read off the driver-side
    * plan for free: a LocalRelation leaf under nothing but Project /
    * SubqueryAlias (and, when `exact` is false, Filter — which only
    * shrinks, so the leaf count stays a valid upper bound for write
    * sizing). Any scan, join, or aggregate anywhere → None.
    */
  private def localBatchRows(df: DataFrame, exact: Boolean): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    val shapeSafe = plan.collect { case n => n }.forall {
      case _: Project | _: SubqueryAlias | _: LocalRelation => true
      case _: Filter => !exact
      case _ => false
    }
    plan.collectLeaves() match {
      case Seq(lr: LocalRelation) if shapeSafe => Some(lr.data.length)
      case _ => None
    }
  }

  /** Upsert: replace-by-PK (full rows), or `partialUpdate` column
    * coalesce against the current snapshot.
    */
  def upsert(spark: SparkSession, rows: DataFrame,
      partialUpdate: Boolean = false,
      partition: Option[String] = None): Unit = {
    val d = definition
    requireWritable(d)
    checkWriteQuota(spark, d)
    val pk = d.primaryField.name
    require(rows.columns.contains(pk), "upsert rows must carry the primary key")
    val batch =
      if (!partialUpdate) conformToSchema(rows, d, allowMissingPk = false)
      else {
        // partial_update: fill columns absent from the batch from the
        // live row (left join on PK; new values win where provided).
        val current = read(spark)
        val provided = rows.columns.toSet
        val joined = rows.alias("n")
          .join(current.alias("o"), col(s"n.$pk") === col(s"o.$pk"), "left")
        val cols = d.fields.map { f =>
          if (f.name == pk) col(s"n.$pk").as(pk)
          else if (provided.contains(f.name))
            coalesce(col(s"n.${f.name}"), col(s"o.${f.name}")).as(f.name)
          else col(s"o.${f.name}").as(f.name)
        }
        // Dynamic blob: replaced wholesale when the batch carries
        // undeclared columns, kept otherwise (the reference's $meta is
        // a single JSON field — partial update swaps the whole object).
        val dynCols =
          if (!d.enableDynamicField) Nil
          else {
            val declared = d.fields.map(_.name).toSet
            val extras = rows.columns
              .filterNot(c => declared.contains(c) || c == DYN).toSeq
            if (rows.columns.contains(DYN))
              Seq(coalesce(col(s"n.$DYN"), col(s"o.$DYN")).as(DYN))
            else if (extras.nonEmpty)
              Seq(to_json(struct(extras.sorted.map(e => col(s"n.$e")): _*)).as(DYN))
            else Seq(col(s"o.$DYN").as(DYN))
          }
        joined.select(cols ++ dynCols: _*)
      }
    val seq = catalog.nextSeq(name)
    writeDelta(spark, batch, d, seq, partition, deleted = false)
    maybeAutoCompact(spark, d)
  }

  /** 3.0 partial-update array operation family (feature-inventory plan
    * §4: `ARRAY_APPEND` / `ARRAY_REMOVE` partial update): per-row
    * mutation of array fields against the live row. `rows` carries the
    * pk plus one column per mutated field holding the OPERAND element;
    * `ops` names the operation per field. APPEND adds the element at
    * the end; REMOVE drops every occurrence (Spark `array_remove`
    * semantics). Untouched fields carry over — same
    * join-against-snapshot write shape as partial_update upsert.
    */
  def updateArrays(spark: SparkSession, rows: DataFrame,
      ops: Map[String, String]): Unit = {
    val d = definition
    requireWritable(d)
    val pk = d.primaryField.name
    require(rows.columns.contains(pk), "array update rows must carry the pk")
    val elemTypes = ops.map { case (f, op) =>
      val fd = d.fields.find(_.name == f).getOrElse(
        throw new IllegalArgumentException(s"no field $f"))
      val at = fd.dataType match {
        case a: ArrayType => a
        case other => throw new IllegalArgumentException(
          s"$f is not an ARRAY field (got ${other.simpleString})")
      }
      require(Set("ARRAY_APPEND", "ARRAY_REMOVE").contains(op.toUpperCase),
        s"unknown array op $op")
      require(rows.columns.contains(f), s"rows must carry an operand for $f")
      f -> at
    }
    val joined = rows.alias("n")
      .join(read(spark).alias("o"), col(s"n.$pk") === col(s"o.$pk"), "inner")
    val cols = d.fields.map { fd =>
      if (fd.name == pk) col(s"o.$pk").as(pk)
      else ops.get(fd.name) match {
        case Some(op) =>
          val at = elemTypes(fd.name)
          val old = coalesce(col(s"o.${fd.name}"),
            array().cast(at))
          val operand = col(s"n.${fd.name}").cast(at.elementType)
          (op.toUpperCase match {
            case "ARRAY_APPEND" => concat(old, array(operand))
            case "ARRAY_REMOVE" => array_remove(old, operand)
          }).as(fd.name)
        case None => col(s"o.${fd.name}").as(fd.name)
      }
    }
    val dynCols =
      if (d.enableDynamicField) Seq(col(s"o.$DYN").as(DYN)) else Nil
    val seq = catalog.nextSeq(name)
    writeDelta(spark, joined.select(cols ++ dynCols: _*), d, seq, None,
      deleted = false)
    maybeAutoCompact(spark, d)
  }

  /** Delete by filter expression (string, compiled via MilvusExpr) —
    * 2.6/common.py:202-238. Writes PK tombstones for currently-matching
    * rows.
    */
  def delete(spark: SparkSession, filterExpr: String): Long =
    delete(spark, MilvusExpr.compile(filterExpr, read(spark)), None)

  def delete(spark: SparkSession, pred: Column,
      preFiltered: Option[DataFrame] = None): Long = {
    val d = definition
    requireWritable(d)
    val pk = d.primaryField.name
    val victims = preFiltered.getOrElse(read(spark).filter(pred))
      .select(pk).distinct()
    val seq = catalog.nextSeq(name)
    // Tombstone every (pk, _part) the key has rows in — deltas are
    // physically partitioned by _part, and co-locating each tombstone
    // with the rows it suppresses lets a partition-scoped read resolve
    // deletes with a PURE partition filter (directory prune, no
    // tombstone-visibility OR-clause defeating the pruning). Cost: one
    // semi-join on the delete (write) path, bounded by rows-per-pk —
    // skipped entirely for unpartitioned collections, where every row
    // lives in the single default partition.
    val unpartitioned = d.partitions.isEmpty &&
      d.partitionKeyField.isEmpty && d.numPartitions.isEmpty
    val targets =
      if (unpartitioned) victims.withColumn(PART, lit(DEFAULT_PART))
      else rawDeltas(spark, d, deltaPaths.map(_.toString))
        .map(_.select(col(pk), col(PART))
          .join(victims, Seq(pk), "left_semi").distinct())
        .getOrElse(victims.withColumn(PART, lit(DEFAULT_PART)))
    val tombstones = targets
      .withColumn(SEQ, lit(seq))
      .withColumn(DEL, lit(true))
      .withColumn(TS, lit(System.currentTimeMillis()))
    commitDelta(tombstones, seq)
    // Count BEFORE compaction: the victims lineage reads the pre-delta
    // files a triggered fold would delete.
    val n = victims.count()
    maybeAutoCompact(spark, d)
    n
  }

  /** Write a delta through a staging directory + atomic rename, so
    * concurrent readers' `delta_*` glob never sees a half-written
    * directory (the pressure runner reads while writers commit).
    * Returns the committed delta path. A loaded (cached) snapshot is
    * refreshed so DML on a Loaded collection stays visible, matching
    * the reference's read-your-writes behavior.
    */
  private def commitDelta(rows: DataFrame, seq: Long): String = {
    // Writer-unique staging name: two processes that double-allocated
    // a seq (nextSeq's RMW is only JVM-atomic) must not stomp each
    // other's STAGING files — with unique staging dirs the race
    // surfaces at the non-replacing rename below instead, where
    // exactly one writer wins and the loser fails cleanly.
    val staging = dataDir.resolve(
      f"_staging_delta_$seq%012d" +
        s"_${ProcessHandle.current().pid()}_${Thread.currentThread().getId}")
    // partitionBy(_part): partition_names reads become directory-pruned
    // scans (PartitionFilters at the FileSourceScan, asserted in
    // StoreSpec) — at 100 TB a partition-scoped query must not touch
    // the other partitions' files at all.
    rows.write.mode("overwrite").partitionBy(PART).parquet(staging.toString)
    val target = dataDir.resolve(f"delta_$seq%012d")
    staging.moveTo(target)
    refreshCachedSnapshot(rows.sparkSession)
    target.toString
  }

  /** Flush is a no-op: parquet writes are atomic per job (S11). */
  def flush(): Unit = ()

  /** Crash-debris GC: a writer killed between its staging write and
    * the atomic rename leaves a `_staging_*` directory that readers
    * never see (every listing filters on its real prefix) but that
    * holds disk forever. Deletes staging dirs older than
    * `olderThanMs` (default 24 h — far beyond any real write) and
    * returns the swept names. Age-gated so a LIVE slow writer's
    * staging dir survives — which is also why this is NOT run on the
    * DML path: call it from the maintenance window that runs
    * [[compact]] (the Milvus GC analog).
    */
  def vacuumStaging(olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    val stale = dataDir.list.filter(p =>
      p.name.startsWith("_staging") && p.isDirectory &&
        p.modifiedAt < cutoff)
    stale.foreach(_.deleteRecursively())
    stale.map(_.name)
  }

  /** TruncateCollection (3.0 API, feature-inventory plan §4): drop all
    * entities, keep the schema, partitions, indexes, and functions.
    * Removes every committed delta and invalidates persisted index
    * builds (they describe data that no longer exists); the next
    * search rebuilds against the empty snapshot.
    */
  def truncate(spark: SparkSession): Unit = {
    requireWritable(definition)
    // Snapshot-referenced deltas are parked, not deleted — a snapshot
    // taken before the truncate still reads its full data.
    retireDeltas(deltaPaths)
    definition.indexes.foreach(ix => IndexStore.drop(this, ix.field))
    evictBaseSizeCache() // the retired base's size no longer applies
    catalog.nextSeq(name): Unit // bump: caches keyed on seq self-invalidate
    refreshCachedSnapshot(spark)
  }

  // ---- Import 2PC (3.0 feature-inventory plan §5: CommitImport /
  // AbortImport / auto_commit) ------------------------------------------

  /** Stage of a two-phase import: rows are fully written (conformed,
    * partition-routed, PK-sorted — the identical physical layout a
    * committed delta has) into `data/_import_<seq>`, which the reader's
    * `delta_*` enumeration never matches, so staged rows are INVISIBLE
    * to every query until [[commitImport]]. Returns the import id.
    *
    * Visibility ordering is prepare-time: the staged batch holds the
    * seq reserved at prepare, so last-writer-wins resolves conflicts
    * with DML that committed after the prepare in favor of the DML —
    * the transactional "import sees the world as of prepare" shape.
    *
    * `autoCommit = true` collapses the two phases (the reference's
    * `auto_commit` import mode).
    */
  def prepareImport(spark: SparkSession, rows: DataFrame,
      partition: Option[String] = None,
      autoCommit: Boolean = false): String = {
    val d = definition
    requireWritable(d)
    checkWriteQuota(spark, d)
    val seq = catalog.nextSeq(name)
    val batch = conformToSchema(rows, d, allowMissingPk = false)
    val staging = dataDir.resolve(f"_staging_import_$seq%012d")
    routedInternal(batch, d, seq, partition)
      .write.mode("overwrite").partitionBy(PART).parquet(staging.toString)
    // Atomic publish into the pending-import namespace: listImports
    // never observes a half-written staging directory.
    staging.moveTo(dataDir.resolve(importDir(seq)))
    val id = importId(seq)
    if (autoCommit) commitImport(spark, id)
    id
  }

  /** Pending (prepared, not yet committed/aborted) import ids. */
  def listImports(): Seq[String] =
    dataDir.list.map(_.name).filter(_.startsWith("_import_"))
      .sorted.map(n => "import_" + n.stripPrefix("_import_"))

  /** Phase 2 commit: one atomic rename moves the staged directory into
    * the committed `delta_*` namespace — all staged rows become visible
    * together. Returns the committed row count.
    */
  def commitImport(spark: SparkSession, id: String): Long = {
    val seq = importSeq(id)
    val src = dataDir.resolve(importDir(seq))
    require(src.exists, s"no pending import $id")
    // Publish under a FRESH commit seq, not the prepare seq:
    // `committedSeq` is the max delta DIRECTORY seq, so a commit that
    // lands after later DML must still advance it — otherwise an index
    // build validated at the pre-commit seq stays "fresh" forever and
    // silently never sees the import, and a change-feed cursor already
    // past the prepare seq never delivers it. The rows KEEP their
    // prepare-time stored `_seq`: visibility ordering (post-prepare DML
    // wins last-writer-wins) is prepare-time, the documented 2PC
    // contract; only the COMMIT POSITION — the directory name, and
    // `_commit_seq` in the feed — is commit-time.
    val commitSeq = catalog.nextSeq(name)
    val target = dataDir.resolve(f"delta_$commitSeq%012d")
    src.moveTo(target)
    refreshCachedSnapshot(spark)
    val n = spark.read.parquet(target.toString).count()
    maybeAutoCompact(spark, definition)
    n
  }

  /** Abort: drop the staged rows; nothing was ever visible. */
  def abortImport(id: String): Unit = {
    val src = dataDir.resolve(importDir(importSeq(id)))
    require(src.exists, s"no pending import $id")
    src.deleteRecursively()
  }

  private def importId(seq: Long): String = f"import_$seq%012d"
  private def importDir(seq: Long): String = f"_import_$seq%012d"
  private def importSeq(id: String): Long = {
    require(id.startsWith("import_"), s"malformed import id $id")
    id.stripPrefix("import_").toLong
  }

  // ---- memory residency (S12) ------------------------------------------

  @volatile private var cached: Option[DataFrame] = None

  def load(spark: SparkSession): Unit = {
    // Idempotent: a still-cached handle is already resident AND fresh
    // (every committed write through the handle refreshes it), so a
    // re-load — the brick pattern is load-per-validation-step — must
    // not rebuild the snapshot from the deltas.
    //
    // TTL collections are never snapshot-PINNED: the expiry filter
    // bakes `now` at assembly, so a pinned snapshot would freeze the
    // TTL clock and keep serving expired rows until the next write.
    // They still warm the IO path; every read re-applies a fresh clock.
    val d = definition
    val ttlConfigured =
      d.ttlSeconds.isDefined || d.properties.contains("ttl.field")
    if (cached.isEmpty && !ttlConfigured) {
      val df = read(spark).cache()
      df.count() // materialize
      cached = Some(df)
    } else if (ttlConfigured) {
      invalidateCache()
      read(spark).count(): Unit
    }
    catalog.setLoadState(name, "Loaded")
  }

  def release(): Unit = {
    invalidateCache()
    catalog.setLoadState(name, "NotLoad")
  }

  /** Drop the cached snapshot without touching the load-state metadata
    * (the drop-collection path: the meta files are going away).
    */
  private[store] def invalidateCache(): Unit = {
    cached.foreach(_.unpersist())
    cached = None
    // Drop memoized base sizes for this collection's storage: a
    // dropped-then-recreated directory restarts its seq, and a stale
    // size entry would feed a wrong minor-vs-major decision.
    evictBaseSizeCache()
  }

  private def evictBaseSizeCache(): Unit = {
    val prefix = dataDir.toString + "/"
    Collection.baseSizeCache.keySet.removeIf(_.startsWith(prefix))
  }

  /** Re-cache after a SCHEMA change (add/drop field or function) —
    * no-op unless load()ed. Without this, a Loaded collection kept
    * serving the pre-change column set until the next DML.
    */
  private def refreshCachedSchema(): Unit = this.synchronized {
    cached.foreach(old => refreshCachedSnapshot(old.sparkSession))
  }

  /** Re-cache the snapshot after a committed write (no-op unless
    * load()ed): keeps a Loaded collection's reads consistent with DML.
    */
  private def refreshCachedSnapshot(spark: SparkSession): Unit =
    this.synchronized {
      cached.foreach { old =>
        old.unpersist()
        // LAZY re-cache: the next action materializes the new snapshot.
        // An eager count() here would re-materialize once per committed
        // write — a loaded collection under a k-write DML burst (the
        // phase-DML brick shape: insert, upsert, delete back-to-back)
        // would pay k full merges instead of one at the next read.
        val df = (if (isExternal) externalRead(spark)
                  else assemble(spark, Seq.empty, None)).cache()
        cached = Some(df)
      }
    }

  def loadState: String = catalog.readMeta(name).loadState

  /** Current write sequence — changes on every committed DML batch, so
    * it doubles as the collection's snapshot/index version (index
    * caches key on it to self-invalidate after DML).
    */
  def currentSeq: Long = catalog.readMeta(name).seq

  /** Highest COMMITTED delta seq — the snapshot version actually
    * visible to readers. `catalog.nextSeq` reserves (and persists) the
    * counter BEFORE the delta lands, so `currentSeq` can briefly run
    * ahead of the committed state; index freshness keys on THIS value,
    * otherwise a search racing a DML could build (and cache-validate)
    * an index against a snapshot missing the in-flight delta and serve
    * stale results until the next write.
    */
  def committedSeq: Long =
    // External data versions on refresh (which bumps the meta seq);
    // store collections version on the last committed delta.
    if (isExternal) catalog.readMeta(name).seq
    else deltaPaths.lastOption
      .map(_.name.stripPrefix("delta_").toLong)
      .getOrElse(0L)

  /** Incremental change feed over the delta log (the engine-meaningful
    * slice of the reference's CDC capability, feature-inventory P2
    * list: failover replication needs a second cluster, but the
    * capture surface — "give me every change after position X" — is
    * engine-local, and the LSM delta log already IS that changelog).
    *
    * Returns the raw change rows of every delta COMMITTED after
    * `sinceSeq`: every stored field (tombstones carry only the PK; the
    * other columns are null), plus `_op` ("delete" | "upsert"), `_seq`
    * (the last-writer-wins resolution key — prepare-time for imports),
    * `_commit_seq` (the pull cursor — `max(_commit_seq)` of a batch,
    * or [[committedSeq]] snapshotted before the pull, is the next
    * `sinceSeq`; for everything except 2PC imports it equals `_seq`),
    * `_ts`, and `_part`.
    *
    * Scale shape: cursor filtering is DIRECTORY-level — deltas at or
    * below the cursor are never opened, so a caught-up consumer's pull
    * cost is proportional to new data only. Engine-computed function
    * outputs are not in the feed (they are derived, not stored).
    *
    * Compaction folds history: a cursor older than the oldest live
    * delta sees the folded base as one big upsert batch — a state
    * resync, the standard compacted-changelog contract (deletes older
    * than the fold are gone; the folded rows carry the fold's seq).
    */
  def changeFeed(spark: SparkSession, sinceSeq: Long = 0L): DataFrame = {
    val d = definition
    requireAccessible(d)
    require(!isExternal, "external collections have no delta log")
    val live = deltaPaths.filter(
      _.name.stripPrefix("delta_").toLong > sinceSeq)
    val stored = d.fields.filterNot(f =>
      d.functionOutputFields.contains(f.name)).map(_.name)
    val outCols =
      (stored ++ (if (d.enableDynamicField) Seq(DYN) else Nil)).map(col) ++
        Seq(when(col(DEL), "delete").otherwise("upsert").as("_op"),
          col(SEQ), col(TS), col(PART), col(COMMIT_SEQ))
    // Each delta root is tagged with its COMMIT position (the directory
    // seq). For an import committed after later DML the two differ:
    // `_seq` (prepare-time) resolves last-writer-wins, `_commit_seq`
    // is the pull cursor — max(_commit_seq) of a batch is the next
    // `sinceSeq`, and it never runs behind rows the consumer has seen.
    live.map { p =>
      spark.read.schema(deltaSchema(d)).parquet(p.toString)
        .withColumn(COMMIT_SEQ,
          lit(p.name.stripPrefix("delta_").toLong))
    }.reduceOption(_ union _)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          deltaSchema(d).fields :+ org.apache.spark.sql.types.StructField(
            COMMIT_SEQ, org.apache.spark.sql.types.LongType))))
      .select(outCols: _*)
  }

  /** Rebuild this collection's live state from a change feed (the
    * salvage / failover-rebuild shape of the reference's CDC
    * capability: a replica reconstructs from the captured changelog).
    * The feed's per-key history is resolved in ONE distributed pass —
    * last `_seq` wins, deletes drop the key, exactly the read path's
    * merge rule — and the survivors land as a single delta, so a
    * salvage is one Spark job regardless of how many commits the feed
    * spans. Returns the number of restored rows. The target must be
    * empty (a salvage rebuilds from scratch; partial replays would
    * double-resolve against existing state).
    */
  def restoreFrom(spark: SparkSession, feed: DataFrame): Long = {
    val d = definition
    requireWritable(d)
    checkWriteQuota(spark, d)
    require(numEntities(spark) == 0L,
      s"restoreFrom needs an empty target, $name has data")
    val pk = d.primaryField.name
    val w = Window.partitionBy(pk).orderBy(col(SEQ).desc)
    val resolved = feed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_op") =!= "delete")
    // The restore writes its delta directly instead of calling
    // insert(): the feed's pks must survive even on auto_id collections
    // (a replica that re-generated keys would break every external
    // reference), and each row lands back in the partition the feed
    // recorded (`_part`) — re-running the default pk-hash routing would
    // move explicitly-placed rows and change partition-scoped query
    // results on the replica. Function-output fields are read-computed
    // and stored null, exactly as on the original write path.
    val seq = catalog.nextSeq(name)
    val present = resolved.columns.toSet
    val cols = d.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ (if (d.enableDynamicField) Seq(col(DYN)) else Nil) :+ col(PART)
    // Keep the feed's `_ts` (the original insert clock) when it carries
    // one: a TTL collection rebuilt from its changelog must expire rows
    // at the SAME absolute time as the source — restamping with the
    // replica's apply time would serve rows the primary already
    // expired, for up to a full TTL period. Synthetic feeds without a
    // `_ts` column (and null-ts rows) stamp now.
    val internal = resolved.select(cols :+ feedTsColumn(resolved): _*)
      .withColumn(SEQ, lit(seq))
      .withColumn(DEL, lit(false))
    val routed =
      if (internal.rdd.getNumPartitions > 1) internal.repartition(col(PART))
      else internal
    val deltaPath = commitDelta(routed.sortWithinPartitions(pk), seq)
    recordCursor(feed)
    spark.read.parquet(deltaPath).count()
  }

  /** The `_ts` a feed-applied row lands with: the feed's own insert
    * clock where present (TTL fidelity — see [[restoreFrom]]), else
    * the apply wall-clock.
    */
  private def feedTsColumn(resolved: DataFrame): Column =
    (if (resolved.columns.contains(TS))
       coalesce(col(TS), lit(System.currentTimeMillis()))
     else lit(System.currentTimeMillis())).as(TS)

  /** Advance `cdc.cursor` to the applied feed's max `_commit_seq` —
    * recorded HERE, by the operation that consumed the window, so the
    * natural restoreFrom → promoteReplica flow never replays full
    * history because nobody remembered to set a property by hand.
    * Monotone (a re-applied old window can't rewind it); skipped for
    * synthetic feeds that carry no commit column (e.g. a cold-backup
    * restore — a fresh primary has no replication ancestry).
    */
  private def recordCursor(feed: DataFrame): Unit =
    if (feed.columns.contains(COMMIT_SEQ)) {
      val m = feed.agg(max(col(COMMIT_SEQ))).head()
      if (!m.isNullAt(0)) {
        val upTo = m.getLong(0)
        val cur = definition.properties.get("cdc.cursor")
          .map(_.toLong).getOrElse(-1L)
        if (upTo > cur)
          catalog.alterCollectionProperties(name,
            Map("cdc.cursor" -> upTo.toString))
      }
    }

  /** Incrementally replay a change-feed batch onto this (possibly
    * non-empty) collection — the CDC REPLICA apply loop, the piece
    * between [[restoreFrom]] (initial full rebuild) and
    * [[graft.store.Catalog.promoteReplica]] (failover). The batch's
    * per-key history is resolved first (last `_seq` wins — the feed's
    * internal ordering never leaks into the replica as distinct
    * writes), then the winners land as ONE delta: upserts as live
    * rows, deletes as tombstones, each in its recorded `_part`. The
    * replica's own LWW read merge does the rest, so repeated applies
    * of successive feed windows reconstruct the upstream exactly.
    * Returns the number of applied change rows. One Spark job per
    * batch regardless of how many upstream commits it spans.
    */
  def applyFeed(spark: SparkSession, feed: DataFrame): Long = {
    val d = definition
    requireWritable(d)
    checkWriteQuota(spark, d)
    // An empty window (caught-up replica, re-drained stream) must not
    // burn a seq on an empty delta.
    if (feed.isEmpty) return 0L
    val pk = d.primaryField.name
    val w = Window.partitionBy(pk).orderBy(col(SEQ).desc)
    val resolved = feed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val seq = catalog.nextSeq(name)
    val present = resolved.columns.toSet
    val cols = d.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ (if (d.enableDynamicField) Seq(col(DYN)) else Nil) :+ col(PART)
    // `_ts` from the feed where present — same TTL-clock fidelity rule
    // as [[restoreFrom]] (tombstones keep their delete time too).
    val internal = resolved.select(cols :+
        (col("_op") === "delete").as(DEL) :+ feedTsColumn(resolved): _*)
      .withColumn(SEQ, lit(seq))
    val routed =
      if (internal.rdd.getNumPartitions > 1) internal.repartition(col(PART))
      else internal
    val deltaPath = commitDelta(routed.sortWithinPartitions(pk), seq)
    recordCursor(feed)
    spark.read.parquet(deltaPath).count()
  }

  /** Streaming form of [[changeFeed]]: a Structured Streaming source
    * over the delta log. New deltas appear as whole directories via
    * atomic rename, exactly the contract the file stream source wants;
    * each micro-batch carries the newly committed change rows, so a
    * downstream incremental pipeline (dedup refresh, index fan-out,
    * replication — the CDC consumer shapes) is a plain
    * `writeStream.foreachBatch`. `_part` is physical (a directory
    * name, not file data), so it is recovered from the file path.
    * Deltas removed by compaction after being read are harmless — the
    * source tracks processed files; a NEW consumer starting after a
    * compaction sees the folded base as its initial resync batch, the
    * same contract as the batch feed.
    */
  def changeFeedStream(spark: SparkSession): DataFrame = {
    val d = definition
    requireAccessible(d)
    require(!isExternal, "external collections have no delta log")
    val stored = d.fields.filterNot(f =>
      d.functionOutputFields.contains(f.name)).map(_.name)
    val outCols =
      (stored ++ (if (d.enableDynamicField) Seq(DYN) else Nil)).map(col) ++
        Seq(when(col(DEL), "delete").otherwise("upsert").as("_op"),
          col(SEQ), col(TS),
          // `_part` is a directory name, not file data; recovered from
          // the path (partition DISCOVERY can't span the per-delta
          // roots — each delta is its own partitioned tree, and the
          // file index rejects the conflicting structures).
          regexp_extract(input_file_name(), "_part=([^/]+)", 1).as(PART),
          // Commit position, from the delta directory name (see the
          // batch feed: differs from `_seq` only for 2PC imports).
          regexp_extract(input_file_name(), "delta_(\\d+)/", 1)
            .cast("long").as(COMMIT_SEQ))
    spark.readStream
      .schema(StructType(deltaSchema(d).filterNot(_.name == PART)))
      // glob the LEAF partition dirs: every matched root holds plain
      // files, so no partition inference runs at all; the re-glob each
      // micro-batch picks up newly renamed-in delta directories.
      .parquet(s"${dataDir.toString}/delta_*/$PART=*")
      .select(outCols: _*)
  }

  // ---- read path --------------------------------------------------------

  /** Merge-on-read snapshot. Column pruning/pushdown still applies —
    * callers filter/select on the returned DataFrame and Catalyst pushes
    * through the window where legal.
    */
  def read(spark: SparkSession, partitionNames: Seq[String] = Seq.empty,
      asOfMillis: Option[Long] = None): DataFrame =
    read(spark, partitionNames, asOfMillis, None)

  /** Merged view retaining the physical partition name (`_part`) —
    * index builds persist it (an extra partition level of the index
    * layout) so partition-scoped searches prune the INDEX directories
    * too instead of falling back to the exact scan.
    */
  private[store] def readWithPartition(spark: SparkSession): DataFrame = {
    requireAccessible(definition) // index builds read the same data
    // External collections have no delta log (and no partitions):
    // their rows all belong to the default partition.
    if (isExternal) read(spark).withColumn(PART, lit(DEFAULT_PART))
    else assemble(spark, Seq.empty, None, None, keepInternals = true)
      .drop("_ts")
  }

  /** Bytes of deltas committed after `sinceSeq` — the driver-side
    * (no Spark job) eligibility input for growing-segment index
    * serving ([[IndexStore]]): a persisted build stays servable while
    * the post-build delta volume is a small fraction of it.
    */
  def deltaBytesSince(sinceSeq: Long): Long =
    if (isExternal) Long.MaxValue
    else deltaPaths
      .filter(_.name.stripPrefix("delta_").toLong > sinceSeq)
      .map(_.totalSize).sum

  /** The "growing segment" view for index serving: the deltas
    * committed after `sinceSeq`, resolved to
    *   - `newRows`    — the currently VISIBLE rows those deltas
    *     produce (last-writer-wins among them, tombstones dropped,
    *     TTL applied — the [[readWithPartition]] shape incl. `_part`),
    *   - `changedPks` — every pk the deltas touch (insert, upsert, OR
    *     delete): these must be masked out of the sealed build, whose
    *     copy of them is stale.
    *
    * Returns None when resolution over the recent window alone would
    * be unsound: a 2PC import committed after `sinceSeq` carries
    * prepare-time `_seq`s that may order BELOW rows already in the
    * sealed build (commitImport doc), so the window's max-`_seq` row
    * is not necessarily the global winner. Detected with one tiny
    * aggregate over the recent deltas (bounded by the caller's byte
    * gate); callers fall back to a full re-encode/rebuild.
    */
  // Memoized per (sinceSeq, committedSeq): a DML-heavy brick runs MANY
  // searches between writes, and the late-import probe below is an
  // EAGER (driver-blocking) aggregate — paying it once per delta
  // window instead of once per search keeps growing-segment serving
  // cheaper than the rebuild it replaces. Entries for superseded
  // windows are evicted on access.
  private val deltaViewCache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Long), Option[(DataFrame, DataFrame)]]()

  private[store] def deltaViewSince(spark: SparkSession,
      sinceSeq: Long): Option[(DataFrame, DataFrame)] = {
    val cs = committedSeq
    deltaViewCache.keySet.removeIf(k => k._2 != cs)
    deltaViewCache.computeIfAbsent((sinceSeq, cs), _ => {
      val d = definition
      val recent = deltaPaths.filter(
        _.name.stripPrefix("delta_").toLong > sinceSeq)
      if (recent.isEmpty || isExternal) None
      else {
        val raw = rawDeltas(spark, d, recent.map(_.toString)).get
        val minRow = raw.agg(min(col(SEQ))).head()
        // empty recent deltas (a zero-row write) have nothing to serve
        val minSeq =
          if (minRow.isNullAt(0)) Long.MaxValue else minRow.getLong(0)
        if (minSeq <= sinceSeq) None // late-committed import
        else {
          val pk = d.primaryField.name
          val changedPks = raw.select(col(pk)).distinct()
          val newRows = assemble(spark, Seq.empty, None, None,
            keepInternals = true, deltaOverride = Some(recent)).drop(TS)
          Some((newRows, changedPks))
        }
      }
    })
  }

  /** `pkPrefilter` is applied BELOW the merge window: safe only for
    * predicates over the PK alone (they keep or drop whole PK groups,
    * so last-writer-wins and tombstone resolution are unaffected) — and
    * exactly what turns a point lookup into a row-group-pruned scan
    * instead of a full merge. Collection.query derives it automatically.
    */
  private[store] def read(spark: SparkSession, partitionNames: Seq[String],
      asOfMillis: Option[Long], pkPrefilter: Option[Column]): DataFrame = {
    requireAccessible(definition)
    if (isExternal) {
      require(partitionNames.isEmpty && asOfMillis.isEmpty,
        s"external collection $name has no partitions or time travel")
      // The prefilter applies to the CACHED frame too (same whole-pk-
      // group safety as the store branch below) — a loaded external
      // collection's point lookup filters the in-memory snapshot
      // instead of returning the whole table to the caller's filter.
      val base = cached.getOrElse(externalRead(spark))
      return pkPrefilter.map(base.filter).getOrElse(base)
    }
    cached match {
      // A pk-only predicate keeps or drops whole PK groups, so applying
      // it ABOVE the already-merged cached snapshot is equivalent to
      // the below-window prefilter — and a point lookup on a Loaded
      // collection must hit the in-memory snapshot, not re-merge the
      // delta chain to save row-group IO it no longer pays.
      case Some(df) if partitionNames.isEmpty && asOfMillis.isEmpty =>
        pkPrefilter.map(df.filter).getOrElse(df)
      case _ => assemble(spark, partitionNames, asOfMillis, pkPrefilter)
    }
  }

  /** Committed delta directories in seq order. Enumerated explicitly
    * (atomic-renamed into place) rather than globbed: a glob can race a
    * concurrent writer whose staging directory makes dataDir non-empty
    * while `delta_*` matches nothing yet.
    */
  private def deltaPaths: Seq[StorePath] = {
    val retired = readRetiredIndex().keySet
    dataDir.list
      .filter(p => p.name.startsWith("delta_") && !retired.contains(p.name))
      .sortBy(_.name)
  }

  /** Compaction stamps this marker in the base it writes: the base is
    * exactly one row per live PK with `_del = false` (the fold already
    * resolved last-writer-wins and dropped tombstones). A read that
    * sees a single marked delta can skip the merge window entirely —
    * the 100 TB difference between "scan parquet" and "hash-shuffle the
    * whole table by PK before every query".
    */
  private val UniqueBaseMarker = "_unique_base"

  private def isUniqueBase(p: StorePath): Boolean =
    p.resolve(UniqueBaseMarker).exists

  /** Raw committed-delta scan (below the merge window), or None for an
    * empty collection. Each delta is `partitionBy(_part)`, so `_part`
    * predicates on this frame are partition (directory) filters.
    */
  private def rawDeltas(spark: SparkSession, d: CollectionDef,
      deltas: Seq[String]): Option[DataFrame] = {
    if (deltas.isEmpty) None
    else Some(deltas
      // One scan per delta root, unioned: multi-root reads can't share
      // a Hive-style partition spec (`delta_N/` sits between the base
      // and `_part=`), but a `_part` predicate pushes through the Union
      // into EVERY branch as a partition (directory) filter, which is
      // the pruning that matters. Compaction bounds the branch count.
      .map(p => spark.read.schema(deltaSchema(d)).parquet(p))
      .reduce(_ union _))
  }

  private def assemble(spark: SparkSession, partitionNames: Seq[String],
      asOfMillis: Option[Long], pkPrefilter: Option[Column] = None,
      keepInternals: Boolean = false,
      pkSemi: Option[DataFrame] = None,
      deltaOverride: Option[Seq[StorePath]] = None): DataFrame = {
    val d = definition
    val outCols = userColumns(d) ++ (if (keepInternals) Seq(PART, TS) else Nil)
    val paths = deltaOverride.getOrElse(deltaPaths)
    val raw = rawDeltas(spark, d, paths.map(_.toString))
    if (raw.isEmpty) {
      val st =
        if (!keepInternals) d.structType
        else StructType(outCols.map(c => deltaSchema(d).apply(c)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    }
    val pk = d.primaryField.name
    var df = raw.get
    if (partitionNames.nonEmpty)
      // Pure partition filter → directory pruning at the scan.
      // Tombstones are co-located with the rows they suppress (delete
      // writes one per (pk, _part)), so no cross-partition OR-clause
      // is needed for delete visibility.
      df = df.filter(col(PART).isin(partitionNames: _*))
    pkPrefilter.foreach(p => df = df.filter(p))
    // Candidate-pk semi-join BELOW the merge window — same
    // whole-group-safe shape as pkPrefilter (every delta row of a pk
    // is kept or dropped together), used by secondary-index lookups.
    pkSemi.foreach(p => df = df.join(p, Seq(pk), "left_semi"))
    // Last write per PK wins; tombstones drop the key. FAST PATH: a
    // single compaction-stamped base is already unique-per-pk with no
    // tombstones, so the row_number window (a full PK hash shuffle per
    // uncached read) is provably a no-op — skip it and read the base
    // as plain pruned parquet. The `!_del` filter stays as a pushed
    // scan predicate (free belt-and-braces, no shuffle).
    var out =
      if (paths.size == 1 && isUniqueBase(paths.head)) df.filter(!col(DEL))
      else {
        val w = Window.partitionBy(pk).orderBy(col(SEQ).desc)
        df.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1 && !col(DEL))
      }
    d.ttlSeconds.foreach { ttl =>
      val now = asOfMillis.getOrElse(System.currentTimeMillis())
      out = out.filter(col(TS) >= lit(now - ttl * 1000L))
    }
    // Entity-level TTL (3.0 feature-inventory "EntityTTL",
    // schema_matrix_3_0.yaml:28-39): the `ttl.field` property names an
    // INT64 expire-at column (epoch millis); a row whose expire time
    // has passed is invisible, a null expire time never expires. Same
    // read-time-filter shape as collection TTL — expiry costs no
    // write, and the filter pushes to the parquet scan.
    d.properties.get("ttl.field").foreach { f =>
      val now = asOfMillis.getOrElse(System.currentTimeMillis())
      out = out.filter(col(f).isNull || col(f) > lit(now))
    }
    val derived = functionOutputColumns(d)
    // default_value fill (add_collection_field semantics,
    // schema_evolution_workload.py:44-64: every added field carries a
    // type-appropriate default): a null — whether from a row written
    // BEFORE the field existed, or a batch that omitted it — reads as
    // the default. Defaults are VIRTUAL (read-time coalesce, no data
    // rewrite), which is what lets an add-field-with-default
    // retro-apply to committed rows for free; the trade is that a
    // filter on a defaulted field evaluates above the coalesce rather
    // than pushing to the scan.
    val defaults = d.fields.flatMap(f => f.defaultValue.map(v =>
      f.name -> coalesce(col(f.name), lit(v).cast(f.dataType)))).toMap
    out.select(outCols.map(c => derived.get(c).map(_.as(c))
      .orElse(defaults.get(c).map(_.as(c))).getOrElse(col(c))): _*)
  }

  /** Fold all deltas into a single base delta (bounds read
    * amplification; the LSM "major compaction").
    *
    * Race-safe against concurrent DML (the pressure-runner +
    * auto-compaction shape): only the deltas captured BEFORE the fold
    * are deleted afterward. A delta committed mid-compaction is either
    * (a) not folded and not deleted — untouched, or (b) folded into
    * the new base AND left on disk — harmless redundancy that
    * last-writer-wins resolves (the base carries the higher seq) and
    * the next compaction removes. One compaction at a time per
    * collection directory (JVM lock), so two triggers can't do the
    * rewrite twice.
    */
  def compact(spark: SparkSession): Unit =
    Collection.compactLock(dataDir.toString).synchronized {
      val d = definition
      requireWritable(d)
      // Defer while an import is pending (2PC interaction): the staged
      // batch holds its prepare-time seq, but the fold re-stamps
      // surviving rows with a HIGHER seq and removes tombstones
      // outright — compacting now would flip last-writer-wins against
      // a later commitImport (old values would beat the import; deleted
      // pks would resurrect). Compaction waits for in-flight
      // transactions; stale imports must be aborted to unblock it.
      if (listImports().nonEmpty) return
      val folded = deltaPaths
      if (folded.isEmpty) return
      // keepInternals: the fold preserves each row's original `_part`
      // (physical partition — re-deriving would re-route explicitly
      // placed rows) and `_ts` (TTL clock — restamping would reset
      // expiry on every compaction).
      val snapshot = assemble(spark, Seq.empty, None, None, keepInternals = true)
      val seq = catalog.nextSeq(name)
      val staging = dataDir.resolve(s"_staging_$seq")
      val stamped = snapshot
        .withColumn(SEQ, lit(seq))
        .withColumn(DEL, lit(false))
      // Layout: the major fold is where physical order gets repaired.
      // Default: co-locate partitions (one file per partition
      // directory instead of tasks x partitions) and sort by pk. With
      // a declared `clustering.key` (the 2.5+ clustering-compaction
      // surface): RANGE-partition on (_part, key) and sort (key, pk)
      // within tasks, so each output file covers a narrow key range
      // and a key-filtered scan prunes whole files via parquet min/max
      // — the columnar twin of the reference's clustering-compaction
      // segment pruning. The unique-base fast path (assemble) skips
      // the LWW window on the compacted base, so the key predicate
      // reaches the scan. Small DML deltas skip both shuffles (an
      // extra shuffle per insert would tax the pressure path); rows
      // written since the last fold are unclustered until the next.
      val laid = d.properties.get("clustering.key") match {
        case Some(key) =>
          // File-count control: `clustering.partitions` pins the range
          // bucket count; unset, the shuffle default + AQE size the
          // buckets by bytes (coalescing adjacent ranges preserves
          // non-overlap — exactly the sizing you want at scale).
          val ranged = d.properties.get("clustering.partitions") match {
            case Some(n) =>
              stamped.repartitionByRange(n.toInt, col(PART), col(key))
            case None => stamped.repartitionByRange(col(PART), col(key))
          }
          ranged.sortWithinPartitions(col(PART), col(key),
            col(d.primaryField.name))
        case None =>
          stamped.repartition(col(PART))
            .sortWithinPartitions(d.primaryField.name)
      }
      laid.write.mode("overwrite").partitionBy(PART).parquet(staging.toString)
      // Stamp BEFORE the atomic move: the marker and the base become
      // visible together, so a reader can never see a marked
      // half-written directory. (Spark ignores `_`-prefixed files.)
      staging.resolve(UniqueBaseMarker).writeBytes(Array.emptyByteArray)
      // Move-then-retire: the new base lands FIRST, so a listing never
      // catches the moment where the folded chain is gone and the base
      // isn't there yet (a reader in that gap saw only mid-compaction
      // deltas — caught by HammerSpec). During the overlap readers see
      // base + folded deltas together, which last-writer-wins resolves
      // to the base (it carries the fold's higher seq; a pre-fold
      // tombstone still out-ranks the even-older insert it masks).
      staging.moveTo(dataDir.resolve(f"delta_$seq%012d"))
      // Folded deltas a snapshot references are parked, not deleted.
      retireDeltas(folded)
      refreshCachedSnapshot(spark)
    }

  /** Minor (leveled) compaction: fold the tail deltas into ONE delta,
    * leaving the compaction-stamped base untouched — the LSM fix for
    * the O(table) cost of a full fold. At 100 TB a major compaction
    * every `maxDeltas` writes rewrites the whole table per k small
    * batches; the minor fold rewrites only the delta tail, so write
    * amplification scales with ingested bytes until the tail is a
    * configured fraction of the base (see [[maybeAutoCompact]]).
    *
    * Correctness: the merged delta keeps each surviving row's ORIGINAL
    * `_seq`/`_ts`/`_part` and KEEPS tombstones (they still mask base
    * rows). Per-pk last-writer-wins selection is associative —
    * LWW(base ∪ tail ∪ later) = LWW(base ∪ LWW(tail) ∪ later) as long
    * as winners keep their seqs — so every read, the changefeed's
    * per-key resolution, and delta-serving's row-seq math are
    * unchanged. The merged DIRECTORY takes a fresh commit seq; a
    * feed cursor inside the folded range re-sees the folded rows under
    * the new commit position (the documented compacted-changelog
    * resync, idempotent under LWW replay). Visibility: the merged
    * delta lands BEFORE the folded ones retire, so a concurrent
    * reader sees duplicate identical winner rows at worst — the merge
    * window resolves the tie to the same values.
    */
  def compactMinor(spark: SparkSession): Unit =
    Collection.compactLock(dataDir.toString).synchronized {
      val d = definition
      requireWritable(d)
      // Same 2PC guard as the major fold: folding rows past a pending
      // import's prepare seq is fine for LWW (seqs are preserved), but
      // deferring keeps the two compaction modes behaviorally aligned.
      if (listImports().nonEmpty) return
      val paths = deltaPaths
      val folded =
        if (paths.nonEmpty && isUniqueBase(paths.head)) paths.tail else paths
      if (folded.size <= 1) return
      val pk = d.primaryField.name
      val raw = rawDeltas(spark, d, folded.map(_.toString)).get
      val w = Window.partitionBy(pk).orderBy(col(SEQ).desc)
      val merged = raw.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      val seq = catalog.nextSeq(name)
      val staging = dataDir.resolve(s"_staging_$seq")
      merged
        .repartition(col(PART))
        .sortWithinPartitions(pk)
        .write.mode("overwrite").partitionBy(PART).parquet(staging.toString)
      // NOT a unique base: tombstones and multi-seq rows live here, so
      // reads over {base, merged} still need the merge window.
      staging.moveTo(dataDir.resolve(f"delta_$seq%012d"))
      retireDeltas(folded)
      refreshCachedSnapshot(spark)
    }

  /** Force Merge compaction mode (3.0 feature-inventory plan §5): an
    * explicit operator-initiated full fold, regardless of whether the
    * auto-compaction policy would have triggered. Returns (deltas
    * before, deltas after) so callers can assert the merge happened.
    */
  def forceMerge(spark: SparkSession): (Int, Int) = {
    requireWritable(definition)
    val before = numDeltas
    compact(spark)
    (before, numDeltas)
  }

  /** Committed delta count (read-amplification stat; what the
    * auto-compaction policy meters).
    */
  def numDeltas: Int = deltaPaths.size

  def numEntities(spark: SparkSession): Long = read(spark).count()

  /** query with Milvus-expression filter + partition_names (Q1/Q6). */
  def query(spark: SparkSession, filterExpr: String = "",
      outputFields: Seq[String] = Seq("*"),
      partitionNames: Seq[String] = Seq.empty,
      orderBy: Seq[Column] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0,
      consistencyLevel: String = "Strong"): DataFrame = {
    // consistencyLevel accepted for API fidelity (Q7): Spark batch
    // reads are snapshot-consistent, so every level behaves as Strong.
    val pk = definition.primaryField.name
    // PK-only predicates are safe below the merge window (whole PK
    // groups are kept or dropped) — push them into the delta scan so a
    // point lookup prunes row groups instead of merging the table.
    val pkOnly = filterExpr.trim.nonEmpty &&
      MilvusExpr.referencedFields(filterExpr) == Set(pk)
    val prefilter =
      if (pkOnly) Some(MilvusExpr.compile(filterExpr, definition.structType, None))
      else None
    // A pure point-in-polygon or point-equality filter over an
    // RTREE-indexed field routes through the grid index (the go_bench
    // horizon query shape / the index-compat GEOMETRY probe shape:
    // the filter string IS the API; users never call queryGeo).
    def rtreeIndexed(f: String) = partitionNames.isEmpty &&
      definition.indexes.exists(ix =>
        ix.field == f && ix.indexType.toUpperCase == "RTREE")
    MilvusExpr.asGeoProbe(filterExpr)
      .filter { case (f, _) => rtreeIndexed(f) }
      .foreach { case (f, poly) =>
        return QueryOps.query(geoBase(spark, f, poly), None,
          outputFields, orderBy, limit, offset)
      }
    MilvusExpr.asGeoPointProbe(filterExpr)
      .filter { case (f, _) => rtreeIndexed(f) }
      .foreach { case (f, point) =>
        return QueryOps.query(geoPointBase(spark, f, point), None,
          outputFields, orderBy, limit, offset)
      }
    val base = read(spark, partitionNames, None, prefilter)
    val pred =
      if (filterExpr.trim.isEmpty) None
      else Some(MilvusExpr.compile(filterExpr, base,
        dynamicField = if (definition.enableDynamicField) Some("_dynamic") else None))
    QueryOps.query(base, pred, outputFields, orderBy, limit, offset)
  }

  /** Query accelerated by a persisted JSON-path index (3.0 "JSON Path
    * Index", Sort kind): `valuePred` runs against the index's typed
    * `_v` column, where the scan prunes whole index files via min/max
    * stats (the index is range-partitioned and sorted on `_v`);
    * only the matching pks' delta rows then go through the merge read
    * (semi-join below the window). Without a declared JSON_PATH index
    * for the path, falls back to the full expression filter.
    */
  def queryJsonPath(spark: SparkSession, field: String, path: String,
      castType: String, valuePred: Column => Column,
      outputFields: Seq[String] = Seq("*")): DataFrame = {
    val d = definition
    val pk = d.primaryField.name
    val declared = d.indexes.find(ix =>
      ix.field == field && ix.indexType.toUpperCase == "JSON_PATH" &&
        ix.params.get("path").contains(path))
    val base = declared match {
      case Some(ix) =>
        // Sealed/growing delta serving: post-DML queries filter the
        // served value frame (sealed minus changed pks, plus delta
        // values) instead of forcing a rebuild.
        val values = IndexStore.serveJsonPathValues(spark, this, field,
          path, ix.params.getOrElse("cast", castType),
          ix.params.getOrElse("kind", "sort"),
          ix.params.get("bitmap_cardinality").map(_.toInt).getOrElse(1024))
        val pks = values
          .filter(valuePred(col("_v"))).select(col(pk))
        assemble(spark, Seq.empty, None, None, keepInternals = false,
          pkSemi = Some(pks))
      case None =>
        val casted = expr(
          s"try_cast(get_json_object($field, '$path') AS $castType)")
        read(spark).filter(valuePred(casted))
    }
    QueryOps.query(base, None, outputFields, Seq.empty, None, 0)
  }

  /** Point-in-polygon query accelerated by a declared RTREE index
    * (3.0 GEOMETRY surface, schema_matrix_3_0.yaml:15-26): the query
    * polygon's bbox enumerates its covered grid cells driver-side, the
    * persisted grid index prunes to those cell DIRECTORIES at the scan
    * (PartitionFilters — at 100 TB a small polygon touches a handful
    * of cells, not the table), exact ST_CONTAINS refines the surviving
    * cells, and the matching pks semi-join below the merge window for
    * output fields. Falls back to the full-scan predicate without a
    * declared index, or when the polygon's bbox covers more cells than
    * an IN-list should hold (a polygon that big reads most of the
    * table anyway).
    */
  def queryGeo(spark: SparkSession, field: String, polygonWkt: String,
      outputFields: Seq[String] = Seq("*"),
      maxCells: Int = 4096): DataFrame =
    QueryOps.query(geoBase(spark, field, polygonWkt, maxCells), None,
      outputFields, Seq.empty, None, 0)

  /** The geo-pruned (or fallback) merged view behind [[queryGeo]] and
    * the `query(filter = "ST_CONTAINS(...)")` auto-route.
    */
  private def geoBase(spark: SparkSession, field: String,
      polygonWkt: String, maxCells: Int = 4096): DataFrame = {
    import org.apache.spark.sql.graft.functions.Wkt
    val d = definition
    val pk = d.primaryField.name
    val exact = graft.Functions.stContains(lit(polygonWkt), col(field))
    val declared = d.indexes.find(ix =>
      ix.field == field && ix.indexType.toUpperCase == "RTREE")
    (declared, Wkt.parsePolygon(polygonWkt)) match {
      case (Some(ix), Some(ring)) =>
        val b = IndexStore.ensureRtree(spark, this, field,
          ix.params.get("cell_size").map(_.toDouble).getOrElse(8.0))
        val (xs, ys) = (ring.map(_._1), ring.map(_._2))
        val (cx0, cx1) = (math.floor(xs.min / b.cellSize).toLong,
          math.floor(xs.max / b.cellSize).toLong)
        val (cy0, cy1) = (math.floor(ys.min / b.cellSize).toLong,
          math.floor(ys.max / b.cellSize).toLong)
        // Guard each axis span separately BEFORE multiplying: extreme
        // polygon coordinates saturate floor(x/cell).toLong near
        // Long.Min/Max, and a spanX*spanY product can overflow to a
        // negative value that slips past the maxCells check — after
        // which the driver-side cell enumeration below would hang on a
        // hostile/malformed WKT string. Non-finite coordinates produce
        // negative spans and fall back too.
        val (spanX, spanY) = (cx1 - cx0 + 1, cy1 - cy0 + 1)
        if (spanX <= 0 || spanY <= 0 ||
            spanX > maxCells || spanY > maxCells ||
            spanX * spanY > maxCells) read(spark).filter(exact)
        else {
          val cells = for (cx <- cx0 to cx1; cy <- cy0 to cy1)
            yield s"${cx}_$cy"
          val pks = spark.read.parquet(b.dataPath)
            .filter(col("_gcell").isin(cells: _*))
            .filter(graft.Functions.stContains(lit(polygonWkt), col(field)))
            .select(col(pk))
          assemble(spark, Seq.empty, None, None, keepInternals = false,
            pkSemi = Some(pks))
        }
      case _ => read(spark).filter(exact)
    }
  }

  /** Point-equality probe through the RTREE grid: the probe point maps
    * to exactly one `_gcell`, so the index scan prunes to a single cell
    * directory before the exact ST_EQUALS refine + pk semi-join read.
    * The geometric-equality refine tolerates formatting differences
    * between the stored WKT and the probe string; both land in the same
    * cell because cell assignment uses the parsed coordinates.
    */
  private def geoPointBase(spark: SparkSession, field: String,
      pointWkt: String): DataFrame = {
    import org.apache.spark.sql.graft.functions.Wkt
    val d = definition
    val pk = d.primaryField.name
    val exact = graft.Functions.stEquals(col(field), lit(pointWkt))
    val declared = d.indexes.find(ix =>
      ix.field == field && ix.indexType.toUpperCase == "RTREE")
    (declared, Wkt.parsePoint(pointWkt)) match {
      case (Some(ix), Some((x, y))) =>
        val b = IndexStore.ensureRtree(spark, this, field,
          ix.params.get("cell_size").map(_.toDouble).getOrElse(8.0))
        val cell = s"${math.floor(x / b.cellSize).toLong}_" +
          s"${math.floor(y / b.cellSize).toLong}"
        val pks = spark.read.parquet(b.dataPath)
          .filter(col("_gcell") === cell)
          .filter(graft.Functions.stEquals(col(field), lit(pointWkt)))
          .select(col(pk))
        assemble(spark, Seq.empty, None, None, keepInternals = false,
          pkSemi = Some(pks))
      case _ => read(spark).filter(exact)
    }
  }

  // ---- internals --------------------------------------------------------

  /** User-visible column names: declared fields plus `_dynamic` when
    * the collection enables dynamic fields.
    */
  private def userColumns(d: CollectionDef): Seq[String] =
    d.fields.map(_.name) ++ (if (d.enableDynamicField) Seq(DYN) else Nil)

  private def deltaSchema(d: CollectionDef): StructType =
    // All user fields nullable here: tombstone deltas carry only the PK,
    // so every other column reads back as null for those rows.
    StructType(d.structType.fields.map(_.copy(nullable = true)) ++
      (if (d.enableDynamicField) Seq(StructField(DYN, StringType)) else Nil) ++
      Seq(
        StructField(SEQ, LongType, nullable = false),
        StructField(DEL, BooleanType, nullable = false),
        StructField(TS, LongType, nullable = false),
        StructField(PART, StringType, nullable = false)))

  private def conformToSchema(rows: DataFrame, d: CollectionDef,
      allowMissingPk: Boolean): DataFrame = {
    val present = rows.columns.toSet
    val cols = d.fields.flatMap { f =>
      if (present.contains(f.name))
        Some(col(f.name).cast(f.dataType).as(f.name))
      else if (f.isPrimary && allowMissingPk) None
      // A defaulted field may be omitted even when non-nullable: the
      // stored null reads back as the default (assemble's coalesce).
      else if (f.nullable || f.defaultValue.isDefined)
        Some(lit(null).cast(f.dataType).as(f.name))
      else throw new IllegalArgumentException(
        s"missing non-nullable column ${f.name}")
    }
    if (!d.enableDynamicField) rows.select(cols: _*)
    else rows.select(cols :+ dynamicColumn(rows, d): _*)
  }

  /** Pack undeclared columns into the `_dynamic` JSON object. A batch
    * already carrying `_dynamic` (e.g. a conformed re-insert) passes it
    * through.
    */
  private def dynamicColumn(rows: DataFrame, d: CollectionDef): Column = {
    val declared = d.fields.map(_.name).toSet
    if (rows.columns.contains(DYN)) col(DYN).cast(StringType).as(DYN)
    else {
      val extras = rows.columns.filterNot(declared.contains).toSeq
      if (extras.isEmpty) lit("{}").as(DYN)
      else to_json(struct(extras.sorted.map(col): _*)).as(DYN)
    }
  }

  private def partitionColumn(d: CollectionDef, df: DataFrame,
      explicit: Option[String]): Column =
    explicit.map(lit).getOrElse {
      d.partitionKeyField match {
        case Some(pkf) =>
          val n = d.numPartitions.getOrElse(16)
          concat(lit("_bucket_"), pmod(hash(col(pkf.name)), lit(n)).cast(StringType))
        case None =>
          if (d.partitions.nonEmpty) {
            // pk % len(partitions) routing (validate_phase_dml_dql.py:105-108)
            val pkCol = col(d.primaryField.name)
            val idx =
              if (d.primaryField.dataType == LongType) pmod(pkCol, lit(d.partitions.length.toLong))
              else pmod(hash(pkCol), lit(d.partitions.length))
            element_at(typedlit(d.partitions), (idx + 1).cast(IntegerType))
          } else lit(DEFAULT_PART)
      }
    }

  private def withInternals(df: DataFrame, d: CollectionDef, seq: Long,
      explicitPart: Option[String] = None): DataFrame =
    df.withColumn(SEQ, lit(seq))
      .withColumn(DEL, lit(false))
      .withColumn(TS, lit(System.currentTimeMillis()))
      .withColumn(PART, partitionColumn(d, df, explicitPart))

  /** Partition-routed, PK-sorted delta frame with internal columns —
    * shared by the direct DML write path and the staged import path.
    */
  private def routedInternal(batch: DataFrame, d: CollectionDef, seq: Long,
      partition: Option[String]): DataFrame = {
    partition.foreach(p => require(listPartitions().contains(p),
      s"no such partition $p"))
    val internal = withInternals(batch, d, seq, partition)
    // Client-supplied batches (the insert/upsert protocol shape) are
    // LocalRelations whose row count is known on the driver for free.
    // Without sizing, a 100-row batch inherits defaultParallelism
    // (32) partitions and every delta write becomes a 32-task job
    // emitting 32 near-empty files — the delta chain then pays that
    // listing/footer overhead on every merge-on-read. Scan-backed
    // frames (the bulk-ETL shape) report None and keep their scan
    // parallelism.
    val small = localBatchRows(internal, exact = false)
      .exists(_ <= SmallBatchRows)
    val sized = if (small) internal.coalesce(1) else internal
    // Bulk writes into a multi-partition collection route rows to
    // their partition first: without it every task writes into every
    // partition directory (tasks x partitions small files per delta).
    // Small batches (single task after sizing — the pressure-DML
    // shape) skip the shuffle: one task writes one file per partition
    // value actually present in the batch.
    val multiPart = d.partitions.length > 1 ||
      d.partitionKeyField.isDefined || d.numPartitions.exists(_ > 1)
    val routed =
      if (!small && multiPart && partition.isEmpty &&
        sized.rdd.getNumPartitions > 1)
        sized.repartition(col(PART))
      else sized
    // PK-sorted row groups give parquet min/max stats real
    // selectivity for PK lookups/range scans (STL_SORT equivalent).
    routed.sortWithinPartitions(d.primaryField.name)
  }

  /** A client batch at or below this row count writes as a single
    * task: one parquet file per partition value present in the batch.
    * Above it (or when the size is unknowable without a job — any
    * scan-backed frame), the write keeps its input parallelism.
    */
  private val SmallBatchRows = 100000

  private def writeDelta(spark: SparkSession, batch: DataFrame,
      d: CollectionDef, seq: Long, partition: Option[String],
      deleted: Boolean): String =
    commitDelta(routedInternal(batch, d, seq, partition), seq)

  /** Auto-compaction policy (Milvus auto-compaction analog, opt-in via
    * the `compaction.maxDeltas` table property): once the delta chain
    * crosses the high-water count, fold it — without this an
    * append-heavy workload grows merge-on-read cost without bound.
    * Called at the END of each DML op, after the op has materialized
    * everything it reads from the just-committed delta.
    */
  private def maybeAutoCompact(spark: SparkSession, d: CollectionDef): Unit =
    d.properties.get("compaction.maxDeltas").map(_.toInt).foreach { max =>
      if (deltaPaths.size >= max) {
        // Leveled policy: while the delta tail is small relative to
        // the base, fold ONLY the tail (O(tail) write amplification);
        // the full O(table) rewrite waits until the tail has grown to
        // `compaction.majorRatio` of the base (default 20%), which
        // amortizes it over proportional ingest. No base yet (or a
        // big tail) → major fold, which creates/refreshes the
        // unique-per-pk base the fast read path keys on.
        val paths = deltaPaths
        val hasBase = paths.nonEmpty && isUniqueBase(paths.head)
        val ratio = d.properties.get("compaction.majorRatio")
          .map(_.toDouble).getOrElse(0.2)
        val minorEligible = hasBase && {
          // The base is immutable once written (a major fold replaces
          // the DIRECTORY, never its files), so its recursive size
          // walk — proportional to the whole table's file count — is
          // memoized per base path; only the small tail is re-walked
          // per trigger.
          val basePath = paths.head.toString
          val baseBytes = Collection.baseSizeCache.computeIfAbsent(
            basePath, _ => paths.head.totalSize)
          // Evict only THIS collection's stale bases (a major fold
          // replaced the directory): wiping other collections' entries
          // here would defeat the memoization for them — with >64
          // active collections each trigger would force everyone else
          // to re-walk whole-table metadata on their next DML. The
          // per-collection live set is exactly one base, so the cache
          // stays bounded by the number of active collections.
          val prefix = dataDir.toString + "/"
          Collection.baseSizeCache.keySet.removeIf(k =>
            k != basePath && k.startsWith(prefix))
          paths.tail.map(_.totalSize).sum < ratio * baseBytes
        }
        if (minorEligible) compactMinor(spark) else compact(spark)
      }
    }

}

object Collection {
  /** Fail a malformed default at DECLARATION time — a bad literal
    * surfacing as a null-producing cast on the first read would read
    * as "no default". Defaults are restricted to atomic types (the
    * reference's schema-evolution workload uses ""/0/0.0/false).
    */
  private[store] def validateDefault(f: FieldDef, v: String): Unit = {
    import org.apache.spark.sql.types._
    def ok(parse: => Any): Unit =
      try { parse; () } catch {
        case _: IllegalArgumentException | _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"default_value '$v' does not parse as ${f.dataType.simpleString} " +
              s"for field ${f.name}")
      }
    f.dataType match {
      // Width-exact parses: an out-of-range literal (e.g. 3e9 on INT)
      // would pass a toLong check, then the read-time cast would yield
      // null — "no default" — silently.
      case LongType => ok(v.toLong)
      case IntegerType => ok(v.toInt)
      case ShortType => ok(v.toShort)
      case ByteType => ok(v.toByte)
      case DoubleType | FloatType => ok(v.toDouble)
      case BooleanType => ok(v.toBoolean)
      case StringType => ()
      case other => throw new IllegalArgumentException(
        s"default_value is only supported on atomic types, " +
          s"not ${other.simpleString} (field ${f.name})")
    }
  }

  // One compaction at a time per collection DIRECTORY (not instance:
  // catalog.collection(name) hands out fresh instances over the same
  // storage).
  private val compactLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[store] def compactLock(dir: String): Object =
    compactLocks.computeIfAbsent(dir, _ => new Object)

  // Memoized on-disk size per (immutable) compaction base directory —
  // the leveled-policy check must not re-walk the whole table's file
  // metadata on every post-high-water DML. Bounded by eviction in
  // maybeAutoCompact.
  private[store] val baseSizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
}
