package graft.store

import org.apache.spark.sql.types._

/** Field declaration for a collection — mirrors the reference's
  * FieldSchema / FieldSpec surface (milvus_client/common/schema.py:13-63,
  * 2.6/common.py:932-1016): exactly one primary key, optional auto_id,
  * optional partition-key field, per-field max_length/dim.
  */
final case class FieldDef(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    isPrimary: Boolean = false,
    autoId: Boolean = false,
    isPartitionKey: Boolean = false,
    maxLength: Option[Int] = None,
    dim: Option[Int] = None,
    defaultValue: Option[String] = None)

/** Index declaration — metadata only: the exact engine scans, and the
  * ANN module consults these to pick an accelerated path
  * (manifests/schema_matrix_2_6.yaml:30-81).
  */
final case class IndexDef(
    field: String,
    indexType: String,
    metricType: Option[String] = None,
    params: Map[String, String] = Map.empty) {

  /** Fail fast on malformed numeric params at declaration time —
    * without this a bad `dim`/`cell_size`/`nlist` string surfaces as a
    * NumberFormatException deep inside the first index build/search
    * instead of at create_index/create_collection.
    */
  def validateParams(): Unit = {
    def check(key: String, parse: String => Any): Unit =
      params.get(key).foreach { v =>
        try { parse(v); () } catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"index on '$field': param $key='$v' is not numeric")
        }
      }
    Seq("nlist", "buckets", "tables", "num_planes", "bitmap_cardinality",
      "refine_k").foreach(check(_, _.toInt))
    check("seed", _.toLong)
    check("cell_size", _.toDouble)
    params.get("cell_size").foreach(v => require(v.toDouble > 0,
      s"index on '$field': cell_size must be positive, got $v"))
  }
}

/** Collection schema + properties. Validation mirrors
  * validate_schema_matrix (common/schema.py:175-269).
  */
/** A schema-bound function (the reference's `Function` objects, e.g.
  * BM25 VARCHAR -> SPARSE_FLOAT_VECTOR, common/schema.py functions
  * blocks; add/drop cycled by schema_evolution_workload.py:93-124).
  * The output field is engine-computed — never inserted, served as a
  * derived column while the function is bound.
  */
final case class FunctionDef(name: String, functionType: String,
    inputFields: Seq[String], outputFields: Seq[String],
    params: Map[String, String] = Map.empty)

final case class CollectionDef(
    name: String,
    fields: Seq[FieldDef],
    enableDynamicField: Boolean = false,
    partitions: Seq[String] = Seq.empty,
    numPartitions: Option[Int] = None, // partition-key hash buckets
    ttlSeconds: Option[Long] = None,
    shardsNum: Int = 1,
    indexes: Seq[IndexDef] = Seq.empty,
    functions: Seq[FunctionDef] = Seq.empty,
    description: String = "",
    // Collection properties (table-properties surface). Quota keys
    // mirror the server-side write quotas the reference's deny loops
    // exercise (create_n_insert_until_denied.py:122-144 retries on
    // "memory quota exceeded"): `quota.rows` / `quota.bytes` deny DML
    // once the committed store crosses the high-water mark.
    properties: Map[String, String] = Map.empty) {

  /** Names of engine-computed function-output fields. */
  def functionOutputFields: Set[String] = functions.flatMap(_.outputFields).toSet

  def primaryField: FieldDef = fields.find(_.isPrimary).get
  def partitionKeyField: Option[FieldDef] = fields.find(_.isPartitionKey)

  def validate(): Unit = {
    val primaries = fields.filter(_.isPrimary)
    require(primaries.length == 1,
      s"exactly one primary field required, got ${primaries.map(_.name)}")
    val pk = primaries.head
    require(pk.dataType == LongType || pk.dataType == StringType,
      s"primary field must be INT64 or VARCHAR, got ${pk.dataType}")
    require(!pk.nullable, "primary field cannot be nullable")
    fields.filter(_.autoId).foreach(f =>
      require(f.isPrimary, s"auto_id only allowed on the primary field (${f.name})"))
    val pkeys = fields.filter(_.isPartitionKey)
    require(pkeys.length <= 1, "at most one partition-key field")
    pkeys.foreach { f =>
      require(f.dataType == LongType || f.dataType == StringType,
        s"partition key must be INT64 or VARCHAR, got ${f.dataType}")
      require(partitions.isEmpty,
        "partition key is mutually exclusive with explicit partitions")
      require(!f.isPrimary, "partition key cannot be the primary field")
    }
    fields.foreach { f =>
      f.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          require(f.dim.isDefined || !isVectorName(f), "")
        case _ => ()
      }
    }
    val names = fields.map(_.name)
    require(names.distinct.length == names.length, "duplicate field names")
    fields.foreach(f => f.defaultValue.foreach { v =>
      require(!f.isPrimary, s"primary field ${f.name} cannot have a default")
      Collection.validateDefault(f, v)
    })
    indexes.foreach { ix =>
      require(names.contains(ix.field),
        s"index references undeclared field ${ix.field}")
      ix.validateParams()
    }
    properties.get("ttl.field").foreach { f =>
      val fd = fields.find(_.name == f).getOrElse(throw
        new IllegalArgumentException(s"ttl.field references undeclared field $f"))
      require(fd.dataType == LongType,
        s"ttl.field $f must be INT64 (epoch millis), got ${fd.dataType}")
    }
    // Clustering key (the 2.5+ clustering-compaction surface): major
    // compaction re-lays the base range-clustered on this scalar
    // field, so key-filtered scans prune whole files by parquet
    // min/max stats. Must be an orderable atomic field — range
    // boundaries are sampled from its sort order.
    properties.get("clustering.key").foreach { f =>
      val fd = fields.find(_.name == f).getOrElse(throw
        new IllegalArgumentException(
          s"clustering.key references undeclared field $f"))
      require(Set[DataType](LongType, IntegerType, ShortType, ByteType,
        DoubleType, FloatType, StringType, TimestampType, DateType,
        BooleanType).contains(fd.dataType),
        s"clustering.key $f must be an orderable scalar, got ${fd.dataType}")
    }
    // clustering.partitions without a clustering.key is INERT (compact
    // ignores it), not an error: clearing the key alone is the natural
    // way to turn clustering off, and must not trip over a leftover
    // bucket count.
    properties.get("clustering.partitions").foreach { n =>
      val v = try n.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"clustering.partitions '$n' is not an integer")
      }
      require(v > 0, s"clustering.partitions must be positive, got $n")
    }
    // Functions arriving via createCollection (e.g. SchemaMatrix YAML)
    // must fail at create time, not on the first read inside
    // functionOutputColumns (where a missing/garbage 'dim' would
    // surface as NoSuchElementException/NumberFormatException).
    functions.foreach { f =>
      val kind = f.functionType.toUpperCase
      require(kind == "BM25" || kind == "TEXT_EMBEDDING",
        s"unsupported function type ${f.functionType}")
      require(f.inputFields.nonEmpty && f.outputFields.nonEmpty,
        s"function ${f.name} needs input and output fields")
      if (kind == "TEXT_EMBEDDING") {
        val dim = f.params.getOrElse("dim", throw new IllegalArgumentException(
          s"TEXT_EMBEDDING function ${f.name} needs a 'dim' param"))
        val d = try dim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"TEXT_EMBEDDING function ${f.name}: dim '$dim' is not an integer")
        }
        require(d > 0,
          s"TEXT_EMBEDDING function ${f.name}: dim must be positive, got $d")
      }
    }
  }

  private def isVectorName(f: FieldDef): Boolean = f.dim.isDefined

  /** User-visible Spark schema (no engine-internal columns). */
  def structType: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, f.nullable)))
}

private[store] final case class CatalogMeta(
    d: CollectionDef, seq: Long, loadState: String)

object Catalog {
  /** JVM-global per-collection-DIRECTORY locks for the meta.json
    * read-modify-writes. `this.synchronized` is per-Catalog-INSTANCE:
    * two Catalog objects over the same root (the two-driver shape the
    * retire lease exists for, in-JVM) would interleave
    * readMeta→writeMeta and double-allocate write seqs — two writers
    * then stage the same delta name and one crashes mid-rename.
    * Keyed by directory, like Collection.compactLock.
    */
  private val metaLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[store] def metaLock(dir: String): Object =
    metaLocks.computeIfAbsent(dir, _ => new Object)
}

/** File-backed collection catalog. One directory per collection under
  * `root`, holding `meta.json` plus sequenced parquet delta directories
  * (see [[Collection]]). Aliases are catalog-level pointers
  * (alter_alias.py:69-98: atomic swap of the collection behind a name).
  *
  * All path operations go through [[StorePath]] (Hadoop FileSystem),
  * so `root` may be a local directory, a `file:///` URI, or a
  * distributed `hdfs://` / `s3a://` URI — same code either way.
  */
final class Catalog(val root: String) {
  private val rootPath: StorePath = {
    val p = StorePath(root)
    p.createDirectories()
    p
  }

  private def dir(name: String): StorePath = rootPath.resolve(name)
  private def metaFile(name: String): StorePath = dir(name).resolve("meta.json")
  private def aliasFile: StorePath = rootPath.resolve("_aliases.json")

  def createCollection(d: CollectionDef): Collection = {
    d.validate()
    require(!hasCollection(d.name), s"collection ${d.name} already exists")
    dir(d.name).createDirectories()
    writeMeta(d.name, CatalogMeta(d, seq = 0L, loadState = "NotLoad"))
    val c = new Collection(this, d.name)
    handles.put(d.name, c)
    c
  }

  /** External Collection over a parquet source (3.0 feature-inventory
    * plan §5): read-only, with an optional data mapping (source column
    * -> declared field) and MANUAL refresh — the initial source file
    * set is pinned here; later source files stay invisible until
    * `refreshExternal`.
    */
  def createExternalCollection(spark: org.apache.spark.sql.SparkSession,
      d: CollectionDef, sourceUri: String,
      mapping: Map[String, String] = Map.empty): Collection = {
    mapping.values.foreach(t => require(d.fields.exists(_.name == t),
      s"mapping targets undeclared field $t"))
    val props = d.properties +
      ("external.source" -> sourceUri) ++
      (if (mapping.isEmpty) Map.empty[String, String]
       else Map("external.mapping" ->
         mapping.map { case (s, t) => s"$s=$t" }.mkString(";")))
    val c = createCollection(d.copy(properties = props))
    c.refreshExternal(spark)
    c
  }

  /** External Collection whose source is another collection's SNAPSHOT
    * (3.0: "Milvus snapshot as External Table data source"): read-only
    * time-travel view served through the snapshot manifest.
    */
  def createExternalFromSnapshot(name: String, srcCollection: String,
      snapshotId: Long): Collection = {
    val src = collection(srcCollection)
    require(src.listSnapshots().contains(snapshotId),
      s"collection $srcCollection has no snapshot $snapshotId")
    val d = describeCollection(srcCollection)
    createCollection(CollectionDef(name, d.fields,
      enableDynamicField = d.enableDynamicField,
      properties = Map("external.snapshot" -> s"$srcCollection:$snapshotId")))
  }

  def hasCollection(name: String): Boolean = metaFile(resolve(name)).exists

  def dropCollection(name: String): Unit = {
    val n = resolve(name)
    Option(handles.remove(n)).foreach(_.invalidateCache())
    // Sweep the index-build caches BEFORE the files go: a recreated
    // same-name collection reuses the cache identity (the directory)
    // and eventually the exact versioned paths, so surviving entries
    // would serve deleted builds or the old corpus's stats
    // (IndexStore.dropAllCached doc).
    IndexStore.dropAllCached(dir(n).toString)
    dir(n).deleteRecursively()
  }

  def describeCollection(name: String): CollectionDef = readMeta(resolve(name)).d

  def listCollections(): Seq[String] =
    rootPath.list
      .filter(p => p.isDirectory && p.resolve("meta.json").exists)
      .map(_.name).sorted

  // One live handle per collection: a brick that load()s a collection
  // in one step and reads it in a later one must get the SAME instance,
  // or the load's cached snapshot dies with the throwaway handle (and
  // its entry leaks in the Spark cache manager until GC). All
  // in-process writes then flow through the one instance, whose
  // refresh-on-commit keeps the cached snapshot consistent.
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[String, Collection]()

  def collection(name: String): Collection = {
    val n = resolve(name)
    require(metaFile(n).exists, s"no such collection $name")
    handles.computeIfAbsent(n, new Collection(this, _))
  }

  // --- aliases (S13) ----------------------------------------------------
  def createAlias(alias: String, collection: String): Unit = {
    val m = readAliases
    require(!m.contains(alias), s"alias $alias already exists")
    writeAliases(m + (alias -> collection))
  }
  def alterAlias(alias: String, collection: String): Unit =
    writeAliases(readAliases + (alias -> collection))
  def dropAlias(alias: String): Unit = writeAliases(readAliases - alias)
  def listAliases(): Map[String, String] = readAliases

  /** CDC failover promote (feature-inventory §7 `cdc_failover_probe` /
    * "CDC force promote"): switch serving from `sourceName` to its
    * change-feed replica `replicaName`.
    *
    *  1. Unless `force`, catch the replica up first: replay the
    *     source's feed past the replica's stored cursor
    *     (`cdc.cursor` property) via [[Collection.applyFeed]].
    *     `force = true` skips the catch-up — the Milvus force-promote
    *     semantic: accept loss of the un-replayed tail to fail over
    *     NOW (the upstream may be unreachable).
    *  2. Demote the source: `cdc.standby = true` denies further writes
    *     so a client still pointed at the old primary can't
    *     split-brain it (reads stay up for diffing/salvage).
    *  3. Repoint `alias` at the replica — one atomic alias-file
    *     rename, the same swap discipline as S13, so readers of the
    *     alias never observe an intermediate state.
    *
    * Returns the number of change rows replayed by the catch-up (0
    * under `force`). The replica's cursor advances to the source seq
    * observed before the replay, keeping a later diff/salvage honest.
    */
  def promoteReplica(spark: org.apache.spark.sql.SparkSession,
      sourceName: String, replicaName: String, alias: String,
      force: Boolean = false): Long = {
    val srcN = resolve(sourceName)
    val repN = resolve(replicaName)
    require(srcN != repN, "source and replica are the same collection")
    val src = collection(srcN)
    val rep = collection(repN)
    // FENCE FIRST: demote the source before draining its feed — a
    // write acknowledged after the feed listing but before the fence
    // would be silently absent from the promoted replica (a data-loss
    // window proportional to replay time). With the fence up, the
    // drain reads a frozen log; reads/snapshots on the source stay up.
    alterCollectionProperties(srcN, Map("cdc.standby" -> "true"))
    val applied =
      if (force) 0L
      else
        try {
          val cursor = rep.definition.properties
            .get("cdc.cursor").map(_.toLong).getOrElse(0L)
          rep.applyFeed(spark, src.changeFeed(spark, cursor))
        } catch {
          case e: Throwable =>
            // failed catch-up: lift the fence — the source is still
            // the primary, nothing was swapped
            alterCollectionProperties(srcN, Map("cdc.standby" -> ""))
            throw e
        }
    alterAlias(alias, repN)
    applied
  }

  // --- users (feature-inventory §7 `rbac_user_description`) --------------

  /** A catalog user: the engine-meaningful slice of the RBAC surface —
    * the 3.0 user DESCRIPTION field plus the one binding that changes
    * execution semantics here: the user's resource group
    * ([[graft.workload.ResourceGroups]] scheduler pool) that
    * [[runAs]] attributes their jobs to. Authentication itself is a
    * deployment concern (credentials/tokens), out of scope like the
    * other credentialed surfaces.
    */
  final case class UserDef(name: String, description: String,
      resourceGroup: Option[String])

  def createUser(name: String, description: String = "",
      resourceGroup: Option[String] = None): Unit = this.synchronized {
    require(name.nonEmpty, "user name must be non-empty")
    val m = readUsers
    require(!m.contains(name), s"user $name already exists")
    writeUsers(m + (name -> userRecord(description, resourceGroup)))
  }

  /** Alter the description and/or resource-group binding in place
    * (alter-user semantics: absent fields keep their value).
    */
  def alterUser(name: String, description: Option[String] = None,
      resourceGroup: Option[Option[String]] = None): Unit =
    this.synchronized {
      val m = readUsers
      val cur = m.getOrElse(name,
        throw new IllegalArgumentException(s"no user $name"))
      val desc = description.getOrElse(cur.getOrElse("description", ""))
      val rg = resourceGroup.getOrElse(cur.get("resourceGroup"))
      writeUsers(m + (name -> userRecord(desc, rg)))
    }

  def describeUser(name: String): UserDef = {
    val r = readUsers.getOrElse(name,
      throw new IllegalArgumentException(s"no user $name"))
    UserDef(name, r.getOrElse("description", ""), r.get("resourceGroup"))
  }

  def dropUser(name: String): Unit = this.synchronized {
    val m = readUsers
    require(m.contains(name), s"no user $name")
    writeUsers(m - name)
  }

  def listUsers(): Seq[UserDef] =
    readUsers.keys.toSeq.sorted.map(describeUser)

  /** Run `body` attributed to the user: jobs land in the user's
    * resource-group scheduler pool (users without a binding run in the
    * default pool).
    */
  def runAs[T](spark: org.apache.spark.sql.SparkSession, user: String)(
      body: => T): T =
    describeUser(user).resourceGroup match {
      case Some(rg) => graft.workload.ResourceGroups.withGroup(spark, rg)(body)
      case None => body
    }

  private def userRecord(description: String,
      resourceGroup: Option[String]): Map[String, String] =
    Map("description" -> description) ++
      resourceGroup.map("resourceGroup" -> _)

  /** Liveness probe (feature-inventory §7 `livez_probe`): one row per
    * component — storage (a real write+delete round-trip under the
    * catalog root, not just an exists() — a read-only or full volume
    * must fail it), metadata (the alias/user registries parse), and
    * the Spark scheduler (context alive). The k8s endpoint plumbing is
    * a deployment concern; this is the check it would serve.
    */
  def livez(spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, Boolean)] = {
    val storage =
      try {
        val probe = rootPath.resolve(
          s"_livez_probe.${Thread.currentThread().getId}")
        probe.writeBytes("ok".getBytes)
        val ok = new String(probe.readBytes) == "ok"
        probe.deleteRecursively()
        ok
      } catch { case _: Exception => false }
    val metadata =
      try { readAliases; readUsers; true }
      catch { case _: Exception => false }
    val scheduler =
      try !spark.sparkContext.isStopped
      catch { case _: Exception => false }
    Seq(("metadata", metadata), ("scheduler", scheduler),
      ("storage", storage))
  }

  private def usersFile: StorePath = rootPath.resolve("_users.json")

  private def readUsers: Map[String, Map[String, String]] =
    if (!usersFile.exists) Map.empty
    else MetaJson.readUsers(new String(usersFile.readBytes))

  private def writeUsers(m: Map[String, Map[String, String]]): Unit =
    usersFile.writeBytes(MetaJson.writeUsers(m).getBytes)

  /** Restore a [[Collection.backupTo]] backup as `newName` (possibly
    * in a different catalog — the cold-DR path). The full definition
    * round-trips: indexes come back DECLARED and rebuild lazily on
    * first indexed access, functions re-bind (their outputs recompute
    * at read), rows land in their recorded partitions as one delta.
    */
  def restoreBackup(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, newName: String): Collection = {
    val src = StorePath(srcDir)
    val metaFile = src.resolve("backup_meta.json")
    require(metaFile.exists, s"no backup at $srcDir")
    val meta = MetaJson.read(new String(metaFile.readBytes))
    // Operational fences are state of the SOURCE deployment, not
    // schema: a backup of a demoted/revoked collection must restore
    // writable (restoring IS the recovery).
    val d = meta.d.copy(name = newName,
      properties = meta.d.properties - "cdc.standby" - "access.revoked")
    val c = createCollection(d)
    val rows = spark.read.parquet(src.resolve("data").toString)
      .withColumn("_op", org.apache.spark.sql.functions.lit("upsert"))
      .withColumn("_seq", org.apache.spark.sql.functions.lit(0L))
    c.restoreFrom(spark, rows): Unit
    c
  }

  /** Replication topology report (feature-inventory §7
    * `replicate_configuration_probe` / GetReplicateConfiguration): one
    * row per collection — write role (`primary`, or `standby` once
    * demoted by [[promoteReplica]]'s fence), the CDC cursor if the
    * collection has ever applied a feed (-1 otherwise; a promoted
    * replica keeps its cursor — that ancestry is what a later
    * diff/salvage needs), and the aliases currently pointing at it.
    * Pure metadata: one meta.json read per collection, no data scan.
    */
  def describeReplication(): Seq[(String, String, Long, String)] = {
    val aliases = listAliases()
    listCollections().sorted.map { n =>
      val d = readMeta(n).d
      val role =
        if (d.properties.get("cdc.standby").contains("true")) "standby"
        else "primary"
      val cursor = d.properties.get("cdc.cursor").map(_.toLong).getOrElse(-1L)
      val pointed = aliases.collect { case (a, t) if t == n => a }
        .toSeq.sorted.mkString(",")
      (n, role, cursor, pointed)
    }
  }

  /** Resolve an alias to its target (identity for real names). */
  def resolve(name: String): String = readAliases.getOrElse(name, name)

  // --- internal metadata ------------------------------------------------
  private[store] def readMeta(name: String): CatalogMeta =
    MetaJson.read(new String(metaFile(name).readBytes))

  /** Atomic: temp file + same-directory overwrite-rename, so a
    * concurrent readMeta (queries race writers under the pressure
    * runner) never observes an empty or torn meta.json — the same
    * discipline as Collection.commitDelta. On HDFS this is the
    * native atomic Rename.OVERWRITE.
    */
  private[store] def writeMeta(name: String, m: CatalogMeta): Unit = {
    val tmp = dir(name).resolve(
      s"meta.json.tmp.${Thread.currentThread().getId}")
    tmp.writeBytes(MetaJson.write(m).getBytes)
    tmp.moveOver(metaFile(name))
  }

  /** Allocate the next write sequence number for a collection. Single
    * driver PROCESS — the file-backed counter under the JVM-global
    * [[Catalog.metaLock]] is sufficient (two in-JVM Catalog instances
    * over one root serialize here); on a real multi-process deployment
    * this becomes a metastore transaction. A cross-process double
    * allocation fails CLEANLY at commit: staging dir names are
    * writer-unique and the final rename is non-replacing
    * (Collection.commitDelta), so the losing writer's DML errors
    * instead of corrupting the chain.
    */
  private[store] def nextSeq(name: String): Long =
    Catalog.metaLock(dir(name).toString).synchronized {
      val m = readMeta(name)
      val next = m.seq + 1
      writeMeta(name, m.copy(seq = next))
      next
    }

  private[store] def setLoadState(name: String, state: String): Unit =
    Catalog.metaLock(dir(name).toString).synchronized {
      writeMeta(name, readMeta(name).copy(loadState = state))
    }
  private[store] def updateDef(name: String, d: CollectionDef): Unit =
    Catalog.metaLock(dir(name).toString).synchronized {
      writeMeta(name, readMeta(name).copy(d = d))
    }

  /** Atomic read-modify-write of a collection definition — concurrent
    * metadata changes (e.g. parallel create_index, S7) must not lose
    * updates.
    */
  /** Merge collection properties (alter_collection_properties surface;
    * set a key to "" to clear it). Quota keys take effect on the next
    * DML call.
    */
  def alterCollectionProperties(name: String, props: Map[String, String]): Unit = {
    val n = resolve(name)
    mutateDef(n) { d =>
      val (clears, sets) = props.partition(_._2.isEmpty)
      d.copy(properties = d.properties -- clears.keys ++ sets)
    }
    // Properties change read semantics (e.g. ttl.field) — a loaded
    // handle's pinned snapshot baked the OLD semantics, so drop it;
    // the next read (or explicit re-load) re-assembles under the new
    // definition.
    Option(handles.get(n)).foreach(_.invalidateCache())
  }

  private[store] def mutateDef(name: String)(f: CollectionDef => CollectionDef): Unit =
    Catalog.metaLock(dir(name).toString).synchronized {
      val m = readMeta(name)
      val nd = f(m.d)
      // EVERY definition mutation re-validates — not just the property
      // merge: a dropField of the declared clustering.key / ttl.field
      // / an indexed field must fail at the DDL call, not inside the
      // first compact/read/search that consumes the dangling
      // reference (the same fail-at-DDL contract createCollection
      // enforces).
      nd.validate()
      writeMeta(name, m.copy(d = nd))
    }

  private[store] def collectionDir(name: String): StorePath = dir(name)

  private def readAliases: Map[String, String] =
    if (!aliasFile.exists) Map.empty
    else MetaJson.readAliases(new String(aliasFile.readBytes))

  private def writeAliases(m: Map[String, String]): Unit =
    aliasFile.writeBytes(MetaJson.writeAliases(m).getBytes)
}
