package graft.store

import graft.SparkSpec
import graft.operators.CollectionSearch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** 3.0 feature-inventory §5 storage family: Import 2PC, Collection
  * Snapshot (+ snapshot as external source), External Collection, Force
  * Merge — plus the §4 nullable-vector search semantics.
  */
class StorageV3Spec extends SparkSpec {

  private def freshCatalog(): Catalog =
    new Catalog(Files.createTempDirectory("graft-sv3").toString)

  private def simpleDef(name: String): CollectionDef =
    CollectionDef(name,
      fields = Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("v", LongType)))

  private def rows(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, i * 10)).toDF("id", "v")
  }

  // ---- Import 2PC --------------------------------------------------------

  test("import 2PC: staged rows invisible until commit; abort leaves no trace") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("imp"))
    c.insert(s, rows(1, 2))

    val id1 = c.prepareImport(s, rows(10, 11, 12))
    assert(c.listImports() == Seq(id1))
    assert(c.numEntities(s) == 2, "staged import must be invisible")

    assert(c.commitImport(s, id1) == 3)
    assert(c.numEntities(s) == 5)
    assert(c.listImports().isEmpty)

    val id2 = c.prepareImport(s, rows(20, 21))
    c.abortImport(id2)
    assert(c.numEntities(s) == 5)
    assert(c.listImports().isEmpty)
    intercept[IllegalArgumentException](c.commitImport(s, id2))
  }

  test("import 2PC: auto_commit collapses the phases; prepare-time ordering") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("imp2"))
    c.prepareImport(s, rows(1, 2), autoCommit = true)
    assert(c.numEntities(s) == 2)
    // Prepare, then a NEWER direct upsert of the same pk, then commit:
    // the import committed last but holds the OLDER (prepare-time) seq,
    // so the upsert wins — import sees the world as of prepare.
    val id = c.prepareImport(s, rows(1))
    val s2 = spark
    import s2.implicits._
    c.upsert(s, Seq((1L, 999L)).toDF("id", "v"))
    c.commitImport(s, id)
    val v = c.read(s).filter(col("id") === 1).select("v").head().getLong(0)
    assert(v == 999L, "post-prepare DML must win over the committed import")
  }

  test("import committed after later DML advances committedSeq and the feed cursor") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("impseq"))
    c.insert(s, rows(1, 2))
    val id = c.prepareImport(s, rows(10))
    c.insert(s, rows(3)) // later DML — higher committed seq than the prepare
    val preCommit = c.committedSeq
    c.commitImport(s, id): Unit
    // The commit must advance committedSeq even though its PREPARE seq is
    // older than the last delta: index freshness keys on committedSeq, so
    // a stale value here would leave pre-commit index builds "fresh" and
    // silently missing the import rows forever.
    assert(c.committedSeq > preCommit,
      "commit must advance committedSeq past the pre-commit state")
    // A feed cursor already past the prepare seq must still deliver the
    // import (its commit POSITION is post-cursor), with a monotone cursor.
    val feed = c.changeFeed(s, preCommit)
    assert(feed.select("id").collect().map(_.getLong(0)).toSet == Set(10L))
    assert(feed.agg(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.col("_commit_seq"))).head().getLong(0)
      > preCommit, "feed _commit_seq must be past the pull cursor")
    assert(c.numEntities(s) == 4)
  }

  test("compaction defers while an import is pending (2PC ordering holds)") {
    val s = spark
    import s.implicits._
    val c = freshCatalog().createCollection(simpleDef("impc"))
    c.insert(s, rows(1, 2))
    val id = c.prepareImport(s, Seq((1L, 111L)).toDF("id", "v"))
    c.upsert(s, Seq((1L, 999L)).toDF("id", "v"))
    c.delete(s, col("id") === 2)
    // A fold now would re-stamp pk 1 above the import's seq and drop
    // pk 2's tombstone — both would corrupt the later commit. It must
    // no-op while the import is staged.
    val before = c.numDeltas
    c.compact(s)
    assert(c.numDeltas == before, "compact must defer with a pending import")
    c.commitImport(s, id): Unit
    // Post-prepare DML still wins; the deleted pk stays deleted.
    assert(c.read(s).filter(col("id") === 1).select("v").head().getLong(0) == 999L)
    assert(c.read(s).filter(col("id") === 2).count() == 0)
    // With no pending imports the fold proceeds and preserves state.
    c.compact(s)
    assert(c.numDeltas == 1)
    assert(c.read(s).filter(col("id") === 1).select("v").head().getLong(0) == 999L)
    assert(c.numEntities(s) == 1)
  }

  // ---- snapshots ---------------------------------------------------------

  test("snapshot pins data across DML, compaction and truncate") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("snap"))
    c.insert(s, rows(1, 2, 3))
    val snap = c.createSnapshot()
    c.insert(s, rows(4, 5))
    c.delete(s, col("id") === 1)
    assert(c.numEntities(s) == 4)
    assert(c.readSnapshot(s, snap).count() == 3, "snapshot must see 1,2,3")

    // Compaction folds + deletes deltas — snapshot-referenced ones park.
    c.compact(s)
    assert(c.numEntities(s) == 4)
    val snapIds = c.readSnapshot(s, snap)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(snapIds == Seq(1L, 2L, 3L), "snapshot must survive compaction")

    // Truncate drops all live data; the snapshot still reads.
    c.truncate(s)
    assert(c.numEntities(s) == 0)
    assert(c.readSnapshot(s, snap).count() == 3, "snapshot must survive truncate")

    c.dropSnapshot(snap)
    intercept[IllegalArgumentException](c.readSnapshot(s, snap))
  }

  test("zero-grace sweep parks snapshot-referenced deltas and deletes the rest") {
    val s = spark
    val cat = freshCatalog()
    // retireGraceMs=0: retirement sweeps IMMEDIATELY (the pre-vacuum
    // behavior), which is the only way to exercise the parking branch
    // in-process — the default 5 min grace outlives any test.
    val c = cat.createCollection(CollectionDef("snapzg", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)),
      properties = Map("compaction.retireGraceMs" -> "0")))
    c.insert(s, rows(1, 2, 3))
    val snap = c.createSnapshot()
    c.insert(s, rows(4, 5))
    c.compact(s)
    // the snapshot-referenced delta was physically PARKED (not merely
    // marker-retired in place), the unreferenced one deleted
    val dataDir = new java.io.File(
      cat.collectionDir("snapzg").resolve("data").toString)
    val live = dataDir.listFiles().filter(_.getName.startsWith("delta_"))
    assert(live.length == 1, s"swept chain must be base-only: ${live.toSeq}")
    val pinned = new java.io.File(
      cat.collectionDir("snapzg").resolve("data").resolve("_pinned").toString)
    assert(pinned.isDirectory && pinned.listFiles().nonEmpty,
      "snapshot-referenced delta must be parked in _pinned")
    // the sweep must also clear the ledger — a stale entry would keep
    // suppressing a future delta that reuses the name
    val ledger = new java.io.File(dataDir, "_retired_index")
    assert(!ledger.exists ||
      scala.io.Source.fromFile(ledger).getLines().forall(_.isEmpty),
      "swept entries must leave the retirement ledger")
    // snapshot reads from the parked copy; live state unaffected
    assert(c.readSnapshot(s, snap).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(c.numEntities(s) == 5)
    c.dropSnapshot(snap)
    assert(pinned.listFiles() == null || pinned.listFiles().isEmpty,
      "dropSnapshot must GC the unreferenced parked delta")
  }

  test("dropSnapshot garbage-collects pinned deltas only when unreferenced") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("snapgc"))
    c.insert(s, rows(1, 2))
    val a = c.createSnapshot()
    val b = c.createSnapshot()
    c.insert(s, rows(3))
    c.compact(s)
    c.dropSnapshot(a)
    // b still references the folded delta — must still read.
    assert(c.readSnapshot(s, b).count() == 2)
    c.dropSnapshot(b)
    assert(c.listSnapshots().isEmpty)
  }

  // ---- external collections ---------------------------------------------

  test("external collection: read-only, mapped columns, manual refresh") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val srcDir = Files.createTempDirectory("graft-ext-src").toString
    Seq((1L, "a"), (2L, "b")).toDF("src_id", "payload")
      .write.mode("append").parquet(srcDir)

    val d = CollectionDef("ext", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("content", StringType)))
    val c = cat.createExternalCollection(s, d, srcDir,
      mapping = Map("src_id" -> "id", "payload" -> "content"))
    assert(c.isExternal)
    assert(c.numEntities(s) == 2)
    assert(c.read(s).filter(col("id") === 2)
      .select("content").head().getString(0) == "b")

    // Writes are forbidden.
    intercept[IllegalArgumentException](c.insert(s, rows(9)))
    intercept[IllegalArgumentException](c.delete(s, lit(true)))
    intercept[IllegalArgumentException](c.truncate(s))
    intercept[IllegalArgumentException](c.createSnapshot())

    // New source files are invisible until the MANUAL refresh.
    Seq((3L, "c")).toDF("src_id", "payload")
      .write.mode("append").parquet(srcDir)
    assert(c.numEntities(s) == 2, "pre-refresh reads serve the pinned manifest")
    c.refreshExternal(s)
    assert(c.numEntities(s) == 3)
  }

  test("external collection: declared IVF index serves search (readWithPartition)") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val srcDir = Files.createTempDirectory("graft-ext-ivf").toString
    (0L until 50L).map(i => (i, Seq(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(srcDir)
    val d = CollectionDef("extivf", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(2))))
    val c = cat.createExternalCollection(s, d, srcDir)
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "2")))
    // The index build snapshots the EXTERNAL rows (regression: the
    // partition-aware build must not assemble an empty delta log).
    val hits = graft.operators.CollectionSearch.search(s, c, "embedding",
      Seq(10f, 3f), 3, searchParams = Map("nprobe" -> "2")).collect()
    assert(hits.length == 3)
    assert(hits.head.getLong(0) == 10L)
  }

  test("external read: filters push through the mapping to the parquet scan") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val srcDir = Files.createTempDirectory("graft-ext-pd").toString
    (1L to 100L).map(i => (i, s"doc$i")).toDF("src_id", "payload")
      .write.mode("overwrite").parquet(srcDir)
    val d = CollectionDef("extpd", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("content", StringType)))
    val c = cat.createExternalCollection(s, d, srcDir,
      mapping = Map("src_id" -> "id", "payload" -> "content"))
    val plan = c.read(s).filter(col("id") === 42)
      .queryExecution.executedPlan.toString
    // The rename+cast mapping must not block pushdown: the predicate
    // has to reach the scan as a PushedFilter on the SOURCE column.
    assert(plan.contains("PushedFilters") && plan.contains("src_id"),
      s"external filter must push to the source scan:\n$plan")
  }

  test("snapshot serves as an external collection source") {
    val s = spark
    val cat = freshCatalog()
    val src = cat.createCollection(simpleDef("histsrc"))
    src.insert(s, rows(1, 2, 3))
    val snap = src.createSnapshot()
    src.delete(s, col("id") === 3)

    val ext = cat.createExternalFromSnapshot("hist", "histsrc", snap)
    assert(ext.isExternal)
    assert(ext.numEntities(s) == 3, "external view pins the snapshot state")
    assert(src.numEntities(s) == 2)
    intercept[IllegalArgumentException](ext.insert(s, rows(9)))
  }

  // ---- force merge -------------------------------------------------------

  test("forceMerge folds the chain regardless of policy") {
    val s = spark
    val c = freshCatalog().createCollection(simpleDef("fm"))
    c.insert(s, rows(1))
    c.insert(s, rows(2))
    c.insert(s, rows(3))
    val (before, after) = c.forceMerge(s)
    assert(before == 3 && after == 1)
    assert(c.numEntities(s) == 3)
  }

  // ---- JSON path index kinds ---------------------------------------------

  test("JSON_PATH bitmap kind: value directories, partition-pruned equality") {
    val s = spark
    import s.implicits._
    val c = freshCatalog().createCollection(CollectionDef("jb", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("props", StringType))))
    c.insert(s, (1L to 40L).map(i => (i, s"""{"k": ${i % 4}}""")).toDF("id", "props"))
    c.createIndex(s, IndexDef("props", "JSON_PATH",
      params = Map("path" -> "$.k", "cast" -> "long", "kind" -> "bitmap")))
    val out = c.queryJsonPath(s, "props", "$.k", "long", v => v === 2,
      outputFields = Seq("id"))
    assert(out.count() == 10)
    // The physical index layout is one directory per distinct value,
    // and an equality on _v prunes at the directory level.
    val build = IndexStore.ensureJsonPath(s, c, "props", "$.k", "long",
      kind = "bitmap")
    val scan = s.read.parquet(build.dataPath).filter(col("_v") === 2)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_v"),
      s"bitmap equality must be a partition filter:\n$plan")
  }

  test("JSON_PATH hybrid kind picks bitmap at low cardinality, sort at high") {
    val s = spark
    import s.implicits._
    val c = freshCatalog().createCollection(CollectionDef("jh", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("props", StringType))))
    c.insert(s, (1L to 30L).map(i => (i, s"""{"k": ${i % 3}}""")).toDF("id", "props"))
    // cardinality 3 <= 1024 -> bitmap layout (value directories exist)
    val low = IndexStore.ensureJsonPath(s, c, "props", "$.k", "long",
      kind = "hybrid")
    assert(StorePath(low.dataPath).list.exists(_.name.startsWith("_v=")),
      "hybrid at low cardinality must lay out value directories")
    // cardinality 30 > 2 (tiny threshold) -> sort layout (no value dirs)
    val c2 = freshCatalog().createCollection(CollectionDef("jh2", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("props", StringType))))
    c2.insert(s, (1L to 30L).map(i => (i, s"""{"k": $i}""")).toDF("id", "props"))
    val high = IndexStore.ensureJsonPath(s, c2, "props", "$.k", "long",
      kind = "hybrid", bitmapCardinality = 2)
    assert(!StorePath(high.dataPath).list.exists(_.name.startsWith("_v=")),
      "hybrid above the cardinality bound must use the sort layout")
  }

  // ---- nullable vector ---------------------------------------------------

  test("nullable vector: null-vector rows store and query but never search") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("nv", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("emb", ArrayType(FloatType), nullable = true, dim = Some(4)))))
    val withVecs = Seq(
      (1L, Some(Seq(1f, 0f, 0f, 0f))),
      (2L, Some(Seq(0f, 1f, 0f, 0f))),
      (3L, None),
      (4L, None)).toDF("id", "emb")
    c.insert(s, withVecs)
    assert(c.numEntities(s) == 4)
    assert(c.query(s, "emb IS NULL").count() == 2)
    // L2 search: a null distance would sort FIRST without the guard.
    val hits = CollectionSearch.search(s, c, "emb", Seq(1f, 0f, 0f, 0f),
      k = 10, searchParams = Map("metric_type" -> "L2"))
    val ids = hits.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L), s"null vectors surfaced in search: $ids")
  }
}
