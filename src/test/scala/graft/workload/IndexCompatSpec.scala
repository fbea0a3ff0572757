package graft.workload

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef, IndexDef}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType}

import java.nio.file.Files

class IndexCompatSpec extends SparkSpec {

  private def newCatalog() = {
    val root = Files.createTempDirectory("graft-icspec")
    (new Catalog(root.resolve("cat").toString), root)
  }

  private def indexedDef(name: String) = CollectionDef(name, Seq(
    FieldDef("id", LongType, nullable = false, isPrimary = true),
    FieldDef("category", LongType),
    FieldDef("tag", StringType),
    FieldDef("location", StringType),
    FieldDef("embedding", ArrayType(FloatType), dim = Some(4))),
    indexes = Seq(
      IndexDef("embedding", "IVF_FLAT", Some("L2"), Map("nlist" -> "4")),
      IndexDef("category", "INVERTED"),
      // null at the probe pk -> `tag is null` fallback (:637)
      IndexDef("tag", "INVERTED"),
      // GEOMETRY probes go through ST_EQUALS, not string ==
      // (requests/validate_index_compatibility.py:629-633)
      IndexDef("location", "RTREE", None, Map("cell_size" -> "8.0"))))

  private def seed(s: org.apache.spark.sql.SparkSession,
      c: graft.store.Collection, cp: String): Unit = {
    import s.implicits._
    c.insert(s, (0 until 100).map { i =>
      (i.toLong, (i % 10).toLong, if (i == 0) null else s"t${i % 3}",
        s"POINT (${i % 13} ${i % 11})",
        Array((i % 5).toFloat, (i % 7).toFloat, (i % 3).toFloat, 1f))
    }.toDF("id", "category", "tag", "location", "embedding")): Unit
    DataIntegrity.seedCheckpoint(s, c, cp): Unit
  }

  test("after-upgrade checkpoints metadata and probes both index kinds") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    seed(s, cat.createCollection(indexedDef("ic")), cp)
    val r = IndexCompat.run(s, cat, Seq("ic"), cp, "after-upgrade")
    assert(r.status == "passed", r.failures.toString)
    assert(r.metrics("collections_checked") == 1.0)
    assert(r.metrics("actual_indexes_total") == 4.0)
    assert(r.metrics("searches_total") == 1.0)
    assert(r.metrics("scalar_index_queries_total") == 3.0)
    assert(r.checkpointPath.exists(p => Files.exists(java.nio.file.Paths.get(p))))
  }

  test("after-rollback passes on unchanged metadata, fails on drift") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    val c = cat.createCollection(indexedDef("ic"))
    seed(s, c, cp)
    assert(IndexCompat.run(s, cat, Seq("ic"), cp, "after-upgrade")
      .status == "passed")
    assert(IndexCompat.run(s, cat, Seq("ic"), cp, "after-rollback")
      .status == "passed")
    // simulate an incompatible rollback: the scalar index is gone
    c.dropIndex("category")
    val drift = IndexCompat.run(s, cat, Seq("ic"), cp, "after-rollback")
    assert(drift.status == "failed")
    assert(drift.failures.exists(_.startsWith(IndexCompat.IndexMetadataMismatch)),
      drift.failures.toString)
  }

  test("rebuild-index drops and recreates every declared index") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    seed(s, cat.createCollection(indexedDef("ic")), cp)
    val r = IndexCompat.run(s, cat, Seq("ic"), cp, "after-upgrade",
      rebuildIndex = true)
    assert(r.status == "passed", r.failures.toString)
    assert(r.metrics("indexes_dropped") == 4.0)
    assert(r.metrics("indexes_rebuilt") == 4.0)
  }

  test("after-rollback without a checkpoint fails with the dedicated code") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    seed(s, cat.createCollection(indexedDef("ic")), cp)
    val r = IndexCompat.run(s, cat, Seq("ic"),
      root.resolve("nowhere").toString, "after-rollback")
    assert(r.status == "failed")
    assert(r.failures.exists(_.startsWith(IndexCompat.CheckpointNotFound)))
  }

  test("phase DML/DQL: upgrade cycle + checkpoint survives to rollback") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    def plainDef(name: String) = CollectionDef(name, Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType),
      FieldDef("version", LongType)))
    val c = cat.createCollection(plainDef("pc"))
    import s.implicits._
    c.insert(s, (0 until 50).map(i =>
      (i.toLong, (i % 10).toLong, s"seed_$i", 0L))
      .toDF("id", "category", "content", "version")): Unit
    val up = PhaseDmlDql.run(s, cat, existing = Seq("pc"),
      newCollectionNames = Seq("pc_new"), defFor = plainDef,
      gen = PhaseDmlDql.compatRowGen, rows = 40, deleteRows = 5,
      newRows = 20, batchSize = 20, existingStartId = 1000L,
      newStartId = 2000L, seed = 7L, phase = "after-upgrade",
      checkpointDir = cp)
    assert(up.status == "passed", up.failures.toString)
    assert(up.metrics("existing_deleted_total") == 5.0)
    assert(up.metrics("new_collection_inserted_total") == 20.0)
    assert(up.checkpointPath.nonEmpty)
    // rollback run validates the checkpoint then runs its own cycle,
    // including a carried pass over the upgrade phase's new collection
    val rb = PhaseDmlDql.run(s, cat, existing = Seq("pc"),
      newCollectionNames = Seq("pc_rb"), defFor = plainDef,
      gen = PhaseDmlDql.compatRowGen, rows = 40, deleteRows = 5,
      newRows = 20, batchSize = 20, existingStartId = 3000L,
      newStartId = 4000L, seed = 7L, phase = "after-rollback",
      carried = Seq("pc_new"), checkpointDir = cp)
    assert(rb.status == "passed", rb.failures.toString)
    assert(rb.metrics("carried_collections_total") == 1.0)
    assert(rb.metrics("carried_inserted_total") == 40.0)
    assert(cat.hasCollection("pc_rb"))
  }

  test("phase DML/DQL rollback detects checkpoint state loss") {
    val s = spark
    val (cat, root) = newCatalog()
    val cp = root.resolve("cp").toString
    def plainDef(name: String) = CollectionDef(name, Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType),
      FieldDef("version", LongType)))
    val c = cat.createCollection(plainDef("pc"))
    val up = PhaseDmlDql.run(s, cat, existing = Seq("pc"),
      newCollectionNames = Seq.empty, defFor = plainDef,
      gen = PhaseDmlDql.compatRowGen, rows = 40, deleteRows = 5,
      newRows = 0, batchSize = 20, existingStartId = 1000L,
      newStartId = 2000L, seed = 7L, phase = "after-upgrade",
      checkpointDir = cp)
    assert(up.status == "passed", up.failures.toString)
    // the "rollback" loses a phase row the checkpoint expects
    c.delete(s, "id == 1039")
    val rb = PhaseDmlDql.run(s, cat, existing = Seq("pc"),
      newCollectionNames = Seq.empty, defFor = plainDef,
      gen = PhaseDmlDql.compatRowGen, rows = 40, deleteRows = 5,
      newRows = 0, batchSize = 20, existingStartId = 3000L,
      newStartId = 4000L, seed = 7L, phase = "after-rollback",
      checkpointDir = cp)
    assert(rb.status == "failed")
    assert(rb.failures.exists(_.startsWith(PhaseDmlDql.PhaseDqlFailed)),
      rb.failures.toString)
    // missing checkpoint is its own dedicated failure code
    val nocp = PhaseDmlDql.run(s, cat, existing = Seq("pc"),
      newCollectionNames = Seq.empty, defFor = plainDef,
      gen = PhaseDmlDql.compatRowGen, rows = 40, deleteRows = 5,
      newRows = 0, batchSize = 20, existingStartId = 5000L,
      newStartId = 6000L, seed = 7L, phase = "after-rollback",
      checkpointDir = root.resolve("nowhere").toString)
    assert(nocp.status == "failed")
    assert(nocp.failures.exists(
      _.startsWith(PhaseDmlDql.PhaseCheckpointNotFound)))
  }
}
