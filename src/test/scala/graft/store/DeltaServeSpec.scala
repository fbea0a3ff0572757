package graft.store

import graft.{SparkSpec, Tables}
import graft.operators.{CollectionSearch, Knn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growing-segment index serving (IndexStore.servedDense): after DML,
  * a small delta is served inline against the sealed persisted build —
  * no rebuild — and full-probe results stay bit-identical to the exact
  * scan of the CURRENT snapshot (inserts visible, upserts moved,
  * tombstones suppressed). Mirrors the reference engine's
  * sealed/growing segment model (sealed segments serve from their
  * index, the growing segment is merged in at query time).
  */
class DeltaServeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def vecCollection(name: String): (Catalog, Collection) = {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-ds").toString)
    val c = cat.createCollection(CollectionDef(name, Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("label", LongType),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "label", "embedding"))
    (cat, c)
  }

  private def queryVec(id: Long): Seq[Float] = {
    val s = spark
    Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") === id).select("embedding").head().getSeq[Float](0)
  }

  private def exactIds(c: Collection, q: Seq[Float], k: Int,
      metric: String = "L2"): Seq[Long] =
    Knn.searchOne(c.read(spark), q, "embedding", "vec_id", metric, k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("post-DML IVF search serves the stale build + growing delta, no rebuild") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection("dsivf")
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val builtSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    assert(builtSeq == c.committedSeq)
    // insert a clone of vec 3 at a fresh pk, move vec 5 far away,
    // tombstone vec 7
    c.insert(s, Seq((800000L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(3))))
    c.upsert(s, Seq((5L, 2L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(5).map(_ => 1e6f))))
    c.delete(s, "vec_id == 7")
    // the ensure returns the SEALED build (no rebuild happened)
    val servedBuild = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
    assert(servedBuild.builtSeq == builtSeq,
      "small post-build delta must serve stale, not rebuild")
    assert(servedBuild.builtSeq < c.committedSeq)
    // full probe == exact over the CURRENT snapshot
    val ann = CollectionSearch.search(s, c, "embedding", queryVec(3), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = exactIds(c, queryVec(3), 10)
    assert(ann == exact, s"served != exact: $ann vs $exact")
    assert(ann.contains(800000L), "growing insert missing from served index")
    val near7 = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!near7.contains(7L), "tombstoned row served from the sealed build")
    assert(!near7.contains(5L), "moved row's stale sealed copy still served")
    // an explicit materialize (create_index semantics) still rebuilds
    assert(IndexStore.ensureIvf(s, c, "embedding", "L2", 8,
      allowStale = false).builtSeq == c.committedSeq)
  }

  test("minor compaction of post-build deltas: serving stays exact (fold preserves row seqs)") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection("dsminor")
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val builtSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    // three post-build tail deltas: clone insert, move, tombstone
    c.insert(s, Seq((800100L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(3))))
    c.upsert(s, Seq((5L, 2L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(5).map(_ => 1e6f))))
    c.delete(s, "vec_id == 7")
    // fold the tail (the base is the initial insert's delta — NOT a
    // compaction base, so fold everything and rebuild-serve; then the
    // interesting case: major first, rebuild, DML, minor fold)
    c.compact(s)
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val seq2 = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    assert(seq2 == c.committedSeq)
    // post-build DML again, then a MINOR fold of just those deltas
    c.insert(s, Seq((800200L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(9))))
    c.delete(s, "vec_id == 11")
    c.compactMinor(s)
    // the merged dir has a HIGHER dir-seq but keeps the original row
    // seqs (all > seq2), so the growing-segment view still resolves —
    // no rebuild — and full-probe results equal the exact scan
    val served = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
    assert(served.builtSeq == seq2,
      "minor fold of post-build deltas must not force a rebuild")
    val ann = CollectionSearch.search(s, c, "embedding", queryVec(9), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ann == exactIds(c, queryVec(9), 10))
    assert(ann.contains(800200L), "folded growing insert missing")
    val near11 = CollectionSearch.search(s, c, "embedding", queryVec(11), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!near11.contains(11L), "folded tombstone not applied")
  }

  test("the serve gate rebuilds when the delta fraction cap is exceeded") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection("dsgate")
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val builtSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    c.insert(s, Seq((800001L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(3))))
    s.conf.set("graft.index.deltaServe.floorBytes", "0")
    s.conf.set("graft.index.deltaServe.fraction", "0.0")
    try {
      val b = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
      assert(b.builtSeq == c.committedSeq && b.builtSeq > builtSeq,
        "zeroed gate must force a full rebuild")
    } finally {
      s.conf.unset("graft.index.deltaServe.floorBytes")
      s.conf.unset("graft.index.deltaServe.fraction")
    }
  }

  test("late-committed 2PC import falls back to exact full-snapshot serving") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection("dsimport")
    // prepare an import that moves vec 11 (prepare-time seq), THEN a
    // later upsert of the same pk, THEN the build (its seq is now
    // ABOVE the import's prepare seq), THEN the commit: the import's
    // rows order BELOW the sealed build's rows, so recent-window LWW
    // would wrongly resurrect the import value — deltaViewSince must
    // return None and serving must fall back to the full snapshot.
    val importVec = queryVec(11).map(_ => 5e5f)
    val id = c.prepareImport(s, Seq((11L, 9L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(importVec)))
    val upsertVec = queryVec(2).map(v => v + 0.001f)
    c.upsert(s, Seq((11L, 3L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(upsertVec)))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val builtSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    assert(builtSeq == c.committedSeq)
    c.commitImport(s, id)
    // still served without a rebuild (the fallback encodes transiently)
    assert(IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
      == builtSeq)
    val ann = CollectionSearch.search(s, c, "embedding", upsertVec, 5,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = exactIds(c, upsertVec, 5)
    assert(ann == exact,
      s"late-import fallback served wrong rows: $ann vs $exact")
    // the upsert (higher _seq) must win over the late-committed import
    assert(ann.head == 11L)
    val farAnn = CollectionSearch.search(s, c, "embedding",
      importVec.map(_.toFloat), 1, searchParams = Map("nprobe" -> "8"))
      .select("vec_id").head().getLong(0)
    assert(farAnn == exactIds(c, importVec, 1).head,
      "import-value neighborhood must match the exact current snapshot")
  }

  test("partition-scoped search merges only the named partitions' growing rows") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-dsp").toString)
    val c = cat.createCollection(CollectionDef("dspart", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1")))
    val base = Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding")
    c.insert(s, base.filter(col("vec_id") % 2 === 0), Some("p0"))
    c.insert(s, base.filter(col("vec_id") % 2 === 1), Some("p1"))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val builtSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
    // clone of vec 4 lands in p1 — visible to a p1-scoped search,
    // invisible to a p0-scoped one
    c.insert(s, Seq(800002L).toDF("vec_id")
      .withColumn("embedding", typedlit(queryVec(4))), Some("p1"))
    assert(IndexStore.ensureIvf(s, c, "embedding", "L2", 8).builtSeq
      == builtSeq)
    val inP1 = CollectionSearch.search(s, c, "embedding", queryVec(4), 3,
      searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p1"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(inP1.contains(800002L), "growing row missing from its partition")
    val inP0 = CollectionSearch.search(s, c, "embedding", queryVec(4), 3,
      searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p0"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!inP0.contains(800002L),
      "growing row leaked into a foreign partition scope")
    // scoped serve == scoped exact
    val exact = Knn.searchOne(
      c.read(s, Seq("p1")).filter(col("embedding").isNotNull),
      queryVec(4), "embedding", "vec_id", "L2", 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ann = CollectionSearch.search(s, c, "embedding", queryVec(4), 3,
      searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p1"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ann == exact)
  }

  test("SQ8 and LSH routes serve growing deltas without rebuild") {
    val s = spark
    import s.implicits._
    // SQ8: full probe + big refine == exact re-rank over current rows
    val (_, c1) = vecCollection("dssq8")
    c1.createIndex(s, IndexDef("embedding", "IVF_SQ8", Some("L2"),
      Map("nlist" -> "8")))
    val b1 = IndexStore.ensureSq8(s, c1, "embedding", "L2", 8).builtSeq
    c1.insert(s, Seq((800003L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(9))))
    c1.delete(s, "vec_id == 9")
    assert(IndexStore.ensureSq8(s, c1, "embedding", "L2", 8).builtSeq == b1)
    val annSq8 = CollectionSearch.search(s, c1, "embedding", queryVec(9), 5,
      searchParams = Map("nprobe" -> "8", "refine_k" -> "100"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(annSq8 == exactIds(c1, queryVec(9), 5))
    assert(annSq8.contains(800003L) && !annSq8.contains(9L))
    // LSH: the clone explodes into the query's own buckets
    val (_, c2) = vecCollection("dslsh")
    c2.createIndex(s, IndexDef("embedding", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    val b2 = IndexStore.ensureLsh(s, c2, "embedding", "COSINE", 2, 4).builtSeq
    c2.upsert(s, Seq((910001L, 7L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(7))))
    assert(IndexStore.ensureLsh(s, c2, "embedding", "COSINE", 2, 4).builtSeq
      == b2)
    val annLsh = CollectionSearch.search(s, c2, "embedding", queryVec(7), 2,
      searchParams = Map("radius" -> "1"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(annLsh.contains(910001L), "growing row missing from LSH serving")
  }

  test("sealed-side probe pruning survives delta serving") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection("dsplan")
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    IndexStore.ensureIvf(s, c, "embedding", "L2", 8): Unit
    c.insert(s, Seq((800004L, 1L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(0))))
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(0), 5,
      searchParams = Map("nprobe" -> "2"))
    val plan = hits.queryExecution.executedPlan.toString
    // the sealed branch still prunes _cid directories at the scan, and
    // the changed-pk mask is a broadcast join, not a shuffle
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"sealed probe filter lost under delta serving:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"changed-pk mask is not a broadcast join:\n$plan")
    assert(hits.count() == 5)
  }
}
