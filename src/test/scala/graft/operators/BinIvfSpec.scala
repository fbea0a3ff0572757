package graft.operators

import graft.{SparkSpec, Tables}
import graft.ann.BinIvf
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

class BinIvfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Deterministic 4-byte binary vectors: the Knuth multiplicative
    * hash of vec_id (odd constant → a bijection on 32-bit patterns,
    * so no two rows share a bit pattern and hamming self-distance 0
    * identifies a row uniquely).
    */
  private def binData = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      unhex(lpad(hex(pmod(col("vec_id") * lit(2654435761L),
        lit(4294967296L))), 8, "0")).as("bvec"))

  private def bytesOf(id: Long): Array[Byte] = {
    val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    Array(((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte)
  }

  test("training is deterministic and assignment matches driver nearest") {
    val data = binData.cache()
    val m1 = BinIvf.train(data, "bvec", k = 8, sampleSize = 200)
    val m2 = BinIvf.train(data, "bvec", k = 8, sampleSize = 200)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    assert(m1.centroids.forall(_.length == 4))
    val assigned = BinIvf.assign(data, "bvec", m1)
      .select("vec_id", "bvec", BinIvf.CID).limit(50).collect()
    assigned.foreach { r =>
      val driver = m1.nearest(r.getAs[Array[Byte]](1))
      assert(r.getInt(2) == driver, s"row ${r.getLong(0)}")
    }
    data.unpersist()
  }

  test("self-hit: full probe ranks the row itself first at distance 0") {
    val data = binData.cache()
    val model = BinIvf.train(data, "bvec", k = 8, sampleSize = 200)
    val enc = BinIvf.assign(data, "bvec", model).cache()
    Seq(0L, 7L, 42L).foreach { id =>
      val top = BinIvf.searchOne(enc, model, bytesOf(id), "bvec", "vec_id",
        k = 1, nprobe = 1).head()
      assert(top.getLong(0) == id)
      assert(top.getAs[Long]("score") == 0L)
    }
    data.unpersist(); enc.unpersist()
  }

  test("full probe is exact: recall 1.0 vs brute force") {
    val data = binData.cache()
    val model = BinIvf.train(data, "bvec", k = 8, sampleSize = 200)
    val enc = BinIvf.assign(data, "bvec", model).cache()
    val queries = Seq(0L, 7L, 42L).map(id => id -> bytesOf(id))
    val recall = BinIvf.recallAtK(data, enc, model, queries,
      "bvec", "vec_id", k = 10, nprobe = 8)
    assert(recall == 1.0, s"full-probe recall: $recall")
    // Operating point: half the cells. Hamming cells are coarse, but
    // the probed half must keep a usable majority of the true top-k.
    val op = BinIvf.recallAtK(data, enc, model, queries,
      "bvec", "vec_id", k = 10, nprobe = 4)
    assert(op >= 0.5, s"operating-point recall: $op")
    data.unpersist(); enc.unpersist()
  }

  test("batched search matches searchOne per query") {
    val data = binData.cache()
    val model = BinIvf.train(data, "bvec", k = 8, sampleSize = 200)
    val enc = BinIvf.assign(data, "bvec", model).cache()
    val ids = Seq(3L, 11L)
    val batched = BinIvf.search(enc, model,
      ids.map(id => (id.toString, bytesOf(id))), "bvec", "vec_id",
      k = 5, nprobe = 4)
      .select("qid", "vec_id", "score").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(2)).map(r => (r.getLong(1), r.getLong(2))).toSeq)
      .toMap
    ids.foreach { id =>
      val one = BinIvf.searchOne(enc, model, bytesOf(id), "bvec", "vec_id",
        k = 5, nprobe = 4).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("score"))).toSeq
      assert(batched(id.toString).sortBy(x => (x._2, x._1)) ==
        one.sortBy(x => (x._2, x._1)), s"query $id")
    }
    data.unpersist(); enc.unpersist()
  }

  test("collection route: BIN_IVF_FLAT serves search with partition pruning") {
    val s = spark
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-binivf").toString)
    val c = cat.createCollection(CollectionDef("binv", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", BinaryType, dim = Some(32)))))
    c.insert(s, binData)
    c.createIndex(s, IndexDef("bvec", "BIN_IVF_FLAT", Some("HAMMING"),
      Map("nlist" -> "8")))
    val res = CollectionSearch.searchBinary(s, c, "bvec", bytesOf(0L), 5,
      searchParams = Map("nprobe" -> "8")).collect()
    assert(res.length == 5)
    assert(res.head.getLong(0) == 0L) // unique bit pattern → self-hit

    // Scale assertion: the probe filter must prune _cid partitions of
    // the persisted index (directory pruning at 100 TB).
    val df = CollectionSearch.searchBinary(s, c, "bvec", bytesOf(0L), 5,
      searchParams = Map("nprobe" -> "2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(BinIvf.CID),
      s"probe filter did not prune partitions:\n$plan")
    assert(df.count() == 5)

    // Brute path without the index declaration (BIN_FLAT semantics)
    // returns the same top-k on full probe.
    val c2 = cat.createCollection(CollectionDef("binflat", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", BinaryType))))
    c2.insert(s, binData)
    val brute = CollectionSearch.searchBinary(s, c2, "bvec", bytesOf(0L), 5)
      .collect()
    assert(brute.map(_.getLong(0)).toSeq == res.map(_.getLong(0)).toSeq)

    // Reload path: drop the in-memory model, redeclare, same results.
    IndexStore.drop(c, "bvec")
    c.createIndex(s, IndexDef("bvec", "BIN_IVF_FLAT", Some("HAMMING"),
      Map("nlist" -> "8")))
    val res2 = CollectionSearch.searchBinary(s, c, "bvec", bytesOf(0L), 5,
      searchParams = Map("nprobe" -> "8")).collect()
    assert(res2.map(_.getLong(0)).toSeq == res.map(_.getLong(0)).toSeq)
  }
}
