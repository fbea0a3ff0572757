package graft.operators

import graft.{SparkSpec, Tables}
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** Batched dense collection-route search (the client's nq>1 shape,
  * reference search_permanently.py:137-189): one routed Spark job must
  * return exactly the hits of a per-query [[CollectionSearch.search]]
  * loop, for every declared-index route.
  */
class SearchBatchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, sfDir, "embeddings")

  private def qvecs: Seq[(String, Seq[Float])] =
    Seq(0L, 7L, 42L).map { id =>
      s"q$id" -> emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0)
    }

  private def mkColl(cat: Catalog, name: String): Collection = {
    val c = cat.createCollection(CollectionDef(name, Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(spark, emb.select("vec_id", "embedding"))
    c
  }

  private def batchEqualsLoop(c: Collection,
      params: Map[String, String]): Unit = {
    val qs = qvecs
    val batch = CollectionSearch
      .searchBatch(spark, c, "embedding", qs, 5, searchParams = params)
      .select("qid", "vec_id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9)))
      .sorted.toSeq
    val loop = qs.flatMap { case (qid, qv) =>
      CollectionSearch.search(spark, c, "embedding", qv, 5,
        searchParams = params)
        .select("vec_id", "score").collect()
        .map(r => (qid, r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    }.sorted
    assert(batch == loop, s"batch != loop for params $params")
  }

  test("batch matches the per-query loop on IVF, IVF_SQ8, IVF_PQ, and LSH routes") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-batch").toString)

    val ivf = mkColl(cat, "ivf")
    ivf.createIndex(spark, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    batchEqualsLoop(ivf, Map("nprobe" -> "4"))

    val sq8 = mkColl(cat, "sq8")
    sq8.createIndex(spark, IndexDef("embedding", "IVF_SQ8", Some("L2"),
      Map("nlist" -> "8")))
    batchEqualsLoop(sq8, Map("nprobe" -> "4", "refine_k" -> "4"))

    val pq = mkColl(cat, "pq")
    pq.createIndex(spark, IndexDef("embedding", "IVF_PQ", Some("L2"),
      Map("nlist" -> "8", "m" -> "8", "nbits" -> "4")))
    batchEqualsLoop(pq, Map("nprobe" -> "4", "refine_k" -> "4"))

    val lsh = mkColl(cat, "lsh")
    lsh.createIndex(spark, IndexDef("embedding", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    batchEqualsLoop(lsh, Map("radius" -> "1"))
  }

  test("no declared index: batch equals the exact per-query loop") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-batch-x").toString)
    val c = mkColl(cat, "flat")
    batchEqualsLoop(c, Map("metric_type" -> "L2"))
  }

  test("hybrid legs route through persisted indexes and match the exact fusion") {
    import HybridSearch._
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-hybix").toString)
    val c = cat.createCollection(CollectionDef("hyb", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)),
      FieldDef("emb2", ArrayType(FloatType), dim = Some(16)))))
    c.insert(spark, emb.select(col("vec_id"), col("embedding"),
      col("embedding").as("emb2")))
    c.createIndex(spark, IndexDef("embedding", "IVF_SQ8", Some("L2"),
      Map("nlist" -> "8")))
    c.createIndex(spark, IndexDef("emb2", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    val q0 = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    // Both legs at provably-exact settings so the routed fusion must
    // equal the raw exact-scan hybridSearch on the same data.
    val routed = HybridSearch.hybridSearchCollection(spark, c,
      Seq(
        CollectionAnnRequest(Seq("q0" -> q0), "embedding", limit = 10,
          params = Map("nprobe" -> "8", "refine_k" -> "50")),
        CollectionAnnRequest(Seq("q0" -> q0), "emb2", limit = 10,
          params = Map("radius" -> "4"))),
      RrfRanker(60), limit = 5)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"no partition-pruned scan in the hybrid plan:\n$plan")
    assert(plan.contains("_cid"), s"SQ8 leg did not probe cells:\n$plan")
    assert(plan.contains("_sig"), s"LSH leg did not probe buckets:\n$plan")
    val got = routed.select("vec_id", "fused_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val q = Seq((0L, q0)).toDF("qid", "qvec")
    val expected = HybridSearch.hybridSearch(emb,
      Seq(
        AnnSearchRequest(q, "embedding", "L2", limit = 10),
        AnnSearchRequest(q, "embedding", "COSINE", limit = 10)),
      RrfRanker(60), idCol = "vec_id", limit = 5)
      .select("vec_id", "fused_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == expected, s"routed hybrid != exact hybrid: $got vs $expected")
  }

  test("binary batch matches the per-query loop with and without BIN_IVF_FLAT") {
    import org.apache.spark.sql.types.BinaryType
    def bytesOf(id: Long): Array[Byte] = {
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      Array(((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte)
    }
    val binData = emb.select(col("vec_id"),
      unhex(lpad(hex(pmod(col("vec_id") * lit(2654435761L),
        lit(4294967296L))), 8, "0")).as("bvec"))
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-binbatch").toString)
    val qs = Seq(0L, 7L, 42L).map(id => s"q$id" -> bytesOf(id))
    Seq(true, false).foreach { indexed =>
      val c = cat.createCollection(CollectionDef(
        if (indexed) "bi" else "bf", Seq(
          FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
          FieldDef("bvec", BinaryType, dim = Some(32)))))
      c.insert(spark, binData)
      if (indexed)
        c.createIndex(spark, IndexDef("bvec", "BIN_IVF_FLAT",
          Some("HAMMING"), Map("nlist" -> "8")))
      val params = if (indexed) Map("nprobe" -> "4") else Map.empty[String, String]
      val batch = CollectionSearch
        .searchBinaryBatch(spark, c, "bvec", qs, 5, searchParams = params)
        .select("qid", "vec_id", "score").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val loop = qs.flatMap { case (qid, qb) =>
        CollectionSearch.searchBinary(spark, c, "bvec", qb, 5,
          searchParams = params)
          .select("vec_id", "score").collect()
          .map(r => (qid, r.getLong(0), r.getLong(1)))
      }.sorted
      assert(batch == loop, s"binary batch != loop (indexed=$indexed)")
    }
  }

  test("binary search honors partition_names on both routes") {
    import org.apache.spark.sql.types.BinaryType
    def bytesOf(id: Long): Array[Byte] = {
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      Array(((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte)
    }
    val binData = emb.select(col("vec_id"),
      unhex(lpad(hex(pmod(col("vec_id") * lit(2654435761L),
        lit(4294967296L))), 8, "0")).as("bvec"))
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-binpart").toString)
    val c = cat.createCollection(CollectionDef("bp", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", BinaryType, dim = Some(32))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(spark, binData)
    c.createIndex(spark, IndexDef("bvec", "BIN_IVF_FLAT", Some("HAMMING"),
      Map("nlist" -> "8")))
    val qs = Seq(0L, 7L, 42L).map(id => s"q$id" -> bytesOf(id))
    // nprobe = nlist is exact, so every hit must come from p1 (pk % 3
    // == 1) and match the exact partition-scoped loop.
    val batch = CollectionSearch.searchBinaryBatch(spark, c, "bvec", qs, 5,
      searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p1"))
      .select("qid", "vec_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(batch.nonEmpty && batch.forall(_._2 % 3 == 1))
    val loop = qs.flatMap { case (qid, qb) =>
      Knn.searchOneBinary(c.read(spark, Seq("p1")), qb, "bvec", "vec_id", 5)
        .select("vec_id").collect().map(r => (qid, r.getLong(0)))
    }.sorted
    assert(batch == loop, s"partition binary batch != exact loop")
    // Single-query route: the partition filter must reach the index
    // scan as a directory prune.
    val one = CollectionSearch.searchBinary(spark, c, "bvec", bytesOf(7L),
      5, searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p1"))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"partition filter did not reach the BIN_IVF scan:\n$plan")
    assert(one.select("vec_id").collect().map(_.getLong(0)).toSeq.sorted ==
      loop.filter(_._1 == "q7").map(_._2))
  }

  test("text-query batch matches the per-text searchByQueryText loop") {
    import org.apache.spark.sql.types.StringType
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-txtbatch").toString)
    val c = cat.createCollection(CollectionDef("txt", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("text", StringType))))
    c.insert(spark, Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 100))
    c.addFunction(graft.store.FunctionDef("enc", "TEXT_EMBEDDING",
      Seq("text"), Seq("emb_vec"), Map("dim" -> "8")))
    val texts = Seq("q0" -> "vector stream data engine",
      "q1" -> "query planning and joins")
    val batch = CollectionSearch.searchByQueryTextBatch(spark, c, "emb_vec",
      texts, 5, searchParams = Map("metric_type" -> "L2"))
      .select("qid", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val loop = texts.flatMap { case (qid, t) =>
      CollectionSearch.searchByQueryText(spark, c, "emb_vec", t, 5,
        searchParams = Map("metric_type" -> "L2"))
        .select("doc_id").collect().map(r => (qid, r.getLong(0)))
    }.sorted
    assert(batch == loop, s"text batch != loop: $batch vs $loop")
  }

  test("partition-scoped search stays on the index route with _part pruning") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-pidx").toString)
    val c = cat.createCollection(CollectionDef("pidx", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(spark, emb.select("vec_id", "embedding"))
    c.createIndex(spark, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val df = CollectionSearch.search(spark, c, "embedding", qv, 5,
      searchParams = Map("nprobe" -> "8"),
      partitionNames = Seq("p0", "p2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"partition filter did not reach the index scan:\n$plan")
    assert(plan.contains("_cid"), s"probe filter lost:\n$plan")
    // nprobe = nlist makes the routed path exact, so it must equal the
    // exact scan over the same partitions.
    val got = df.select("vec_id").collect().map(_.getLong(0)).toSeq
    val expected = Knn.searchOne(c.read(spark, Seq("p0", "p2")), qv,
      "embedding", "vec_id", "L2", 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"routed $got != exact $expected")
  }

  test("batch honors partition_names on the IVF route") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-pbatch").toString)
    val c = cat.createCollection(CollectionDef("pb", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(spark, emb.select("vec_id", "embedding"))
    c.createIndex(spark, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val qs = qvecs
    val batch = CollectionSearch.searchBatch(spark, c, "embedding", qs, 5,
      searchParams = Map("nprobe" -> "8"), partitionNames = Seq("p1"))
      .select("qid", "vec_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // nprobe = nlist is exact, so every hit must come from p1 (pk % 3
    // == 1) and match the exact partition-scoped loop.
    assert(batch.nonEmpty && batch.forall(_._2 % 3 == 1))
    val loop = qs.flatMap { case (qid, qv) =>
      Knn.searchOne(c.read(spark, Seq("p1")), qv, "embedding", "vec_id",
        "L2", 5).select("vec_id").collect().map(r => (qid, r.getLong(0)))
    }.sorted
    assert(batch == loop, s"partition batch != exact loop")
  }

  test("collection-route group_by search equals the operator-level result") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-gbr").toString)
    val c = cat.createCollection(CollectionDef("gb", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("label", LongType),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(spark, emb.select("vec_id", "label", "embedding"))
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val routed = CollectionSearch.searchGroupBy(spark, c, "embedding", qv,
      3, Seq("label"), groupSize = 2,
      searchParams = Map("metric_type" -> "COSINE"))
      .select("vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val q = Seq(("q0", qv)).toDF("qid", "qvec")
    val direct = Knn.searchGroupBy(emb, q, "embedding", "vec_id", "label",
      "COSINE", 3, groupSize = 2)
      .select("vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(routed == direct, s"$routed != $direct")
  }

  test("partition-scoped hybrid restricts both leg kinds before top-k") {
    import HybridSearch._
    import org.apache.spark.sql.types.{DoubleType, IntegerType, MapType}
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-hybpart").toString)
    val c = cat.createCollection(CollectionDef("hp", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("dvec", ArrayType(FloatType), dim = Some(2)),
      FieldDef("svec", MapType(IntegerType, DoubleType))),
      partitions = Seq("p0", "p1")))
    // pk % 2 routing: evens -> p0, odds -> p1.
    c.insert(spark, (1L to 8L).map(i =>
      (i, Seq(i.toFloat, 0f), Map(1 -> i.toDouble))).toDF("id", "dvec", "svec"))
    c.createIndex(spark, IndexDef("dvec", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "2")))
    c.createIndex(spark, IndexDef("svec", "SPARSE_INVERTED_INDEX"))
    val fused = HybridSearch.hybridSearchCollection(spark, c,
      Seq(
        CollectionAnnRequest(Seq("q0" -> Seq(0f, 0f)), "dvec", limit = 3,
          params = Map("nprobe" -> "2")),
        CollectionSparseRequest(Seq("q0" -> Map(1 -> 1.0)), "svec",
          limit = 3)),
      RrfRanker(60), limit = 8, partitionNames = Seq("p1"))
      .select("id").collect().map(_.getLong(0)).toSet
    // Only odd ids live in p1: dense leg top-3 = {1,3,5}, sparse
    // leg top-3 (IP desc) = {7,5,3} — fused ids are exactly the union.
    assert(fused == Set(1L, 3L, 5L, 7L), s"got $fused")
  }

  test("sparse search honors partition_names on the persisted route") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, MapType}
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-sppart").toString)
    val c = cat.createCollection(CollectionDef("sp", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("svec", MapType(IntegerType, DoubleType))),
      partitions = Seq("p0", "p1")))
    // pk % 2 routing: evens -> p0, odds -> p1.
    c.insert(spark, (1L to 8L).map(i => (i, Map(1 -> i.toDouble)))
      .toDF("id", "svec"))
    c.createIndex(spark, IndexDef("svec", "SPARSE_INVERTED_INDEX"))
    val one = CollectionSearch.searchSparse(spark, c, "svec",
      Map(1 -> 1.0), 8, partitionNames = Seq("p1"))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"partition scope did not prune the sparse postings scan:\n$plan")
    // Only odd ids live in p1; IP desc ranks by value.
    assert(one.select("id").collect().map(_.getLong(0)).toSeq ==
      Seq(7L, 5L, 3L, 1L))
    // Batch route, same scope: identical per-qid hits.
    val batch = CollectionSearch.searchSparseBatch(spark, c, "svec",
      Seq("q0" -> Map(1 -> 1.0)), 8, partitionNames = Seq("p1"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batch == Set(1L, 3L, 5L, 7L))
  }

  test("partition-scoped LSH search serves from the bucket layout") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-plsh").toString)
    val c = cat.createCollection(CollectionDef("plsh", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(spark, emb.select("vec_id", "embedding"))
    c.createIndex(spark, IndexDef("embedding", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    // radius = num_planes probes every bucket => exact within the
    // selected partitions.
    val df = CollectionSearch.search(spark, c, "embedding", qv, 5,
      searchParams = Map("radius" -> "4"),
      partitionNames = Seq("p0", "p2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"partition filter did not reach the LSH scan:\n$plan")
    val got = df.select("vec_id").collect().map(_.getLong(0)).toSeq
    val expected = Knn.searchOne(c.read(spark, Seq("p0", "p2")), qv,
      "embedding", "vec_id", "COSINE", 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"routed $got != exact $expected")
  }

  test("LSH batch scan is pruned to the probed bucket directories") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-batch-p").toString)
    val c = mkColl(cat, "lshp")
    c.createIndex(spark, IndexDef("embedding", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    val df = CollectionSearch.searchBatch(spark, c, "embedding", qvecs, 5,
      searchParams = Map("radius" -> "1"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_sig"),
      s"probe predicate did not reach the partition filters:\n$plan")
    assert(df.count() == 15)
  }
}
