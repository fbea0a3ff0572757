package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ElementSearchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def nested = {
    val s = spark
    Tables.load(s, sfDir, "embeddings")
      .groupBy((col("vec_id") / 5).cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(
        col("vec_id").as("elem_id"),
        (col("vec_id") % 3).as("tag"),
        col("embedding")))).as("elems"))
  }

  private def qv = {
    val s = spark
    import s.implicits._
    Tables.load(s, sfDir, "embeddings").filter($"vec_id" === 0)
      .select("embedding").head().getSeq[Float](0)
  }

  test("element-scope top-k equals flat search over the unnested rows") {
    val s = spark
    import s.implicits._
    val got = ElementSearch.searchElements(nested, "elems", "embedding",
      "doc_id", qv, "L2", 8)
      .select("elem_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // the nested table was built FROM the flat table, so flat kNN over
    // it (tiebreak doc-major, then element position == vec_id order)
    // is the exact oracle
    val flat = Tables.load(s, sfDir, "embeddings")
      .withColumn("doc_id", ($"vec_id" / 5).cast("long"))
    val expected = Knn.searchOne(flat, qv, "embedding", "vec_id", "L2",
      rows(flat), outputCols = Seq("doc_id"))
      .orderBy($"score".asc, $"doc_id".asc, $"vec_id".asc).limit(8)
      .select("vec_id").collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), i + 1) }.toSeq
    assert(got == expected)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Int =
    df.count().toInt

  test("element-level filter restricts candidates to matching subfields") {
    val got = ElementSearch.searchElements(nested, "elems", "embedding",
      "doc_id", qv, "L2", 10, Some(col("tag") === 1))
      .select("tag").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("entity group_by keeps one best element per entity") {
    val s = spark
    import s.implicits._
    val got = ElementSearch.searchGroupByEntity(nested, "elems",
      "embedding", "doc_id", qv, "L2", 5)
      .select("doc_id", "elem_id", "entity_rank").collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(0)).distinct.length == 5, "duplicate entities")
    assert(got.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // rank 1 entity holds the globally best element
    val best = ElementSearch.searchElements(nested, "elems", "embedding",
      "doc_id", qv, "L2", 1).select("elem_id").head().getLong(0)
    assert(got.find(_.getInt(2) == 1).get.getLong(1) == best)
  }

  test("group_size=2 returns up to two elements per entity, rank shared") {
    val got = ElementSearch.searchGroupByEntity(nested, "elems",
      "embedding", "doc_id", qv, "L2", 3, groupSize = 2)
      .select("doc_id", "entity_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val perEntity = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perEntity.values.forall(n => n >= 1 && n <= 2))
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(1, 2, 3))
    // all elements of one entity share its entity_rank
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).distinct.length == 1)
    }
  }

  test("element group-bys salt the leader rank at k>=1000, not below") {
    def entityPlan(k: Int): String =
      ElementSearch.searchGroupByEntity(nested, "elems", "embedding",
        "doc_id", qv, "L2", k)
        .queryExecution.executedPlan.toString
    def fieldPlan(k: Int): String =
      ElementSearch.searchGroupByField(nested, "elems", "embedding",
        "doc_id", "tag", qv, "L2", k)
        .queryExecution.executedPlan.toString
    assert(entityPlan(1200).contains("_gsalt") && !entityPlan(5).contains("_gsalt"))
    assert(fieldPlan(1200).contains("_gsalt") && !fieldPlan(5).contains("_gsalt"))
    // salted and plain entity paths rank the 100 entities identically
    def run(k: Int) =
      ElementSearch.searchGroupByEntity(nested, "elems", "embedding",
        "doc_id", qv, "L2", k)
        .select("doc_id", "elem_id", "entity_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(run(1200) == run(999))
  }

  test("element range search returns exactly the under-threshold elements") {
    val s = spark
    import s.implicits._
    val got = ElementSearch.rangeSearchElements(nested, "elems",
      "embedding", "doc_id", qv, "L2", 1.2)
      .select("elem_id").collect().map(_.getLong(0)).toSet
    val flat = Tables.load(s, sfDir, "embeddings")
    val expected = Knn.rangeSearch(flat,
      Seq((0L, qv)).toDF("qid", "qvec"), "embedding", "vec_id", "L2", 1.2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  private def qvAt(id: Long) = {
    val s = spark
    import s.implicits._
    Tables.load(s, sfDir, "embeddings").filter($"vec_id" === id)
      .select("embedding").head().getSeq[Float](0)
  }

  test("field group_by ranks subfield groups by their best element") {
    val got = ElementSearch.searchGroupByField(nested, "elems", "embedding",
      "doc_id", "tag", qv, "L2", 2, groupSize = 2)
      .select("tag", "elem_id", "group_rank").collect()
    val byTag = got.groupBy(_.getLong(0))
    assert(byTag.size == 2)
    byTag.values.foreach { rs =>
      assert(rs.length >= 1 && rs.length <= 2)
      assert(rs.map(_.getInt(2)).distinct.length == 1,
        "all elements of a group share its group_rank")
    }
    // the rank-1 group is the one holding the globally best element
    val best = ElementSearch.searchElements(nested, "elems", "embedding",
      "doc_id", qv, "L2", 1).select("elem_id").head().getLong(0)
    val rank1 = got.filter(_.getInt(2) == 1)
    assert(rank1.map(_.getLong(0)).head == best % 3)
    assert(rank1.map(_.getLong(1)).contains(best))
  }

  test("element hybrid search fuses two subfield requests with RRF") {
    val s = spark
    import s.implicits._
    val two = Tables.load(s, sfDir, "embeddings")
      .groupBy(($"vec_id" / 5).cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(
        $"vec_id".as("elem_id"),
        $"embedding".as("emb_a"),
        transform($"embedding", x => -x).as("emb_b")))).as("elems"))
    val q1 = qvAt(1)
    val got = ElementSearch.hybridSearchElements(two, "elems", "doc_id",
      Seq(ElementSearch.ElementAnnRequest("emb_a", qv, "L2", 15),
        ElementSearch.ElementAnnRequest("emb_b", q1, "L2", 15)),
      HybridSearch.RrfRanker(60), limit = 8)
      .select("doc_id", "_elem_idx", "fused_rank").collect()
    assert(got.length == 8)
    assert(got.map(_.getInt(2)).toSeq == (1 to 8))
    // hand-fuse the two per-request element rank lists
    def ranks(sub: String, q: Seq[Float]) =
      ElementSearch.searchElements(two, "elems", sub, "doc_id", q, "L2", 15)
        .select("doc_id", "_elem_idx", "rank").collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    // pruned to the vector subfields only: identical fusion
    val prunedFused = ElementSearch.hybridSearchElements(two, "elems",
      "doc_id",
      Seq(ElementSearch.ElementAnnRequest("emb_a", qv, "L2", 15),
        ElementSearch.ElementAnnRequest("emb_b", q1, "L2", 15)),
      HybridSearch.RrfRanker(60), limit = 8,
      subfields = Seq("emb_a", "emb_b"))
      .select("doc_id", "_elem_idx", "fused_rank").collect()
    assert(prunedFused.map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSeq == got.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq)
    val ra = ranks("emb_a", qv)
    val rb = ranks("emb_b", q1)
    val expected = (ra.keySet ++ rb.keySet).toSeq.map { k =>
      (k, ra.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rb.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0))
    }.sortBy { case ((d, i), sc) => (-sc, d, i) }.take(8).map(_._1)
    assert(got.map(r => (r.getLong(0), r.getInt(1))).toSeq == expected)
  }

  test("element iterator pages concatenate to the element top-k") {
    val top = ElementSearch.searchElements(nested, "elems", "embedding",
      "doc_id", qv, "L2", 9)
      .select("doc_id", "_elem_idx", "elem_id", "score").collect()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1))
    val p1 = ElementSearch.searchIteratorElements(nested, "elems",
      "embedding", "doc_id", qv, "L2", 3)
      .select("doc_id", "_elem_idx", "score").collect()
    val cursor1 = (p1.last.getDouble(2), p1.last.getLong(0), p1.last.getInt(1))
    val p2 = ElementSearch.searchIteratorElements(nested, "elems",
      "embedding", "doc_id", qv, "L2", 3, after = Some(cursor1))
      .select("doc_id", "_elem_idx", "score").collect()
    val cursor2 = (p2.last.getDouble(2), p2.last.getLong(0), p2.last.getInt(1))
    val p3 = ElementSearch.searchIteratorElements(nested, "elems",
      "embedding", "doc_id", qv, "L2", 3, after = Some(cursor2))
      .select("doc_id", "_elem_idx", "score").collect()
    assert((p1 ++ p2 ++ p3).map(key).toSeq == top.map(key).toSeq)
  }

  test("null vector elements are stored but never searched") {
    val s = spark
    import s.implicits._
    // null out the vector of every tag==0 element (pk-deterministic)
    val withNulls = Tables.load(s, sfDir, "embeddings")
      .groupBy(($"vec_id" / 5).cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(
        $"vec_id".as("elem_id"),
        ($"vec_id" % 3).as("tag"),
        when($"vec_id" % 3 === 0, lit(null)
          .cast("array<float>")).otherwise($"embedding").as("embedding"))))
        .as("elems"))
    val hits = ElementSearch.searchElements(withNulls, "elems", "embedding",
      "doc_id", qv, "L2", 20)
      .select("elem_id", "tag").collect()
    assert(hits.length == 20)
    assert(hits.forall(_.getLong(1) != 0L), "null-vector elements surfaced")
    // ...but they remain queryable as data
    val stored = ElementSearch.queryElements(withNulls, "elems", "doc_id",
      Some(col("embedding").isNull)).count()
    assert(stored > 0)
  }

  test("binary vector subfields rank by hamming distance") {
    val s = spark
    import s.implicits._
    // pack each vector's sign bits (zero center) as a BINARY_VECTOR code
    val packed = Tables.load(s, sfDir, "embeddings")
      .withColumn("code", expr(
        "centered_sign_bits(embedding, transform(embedding, x -> 0.0D))"))
    val nestedBin = packed
      .groupBy(($"vec_id" / 5).cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(
        $"vec_id".as("elem_id"), $"code"))).as("elems"))
    val qbits = packed.filter($"vec_id" === 0)
      .select("code").head().getAs[Array[Byte]](0)
    val got = ElementSearch.searchElementsBinary(nestedBin, "elems", "code",
      "doc_id", qbits, "HAMMING", 5)
      .select("elem_id", "score").collect()
    assert(got.length == 5)
    // vec 0's own code is at distance 0, so it must lead
    assert(got.head.getLong(0) == 0L && got.head.getLong(1) == 0L)
    assert(got.map(_.getLong(1)).toSeq.sorted == got.map(_.getLong(1)).toSeq)
  }

  test("collection API: element search + dynamic StructArray subfield add") {
    val s = spark
    import s.implicits._
    import graft.store.{Catalog, CollectionDef, FieldDef}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-elem-coll")
    val cat = new Catalog(root.resolve("cat").toString)
    val elemT = StructType(Seq(
      StructField("tag", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val c = cat.createCollection(CollectionDef("nested", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("elems", ArrayType(elemT)))))
    def nestedBatch(ids: Seq[Long]) =
      ids.flatMap(d => (0 until 3).map(i => (d, (d * 3 + i) % 2,
          Seq((d * 3 + i).toFloat, 1f))))
        .toDF("doc_id", "tag", "embedding")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct($"tag", $"embedding")))
          .as("elems"))
    c.insert(s, nestedBatch(Seq(0L, 1L))): Unit
    // element-scope search with a Milvus-expr element filter
    val hits = CollectionSearch.searchElements(s, c, "elems", "embedding",
      Seq(0f, 1f), k = 3, metricType = "L2", elementFilterExpr = "tag == 0")
      .select("doc_id", "tag", "rank").collect()
    assert(hits.length == 3)
    assert(hits.forall(_.getLong(1) == 0L))
    assert(hits.head.getLong(0) == 0L, "nearest tag-0 element is doc 0's")
    // pruned to outputSubfields (+ filter refs + vector): same hits
    val prunedHits = CollectionSearch.searchElements(s, c, "elems",
      "embedding", Seq(0f, 1f), k = 3, metricType = "L2",
      elementFilterExpr = "tag == 0", outputSubfields = Seq("tag"))
      .select("doc_id", "tag", "rank").collect()
    assert(prunedHits.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq == hits.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
    // widen the element type; old elements read the subfield as null
    c.addStructSubfield("elems", StructField("weight", DoubleType))
    val weights = c.read(s)
      .select(explode($"elems.weight").as("w")).collect()
    assert(weights.length == 6 && weights.forall(_.isNullAt(0)))
    // new generation carries the subfield; element filter sees it,
    // and 3VL null comparison excludes the old generation
    val widened = Seq((2L, 0L, Seq(100f, 1f), 0.9),
        (2L, 1L, Seq(101f, 1f), 0.1))
      .toDF("doc_id", "tag", "embedding", "weight")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"tag", $"embedding", $"weight")))
        .as("elems"))
    c.insert(s, widened): Unit
    val heavy = CollectionSearch.searchElements(s, c, "elems", "embedding",
      Seq(0f, 1f), k = 10, elementFilterExpr = "weight >= 0.5")
      .select("doc_id", "weight").collect()
    assert(heavy.length == 1)
    assert(heavy.head.getLong(0) == 2L && heavy.head.getDouble(1) == 0.9)
  }

  test("parquet plan: nested schema pruning drops unreferenced subfields") {
    val s = spark
    import s.implicits._
    // a fat payload subfield the query never touches
    val dir = java.nio.file.Files.createTempDirectory("graft-elem-prune")
    Tables.load(s, sfDir, "embeddings").limit(500)
      .groupBy(($"vec_id" / 5).cast("long").as("doc_id"))
      .agg(sort_array(collect_list(struct(
        $"vec_id".as("elem_id"),
        $"embedding",
        concat(lit("payload_"), $"vec_id").as("payload")))).as("elems"))
      .write.parquet(dir.toString + "/nested")
    val nestedPq = s.read.parquet(dir.toString + "/nested")
    // subfields passed: the arrays_zip pre-prune narrows the scan
    // (a bare posexplode would read payload too — Catalyst has no
    // generator pruning for PosExplode, only Explode)
    val pruned = ElementSearch.searchElements(nestedPq, "elems", "embedding",
      "doc_id", qv, "L2", 5, subfields = Seq("elem_id", "embedding"))
      .select("doc_id", "_elem_idx", "elem_id", "score", "rank")
    val plan = pruned.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("elem_id") && readSchema.contains("embedding"),
      s"referenced subfields must be read:\n$readSchema")
    assert(!readSchema.contains("payload"),
      s"unreferenced subfield must be pruned from the scan:\n$readSchema")
    // and the element top-k is a TakeOrdered over the exploded scan —
    // no shuffle below it
    assert(plan.contains("TakeOrderedAndProject"),
      s"element top-k should be TakeOrdered, not sort+limit:\n$plan")
    // pruned results == unpruned results (same elements, same order)
    val full = ElementSearch.searchElements(nestedPq, "elems", "embedding",
      "doc_id", qv, "L2", 5)
      .select("doc_id", "_elem_idx", "elem_id", "score", "rank")
    assert(pruned.collect().toSeq == full.collect().toSeq)
  }

  test("element query projects subfields with the element hit path") {
    val got = ElementSearch.queryElements(nested, "elems", "doc_id",
      Some(col("tag") === 2), limit = Some(4))
      .select("doc_id", "_elem_idx", "elem_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // tag == 2 -> vec_id % 3 == 2: first is vec_id 2 (doc 0, position 2)
    assert(got.head == ((0L, 2, 2L)))
    assert(got.length == 4)
    got.foreach { case (_, _, elemId) => assert(elemId % 3 == 2) }
  }
}
