package graft.operators

import graft.SparkSpec
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType,
  FloatType, IntegerType, LongType, MapType, StringType}

/** Regression pins for the round-14 serving-core review findings:
  * null vectors must never occupy top-k slots on the brute-force
  * routes (a null score sorts NULLS FIRST under ascending L2/Hamming),
  * a filter over doc columns must work identically with and without a
  * declared sparse index, searchByPk must fail with named errors, the
  * range/iterator routes must not leak the window's internal rank
  * column, and a dropped sparse index's WAND impact stats must not
  * survive into a recreated same-name collection.
  */
class SearchHardeningSpec extends SparkSpec {

  private def freshCat(tag: String) = new Catalog(
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  private def vec(i: Long): Seq[Float] =
    Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat, 1.0f)

  test("null dense vectors never reach the top-k on the masked HNSW brute path") {
    val s = spark
    import s.implicits._
    val cat = freshCat("nullmask")
    val c = cat.createCollection(CollectionDef("nm", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(4)),
      FieldDef("tag", StringType))))
    val rows = (0L until 50L).map(i => (i, vec(i), "a")) :+
      ((50L, null.asInstanceOf[Seq[Float]], "a"))
    c.insert(s, rows.toDF("vec_id", "embedding", "tag")): Unit
    c.createIndex(s, IndexDef("embedding", "HNSW", Some("L2"),
      Map("M" -> "4", "efConstruction" -> "16")))
    // tag == "a" matches every row including the null-vector one; the
    // 51-pk mask is far under maskBruteForceMax, forcing the brute path.
    val hits = CollectionSearch.search(s, c, "embedding", vec(3), 5,
      filterExpr = "tag == \"a\"").select("vec_id").as[Long].collect()
    assert(!hits.contains(50L), s"null-vector row in top-k: ${hits.toSeq}")
    assert(hits.length == 5)
  }

  test("null binary vectors never reach the top-k on the brute Hamming routes") {
    val s = spark
    import s.implicits._
    val cat = freshCat("nullbin")
    val c = cat.createCollection(CollectionDef("nb", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("bvec", BinaryType))))
    val rows = (0L until 20L).map(i => (i, Array[Byte](i.toByte, 1, 2, 3))) :+
      ((20L, null.asInstanceOf[Array[Byte]]))
    c.insert(s, rows.toDF("vec_id", "bvec")): Unit
    val one = CollectionSearch.searchBinary(s, c, "bvec",
      Array[Byte](3, 1, 2, 3), 5).select("vec_id").as[Long].collect()
    assert(!one.contains(20L), s"null bvec in searchBinary: ${one.toSeq}")
    val batch = CollectionSearch.searchBinaryBatch(s, c, "bvec",
      Seq("q0" -> Array[Byte](3, 1, 2, 3)), 5)
      .select("vec_id").as[Long].collect()
    assert(!batch.contains(20L), s"null bvec in batch: ${batch.toSeq}")
  }

  test("sparse filter over doc columns works identically indexed and unindexed") {
    val s = spark
    import s.implicits._
    val cat = freshCat("spfilter")
    def mk(name: String): Collection = {
      val c = cat.createCollection(CollectionDef(name, Seq(
        FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
        FieldDef("sv", MapType(IntegerType, DoubleType)),
        FieldDef("category", StringType))))
      c.insert(s, (0L until 40L).map(i =>
          (i, Map((i % 5).toInt -> (1.0 + i % 3), 7 -> 0.5),
            if (i % 2 == 0) "a" else "b"))
        .toDF("doc_id", "sv", "category")): Unit
      c
    }
    val plain = mk("plain")
    val indexed = mk("indexed")
    indexed.createIndex(s, IndexDef("sv", "SPARSE_INVERTED_INDEX"))
    val q = Map(7 -> 1.0, 2 -> 2.0)
    def top(c: Collection): Seq[(Long, Double)] =
      CollectionSearch.searchSparse(s, c, "sv", q, 10,
          filterExpr = "category == \"a\"")
        .select("doc_id", "score").as[(Long, Double)].collect().sorted.toSeq
    assert(top(indexed) == top(plain),
      "indexed sparse filter over doc columns diverged from unindexed")
    assert(top(indexed).nonEmpty)
    // batch + range routes take the same fallback
    val batch = CollectionSearch.searchSparseBatch(s, indexed, "sv",
        Seq("q0" -> q), 10, filterExpr = "category == \"a\"")
      .select("doc_id").as[Long].collect()
    assert(batch.nonEmpty && batch.forall(_ % 2 == 0))
    val range = CollectionSearch.rangeSearchSparse(s, indexed, "sv", q,
        radius = 0.0, filterExpr = "category == \"a\"")
      .select("doc_id").as[Long].collect()
    assert(range.nonEmpty && range.forall(_ % 2 == 0))
  }

  test("searchByPk fails with named errors on a missing pk and a null vector") {
    val s = spark
    import s.implicits._
    val cat = freshCat("bypk")
    val c = cat.createCollection(CollectionDef("bp", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(4)))))
    c.insert(s, Seq((1L, vec(1)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")): Unit
    val missing = intercept[IllegalArgumentException] {
      CollectionSearch.searchByPk(s, c, "embedding", 999L, 5)
    }
    assert(missing.getMessage.contains("999"))
    val nullVec = intercept[IllegalArgumentException] {
      CollectionSearch.searchByPk(s, c, "embedding", 2L, 5)
    }
    assert(nullVec.getMessage.contains("null"))
  }

  test("range and iterator routes do not leak the internal rank column") {
    val s = spark
    import s.implicits._
    val cat = freshCat("norank")
    val c = cat.createCollection(CollectionDef("nr", Seq(
      FieldDef("vec_id", LongType, nullable = false, isPrimary = true),
      FieldDef("embedding", ArrayType(FloatType), dim = Some(4)))))
    c.insert(s, (0L until 30L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")): Unit
    val range = CollectionSearch.rangeSearchBatch(s, c, "embedding",
      Seq("q0" -> vec(3)), radius = 100.0, limit = 5)
    assert(!range.columns.contains("rank"),
      s"rangeSearchBatch leaked rank: ${range.columns.toSeq}")
    val page = CollectionSearch.searchIterator(s, c, "embedding", vec(3), 5)
    assert(!page.columns.contains("rank"),
      s"searchIterator leaked rank: ${page.columns.toSeq}")
  }

  test("dropping a sparse index evicts its WAND impact stats (no stale prune after recreate)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-wandstale")
      .toString
    def build(cat: Catalog, hotDim: Int): Collection = {
      val c = cat.createCollection(CollectionDef("ws", Seq(
        FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
        FieldDef("sv", MapType(IntegerType, DoubleType)))))
      // doc 0 is the clear winner through hotDim; every other doc has
      // tiny weight there. A stale stats map from a PREVIOUS corpus
      // (where hotDim was cold) lets WAND prune hotDim's postings and
      // lose doc 0.
      c.insert(s, (0L until 30L).map(i =>
          (i, if (i == 0) Map(hotDim -> 10.0, 1 -> 0.1)
              else Map(hotDim -> 0.01, 1 -> (1.0 + (i % 3))))).toDF(
          "doc_id", "sv")): Unit
      c.createIndex(s, IndexDef("sv", "SPARSE_WAND")): Unit
      c
    }
    val cat1 = new Catalog(root)
    val c1 = build(cat1, hotDim = 3)
    // Memoize the first incarnation's stats (dim 3 hot only via doc 0).
    CollectionSearch.searchSparse(s, c1, "sv", Map(3 -> 1.0), 3)
      .collect(): Unit
    cat1.dropCollection("ws")
    // Same root + same name + same single insert batch -> the new
    // build lands on the SAME versioned dimstats path.
    val cat2 = new Catalog(root)
    val c2 = build(cat2, hotDim = 9)
    val hits = CollectionSearch.searchSparse(s, c2, "sv", Map(9 -> 1.0), 1)
      .select("doc_id").as[Long].collect()
    assert(hits.toSeq == Seq(0L),
      s"stale WAND stats served after drop/recreate: ${hits.toSeq}")
  }
}
