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
