package graft.sources

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class StructArrayImportSpec extends SparkSpec {

  private val elem = StructArrayImport.elementType(
    Seq("tag" -> LongType), "embedding")

  private def writeJsonl(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-sa-import")
    val p = dir.resolve("rows.jsonl")
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private val fixture = Seq(
    """{"doc_id":0,"elems":[{"tag":1,"embedding":[0.5,1.0,1.5]},{"tag":2,"embedding":[2.0,2.5,3.0]}]}""",
    """{"doc_id":1,"elems":[{"tag":3,"embedding":[1.0,0.0,0.0]}]}""",
    """{"doc_id":2,"elems":[{"tag":4,"embedding":[9.0,8.0]}]}""",
    """{"doc_id":3}""",
    """{"doc_id":4,"elems":[]}""")

  test("jsonl import splits valid rows from wrong-dim and missing lists") {
    val got = StructArrayImport.readJsonl(spark, writeJsonl(fixture),
      "doc_id", LongType, "elems", elem, "embedding", dim = 3)
    assert(got.valid.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(0L, 1L, 4L))
    assert(got.malformed.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 3L))
    // parsed elements are fully typed — searchable by the element ops
    val first = got.valid.filter(col("doc_id") === 0)
      .select(element_at(col("elems"), 1)).head().getStruct(0)
    assert(first.getLong(0) == 1L)
    assert(first.getSeq[Float](1) == Seq(0.5f, 1.0f, 1.5f))
  }

  test("csv import parses the JSON-encoded element column to the same set") {
    val dir = Files.createTempDirectory("graft-sa-csv")
    val p = dir.resolve("rows.csv")
    val rows = Seq(
      "doc_id,elems",
      """0,"[{""tag"":1,""embedding"":[0.5,1.0,1.5]},{""tag"":2,""embedding"":[2.0,2.5,3.0]}]"""",
      """1,"[{""tag"":3,""embedding"":[1.0,0.0,0.0]}]"""",
      """2,"[{""tag"":4,""embedding"":[9.0,8.0]}]"""",
      "3,",
      """4,"[]"""")
    Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
    val got = StructArrayImport.readCsv(spark, p.toString, "doc_id",
      LongType, "elems", elem, "embedding", dim = 3)
    assert(got.valid.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(0L, 1L, 4L))
    assert(got.malformed.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 3L))
  }

  test("import 2PC aborts on malformed rows, commits a clean file") {
    val root = Files.createTempDirectory("graft-sa-2pc")
    val cat = new Catalog(root.resolve("cat").toString)
    val c = cat.createCollection(CollectionDef("sa", Seq(
      FieldDef("doc_id", LongType, nullable = false, isPrimary = true),
      FieldDef("elems", ArrayType(elem)))))
    // dirty file: malformed rows exist -> abort, nothing visible
    val dirty = StructArrayImport.readJsonl(spark, writeJsonl(fixture),
      "doc_id", LongType, "elems", elem, "embedding", dim = 3)
    val id1 = c.prepareImport(spark, dirty.valid)
    assert(dirty.malformed.count() > 0)
    c.abortImport(id1)
    assert(c.numEntities(spark) == 0)
    // clean file -> commit, all rows visible
    val clean = StructArrayImport.readJsonl(spark,
      writeJsonl(fixture.take(2)),
      "doc_id", LongType, "elems", elem, "embedding", dim = 3)
    assert(clean.malformed.count() == 0)
    val id2 = c.prepareImport(spark, clean.valid)
    c.commitImport(spark, id2)
    assert(c.numEntities(spark) == 2)
  }
}
