package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class StoreSpec extends SparkSpec {

  private def freshCatalog(): Catalog =
    new Catalog(Files.createTempDirectory("graft-store").toString)

  /** Names in the data dir's retirement ledger (logically-removed
    * delta dirs awaiting the grace sweep).
    */
  private def retiredNames(dataDir: java.io.File): Set[String] = {
    val f = new java.io.File(dataDir, "_retired_index")
    if (!f.exists) Set.empty
    else scala.io.Source.fromFile(f).getLines()
      .filter(_.nonEmpty).map(_.split(" ")(0)).toSet
  }

  private def simpleDef(name: String,
      partitions: Seq[String] = Seq.empty,
      ttl: Option[Long] = None,
      autoId: Boolean = false): CollectionDef =
    CollectionDef(name,
      fields = Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true, autoId = autoId),
        FieldDef("category", LongType),
        FieldDef("content", StringType),
        FieldDef("version", LongType)),
      partitions = partitions, ttlSeconds = ttl)

  test("schema validation mirrors the reference rules") {
    // no primary
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(FieldDef("a", LongType))).validate()
    }
    // two primaries
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true),
        FieldDef("b", LongType, nullable = false, isPrimary = true))).validate()
    }
    // auto_id on non-primary
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true),
        FieldDef("b", LongType, autoId = true))).validate()
    }
    // float primary
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", DoubleType, nullable = false, isPrimary = true))).validate()
    }
    // partition key + explicit partitions are mutually exclusive
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true),
        FieldDef("g", LongType, isPartitionKey = true)),
        partitions = Seq("p0")).validate()
    }
    // index on undeclared field
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true)),
        indexes = Seq(IndexDef("nope", "INVERTED"))).validate()
    }
  }

  test("create / has / describe / list / drop collection") {
    val cat = freshCatalog()
    cat.createCollection(simpleDef("c1"))
    cat.createCollection(simpleDef("c2"))
    assert(cat.hasCollection("c1"))
    assert(cat.listCollections() == Seq("c1", "c2"))
    assert(cat.describeCollection("c1").fields.map(_.name) ==
      Seq("id", "category", "content", "version"))
    intercept[IllegalArgumentException](cat.createCollection(simpleDef("c1")))
    cat.dropCollection("c1")
    assert(!cat.hasCollection("c1"))
    assert(cat.listCollections() == Seq("c2"))
  }

  test("insert returns pks; read returns inserted rows; num_entities") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ins"))
    val res = c.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version"))
    assert(res.count == 2)
    assert(res.idSeq().toSet == Set(1L, 2L))
    assert(c.numEntities(s) == 2)
    val rows = c.read(s).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getString(2)).toSeq == Seq("a", "b"))
  }

  test("auto_id assigns unique pks across batches") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("auto", autoId = true))
    val df = Seq((10L, "x", 0L), (20L, "y", 0L))
      .toDF("category", "content", "version")
    val ids1 = c.insert(s, df).idSeq()
    val ids2 = c.insert(s, df).idSeq()
    assert((ids1 ++ ids2).distinct.length == 4)
    assert(c.numEntities(s) == 4)
    // supplying pk to an auto_id collection is an error
    intercept[IllegalArgumentException] {
      c.insert(s, Seq((99L, 1L, "z", 0L)).toDF("id", "category", "content", "version"))
    }
  }

  test("upsert3-style version replacement: last write wins per pk") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ups"))
    // round 0: insert 6 rows at version 0
    c.insert(s, (0L until 6L).map(i => (i, i * 10, s"v0_$i", 0L))
      .toDF("id", "category", "content", "version"))
    // rounds 1..3: upsert all rows, bumping version (upsert3.py:184-226)
    (1L to 3L).foreach { v =>
      c.upsert(s, (0L until 6L).map(i => (i, i * 10 + v, s"v${v}_$i", v))
        .toDF("id", "category", "content", "version"))
    }
    val rows = c.read(s).orderBy("id").collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(3) == 3L), "all rows must be at version 3")
    assert(rows.map(_.getString(2)).forall(_.startsWith("v3_")))
  }

  test("partial_update coalesces absent/null columns from the live row") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("pup"))
    c.insert(s, Seq((1L, 10L, "orig", 0L), (2L, 20L, "keep", 0L))
      .toDF("id", "category", "content", "version"))
    // update only category for pk 1; content column absent entirely
    c.upsert(s, Seq((1L, 99L)).toDF("id", "category"), partialUpdate = true)
    val r1 = c.read(s).filter($"id" === 1).head()
    assert(r1.getLong(1) == 99L)
    assert(r1.getString(2) == "orig") // carried over
    val r2 = c.read(s).filter($"id" === 2).head()
    assert(r2.getLong(1) == 20L)
  }

  test("delete by filter expression writes tombstones") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("del"))
    c.insert(s, (0L until 10L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    val n = c.delete(s, "category >= 7")
    assert(n == 3)
    assert(c.numEntities(s) == 7)
    // delete by pk list (2.6/common.py:229 shape)
    val n2 = c.delete(s, "id in [0, 1]")
    assert(n2 == 2)
    assert(c.read(s).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (2L to 6L))
    // re-insert a deleted pk resurrects it (newer seq wins over tombstone)
    c.insert(s, Seq((0L, 0L, "back", 1L)).toDF("id", "category", "content", "version"))
    assert(c.read(s).filter($"id" === 0).head().getString(2) == "back")
  }

  test("explicit partitions route by pk and prune on read") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("parts", partitions = Seq("p0", "p1", "p2")))
    c.insert(s, (0L until 9L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    // pk % 3 routing: p0 = {0,3,6}, p1 = {1,4,7}, p2 = {2,5,8}
    assert(c.read(s, partitionNames = Seq("p0")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L, 6L))
    assert(c.read(s, partitionNames = Seq("p1", "p2")).count() == 6)
    // deletes suppress rows in partition-scoped reads too
    c.delete(s, "id == 3")
    assert(c.read(s, partitionNames = Seq("p0")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 6L))
    // create/drop partition
    c.createPartition("p3")
    assert(c.listPartitions() == Seq("p0", "p1", "p2", "p3"))
    c.dropPartition(s, "p2")
    assert(c.listPartitions() == Seq("p0", "p1", "p3"))
    assert(c.read(s).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 4L, 6L, 7L))
  }

  test("partition_names reads prune delta directories at the scan") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("prune", partitions = Seq("p0", "p1", "p2")))
    c.insert(s, (0L until 9L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.delete(s, "id == 6")
    val scoped = c.read(s, partitionNames = Seq("p0"))
    // deltas are partitionBy(_part): the scope must arrive at the scan
    // as a PARTITION (directory) filter, same standard as _cid/_tb in
    // IndexLifecycleSpec — at scale the other partitions' files are
    // never listed, let alone read.
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_part"),
      s"partition scope did not reach the scan as a partition filter:\n$plan")
    // pk % 3 routing puts {0,3,6} in p0; the tombstone for 6 is
    // co-located in p0, so the pruned read still sees the delete.
    assert(scoped.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L))
  }

  test("TTL expiry filters aged rows at read time") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ttl", ttl = Some(60L)))
    c.insert(s, Seq((1L, 1L, "fresh", 0L)).toDF("id", "category", "content", "version"))
    assert(c.numEntities(s) == 1)
    // pretend we read 2 minutes in the future: row expired
    val future = System.currentTimeMillis() + 120 * 1000L
    assert(c.read(s, asOfMillis = Some(future)).count() == 0)
  }

  test("aliases: create, swap, drop (alter_alias.py)") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c1 = cat.createCollection(simpleDef("coll_a"))
    cat.createCollection(simpleDef("coll_b"))
    c1.insert(s, Seq((1L, 1L, "a", 0L)).toDF("id", "category", "content", "version"))
    cat.createAlias("hot", "coll_a")
    assert(cat.collection("hot").numEntities(s) == 1)
    cat.alterAlias("hot", "coll_b")
    assert(cat.collection("hot").numEntities(s) == 0)
    intercept[IllegalArgumentException](cat.createAlias("hot", "coll_a"))
    cat.dropAlias("hot")
    assert(cat.listAliases().isEmpty)
  }

  test("load/release lifecycle and load_state") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ld"))
    c.insert(s, Seq((1L, 1L, "a", 0L)).toDF("id", "category", "content", "version"))
    assert(c.loadState == "NotLoad")
    c.load(s)
    assert(c.loadState == "Loaded")
    assert(c.numEntities(s) == 1)
    c.release()
    assert(c.loadState == "NotLoad")
  }

  test("index metadata create/drop/list (S4-S6)") {
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ix"))
    c.createIndex(IndexDef("category", "INVERTED"))
    c.createIndex(IndexDef("content", "NGRAM", params = Map("min_gram" -> "2")))
    assert(c.listIndexes().map(_.field).sorted == Seq("category", "content"))
    c.dropIndex("category")
    assert(c.listIndexes().map(_.field) == Seq("content"))
    intercept[IllegalArgumentException](c.createIndex(IndexDef("nope", "TRIE")))
  }

  test("schema evolution: add nullable field, drop field") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("evo"))
    c.insert(s, Seq((1L, 1L, "a", 0L)).toDF("id", "category", "content", "version"))
    c.addField(FieldDef("extra", StringType))
    // old rows read back with null in the new column
    val r = c.read(s).head()
    assert(r.schema.fieldNames.contains("extra") && r.isNullAt(r.fieldIndex("extra")))
    // new writes can fill it
    c.upsert(s, Seq((1L, "filled")).toDF("id", "extra"), partialUpdate = true)
    assert(c.read(s).head().getString(4) == "filled")
    c.dropField("extra")
    assert(!c.read(s).columns.contains("extra"))
    intercept[IllegalArgumentException](c.addField(FieldDef("x", LongType, nullable = false)))
    intercept[IllegalArgumentException](c.dropField("id"))
  }

  test("function add/drop lifecycle: output field served while bound, gone after drop") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("fn"))
    c.insert(s, Seq((1L, 1L, "hello hello world", 0L), (2L, 2L, "spark spark spark", 0L))
      .toDF("id", "category", "content", "version"))
    // add: BM25 content -> sparse; output field auto-declared and served
    c.addFunction(FunctionDef("fts", "BM25", Seq("content"), Seq("sparse")))
    assert(c.definition.functions.map(_.name) == Seq("fts"))
    assert(c.read(s).columns.contains("sparse"))
    val m1 = c.read(s).filter($"id" === 1L)
      .select("sparse").head().getMap[Int, Double](0)
    assert(m1.size == 2, "two distinct terms in doc 1")
    assert(m1.values.toSeq.sorted == Seq(1.0, 2.0), "tf 2 for 'hello', 1 for 'world'")
    // validation: unknown input / non-text input / duplicate name
    intercept[IllegalArgumentException](
      c.addFunction(FunctionDef("bad", "BM25", Seq("nope"), Seq("o"))))
    intercept[IllegalArgumentException](
      c.addFunction(FunctionDef("bad", "BM25", Seq("category"), Seq("o"))))
    intercept[IllegalArgumentException](
      c.addFunction(FunctionDef("fts", "BM25", Seq("content"), Seq("o"))))
    // drop: binding and output field disappear (drop_function_field)
    c.dropFunction("fts")
    assert(c.definition.functions.isEmpty)
    assert(!c.read(s).columns.contains("sparse"))
    intercept[IllegalArgumentException](c.dropFunction("fts"))
    // re-add serves again — the schema_evolution_workload cycle
    c.addFunction(FunctionDef("fts", "BM25", Seq("content"), Seq("sparse")))
    assert(c.read(s).filter($"id" === 2L)
      .select("sparse").head().getMap[Int, Double](0).values.toSeq == Seq(3.0))
    // function outputs survive the catalog round-trip (MetaJson)
    assert(cat.describeCollection("fn").functions.map(_.name) == Seq("fts"))
    // queries that don't project the output must not pay for it:
    // column pruning eliminates the derived tokenize/hash expressions
    val plan = c.query(s, "", outputFields = Seq("id"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("xxhash64"),
      s"unprojected function output not pruned:\n$plan")
  }

  test("alterFunction re-parameterizes in place and invalidates output indexes") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("fna"))
    c.insert(s, Seq((1L, 1L, "hello world", 0L), (2L, 2L, "spark", 0L))
      .toDF("id", "category", "content", "version")): Unit
    c.addFunction(FunctionDef("enc", "TEXT_EMBEDDING",
      Seq("content"), Seq("emb"), Map("dim" -> "4")))
    assert(c.read(s).select("emb").head().getSeq[Float](0).length == 4)
    // index on the function OUTPUT + an unrelated scalar index
    c.createIndex(IndexDef("emb", "IVF_FLAT", Some("L2")))
    c.createIndex(IndexDef("category", "INVERTED"))
    assert(c.listIndexes().map(_.field).sorted == Seq("category", "emb"))
    // alter: dim 4 -> 8; same binding, output re-declared at the new dim
    c.alterFunction("enc", Map("dim" -> "8"))
    assert(c.definition.functions.head.params("dim") == "8")
    assert(c.definition.fields.find(_.name == "emb").flatMap(_.dim)
      .contains(8))
    assert(c.read(s).select("emb").head().getSeq[Float](0).length == 8)
    // output-field index dropped (its build encoded dim-4 values);
    // the scalar index is untouched
    assert(c.listIndexes().map(_.field) == Seq("category"))
    // validation: unknown name, bad dim, remote provider
    intercept[IllegalArgumentException](c.alterFunction("nope", Map.empty))
    intercept[IllegalArgumentException](
      c.alterFunction("enc", Map("dim" -> "zero")))
    intercept[IllegalArgumentException](
      c.alterFunction("enc", Map("dim" -> "8", "provider" -> "remote")))
    // the alter survives the catalog round-trip
    assert(cat.describeCollection("fna").functions.head.params("dim") == "8")
  }

  test("truncate drops all entities, keeps schema and index metadata") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("trunc", partitions = Seq("p0", "p1")))
    c.createIndex(IndexDef("category", "INVERTED"))
    c.insert(s, (0L until 10L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.delete(s, "id == 3")
    assert(c.numEntities(s) == 9)
    c.truncate(s)
    assert(c.numEntities(s) == 0)
    assert(c.read(s).columns.contains("content"), "schema survives")
    assert(c.listPartitions() == Seq("p0", "p1"), "partitions survive")
    assert(c.listIndexes().map(_.field) == Seq("category"), "index defs survive")
    // collection is immediately writable again
    c.insert(s, Seq((42L, 1L, "back", 0L)).toDF("id", "category", "content", "version"))
    assert(c.numEntities(s) == 1)
    assert(c.read(s).head().getLong(0) == 42L)
  }

  test("ARRAY_APPEND / ARRAY_REMOVE partial update mutates live arrays") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("arr", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("tags", ArrayType(StringType)),
      FieldDef("scores", ArrayType(LongType)))))
    c.insert(s, Seq(
      (1L, Seq("a", "b"), Seq(1L, 2L)),
      (2L, Seq("b"), Seq(9L)))
      .toDF("id", "tags", "scores"))
    // append to tags for row 1, remove from scores for row 2
    c.updateArrays(s, Seq((1L, "c")).toDF("id", "tags"),
      Map("tags" -> "ARRAY_APPEND"))
    c.updateArrays(s, Seq((2L, 9L)).toDF("id", "scores"),
      Map("scores" -> "ARRAY_REMOVE"))
    val rows = c.read(s).orderBy("id").collect()
    assert(rows(0).getSeq[String](1) == Seq("a", "b", "c"))
    assert(rows(0).getSeq[Long](2) == Seq(1L, 2L), "untouched field carries over")
    assert(rows(1).getSeq[String](1) == Seq("b"))
    assert(rows(1).getSeq[Long](2).isEmpty, "REMOVE drops every occurrence")
    // append again: duplicates allowed, order preserved
    c.updateArrays(s, Seq((1L, "a")).toDF("id", "tags"),
      Map("tags" -> "ARRAY_APPEND"))
    assert(c.read(s).filter($"id" === 1L).head().getSeq[String](1) ==
      Seq("a", "b", "c", "a"))
    // validation
    intercept[IllegalArgumentException](
      c.updateArrays(s, Seq((1L, "x")).toDF("id", "nope"),
        Map("nope" -> "ARRAY_APPEND")))
    intercept[IllegalArgumentException](
      c.updateArrays(s, Seq((1L, "x")).toDF("id", "tags"),
        Map("tags" -> "ARRAY_SHUFFLE")))
    intercept[IllegalArgumentException]( // non-array field
      c.updateArrays(s, Seq((1L, "x")).toDF("id", "id"),
        Map("id" -> "ARRAY_APPEND")))
  }

  test("schema changes refresh a Loaded collection's cached snapshot") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ldschema"))
    c.insert(s, Seq((1L, 1L, "hello world", 0L))
      .toDF("id", "category", "content", "version"))
    c.load(s)
    assert(c.loadState == "Loaded")
    c.addField(FieldDef("extra", StringType))
    assert(c.read(s).columns.contains("extra"),
      "added field invisible on a Loaded collection")
    c.addFunction(FunctionDef("fts", "BM25", Seq("content"), Seq("sparse")))
    assert(c.read(s).columns.contains("sparse"),
      "function output invisible on a Loaded collection")
    assert(c.read(s).head().getMap[Int, Double](
      c.read(s).columns.indexOf("sparse")).size == 2)
    c.dropFunction("fts")
    assert(!c.read(s).columns.contains("sparse"),
      "dropped function output still served on a Loaded collection")
    c.dropField("extra")
    assert(!c.read(s).columns.contains("extra"))
    c.release()
  }

  test("compaction folds deltas and preserves the snapshot") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("cmp"))
    c.insert(s, (0L until 5L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.upsert(s, Seq((2L, 99L, "upd", 1L)).toDF("id", "category", "content", "version"))
    c.delete(s, "id == 4")
    val before = c.read(s).orderBy("id").collect().map(_.toSeq).toSeq
    c.compact(s)
    val after = c.read(s).orderBy("id").collect().map(_.toSeq).toSeq
    assert(before == after)
    assert(c.read(s).filter($"id" === 2).head().getString(2) == "upd")
    assert(c.numEntities(s) == 4)
  }

  test("single compacted base reads skip the merge window (no shuffle)") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("uniqbase"))
    c.insert(s, (0L until 10L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.upsert(s, Seq((3L, 77L, "upd", 1L)).toDF("id", "category", "content", "version"))
    c.delete(s, "id == 9")
    c.compact(s)
    // Post-compaction the collection is one unique-per-pk base: the
    // read plan must be a plain pruned parquet scan — no Window, no
    // Exchange. At 100 TB this is the difference between scanning and
    // hash-shuffling the whole table by PK on every query.
    val plan = c.read(s).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge window not skipped:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(c.read(s).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 9L))
    assert(c.read(s).filter($"id" === 3).head().getString(2) == "upd")
    // A new DML after compaction reintroduces the merge window...
    c.delete(s, "id == 0")
    val plan2 = c.read(s).queryExecution.executedPlan.toString
    assert(plan2.contains("Window"), s"merge window missing with deltas:\n$plan2")
    assert(c.numEntities(s) == 8)
    // ...and the next compaction removes it again.
    c.compact(s)
    val plan3 = c.read(s).queryExecution.executedPlan.toString
    assert(!plan3.contains("Window") && !plan3.contains("Exchange"))
    assert(c.numEntities(s) == 8)
  }

  test("store runs unchanged against a scheme-qualified file:/// root") {
    // The store's path layer is Hadoop FileSystem (StorePath): the
    // same code serves local dirs and hdfs:// / s3a:// URIs. Driving
    // the full DML + compaction + catalog cycle through an explicit
    // file:/// URI proves every path op (list, atomic rename,
    // overwrite-rename, marker write, recursive delete) goes through
    // the Hadoop API — nothing falls back to java.nio semantics.
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      "file://" + Files.createTempDirectory("graft-hfs").toString + "/cat")
    val c = cat.createCollection(simpleDef("hfs"))
    c.insert(s, (0L until 10L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.upsert(s, Seq((3L, 77L, "upd", 1L))
      .toDF("id", "category", "content", "version"))
    c.delete(s, "id == 9")
    assert(c.numEntities(s) == 9)
    assert(c.storageBytes > 0)
    c.compact(s)
    // unique-base marker written + detected through the Hadoop path:
    // post-compaction read is a plain scan, no merge window
    val plan = c.read(s).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge window not skipped:\n$plan")
    assert(c.read(s).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 9L))
    assert(c.read(s).filter($"id" === 3).head().getString(2) == "upd")
    // catalog surface over the URI root
    assert(cat.listCollections() == Seq("hfs"))
    assert(cat.hasCollection("hfs"))
    // persisted index build + drop through the Hadoop path
    c.createIndex(s, IndexDef("category", "INVERTED"))
    assert(c.listIndexes().map(_.field) == Seq("category"))
    c.dropIndex("category")
    cat.dropCollection("hfs")
    assert(!cat.hasCollection("hfs"))
  }

  test("PK-only predicates push below the merge window and stay correct") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("pkpush"))
    c.insert(s, (0L until 20L).map(i => (i, i, s"v0_$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.upsert(s, Seq((5L, 99L, "upd", 1L)).toDF("id", "category", "content", "version"))
    c.delete(s, "id == 7")
    // point lookup sees the upserted version, not the stale row
    val r = c.query(s, "id == 5").collect()
    assert(r.length == 1 && r.head.getString(2) == "upd")
    // deleted pk stays deleted through the pushed path
    assert(c.query(s, "id == 7").isEmpty)
    // range over pk matches the unpushed equivalent
    assert(c.query(s, "id >= 3 and id <= 8").count() ==
      c.read(s).filter($"id" >= 3 && $"id" <= 8).count())
    // the pushed predicate reaches the parquet scan
    val plan = c.query(s, "id == 5").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,5)]"),
      s"pk predicate not pushed:\n$plan")
    // non-pk filters must NOT prefilter (they'd see stale versions)
    val r2 = c.query(s, "category == 5").collect()
    assert(r2.isEmpty, "stale category value resurfaced") // 5 was upserted to 99
    assert(c.query(s, "category == 99").count() == 1)
  }

  test("auto_id ids stay in the batch's space at high input partition counts") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("auto_wide", autoId = true))
    // 200 partitions: monotonically_increasing_id would put partition
    // 128+ ids at >= 2^40, colliding with the NEXT batch's space.
    val df = s.range(0, 2000).repartition(200)
      .select((col("id") % 50).as("category"),
        concat(lit("c"), col("id")).as("content"), lit(0L).as("version"))
    val r1 = c.insert(s, df)
    val r2 = c.insert(s, df)
    assert(r1.count == 2000 && r2.count == 2000)
    val batchSpace = (ids: InsertResult) =>
      ids.ids.select((col("id") / 1099511627776L).cast("long")).distinct().collect()
        .map(_.getLong(0)).toSet
    assert(batchSpace(r1) != batchSpace(r2), "batches must own disjoint id spaces")
    assert(c.numEntities(s) == 4000, "colliding auto_ids merged rows")
  }

  test("bulk insert: ids stay a lazy DataFrame, no unbounded driver collect") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("bulk", autoId = true))
    val n = 1000000L
    val res = c.insert(s, s.range(0, n)
      .select((col("id") % 97).as("category"),
        concat(lit("d"), col("id")).as("content"), lit(0L).as("version")))
    assert(res.count == n)
    // distributed distinct over the id DataFrame — never collected
    assert(res.ids.distinct().count() == n)
    intercept[IllegalArgumentException](res.idSeq(maxRows = 1000))
  }

  test("DML on a loaded collection is visible (cache refresh)") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("loaded"))
    c.insert(s, (0L until 5L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.load(s)
    assert(c.loadState == "Loaded")
    assert(c.numEntities(s) == 5)
    c.insert(s, Seq((10L, 1L, "new", 0L)).toDF("id", "category", "content", "version"))
    assert(c.numEntities(s) == 6, "insert invisible on a Loaded collection")
    c.upsert(s, Seq((10L, 2L, "upd", 1L)).toDF("id", "category", "content", "version"))
    assert(c.read(s).filter($"id" === 10L).head().getString(2) == "upd")
    c.delete(s, "id == 10")
    assert(c.numEntities(s) == 5, "delete invisible on a Loaded collection")
    c.release()
    assert(c.loadState == "NotLoad")
  }

  test("dynamic fields: undeclared columns ingest into _dynamic and filter") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("dynt", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType)), enableDynamicField = true))
    c.insert(s, Seq(
      (1L, 10L, "user_a", 5L), (2L, 20L, "user_b", 9L), (3L, 30L, "user_a", 2L))
      .toDF("id", "category", "Tenant", "score"))
    // read exposes the blob; unknown filter names resolve through it
    assert(c.read(s).columns.contains("_dynamic"))
    assert(c.query(s, "Tenant == \"user_a\"").count() == 2)
    assert(c.query(s, "score >= 5").count() == 2)
    assert(c.query(s, "Tenant == \"user_a\" and score < 3").count() == 1)
    // full upsert replaces the blob; partial update without extras keeps it
    c.upsert(s, Seq((1L, 11L, "user_z", 7L)).toDF("id", "category", "Tenant", "score"))
    assert(c.query(s, "Tenant == \"user_z\"").count() == 1)
    c.upsert(s, Seq((1L, 12L)).toDF("id", "category"), partialUpdate = true)
    assert(c.query(s, "Tenant == \"user_z\" and category == 12").count() == 1)
    // rows without extras carry an empty blob and never match
    c.insert(s, Seq((9L, 90L)).toDF("id", "category"))
    assert(c.query(s, "Tenant == \"user_z\"").count() == 1)
    assert(c.numEntities(s) == 4)
  }

  test("query with Milvus filter string + partition_names") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("qf", partitions = Seq("p0", "p1")))
    c.insert(s, (0L until 8L).map(i => (i, i * 10, s"doc_$i", 0L))
      .toDF("id", "category", "content", "version"))
    assert(c.query(s, "category >= 40").count() == 4)
    assert(c.query(s, "content like \"doc_%\"").count() == 8)
    // pk % 2 routing: p0 = evens
    assert(c.query(s, "category >= 0", partitionNames = Seq("p0")).count() == 4)
    assert(c.query(s, "", outputFields = Seq("id", "content")).columns.toSeq ==
      Seq("id", "content"))
  }

  test("minor compaction folds only the tail: state, seqs, tombstones preserved") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("minor"))
    def deltaDirs() = new java.io.File(
      cat.collectionDir("minor").resolve("data").toString)
      .listFiles().filter(f => f.getName.startsWith("delta_")
        && !retiredNames(f.getParentFile).contains(f.getName))
      .map(_.getName).sorted
    c.insert(s, (0L until 10L).map(i => (i, i, s"c$i", 0L))
      .toDF("id", "category", "content", "version"))
    c.compact(s)
    val baseDir = deltaDirs().head
    // tail: an insert, an upsert over a BASE row, a delete of a BASE row
    c.insert(s, Seq((20L, 20L, "new", 0L))
      .toDF("id", "category", "content", "version"))
    c.upsert(s, Seq((3L, 77L, "upd", 1L))
      .toDF("id", "category", "content", "version"))
    c.delete(s, "id == 9")
    val before = c.read(s).orderBy("id").collect().map(_.toSeq).toSeq
    assert(c.numDeltas == 4)
    c.compactMinor(s)
    // base untouched, tail folded to ONE delta
    assert(deltaDirs().head == baseDir, "minor fold must not rewrite the base")
    assert(c.numDeltas == 2)
    assert(c.read(s).orderBy("id").collect().map(_.toSeq).toSeq == before)
    assert(c.query(s, "id == 3").head().getString(2) == "upd")
    assert(c.query(s, "id == 9").count() == 0, "tombstone must still mask the base row")
    // the merged delta keeps original row seqs and the tombstone ROW
    val mergedRaw = s.read.parquet(
      cat.collectionDir("minor").resolve("data").toString + "/" + deltaDirs()(1))
    assert(mergedRaw.filter(col("_del")).count() == 1,
      "minor fold must keep tombstones (they mask base rows)")
    assert(mergedRaw.select(countDistinct(col("_seq"))).head().getLong(0) >= 3,
      "minor fold must preserve original per-row seqs")
    // LWW still works above the fold
    c.upsert(s, Seq((3L, 88L, "upd2", 2L))
      .toDF("id", "category", "content", "version"))
    assert(c.query(s, "id == 3").head().getString(2) == "upd2")
  }

  test("leveled auto-compaction: small tail folds minor, grown tail folds major") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("lvl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("pad", StringType)),
      properties = Map("compaction.maxDeltas" -> "3",
        "compaction.majorRatio" -> "0.5")))
    def deltaDirs() = new java.io.File(
      cat.collectionDir("lvl").resolve("data").toString)
      .listFiles().filter(f => f.getName.startsWith("delta_")
        && !retiredNames(f.getParentFile).contains(f.getName))
      .map(_.getName).sorted
    val pad = "x" * 200
    // three big batches cross the high-water with no base -> MAJOR
    (0 until 3).foreach { r =>
      c.insert(s, (0L until 500L).map(j => (r * 1000L + j, pad))
        .toDF("id", "pad")): Unit
    }
    assert(c.numDeltas == 1, "first fold must be major (creates the base)")
    val baseDir = deltaDirs().head
    // small tail batches re-cross the high-water -> MINOR, base kept
    (0 until 3).foreach { r =>
      c.insert(s, Seq((9000L + r, "t")).toDF("id", "pad")): Unit
    }
    assert(deltaDirs().head == baseDir,
      "small tail must fold minor — the base is not rewritten")
    assert(c.numDeltas == 2)
    assert(c.numEntities(s) == 1503)
    // a tail bigger than ratio x base -> MAJOR again (fresh base)
    c.insert(s, (0L until 2000L).map(j => (20000L + j, pad))
      .toDF("id", "pad")): Unit
    assert(c.numDeltas == 1, "grown tail must fold major")
    assert(deltaDirs().head != baseDir)
    assert(c.numEntities(s) == 3503)
    // the fresh base serves the fast no-window read path
    val plan = c.read(s).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Exchange"))
  }

  test("auto-compaction folds the delta chain at the configured high-water") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("ac", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("v", LongType)),
      properties = Map("compaction.maxDeltas" -> "5")))
    (0 until 8).foreach { r =>
      c.insert(s, (0L until 10L).map(j => (r * 10L + j, j)).toDF("id", "v"))
    }
    // 8 inserts with maxDeltas=5: the chain folded at least once and
    // never exceeds the high-water; all rows survive the folds.
    assert(c.numDeltas <= 5, s"chain not compacted: ${c.numDeltas} deltas")
    assert(c.numEntities(s) == 80)
    // LWW + tombstones survive compaction
    c.upsert(s, Seq((3L, 999L)).toDF("id", "v"))
    c.delete(s, "id == 7")
    c.compact(s)
    assert(c.numDeltas == 1)
    assert(c.numEntities(s) == 79)
    assert(c.query(s, "id == 3").head().getLong(1) == 999L)
    assert(c.query(s, "id == 7").count() == 0)
    // concurrent DML + auto-compaction: no lost writes, no crashes
    val c2 = cat.createCollection(CollectionDef("ac2", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true)),
      properties = Map("compaction.maxDeltas" -> "4")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      (0 until 16).map { r =>
        pool.submit(new Runnable {
          def run(): Unit =
            c2.insert(s, (0L until 5L).map(j => r * 10L + j).toDF("id")): Unit
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(c2.numEntities(s) == 16 * 5)
  }

  test("many-collections catalog: concurrent creates stay consistent " +
      "(requests_10kplus_collections shape, scaled for test time)") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val n = 200
    // Phase 1: create collections in parallel — catalog metadata ops
    // are O(1) per collection (one meta.json each), no Spark jobs.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      (0 until n).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            cat.createCollection(CollectionDef(f"mc_$i%04d", Seq(
              FieldDef("id", LongType, nullable = false, isPrimary = true),
              FieldDef("v", LongType)))): Unit
          }
        })
      }.foreach(_.get())
      // Phase 2: concurrent inserts into a subset + queries across it.
      val writers = (0 until 20).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val c = cat.collection(f"mc_$i%04d")
            c.insert(s, (0L until 10L).map(j => (i * 100L + j, j))
              .toDF("id", "v")): Unit
          }
        })
      }
      writers.foreach(_.get())
    } finally pool.shutdown()
    val listed = cat.listCollections()
    assert(listed.length == n)
    assert(listed == (0 until n).map(i => f"mc_$i%04d"))
    (0 until 20).foreach { i =>
      assert(cat.collection(f"mc_$i%04d").numEntities(s) == 10)
    }
    assert(cat.collection("mc_0150").numEntities(s) == 0)
    assert(cat.describeCollection("mc_0199").fields.map(_.name) ==
      Seq("id", "v"))
  }

  test("entity-level TTL: expired rows invisible at read, null never " +
      "expires, ttl.field validated") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("ettl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("expire_at", LongType)),
      properties = Map("ttl.field" -> "expire_at")))
    val now = System.currentTimeMillis()
    c.insert(s, Seq(
      (1L, Some(now - 60000L)),  // already expired
      (2L, Some(now + 3600000L)), // expires in an hour
      (3L, None))                 // never expires
      .toDF("id", "expire_at"))
    assert(c.read(s).select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    // time travel past entity 2's expiry
    assert(c.read(s, asOfMillis = Some(now + 7200000L))
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L))
    // validation: undeclared / non-INT64 ttl.field rejected at create
    intercept[IllegalArgumentException](cat.createCollection(
      CollectionDef("bad1", Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true)),
        properties = Map("ttl.field" -> "nope"))))
    intercept[IllegalArgumentException](cat.createCollection(
      CollectionDef("bad2", Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("e", StringType)),
        properties = Map("ttl.field" -> "e"))))
  }

  test("loaded TTL collection keeps an unfrozen expiry clock") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("lttl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("expire_at", LongType)),
      properties = Map("ttl.field" -> "expire_at")))
    val now = System.currentTimeMillis()
    c.insert(s, Seq(
      (1L, Some(now + 1500L)),  // expires mid-test
      (2L, None))               // never expires
      .toDF("id", "expire_at"))
    // load() must NOT pin the snapshot: the TTL filter bakes `now` at
    // assembly, and a pinned snapshot would keep serving row 1 after
    // its expiry with no intervening write to refresh the cache.
    c.load(s)
    assert(c.read(s).select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    Thread.sleep(2000L)
    assert(c.read(s).select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L), "loaded TTL collection served an expired row")
    c.release()
    // And altering read-semantics properties drops a pinned snapshot:
    // a plain collection loaded, then given a ttl.field, must apply it.
    val p = cat.createCollection(CollectionDef("pttl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("expire_at", LongType))))
    p.insert(s, Seq((1L, Some(now - 60000L)), (2L, None))
      .toDF("id", "expire_at"))
    p.load(s)
    assert(p.read(s).count() == 2)
    cat.alterCollectionProperties("pttl", Map("ttl.field" -> "expire_at"))
    assert(cat.collection("pttl").read(s).select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L),
      "property change did not invalidate the pinned snapshot")
  }

  test("TEXT_EMBEDDING function: deterministic encode served and " +
      "searchable by query text; provider/dim validation") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("emb"))
    c.insert(s, Seq(
      (1L, 1L, "spark streaming engine", 0L),
      (2L, 2L, "vector search index", 0L),
      (3L, 3L, "completely unrelated words here", 0L))
      .toDF("id", "category", "content", "version"))
    c.addFunction(FunctionDef("enc", "TEXT_EMBEDDING",
      Seq("content"), Seq("emb_vec"), Map("dim" -> "8")))
    // served as a derived column, exact parity with the driver mirror
    val served = c.read(s).filter($"id" === 2L)
      .select("emb_vec").head().getSeq[Float](0)
    assert(served == graft.functions.TextEmbedding
      .encodeLocal("vector search index", 8))
    assert(served.length == 8)
    // query text routes through the bound function: the doc with the
    // query's own text is distance 0 -> rank 1
    val hits = graft.operators.CollectionSearch.searchByQueryText(
      s, c, "emb_vec", "vector search index", 2,
      searchParams = Map("metric_type" -> "L2"))
    assert(hits.select("id").head().getLong(0) == 2L)
    // validation: no dim, remote provider, non-text input
    intercept[IllegalArgumentException](c.addFunction(
      FunctionDef("e2", "TEXT_EMBEDDING", Seq("content"), Seq("o"))))
    intercept[IllegalArgumentException](c.addFunction(
      FunctionDef("e3", "TEXT_EMBEDDING", Seq("content"), Seq("o"),
        Map("dim" -> "8", "provider" -> "openai"))))
    intercept[IllegalArgumentException](c.addFunction(
      FunctionDef("e4", "TEXT_EMBEDDING", Seq("category"), Seq("o"),
        Map("dim" -> "8"))))
    // params survive the catalog round-trip (meta.json)
    assert(cat.collection("emb").definition.functions.head
      .params("dim") == "8")
    // an ANN index composes with the function output: the build reads
    // the derived column, and query-text search routes through it
    c.createIndex(s, IndexDef("emb_vec", "IVF_FLAT",
      Some("L2"), Map("nlist" -> "2")))
    val indexed = graft.operators.CollectionSearch.searchByQueryText(
      s, c, "emb_vec", "vector search index", 1,
      searchParams = Map("metric_type" -> "L2", "nprobe" -> "2"))
    assert(indexed.select("id").head().getLong(0) == 2L)
    c.dropFunction("enc")
    assert(!c.read(s).columns.contains("emb_vec"))
    // dropping the function also invalidates the index on its output
    assert(c.definition.indexes.isEmpty)
  }

  test("malformed function/index params fail at create time, not first read") {
    val cat = freshCatalog()
    def textDef(name: String, fns: Seq[FunctionDef]) =
      CollectionDef(name, Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("txt", StringType)), functions = fns)
    // TEXT_EMBEDDING via createCollection (the SchemaMatrix YAML route)
    // bypasses addFunction — missing/garbage dim must still fail NOW
    intercept[IllegalArgumentException](cat.createCollection(textDef("f1",
      Seq(FunctionDef("e", "TEXT_EMBEDDING", Seq("txt"), Seq("v"))))))
    intercept[IllegalArgumentException](cat.createCollection(textDef("f2",
      Seq(FunctionDef("e", "TEXT_EMBEDDING", Seq("txt"), Seq("v"),
        Map("dim" -> "abc"))))))
    intercept[IllegalArgumentException](cat.createCollection(textDef("f3",
      Seq(FunctionDef("e", "NOT_A_TYPE", Seq("txt"), Seq("v"))))))
    // non-numeric index params fail at declaration on both routes
    intercept[IllegalArgumentException](cat.createCollection(
      CollectionDef("ix1", Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("loc", StringType)),
        indexes = Seq(IndexDef("loc", "RTREE", None,
          Map("cell_size" -> "big"))))))
    val c = cat.createCollection(simpleDef("okc"))
    intercept[IllegalArgumentException](
      c.createIndex(IndexDef("content", "BM25", None, Map("nlist" -> "x"))))
    // well-formed params still pass
    c.createIndex(IndexDef("content", "BM25", None, Map("nlist" -> "8")))
  }

  test("salvage preserves explicit partitions and auto_id pks") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    // explicit partitions: restored rows land in the feed's _part, not
    // wherever default routing would re-place them
    val c = cat.createCollection(simpleDef("sv_p", partitions = Seq("p0", "p1")))
    c.insert(s, Seq((1L, 1L, "a", 0L)).toDF("id", "category", "content", "version"),
      partition = Some("p1"))
    c.insert(s, Seq((2L, 1L, "b", 0L)).toDF("id", "category", "content", "version"),
      partition = Some("p0"))
    val r = cat.createCollection(simpleDef("sv_p_r", partitions = Seq("p0", "p1")))
    assert(r.restoreFrom(s, c.changeFeed(s)) == 2L)
    assert(r.read(s, partitionNames = Seq("p1")).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(r.read(s, partitionNames = Seq("p0")).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // auto_id: the source's generated pks survive the rebuild unchanged
    val a = cat.createCollection(simpleDef("sv_a", autoId = true))
    a.insert(s, Seq((1L, "x", 0L), (2L, "y", 0L))
      .toDF("category", "content", "version"))
    val ids = a.read(s).select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 2)
    val ar = cat.createCollection(simpleDef("sv_a_r", autoId = true))
    assert(ar.restoreFrom(s, a.changeFeed(s)) == 2L)
    assert(ar.read(s).select("id").collect().map(_.getLong(0)).toSet == ids)
  }

  test("change feed: cursor-incremental pull, delete ops, " +
      "compaction resync semantics") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("cf"))
    c.insert(s, Seq((1L, 1L, "a", 0L), (2L, 1L, "b", 0L))
      .toDF("id", "category", "content", "version"))
    val cursor = c.committedSeq
    c.insert(s, Seq((3L, 2L, "c", 0L)).toDF("id", "category", "content", "version"))
    c.delete(s, "id == 1")
    // incremental pull: exactly the post-cursor changes, in seq order
    val feed = c.changeFeed(s, cursor)
      .select("id", "_op").orderBy("_seq", "id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(feed.toSeq == Seq((3L, "upsert"), (1L, "delete")))
    // caught-up consumer sees nothing
    assert(c.changeFeed(s, c.committedSeq).isEmpty)
    // from zero: full history (2 inserts + 1 insert + 1 tombstone)
    assert(c.changeFeed(s).count() == 4)
    // tombstones carry only the PK
    val del = c.changeFeed(s, cursor).filter($"_op" === "delete").head()
    assert(del.isNullAt(del.fieldIndex("content")))
    // salvage: an empty collection rebuilt from the full feed equals
    // the source's live state (delete resolved away, one Spark job)
    val r = cat.createCollection(simpleDef("cf_restore"))
    assert(r.restoreFrom(s, c.changeFeed(s)) == 2L)
    assert(r.read(s).select("id", "content").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet ==
      c.read(s).select("id", "content").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet)
    intercept[IllegalArgumentException](r.restoreFrom(s, c.changeFeed(s)))
    // compaction folds history: a stale cursor resyncs from the base
    c.compact(s)
    val folded = c.changeFeed(s).select("id", "_op").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(folded == Set((2L, "upsert"), (3L, "upsert")))
    val extSrc = java.nio.file.Files.createTempDirectory("cf-ext")
    Seq((9L, 1L, "x", 0L)).toDF("id", "category", "content", "version")
      .write.mode("overwrite").parquet(extSrc.toString)
    intercept[IllegalArgumentException](
      cat.createExternalCollection(s, simpleDef("cfx"), extSrc.toString)
        .changeFeed(s))
  }

  test("applyFeed replays incremental CDC windows onto a live replica") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val src = cat.createCollection(simpleDef("cdc_src"))
    val rep = cat.createCollection(simpleDef("cdc_rep"))
    src.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L), (3L, 30L, "c", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // initial rebuild, then cursor
    rep.restoreFrom(s, src.changeFeed(s)): Unit
    val cur1 = src.committedSeq
    // window 2: update key 2, delete key 1, add key 4 — multiple commits
    src.upsert(s, Seq((2L, 21L, "b2", 1L))
      .toDF("id", "category", "content", "version")): Unit
    src.delete(s, "id == 1")
    src.insert(s, Seq((4L, 40L, "d", 0L))
      .toDF("id", "category", "content", "version")): Unit
    val applied = rep.applyFeed(s, src.changeFeed(s, cur1))
    assert(applied == 3, s"3 change rows in the window, got $applied")
    // replica == source, row for row
    def snap(c: Collection) = c.read(s)
      .select("id", "category", "content")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(snap(rep) == snap(src))
    assert(snap(rep).map(_._1) == Seq(2L, 3L, 4L))
    // idempotent-ish: replaying an already-applied window keeps LWW
    // state (same winners re-asserted under a newer seq)
    rep.applyFeed(s, src.changeFeed(s, cur1)): Unit
    assert(snap(rep) == snap(src))
  }

  test("promoteReplica: catch-up promote, force promote, standby guard") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val src = cat.createCollection(simpleDef("p_src"))
    val rep = cat.createCollection(simpleDef("p_rep"))
    cat.createAlias("serving", "p_src")
    src.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    rep.restoreFrom(s, src.changeFeed(s)): Unit
    // restoreFrom RECORDS the cursor itself — the natural flow must
    // not replay full history because nobody set a property by hand
    assert(rep.definition.properties.get("cdc.cursor")
      .contains(src.committedSeq.toString))
    // un-replicated tail on the source
    src.insert(s, Seq((3L, 30L, "c", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // catch-up promote replays the tail, then swaps the alias
    val applied = cat.promoteReplica(s, "p_src", "p_rep", "serving")
    assert(applied == 1L)
    assert(cat.listAliases()("serving") == "p_rep")
    assert(cat.collection("serving").read(s).count() == 3)
    // demoted source denies writes (split-brain guard) but still reads
    val ex = intercept[IllegalArgumentException](
      src.insert(s, Seq((9L, 90L, "x", 0L))
        .toDF("id", "category", "content", "version")))
    assert(ex.getMessage.contains("standby"))
    assert(src.read(s).count() == 3)
    // ...and stays snapshot/backup-able: preserving the demoted
    // primary's state is exactly the post-failover salvage need
    val bdir = java.nio.file.Files
      .createTempDirectory("graft-standby-bk").toString
    assert(src.backupTo(s, bdir) == 3L)
    // the promoted replica serves writes through the alias
    cat.collection("serving").insert(s, Seq((4L, 40L, "d", 0L))
      .toDF("id", "category", "content", "version")): Unit
    assert(cat.collection("serving").read(s).count() == 4)

    // FORCE promote: un-replayed tail is deliberately lost
    val src2 = cat.createCollection(simpleDef("f_src"))
    val rep2 = cat.createCollection(simpleDef("f_rep"))
    cat.createAlias("serving2", "f_src")
    src2.insert(s, Seq((1L, 10L, "a", 0L))
      .toDF("id", "category", "content", "version")): Unit
    rep2.restoreFrom(s, src2.changeFeed(s)): Unit
    src2.insert(s, Seq((2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    assert(cat.promoteReplica(s, "f_src", "f_rep", "serving2",
      force = true) == 0L)
    assert(cat.collection("serving2").read(s).count() == 1,
      "force promote must not replay the tail")
    intercept[IllegalArgumentException](
      cat.promoteReplica(s, "f_src", "f_src", "x"))
  }

  test("user registry: CRUD, persistence, resource-group attribution") {
    val s = spark
    val cat = freshCatalog()
    cat.createUser("ana", "ingest pipeline owner")
    graft.workload.ResourceGroups.create("rg_analytics")
    cat.createUser("raj", "analyst", Some("rg_analytics"))
    assert(cat.describeUser("ana") ==
      cat.UserDef("ana", "ingest pipeline owner", None))
    assert(cat.listUsers().map(_.name) == Seq("ana", "raj"))
    // alter: description only, binding kept; then rebind
    cat.alterUser("raj", description = Some("senior analyst"))
    assert(cat.describeUser("raj") ==
      cat.UserDef("raj", "senior analyst", Some("rg_analytics")))
    cat.alterUser("ana", resourceGroup = Some(Some("rg_analytics")))
    assert(cat.describeUser("ana").resourceGroup.contains("rg_analytics"))
    // registry survives a fresh catalog handle over the same root
    val cat2 = new Catalog(cat.root)
    assert(cat2.listUsers().map(_.name) == Seq("ana", "raj"))
    // runAs attributes jobs to the user's pool
    val pool = cat.runAs(s, "raj") {
      s.sparkContext.getLocalProperty("spark.scheduler.pool")
    }
    assert(pool == "rg_analytics")
    assert(s.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
    // validation
    intercept[IllegalArgumentException](cat.createUser("ana"))
    intercept[IllegalArgumentException](cat.describeUser("nobody"))
    intercept[IllegalArgumentException](cat.alterUser("nobody"))
    cat.dropUser("ana")
    assert(cat.listUsers().map(_.name) == Seq("raj"))
    intercept[IllegalArgumentException](cat.dropUser("ana"))
    // ResourceGroups is JVM-global: leave no residue for other suites
    graft.workload.ResourceGroups.drop("rg_analytics")
  }

  test("access revocation fences reads, writes, and feeds; clearing restores") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("kms"))
    c.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    assert(c.read(s).count() == 2)
    val snap = c.createSnapshot()
    // revoke: reads, writes and the change feed all deny — and the
    // property hot-applies (no reload, no new handle)
    cat.alterCollectionProperties("kms", Map("access.revoked" -> "true"))
    val er = intercept[IllegalArgumentException](c.read(s).count())
    assert(er.getMessage.contains("revoked"))
    // a PRE-revocation snapshot must not bypass the fence
    intercept[IllegalArgumentException](c.readSnapshot(s, snap).count())
    intercept[IllegalArgumentException](c.createSnapshot())
    intercept[IllegalArgumentException](
      c.insert(s, Seq((3L, 30L, "c", 0L))
        .toDF("id", "category", "content", "version")))
    intercept[IllegalArgumentException](c.changeFeed(s))
    intercept[IllegalArgumentException](c.delete(s, "id == 1"))
    // metadata stays readable (describe is not data access)
    assert(cat.describeCollection("kms").name == "kms")
    // restore (key re-granted): data intact, no rebuild
    cat.alterCollectionProperties("kms", Map("access.revoked" -> ""))
    assert(c.read(s).count() == 2)
    c.insert(s, Seq((3L, 30L, "c", 0L))
      .toDF("id", "category", "content", "version")): Unit
    assert(c.read(s).count() == 3)
  }

  test("default_value: add-field retro-applies, omitted inserts fill, explicit values win") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("dfv"))
    c.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // add_collection_field with a default: rows written BEFORE the
    // field existed read the default (the workload's add-field shape)
    c.addField(FieldDef("score", LongType, nullable = false,
      defaultValue = Some("7")))
    assert(c.read(s).select("id", "score").as[(Long, Long)]
      .collect().toMap == Map(1L -> 7L, 2L -> 7L))
    // a batch OMITTING the defaulted (non-nullable!) field is accepted
    c.insert(s, Seq((3L, 30L, "c", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // a batch providing it keeps its explicit value
    c.insert(s, Seq((4L, 40L, "d", 0L, 99L))
      .toDF("id", "category", "content", "version", "score")): Unit
    assert(c.read(s).select("id", "score").as[(Long, Long)]
      .collect().toMap ==
      Map(1L -> 7L, 2L -> 7L, 3L -> 7L, 4L -> 99L))
    // filters see the default (a query on the added field works)
    assert(c.query(s, "score == 7").count() == 3)
    // survives the catalog round-trip and a compaction
    assert(new Catalog(cat.root).describeCollection("dfv")
      .fields.find(_.name == "score").flatMap(_.defaultValue)
      .contains("7"))
    c.compact(s)
    assert(c.read(s).filter($"id" === 3L).select("score").as[Long]
      .head() == 7L)
    // validation: bad literal, non-atomic type, defaultless
    // non-nullable add, primary-key default
    intercept[IllegalArgumentException](c.addField(
      FieldDef("bad", LongType, defaultValue = Some("zero"))))
    // width-exact: an out-of-range INT default would cast to null at
    // read — "no default" — so it must fail at declaration
    intercept[IllegalArgumentException](c.addField(
      FieldDef("bad", org.apache.spark.sql.types.IntegerType,
        defaultValue = Some("3000000000"))))
    intercept[IllegalArgumentException](c.addField(
      FieldDef("bad", org.apache.spark.sql.types.ByteType,
        defaultValue = Some("300"))))
    intercept[IllegalArgumentException](c.addField(
      FieldDef("bad", org.apache.spark.sql.types.ArrayType(LongType),
        defaultValue = Some("[]"))))
    intercept[IllegalArgumentException](c.addField(
      FieldDef("bad", LongType, nullable = false)))
    intercept[IllegalArgumentException](cat.createCollection(
      CollectionDef("dfv2", Seq(FieldDef("id", LongType,
        nullable = false, isPrimary = true, defaultValue = Some("1"))))))
  }

  test("backup/restore round-trips data, partitions, schema, indexes, functions") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("bk", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType)),
      partitions = Seq("p0", "p1")))
    c.insert(s, Seq((1L, 10L, "hello world"), (2L, 20L, "spark engine"))
      .toDF("id", "category", "content"), partition = Some("p0")): Unit
    c.insert(s, Seq((3L, 30L, "third doc"))
      .toDF("id", "category", "content"), partition = Some("p1")): Unit
    c.delete(s, "id == 2") // tombstone must NOT travel into the backup
    c.createIndex(IndexDef("category", "INVERTED"))
    c.addFunction(FunctionDef("fts", "BM25", Seq("content"), Seq("sparse")))
    val dest = java.nio.file.Files.createTempDirectory("graft-bk").toString
    assert(c.backupTo(s, dest) == 2L, "visible rows only")
    // backups don't pin storage
    assert(c.listSnapshots().isEmpty)
    // restore into a DIFFERENT catalog root (the DR shape)
    val cat2 = freshCatalog()
    val r = cat2.restoreBackup(s, dest, "bk_restored")
    assert(r.read(s).select("id", "category").as[(Long, Long)]
      .collect().sorted.toSeq == Seq((1L, 10L), (3L, 30L)))
    // partition placement survived: scoped reads prune correctly
    assert(r.query(s, "", partitionNames = Seq("p0")).count() == 1)
    assert(r.query(s, "", partitionNames = Seq("p1")).count() == 1)
    // schema extras round-tripped: index declared, function serves
    assert(r.listIndexes().map(_.field) == Seq("category"))
    assert(r.read(s).columns.contains("sparse"))
    assert(r.read(s).filter($"id" === 1L).select("sparse")
      .head().getMap[Int, Double](0).size == 2)
    // the restored collection is independent and writable
    r.insert(s, Seq((9L, 90L, "post-restore"))
      .toDF("id", "category", "content"), partition = Some("p0")): Unit
    assert(r.read(s).count() == 3 && c.read(s).count() == 2)
    // a fenced source restores writable
    cat.alterCollectionProperties("bk", Map("access.revoked" -> "true"))
    intercept[IllegalArgumentException](c.read(s).count())
    val r2 = cat2.restoreBackup(s, dest, "bk2")
    assert(r2.read(s).count() == 2)
    intercept[IllegalArgumentException](
      cat2.restoreBackup(s, dest + "/nope", "x"))
  }

  test("incremental backup: feed window round-trips through parquet into applyFeed") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val cat2 = freshCatalog()
    val src = cat.createCollection(simpleDef("ib"))
    src.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // full backup + cursor
    val full = java.nio.file.Files.createTempDirectory("graft-ibf").toString
    src.backupTo(s, full): Unit
    val cursor = src.committedSeq
    // post-backup window: update, delete, insert
    src.upsert(s, Seq((2L, 21L, "b2", 1L))
      .toDF("id", "category", "content", "version")): Unit
    src.delete(s, "id == 1")
    src.insert(s, Seq((3L, 30L, "c", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // incremental = the feed window dumped to parquet (survives the
    // file round-trip: _op/_seq/_part are plain columns)
    val inc = java.nio.file.Files.createTempDirectory("graft-ibi").toString
    src.changeFeed(s, cursor).write.mode("overwrite").parquet(inc)
    // DR: restore the full backup, then apply the increment
    val r = cat2.restoreBackup(s, full, "ib_dr")
    assert(r.read(s).count() == 2, "full backup state first")
    val applied = r.applyFeed(s, s.read.parquet(inc))
    assert(applied == 3)
    def snap(c: Collection) = c.read(s)
      .select("id", "category", "content")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(snap(r) == snap(src), "restored + increment == source")
  }

  test("vacuumStaging sweeps only OLD crash debris; reads never see staging dirs") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("vs"))
    c.insert(s, Seq((1L, 10L, "a", 0L), (2L, 20L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    // plant crash debris: a staging dir a killed writer left behind
    val dataDir = new java.io.File(cat.root, "vs/data")
    val debris = new java.io.File(dataDir, "_staging_delta_000000000999")
    assert(debris.mkdirs())
    java.nio.file.Files.writeString(
      debris.toPath.resolve("part-zzz.parquet"), "junk")
    // invisible to reads
    assert(c.read(s).count() == 2)
    // young debris survives an age-gated sweep (live writer safety)
    assert(c.vacuumStaging(olderThanMs = 3600 * 1000L).isEmpty)
    assert(debris.exists)
    // stale debris is swept; data unaffected
    val swept = c.vacuumStaging(olderThanMs = 0L)
    assert(swept == Seq("_staging_delta_000000000999"), swept.toString)
    assert(!debris.exists)
    assert(c.read(s).count() == 2)
    // committed deltas are never candidates
    assert(dataDir.listFiles().exists(_.getName.startsWith("delta_")))
  }

  test("clustering compaction: key-clustered base files, pushed key filter, results invariant") {
    val s = spark
    import s.implicits._
    // clustering.key must reference a declared, orderable scalar
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true)),
        properties = Map("clustering.key" -> "nope")).validate()
    }
    intercept[IllegalArgumentException] {
      CollectionDef("bad", Seq(
        FieldDef("a", LongType, nullable = false, isPrimary = true),
        FieldDef("v", ArrayType(FloatType), dim = Some(4))),
        properties = Map("clustering.key" -> "v")).validate()
    }
    val cat = freshCatalog()
    val c = cat.createCollection(CollectionDef("clust", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("k", LongType),
      FieldDef("payload", StringType)),
      properties = Map("clustering.key" -> "k",
        "clustering.partitions" -> "8")))
    // Insertion order interleaves keys (multiplicative hash), so the
    // pre-compaction layout has every file spanning ~the whole key
    // domain; only the clustered rewrite can narrow per-file ranges.
    val rows = s.range(20000).select(col("id"),
      pmod(col("id") * 2654435761L, lit(1000L)).as("k"),
      concat(lit("p"), col("id")).as("payload"))
    c.insert(s, rows)
    c.delete(s, "id % 100 == 7")
    c.upsert(s, Seq((5L, 4242L, "five")).toDF("id", "k", "payload"))
    def q(): Set[Long] = c.read(s).filter(col("k") === 42)
      .select("id").collect().map(_.getLong(0)).toSet
    val before = q()
    c.compact(s)
    assert(q() == before, "clustered compaction changed query results")
    assert(c.read(s).filter(col("k") === 4242).select("payload")
      .collect().map(_.getString(0)).toSeq == Seq("five"))
    // Physical clustering: per-file key ranges are non-overlapping
    // except at range-partitioner boundaries (equal keys co-locate).
    // Per-file key ranges in ONE job (grouped on input_file_name).
    def fileRanges(dataDir: java.io.File): Seq[(Long, Long)] = {
      val base = dataDir.listFiles()
        .filter(_.getName.startsWith("delta_")).maxBy(_.getName)
      s.read.parquet(base.toString)
        .groupBy(input_file_name().as("f"))
        .agg(min("k").as("lo"), max("k").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    val ranges = fileRanges(new java.io.File(cat.root, "clust/data"))
    assert(ranges.size > 1, s"need >1 base file, got ${ranges.size}")
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(lo2 >= hi,
        s"overlapping clustered file ranges: [..,$hi] then [$lo2,..]")
    case _ => ()
    }
    // The compacted base is unique (no LWW window), so the key
    // predicate reaches the parquet scan as a pushed filter.
    val plan = c.read(s).filter(col("k") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,42)"),
      s"key filter not pushed to the clustered scan:\n$plan")
    // alter_collection_properties re-validates: a bad clustering key
    // fails at the DDL call, not on the first compact consuming it —
    // and a legitimate alter makes an UNclustered collection cluster
    // on its next major fold.
    intercept[IllegalArgumentException] {
      cat.alterCollectionProperties("clust",
        Map("clustering.key" -> "nope"))
    }
    val c2 = cat.createCollection(CollectionDef("clust2", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("k", LongType))))
    c2.insert(s, s.range(4000).select(col("id"),
      pmod(col("id") * 2654435761L, lit(100L)).as("k")))
    cat.alterCollectionProperties("clust2",
      Map("clustering.key" -> "k", "clustering.partitions" -> "4"))
    c2.compact(s)
    val ranges2 = fileRanges(new java.io.File(cat.root, "clust2/data"))
    assert(ranges2.size > 1)
    ranges2.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(lo2 >= hi, "post-alter compaction did not cluster")
    case _ => ()
    }
    // Clearing the key alone turns clustering off — a leftover
    // clustering.partitions is inert, not an error.
    cat.alterCollectionProperties("clust2", Map("clustering.key" -> ""))
    c2.insert(s, Seq((999999L, 1L)).toDF("id", "k")): Unit
    c2.compact(s)
    assert(c2.read(s).count() == 4001)
    // dropField of a consumed property field fails at the DDL call.
    intercept[IllegalArgumentException] { c.dropField("k") }
  }

  test("dropPartition deletes only entities whose visible row lives in it") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(
      simpleDef("dp_vis", partitions = Seq("p0", "p1")))
    // pk 1: older copy explicitly placed in p0, superseded by a later
    // write in p1 — the entity's visible home is p1.
    c.insert(s, Seq((1L, 1L, "old", 0L))
      .toDF("id", "category", "content", "version"),
      partition = Some("p0")): Unit
    c.insert(s, Seq((1L, 1L, "new", 1L))
      .toDF("id", "category", "content", "version"),
      partition = Some("p1")): Unit
    // pk 2: visible in p0.
    c.insert(s, Seq((2L, 2L, "doomed", 0L))
      .toDF("id", "category", "content", "version"),
      partition = Some("p0")): Unit
    c.dropPartition(s, "p0")
    // pk 2's visible row lived in p0 → entity deleted. pk 1's p0 copy
    // was already superseded — dropping p0 must NOT tombstone the
    // entity p1 is serving (the partition-scoped LWW read listed it as
    // "live in p0" and the old victims derivation killed it globally).
    assert(c.read(s).select("id", "content").as[(Long, String)]
      .collect().toSet == Set((1L, "new")))
  }

  test("backup/restore and CDC apply preserve the TTL insert clock") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    val c = cat.createCollection(simpleDef("ts_src", ttl = Some(3600)))
    c.insert(s, Seq((1L, 1L, "a", 0L), (2L, 2L, "b", 0L))
      .toDF("id", "category", "content", "version")): Unit
    val srcTs = c.changeFeed(s).select("_ts")
      .collect().map(_.getLong(0)).toSet
    Thread.sleep(20) // guarantee a restamp-with-now would differ
    // Cold backup → restore: the backup copies `_ts`, restoreFrom
    // keeps it — the restored collection expires rows when the SOURCE
    // would have, not TTL-from-restore-time.
    val dest = java.nio.file.Files.createTempDirectory("graft-ts-bk").toString
    assert(c.backupTo(s, dest) == 2L)
    val r = cat.restoreBackup(s, dest, "ts_rest")
    assert(r.changeFeed(s).select("_ts").collect().map(_.getLong(0)).toSet
      == srcTs, "restore restamped the TTL clock")
    // CDC rebuild: the feed carries `_ts`; the replica must keep it —
    // a restamping replica serves rows the primary already expired,
    // for up to a full TTL period after every apply.
    val rep = cat.createCollection(simpleDef("ts_rep", ttl = Some(3600)))
    rep.restoreFrom(s, c.changeFeed(s)): Unit
    assert(rep.changeFeed(s).select("_ts").collect().map(_.getLong(0)).toSet
      == srcTs, "CDC apply restamped the TTL clock")
    // Expiry semantics agree at the same absolute horizon on all three.
    val horizon = srcTs.max + 3600 * 1000L + 1
    assert(c.read(s, Seq.empty, Some(horizon)).count() == 0)
    assert(r.read(s, Seq.empty, Some(horizon)).count() == 0)
    assert(rep.read(s, Seq.empty, Some(horizon)).count() == 0)
    assert(rep.read(s).count() == 2)
  }
}
