package graft.workload

import graft.SparkSpec
import graft.operators.CollectionSearch
import graft.store._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.util.concurrent.{Executors, TimeUnit}

/** Catalog-scale concurrency (reference
  * `requests_10kplus_collections.py`: a thread pool creating, loading
  * and searching many collections against one server). Scaled to spec
  * size: 24 collections built by 6 concurrent workers over ONE
  * file-backed catalog, then cross-collection listing, description and
  * search — meta.json atomicity and the per-catalog mutateDef lock are
  * what is under test.
  */
class ManyCollectionsSpec extends SparkSpec {

  test("concurrent create+insert+search over many collections in one catalog") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(Files.createTempDirectory("graft-many").toString)
    val n = 24
    val pool = Executors.newFixedThreadPool(6)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until n).foreach { i =>
      pool.execute { () =>
        try {
          val c = cat.createCollection(CollectionDef(s"mc_$i", Seq(
            FieldDef("id", LongType, nullable = false, isPrimary = true),
            FieldDef("emb", ArrayType(FloatType), dim = Some(4)),
            FieldDef("grp", LongType))))
          val rows = (0 until 20).map { j =>
            (j.toLong, Seq(j * 0.1f, i * 0.01f, 1f, 0f), j.toLong % 3)
          }.toDF("id", "emb", "grp")
          c.insert(s, rows): Unit
          c.createIndex(IndexDef("emb", "IVF_FLAT", Some("L2"),
            Map("nlist" -> "2")))
        } catch { case t: Throwable => errors.add(t) }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, s"concurrent builds failed: ${errors.peek()}")

    // Catalog metadata survived 24 concurrent creators.
    val names = cat.listCollections()
    assert(names.length == n && names.forall(_.startsWith("mc_")))
    names.foreach { nm =>
      val d = cat.describeCollection(nm)
      assert(d.fields.length == 3 && d.indexes.length == 1)
    }
    // Every collection reads and searches consistently.
    val counts = names.map(nm => cat.collection(nm).numEntities(s))
    assert(counts.forall(_ == 20L), s"inconsistent counts: $counts")
    val hits = CollectionSearch.search(s, cat.collection("mc_7"), "emb",
      Seq(0.5f, 0.07f, 1f, 0f), k = 3,
      searchParams = Map("metric_type" -> "L2"))
      .select("id").collect().map(_.getLong(0))
    assert(hits.length == 3 && hits.contains(5L))
  }
}
