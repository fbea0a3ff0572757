package graft.sources

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

class ObjectStoreIngestSpec extends SparkSpec {

  /** Fixture layout mirroring the loader's three prefixes. */
  private def fixture(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-oss").toString
    // 3 single-file feature "objects", 4 rows each, ids 0..11
    (0 until 3).foreach { f =>
      (0 until 4).map(r => (f * 4 + r).toLong)
        .map(i => (i, Seq.fill(4)(i.toFloat)))
        .toDF("id", "feature").coalesce(1)
        .write.parquet(s"$root/test/part$f.parquet")
    }
    // 2 location objects: valid, invalid, and null WKT
    Seq("POINT (1.5 2.5)", "LINESTRING (0 0, 1 1)", null, "POINT(3 4)")
      .toDF("location").coalesce(1)
      .write.parquet(s"$root/nyc-taxi/loc0.parquet")
    Seq("POINT (9 9)").toDF("location").coalesce(1)
      .write.parquet(s"$root/nyc-taxi/loc1.parquet")
    // scalars: extra columns plus a 'location' column that must be skipped
    Seq((7L, "cat_a", "POINT (0 0)"), (8L, "cat_b", "POINT (0 0)"))
      .toDF("score", "category", "location").coalesce(1)
      .write.parquet(s"$root/other_scalars/sc0.parquet")
    root
  }

  test("lists parquet objects recursively, sorted") {
    val root = fixture()
    val files = ObjectStoreIngest.listParquetFiles(spark, root, "test/")
    assert(files.length == 3)
    assert(files == files.sorted)
    assert(files.forall(_.endsWith(".parquet")))
    assert(ObjectStoreIngest.listParquetFiles(spark, root, "missing/").isEmpty)
  }

  test("batch plan: density-aware grouping and cycling of smaller sources") {
    val root = fixture()
    val p = ObjectStoreIngest.plan(spark, root, "test/", "nyc-taxi/",
      "other_scalars/", featureFilesPerBatch = 2)
    assert(p.totalBatches == 2) // 3 files, 2 per batch
    assert(p.featureBatch(0).length == 2 && p.featureBatch(1).length == 1)
    assert(p.locationBatch(0) != p.locationBatch(1),
      "two location files, one per batch")
    assert(p.locationBatch(2) == p.locationBatch(0), "cycles when exhausted")
    assert(p.scalarsBatch(0) == p.scalarsBatch(1), "single scalars file cycles")
    assert(p.batchInfo("feature_batches") == 2)
    assert(p.batchInfo("location_files") == 2)
  }

  test("WKT validation: point kept, non-point/invalid/null fall back deterministically") {
    val s = spark
    import s.implicits._
    val out = Seq("POINT (1.5 2.5)", "point( 3 4 )", "LINESTRING (0 0, 1 1)",
      "POINT (x y)", null)
      .toDF("w").select(ObjectStoreIngest.wktPoint(col("w")).as("v"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("POINT (1.5 2.5)"))
    assert(out(1).contains("point( 3 4 )"), "case/space preserved, validated upper")
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("mergeBatch: cycled joins, WKT fallback, scalars merged minus location") {
    val root = fixture()
    val p = ObjectStoreIngest.plan(spark, root, "test/", "nyc-taxi/",
      "other_scalars/", featureFilesPerBatch = 2)
    val m = ObjectStoreIngest.mergeBatch(spark, p, 0, nowMillis = 1234L)
    assert(m.count() == 8) // 2 feature files x 4 rows
    assert(m.columns.toSet ==
      Set("id", "feature", "timestamp", "url", "device_id", "location",
        "score", "category"))
    val rows = m.orderBy(col("id").cast("long")).collect()
    // location file 0 row 0 is a valid point; row 1 is LINESTRING -> fallback
    assert(rows(0).getAs[String]("location") == "POINT (1.5 2.5)")
    assert(rows(1).getAs[String]("location").startsWith("POINT (-74."),
      "invalid WKT must fall back to the deterministic mock point")
    // scalars cycle by index: row 0 -> score 7, row 1 -> score 8, row 2 -> 7
    assert(rows(0).getAs[Long]("score") == 7L)
    assert(rows(1).getAs[Long]("score") == 8L)
    assert(rows(2).getAs[Long]("score") == 7L)
    assert(rows(0).getAs[String]("url") == "https://example.com/data/0")
    assert(rows.forall(_.getAs[Long]("timestamp") == 1234L))
    // required-column validation
    val bad = Plans(root)
    intercept[IllegalArgumentException](
      ObjectStoreIngest.mergeBatch(spark, bad, 0))
  }

  private def Plans(root: String) = ObjectStoreIngest.Plan(
    featureFiles =
      ObjectStoreIngest.listParquetFiles(spark, root, "other_scalars/"),
    locationFiles = Seq.empty, scalarsFiles = Seq.empty)

  test("retry wrapper: transient failures retried with backoff, then rethrow") {
    var calls = 0
    val (v, attempts) = ObjectStoreIngest.withRetry(maxRetries = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(v == 42 && attempts == 2)
    intercept[RuntimeException] {
      ObjectStoreIngest.withRetry(maxRetries = 1, backoffMs = 1) {
        throw new RuntimeException("permanent")
      }
    }
  }

  test("end-to-end ingest into a dynamic collection") {
    val s = spark
    val root = fixture()
    val cat = new Catalog(Files.createTempDirectory("graft-oss-cat").toString)
    val c = cat.createCollection(CollectionDef("horizon", Seq(
      FieldDef("id", StringType, nullable = false, isPrimary = true),
      FieldDef("feature", ArrayType(FloatType), dim = Some(4)),
      FieldDef("timestamp", LongType),
      FieldDef("url", StringType),
      FieldDef("device_id", StringType),
      FieldDef("location", StringType)), enableDynamicField = true))
    val p = ObjectStoreIngest.plan(spark, root, "test/", "nyc-taxi/",
      "other_scalars/", featureFilesPerBatch = 2)
    val stats = ObjectStoreIngest.ingest(s, c, p, nowMillis = 99L)
    assert(stats.batches == 2 && stats.rows == 12 && stats.retries == 0)
    assert(c.numEntities(s) == 12)
    // scalar extras land in the dynamic blob and filter
    assert(c.query(s, "category == \"cat_a\"").count() == 6)
    // every row has a POINT location (valid or fallback)
    assert(c.read(s).filter(col("location").startsWith("POINT")).count() == 12)
  }
}
