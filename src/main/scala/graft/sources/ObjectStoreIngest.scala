package graft.sources

import graft.store.Collection
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Object-store bulk ingestion — the Spark-native re-expression of the
  * reference's Horizon OSS loader
  * (horizonPoc/insert_horizon_from_oss.py): list parquet objects under
  * per-source prefixes, group them into data-density-aware file
  * batches (:99-116), cycle the smaller location/scalars sources
  * against the feature batch by row index (:358,381), validate WKT
  * points with a deterministic fallback (:144-166,365-377), and insert
  * chunk-by-chunk with retry + fail-stop (:440-477).
  *
  * The store URI is anything the Hadoop filesystem layer resolves —
  * `file://` here (the sandbox has no cloud credentials), `s3a://` /
  * `oss://` / `abfs://` in a real deployment with the scheme's
  * credentials configured on the SparkSession (e.g.
  * `spark.hadoop.fs.s3a.access.key` / `.secret.key`, endpoint for
  * OSS-compatible stores). Listing, reads, and the ingest path are
  * scheme-agnostic; nothing below assumes a local filesystem.
  *
  * Scale note: the reference funnels pandas frames through the client;
  * here each batch stays a distributed DataFrame end-to-end — the scan
  * reads only the batch's files, the cycling joins broadcast the small
  * sources, and the collection write is Spark's parallel parquet
  * commit.
  */
object ObjectStoreIngest {

  /** Sorted parquet object keys under `root/prefix` (recursive),
    * mirroring list_parquet_files (:61-71).
    */
  def listParquetFiles(spark: SparkSession, root: String,
      prefix: String): Seq[String] = {
    val rootPath = new HPath(root, prefix)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val it = fs.listFiles(rootPath, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet"))
          buf += f.getPath.toString
      }
      buf.result().sorted
    }
  }

  /** Data-density-aware batch plan (BatchDataProcessor:99-131): the
    * feature source drives the batch count; location/scalars cycle
    * when exhausted.
    */
  final case class Plan(
      featureFiles: Seq[String],
      locationFiles: Seq[String],
      scalarsFiles: Seq[String],
      featureFilesPerBatch: Int = 5,
      locationFilesPerBatch: Int = 1,
      scalarsFilesPerBatch: Int = 1) {

    require(featureFilesPerBatch > 0)

    def totalBatches: Int =
      (featureFiles.length + featureFilesPerBatch - 1) / featureFilesPerBatch

    def featureBatch(i: Int): Seq[String] =
      featureFiles.slice(i * featureFilesPerBatch,
        math.min((i + 1) * featureFilesPerBatch, featureFiles.length))

    /** Cycle a smaller source across batches (:246-251,:297-302). */
    private def cycled(files: Seq[String], perBatch: Int, i: Int): Seq[String] =
      if (files.isEmpty) Seq.empty
      else {
        val nb = (files.length + perBatch - 1) / perBatch
        val j = i % nb
        files.slice(j * perBatch,
          math.min((j + 1) * perBatch, files.length))
      }

    def locationBatch(i: Int): Seq[String] =
      cycled(locationFiles, locationFilesPerBatch, i)
    def scalarsBatch(i: Int): Seq[String] =
      cycled(scalarsFiles, scalarsFilesPerBatch, i)

    /** get_batch_info (:132-143). */
    def batchInfo: Map[String, Int] = Map(
      "feature_files" -> featureFiles.length,
      "feature_batches" -> totalBatches,
      "location_files" -> locationFiles.length,
      "scalars_files" -> scalarsFiles.length,
      "feature_files_per_batch" -> featureFilesPerBatch,
      "scalars_files_per_batch" -> scalarsFilesPerBatch,
      "location_files_per_batch" -> locationFilesPerBatch)
  }

  def plan(spark: SparkSession, root: String,
      featurePrefix: String, locationPrefix: String = "",
      scalarsPrefix: String = "",
      featureFilesPerBatch: Int = 5): Plan = Plan(
    featureFiles = listParquetFiles(spark, root, featurePrefix),
    locationFiles =
      if (locationPrefix.isEmpty) Seq.empty
      else listParquetFiles(spark, root, locationPrefix),
    scalarsFiles =
      if (scalarsPrefix.isEmpty) Seq.empty
      else listParquetFiles(spark, root, scalarsPrefix),
    featureFilesPerBatch = featureFilesPerBatch)

  /** Validated WKT point or null (parse_wkt_point:144-166): POINT with
    * two numeric coordinates, original spacing preserved.
    */
  def wktPoint(c: Column): Column =
    when(upper(trim(c)).rlike(
      "^POINT\\s*\\(\\s*-?[0-9]+(\\.[0-9]+)?\\s+-?[0-9]+(\\.[0-9]+)?(\\s+-?[0-9]+(\\.[0-9]+)?)*\\s*\\)$"),
      trim(c))

  /** Deterministic fallback point near the reference's mock NYC box
    * (:365-377 used random.uniform; randomness would break the
    * idempotence bulk loads need, so the offset derives from the row
    * index instead).
    */
  private def fallbackPoint(idx: Column): Column =
    concat(lit("POINT ("),
      format_number(lit(-74.0) + (pmod(idx, lit(101L)) - 50L) * 0.004, 4),
      lit(" "),
      format_number(lit(40.7) + (pmod(idx, lit(89L)) - 44L) * 0.004, 4),
      lit(")"))

  /** Stable 0-based row index in file/row order (the positional `i` the
    * reference cycles with). zipWithIndex is one extra job — a
    * write-path cost, not a query-path one.
    */
  private def withIndex(df: DataFrame, name: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(name, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** One scan per object, indexed and offset by the preceding objects'
    * row counts (parquet footer metadata, no data scan), so the
    * positional index follows OBJECT order exactly like the
    * reference's sequential reads — a single multi-file Spark scan
    * orders its splits by size, not name.
    */
  private def readIndexed(spark: SparkSession, files: Seq[String],
      cols: Seq[Column], idxName: String): DataFrame = {
    val counts = files.map(f => spark.read.parquet(f).count())
    val offsets = counts.scanLeft(0L)(_ + _)
    files.zip(offsets).map { case (f, off) =>
      withIndex(spark.read.parquet(f).select(cols: _*), idxName)
        .withColumn(idxName, col(idxName) + lit(off))
    }.reduce(_ union _)
  }

  /** Merge one batch (merge_batch_data:325-415): feature rows drive;
    * location and scalars attach by cycled row index; invalid/missing
    * WKT falls back deterministically; scalar columns merge except
    * `location` and already-present fields.
    */
  def mergeBatch(spark: SparkSession, p: Plan, batchIdx: Int,
      nowMillis: Long = System.currentTimeMillis()): DataFrame = {
    val fFiles = p.featureBatch(batchIdx)
    require(fFiles.nonEmpty, s"no feature files for batch $batchIdx")
    val f = spark.read.parquet(fFiles: _*)
    require(f.columns.contains("id") && f.columns.contains("feature"),
      s"missing required columns id and feature in feature batch $batchIdx " +
        s"(available: ${f.columns.mkString(", ")})")
    val fi = readIndexed(spark, fFiles, Seq(col("id"), col("feature")), "_idx")
    var merged = fi.select(
      col("id").cast("string").as("id"),
      col("feature"),
      lit(nowMillis).as("timestamp"),
      concat(lit("https://example.com/data/"), col("_idx").cast("string")).as("url"),
      concat(lit("DV"),
        (pmod(col("_idx"), lit(900L)) + 100L).cast("string")).as("device_id"),
      col("_idx"))

    val lFiles = p.locationBatch(batchIdx)
    if (lFiles.nonEmpty) {
      val l = spark.read.parquet(lFiles: _*)
      if (l.columns.contains("location")) {
        val li = readIndexed(spark, lFiles,
          Seq(col("location").as("_loc")), "_lidx")
        val n = li.count()
        merged = merged
          .join(broadcast(li), pmod(col("_idx"), lit(n)) === col("_lidx"), "left")
          .withColumn("location",
            coalesce(wktPoint(col("_loc")), fallbackPoint(col("_idx"))))
          .drop("_loc", "_lidx")
      } else merged = merged.withColumn("location", fallbackPoint(col("_idx")))
    } else merged = merged.withColumn("location", fallbackPoint(col("_idx")))

    val sFiles = p.scalarsBatch(batchIdx)
    if (sFiles.nonEmpty) {
      val sc = spark.read.parquet(sFiles: _*)
      val keep = sc.columns.filterNot(c =>
        c == "location" || merged.columns.contains(c))
      if (keep.nonEmpty) {
        val si = readIndexed(spark, sFiles, keep.map(col).toSeq, "_sidx")
        val n = si.count()
        merged = merged
          .join(broadcast(si), pmod(col("_idx"), lit(n)) === col("_sidx"), "left")
          .drop("_sidx")
      }
    }
    merged.drop("_idx")
  }

  final case class IngestStats(batches: Int, rows: Long, retries: Int)

  /** Retry with linear backoff; rethrows after `maxRetries` failures
    * (the reference fail-stops a batch that cannot be inserted,
    * :469-473 — silent partial loads are worse than a loud stop).
    */
  private[sources] def withRetry[T](maxRetries: Int, backoffMs: Long)
      (f: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      try return (f, attempt)
      catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Ingest `maxBatches` (or all) file batches into a collection,
    * each merge+insert retried with backoff. Undeclared merged columns
    * flow to `_dynamic` when the collection enables dynamic fields,
    * matching the loader's open schema.
    */
  def ingest(spark: SparkSession, coll: Collection, p: Plan,
      maxBatches: Option[Int] = None, maxRetries: Int = 2,
      backoffMs: Long = 100L,
      nowMillis: Long = System.currentTimeMillis()): IngestStats = {
    val n = maxBatches.map(math.min(_, p.totalBatches)).getOrElse(p.totalBatches)
    var rows = 0L
    var retries = 0
    (0 until n).foreach { i =>
      val (res, att) = withRetry(maxRetries, backoffMs) {
        coll.insert(spark, mergeBatch(spark, p, i, nowMillis))
      }
      rows += res.count
      retries += att
    }
    IngestStats(n, rows, retries)
  }
}
