package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

import java.nio.file.{Files, Paths}

/** Resumable batched scan — the reference's `query_iterator` with
  * `iterator_cp_file` checkpointing
  * (milvus_client/query_iterator.py:104-163).
  *
  * Keyset pagination on the PK (each batch is `pk > lastSeen ORDER BY
  * pk LIMIT batch`), so a page costs one pruned range scan instead of
  * an OFFSET re-scan. The checkpoint file persists (lastPk, a hash of
  * the filter + table identity); a new iterator pointed at the same
  * file resumes after the last completed batch, across JVM restarts.
  * Checkpoint writes are atomic (temp file + move), mirroring the
  * reference's crash-safe cp-file behavior.
  */
object QueryIterator {

  /** Collection-level iterator — the reference's
    * `query_iterator(partition_names=..., expr=...)` shape
    * (milvus_client/query_iterator.py:104-163, with month-named
    * partition scans at :109): the underlying scan is the collection's
    * partition-scoped merge-on-read view, so every keyset page is a
    * directory-pruned range scan of ONLY the named partitions (deltas
    * are `partitionBy(_part)`; partition pruning is plan-asserted in
    * OperatorsSpec/StoreSpec).
    */
  def forCollection(
      spark: org.apache.spark.sql.SparkSession,
      coll: graft.store.Collection,
      batchSize: Int,
      filter: Option[Column] = None,
      partitionNames: Seq[String] = Seq.empty,
      checkpointFile: Option[String] = None,
      outputFields: Seq[String] = Seq("*")): QueryIterator =
    new QueryIterator(coll.read(spark, partitionNames),
      coll.definition.primaryField.name, batchSize, filter,
      checkpointFile, outputFields)
}

final class QueryIterator(
    df: DataFrame,
    pkCol: String,
    batchSize: Int,
    filter: Option[Column] = None,
    checkpointFile: Option[String] = None,
    outputFields: Seq[String] = Seq("*")) {

  private val filterSig: String = {
    val f = filter.map(_.toString).getOrElse("")
    // Table identity = semantic hash of the analyzed plan (canonicalized
    // — stable for the same source/projection regardless of expression
    // ids), so a checkpoint written against one collection cannot
    // silently resume a scan of a different one that happens to share
    // the (filter, pk, batch) shape.
    val tableId = df.queryExecution.analyzed.semanticHash()
    CheckpointFile.signature(s"$tableId|$f|$pkCol|$batchSize")
  }

  private var lastPk: Option[Any] = loadCheckpoint()
  private var exhausted = false

  /** Next batch of rows (empty when the scan is complete). Advances and
    * checkpoints only after the batch is fully materialized.
    */
  def next(): Seq[Row] = {
    if (exhausted) return Seq.empty
    val rows = fetchPage(batchSize)
    if (rows.isEmpty) { exhausted = true; Seq.empty }
    else {
      lastPk = Some(rows.last.get(rows.last.fieldIndex(pkCol)))
      saveCheckpoint()
      rows
    }
  }

  def hasNext: Boolean = !exhausted

  /** Distributed export of the remaining scan — the engine-native fast
    * path when resumability is NOT needed: one parallel range-filtered
    * write instead of driver-funneled iterator pages. Emits a single
    * `part_00000` directory so re-reads glob the same way as the
    * iterator export. Returns the number of rows exported.
    */
  def exportParquetDirect(outDir: String): Long = {
    var out = filter.foldLeft(df)(_ filter _)
    lastPk.foreach(pk => out = out.filter(col(pkCol) > lit(pk)))
    if (outputFields != Seq("*"))
      out = out.select((outputFields :+ pkCol).distinct.map(col): _*)
    out.write.mode("overwrite").parquet(f"$outDir/part_${0}%05d")
    exhausted = true
    df.sparkSession.read.parquet(f"$outDir/part_${0}%05d").count()
  }

  /** Export the remaining scan to parquet, `batchesPerFile` iterator
    * batches per output file (reference S17,
    * query_iterator.py:225-260: iterator batches → parquet every 100
    * batches; the driver funnel is the reference's own client-side
    * shape — use [[exportParquetDirect]] when resumability isn't
    * needed). Returns the number of rows exported.
    */
  def exportParquet(outDir: String, batchesPerFile: Int = 100): Long = {
    val spark = df.sparkSession
    // The page loop below re-plans `pk > last ORDER BY pk LIMIT n` once
    // per batch; pin the source scan for the export's duration so N
    // pages cost ONE parquet read + in-memory top-k's instead of N
    // source scans. Iterator semantics (checkpointing, resume) are
    // unchanged — this only caches the immutable snapshot being paged.
    val alreadyCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (!alreadyCached)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try exportParquetLoop(spark, outDir, batchesPerFile)
    finally if (!alreadyCached) df.unpersist(blocking = false)
  }

  private def exportParquetLoop(
      spark: org.apache.spark.sql.SparkSession,
      outDir: String, batchesPerFile: Int): Long = {
    var fileNo = 0
    var total = 0L
    def flush(buffer: Seq[Row]): Unit = if (buffer.nonEmpty) {
      val schema = buffer.head.schema
      spark.createDataFrame(
        spark.sparkContext.parallelize(buffer, 1), schema)
        .write.mode("overwrite")
        .parquet(f"$outDir/part_$fileNo%05d")
      fileNo += 1
    }
    // One keyset page per OUTPUT FILE, not per iterator batch: a file's
    // worth of rows (batchesPerFile x batchSize) is fetched in a single
    // top-k job and sliced into iterator batches locally — the file
    // layout, row order, and per-batch checkpoint progression are
    // byte-identical to the batch-at-a-time loop, at 1/batchesPerFile
    // the job count. A short page means the scan is exhausted (keyset
    // LIMIT returns everything left).
    require(batchSize > 0, "batchSize must be positive")
    require(batchesPerFile > 0, "batchesPerFile must be positive")
    // Long product capped to Int.MaxValue: a huge batchSize x
    // batchesPerFile must degrade to big-but-valid pages, not overflow
    // into limit(negative) / a zero product's infinite loop.
    val groupRows =
      math.min(batchSize.toLong * batchesPerFile, Int.MaxValue.toLong).toInt
    var done = false
    while (!done) {
      val group = fetchPage(groupRows)
      group.grouped(batchSize).foreach { slice =>
        total += slice.length
        lastPk = Some(slice.last.get(slice.last.fieldIndex(pkCol)))
        saveCheckpoint()
      }
      flush(group)
      done = group.length < groupRows
    }
    exhausted = true
    total
  }

  /** One keyset page of up to `n` rows after `lastPk`, projected. */
  private def fetchPage(n: Int): Seq[Row] = {
    val page = QueryOps.keysetPage(df, pkCol, lastPk, n, filter)
    val projected =
      if (outputFields == Seq("*")) page
      else page.select((outputFields :+ pkCol).distinct.map(col): _*)
    projected.collect().toSeq
  }

  def close(): Unit = ()

  /** Drop the checkpoint (after a fully consumed scan). */
  def clearCheckpoint(): Unit =
    checkpointFile.foreach(f => Files.deleteIfExists(Paths.get(f)))

  private def saveCheckpoint(): Unit = checkpointFile.foreach { f =>
    CheckpointFile.save(f, filterSig,
      Seq("lastPk" -> CheckpointFile.pkJson(lastPk.get)))
  }

  private def loadCheckpoint(): Option[Any] = checkpointFile.flatMap { f =>
    CheckpointFile.load(f, filterSig, "query").flatMap { body =>
      "\"lastPk\": (.+)}".r.findFirstMatchIn(body)
        .map(m => CheckpointFile.parsePk(m.group(1).trim))
    }
  }
}
