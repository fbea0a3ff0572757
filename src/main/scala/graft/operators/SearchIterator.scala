package graft.operators

import graft.store.Collection
import org.apache.spark.sql.{Row, SparkSession}

import java.nio.file.{Files, Paths}

/** Resumable search-iterator handle with `iterator_cp_file`
  * checkpointing — the crash-resume contract the reference applies to
  * BOTH iterator kinds (milvus_client/query_iterator.py:104-163; the
  * search iterator shares the cp-file plumbing): the exact
  * `(score, pk)` keyset cursor is persisted after each fully
  * materialized page, atomically (temp file + move), so a NEW handle
  * pointed at the same file resumes after the last completed page —
  * across JVM restarts or a crash mid-scan. Pages come from
  * [[CollectionSearch.searchIteratorAny]], so every vector family
  * (dense / binary / sparse, banded or not) resumes identically.
  *
  * The checkpoint carries a signature of (collection identity, field,
  * query, batchSize, filter, params), so a file written for one scan
  * cannot silently resume a different one — same guard as
  * [[QueryIterator]].
  */
final class SearchIterator(
    spark: SparkSession,
    coll: Collection,
    vecField: String,
    query: Any,
    batchSize: Int,
    filterExpr: String = "",
    searchParams: Map[String, String] = Map.empty,
    outputFields: Seq[String] = Seq.empty,
    partitionNames: Seq[String] = Seq.empty,
    checkpointFile: Option[String] = None) {

  private val pkName = coll.definition.primaryField.name

  // Iteration order: similarity metrics page score-DESCENDING,
  // distance metrics ASCENDING — must match the keyset direction the
  // underlying iterator routes use, or the persisted cursor would
  // re-serve or skip rows on resume. The direction is derived from
  // the QUERY FAMILY first, exactly like the routes themselves: the
  // binary route always pages Hamming-ascending (it ignores
  // metric_type) and the sparse route always pages IP-descending —
  // trusting a caller-supplied metric_type there would flip the
  // handle's sort against the engine's and duplicate rows across
  // pages. Only the dense route resolves metric_type/index metadata.
  private val resolvedMetric: String = query match {
    case _: Array[Byte] => "HAMMING"
    case _: Map[_, _] => "IP"
    case _ =>
      val declared = coll.definition.indexes.find(_.field == vecField)
        .flatMap(_.metricType)
      searchParams.get("metric_type").orElse(declared)
        .getOrElse("COSINE").toUpperCase
  }
  // ONE direction predicate shared with the engine routes — a second
  // divergent copy here could silently flip the persisted cursor's
  // sort against the engine's keyset and duplicate/skip on resume.
  private val simLike: Boolean =
    CollectionSearch.simLikeMetric(resolvedMetric)

  private val sig: String = {
    val qRepr = query match {
      case m: Map[_, _] =>
        m.toSeq.map { case (k, v) => s"$k:$v" }.sorted.mkString(",")
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: Seq[_] => s.mkString(",")
      case other => String.valueOf(other)
    }
    // resolvedMetric is part of the identity: the same field can be
    // re-indexed under a different metric between crash and resume,
    // flipping the iteration direction — a cursor persisted for one
    // direction must NOT be applied to the other.
    CheckpointFile.signature(
      Seq(coll.catalog.root.toString, coll.name, vecField, qRepr,
        batchSize.toString, filterExpr, resolvedMetric,
        searchParams.toSeq.sorted.mkString(";"),
        partitionNames.mkString(",")).mkString("|"))
  }

  private var cursor: Option[(Double, Any)] = loadCheckpoint()
  private var exhausted = false

  def hasNext: Boolean = !exhausted

  /** Next page of up to `batchSize` rows in exact score order (empty
    * when the scan is complete). Advances and checkpoints only after
    * the page is fully materialized — a crash mid-page re-serves the
    * whole page on resume, never half of it.
    */
  def next(): Seq[Row] = {
    if (exhausted) return Seq.empty
    val page = CollectionSearch.searchIteratorAny(spark, coll, vecField,
        query, batchSize, after = cursor, filterExpr, searchParams,
        outputFields, partitionNames)
      .collect().toSeq
    if (page.isEmpty) { exhausted = true; Seq.empty }
    else {
      val ordered = page.sortWith { (r1, r2) =>
        val s1 = r1.getDouble(r1.fieldIndex("score"))
        val s2 = r2.getDouble(r2.fieldIndex("score"))
        if (s1 != s2) { if (simLike) s1 > s2 else s1 < s2 }
        else pkLt(r1.get(r1.fieldIndex(pkName)),
          r2.get(r2.fieldIndex(pkName)))
      }
      val last = ordered.last
      cursor = Some((last.getDouble(last.fieldIndex("score")),
        last.get(last.fieldIndex(pkName))))
      saveCheckpoint()
      ordered
    }
  }

  // Typed pk tiebreak (NOT zero-padded strings — a fixed-width render
  // of a NEGATIVE long sorts backwards lexicographically, -10 after
  // -5): must match the engine routes' `col(pk).asc` order exactly or
  // the persisted cursor drifts within a tied score block.
  private def pkLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: String, y: String) => x < y
    case _ => String.valueOf(a) < String.valueOf(b)
  }

  /** Drop the checkpoint (after a fully consumed scan). */
  def clearCheckpoint(): Unit =
    checkpointFile.foreach(f => Files.deleteIfExists(Paths.get(f)))

  private def saveCheckpoint(): Unit = checkpointFile.foreach { f =>
    val (s, p) = cursor.get
    // A non-finite cursor score (NaN/Infinity from a degenerate
    // vector) would serialize as bare NaN/Infinity — invalid JSON —
    // and on resume lit(NaN) makes every keyset comparison false, so
    // the scan would silently read as complete. Fail loudly instead.
    require(java.lang.Double.isFinite(s),
      s"cannot checkpoint a non-finite cursor score ($s) for pk $p — " +
        "the resumed keyset would silently match nothing")
    // Double.toString is shortest-round-trip exact in Java, so the
    // resumed cursor score cannot drift an ulp from the in-memory one.
    CheckpointFile.save(f, sig,
      Seq("score" -> s.toString, "pk" -> CheckpointFile.pkJson(p)))
  }

  private def loadCheckpoint(): Option[(Double, Any)] =
    checkpointFile.flatMap { f =>
      CheckpointFile.load(f, sig, "search").flatMap { body =>
        val score = "\"score\": ([^,]+),".r.findFirstMatchIn(body)
          .map(_.group(1).trim.toDouble)
        val pk = "\"pk\": (.+)}".r.findFirstMatchIn(body)
          .map(m => CheckpointFile.parsePk(m.group(1).trim))
        for (sc <- score; pv <- pk) yield (sc, pv)
      }
    }
}
