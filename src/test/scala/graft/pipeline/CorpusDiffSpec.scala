package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff: per-doc verdicts, changelog roll-up, fingerprint
  * (not text) through the join.
  */
class CorpusDiffSpec extends SparkSpec {

  test("verdicts: added / removed / changed / unchanged, each id once") {
    val s = spark
    import s.implicits._
    val oldc = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta"))
      .toDF("doc_id", "text")
    val newc = Seq(
      (1L, "alpha"),          // unchanged
      (2L, "bravo edited"),   // changed
      (4L, "delta"),          // unchanged
      (9L, "echo"))           // added; 3 removed
      .toDF("doc_id", "text")
    val v = CorpusDiff.diff(oldc, newc, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 9L -> "added"))

    val sum = CorpusDiff.summary(
        CorpusDiff.diff(oldc, newc, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("identical snapshots diff to all-unchanged; empty new to all-removed") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(CorpusDiff.diff(c, c, "doc_id", "text")
      .collect().forall(_.getString(1) == "unchanged"))
    val empty = c.filter(lit(false))
    assert(CorpusDiff.diff(c, empty, "doc_id", "text")
      .collect().forall(_.getString(1) == "removed"))
    assert(CorpusDiff.diff(empty, c, "doc_id", "text")
      .collect().forall(_.getString(1) == "added"))
  }

  test("null text is a value: compared null-safely, never read as absence") {
    val s = spark
    import s.implicits._
    val oldc = Seq((1L, null.asInstanceOf[String]), (2L, null), (3L, "x"),
      (4L, null)).toDF("doc_id", "text")
    val newc = Seq((1L, null.asInstanceOf[String]), (2L, "now text"),
      (3L, null)).toDF("doc_id", "text")
    val v = CorpusDiff.diff(oldc, newc, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed"))
  }

  test("plan shape: the join carries digests, not document text") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, "some very long document body")).toDF("doc_id", "text")
    val plan = CorpusDiff.diff(c, c, "doc_id", "text")
      .queryExecution.optimizedPlan
    // the join's children must not output the raw text column
    val join = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    join.children.foreach { ch =>
      assert(!ch.output.map(_.name).contains("text"),
        s"join side still carries text: ${ch.output.map(_.name)}")
    }
  }
}
