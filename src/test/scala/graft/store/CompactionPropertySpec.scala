package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** Property tests for fold invariance: a RANDOM interleaving of
  * insert / upsert / delete-by-filter batches with minor, major and
  * CLUSTERED major folds must leave the visible row set equal to a
  * driver-side last-writer-wins replay of the same operations — after
  * every fold, not just at the end. This is the associativity claim
  * the LSM design note makes (LWW(base ∪ LWW(tail) ∪ later) =
  * LWW(base ∪ tail ∪ later)) exercised over randomized inputs, plus
  * the clustered rewrite's results-invariance on top.
  */
class CompactionPropertySpec extends SparkSpec {

  private sealed trait Op
  private case class Insert(rows: Seq[(Long, Long, String)]) extends Op
  private case class Upsert(rows: Seq[(Long, Long, String)]) extends Op
  private case class DeleteMod(m: Long, r: Long) extends Op
  private case object Minor extends Op
  private case object Major extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> (for {
      n <- Gen.choose(5, 40)
      base <- Gen.choose(0L, 400L)
      tag <- Gen.alphaLowerStr.map(_.take(4))
    } yield Insert((0 until n).map(i =>
      (base + i, (base + i) % 13, s"i$tag$i")))),
    3 -> (for {
      n <- Gen.choose(3, 25)
      base <- Gen.choose(0L, 400L)
      tag <- Gen.alphaLowerStr.map(_.take(4))
    } yield Upsert((0 until n).map(i =>
      (base + i * 2, (base + i) % 7, s"u$tag$i")))),
    2 -> (for {
      m <- Gen.choose(3L, 9L)
      r <- Gen.choose(0L, 2L)
    } yield DeleteMod(m, r)),
    1 -> Gen.const(Minor),
    2 -> Gen.const(Major),
  )

  test("random DML + minor/major/clustered folds: reads always equal the LWW model") {
    val s = spark
    import s.implicits._
    val cat = new Catalog(
      Files.createTempDirectory("graft-cprop").toString)
    (0 until 3).foreach { trial =>
      // trial 0: plain; 1: clustered; 2: clustered + pinned buckets
      val props: Map[String, String] = trial match {
        case 0 => Map.empty
        case 1 => Map("clustering.key" -> "k")
        case _ => Map("clustering.key" -> "k",
          "clustering.partitions" -> "5")
      }
      val c = cat.createCollection(CollectionDef(s"cp$trial", Seq(
        FieldDef("id", LongType, nullable = false, isPrimary = true),
        FieldDef("k", LongType),
        FieldDef("txt", StringType)), properties = props))
      val model = scala.collection.mutable.Map.empty[Long, (Long, String)]
      def check(where: String): Unit = {
        val got = c.read(s).select("id", "k", "txt").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        assert(got == model.toMap,
          s"trial $trial $where: engine has ${got.size} rows, " +
            s"model ${model.size}; diff keys: " +
            s"${(got.keySet diff model.keySet) ++ (model.keySet diff got.keySet)}")
      }
      val ops = (0 until 12).map(i =>
        opGen.pureApply(Gen.Parameters.default, Seed(trial * 100L + i)))
      ops.zipWithIndex.foreach { case (op, oi) =>
        op match {
          case Insert(rows) =>
            // pk collisions WITHIN one batch resolve to the latest row
            // (batch order = seq order); model mirrors with toMap's
            // last-wins.
            c.insert(s, rows.toDF("id", "k", "txt")): Unit
            rows.foreach { case (id, k, t) => model(id) = (k, t) }
          case Upsert(rows) =>
            c.upsert(s, rows.toDF("id", "k", "txt"))
            rows.foreach { case (id, k, t) => model(id) = (k, t) }
          case DeleteMod(m, r) =>
            c.delete(s, s"k % $m == $r")
            model.filterInPlace { case (_, (k, _)) => k % m != r }
          case Minor =>
            c.compactMinor(s); check(s"after minor at op $oi")
          case Major =>
            c.compact(s); check(s"after major at op $oi")
        }
      }
      c.compact(s)
      check("after the final major fold")
    }
  }

  test("altering clustering.key re-lays the next major fold on the new key") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-reclust")
    val cat = new Catalog(root.toString)
    val c = cat.createCollection(CollectionDef("rl", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("knum", LongType),
      FieldDef("kstr", StringType)),
      properties = Map("clustering.key" -> "knum",
        "clustering.partitions" -> "8")))
    // knum and kstr orders DISAGREE non-monotonically (kstr is a
    // modular-permutation scramble of knum — a reversal would keep
    // knum-contiguous files kstr-contiguous too), so a base laid on
    // one key provably violates non-overlap on the other — the
    // re-fold must physically re-lay, not keep the old layout.
    c.insert(s, (0L until 4000L).map(i =>
      (i, i % 97, f"s${(i % 97) * 31 % 97}%03d")).toDF("id", "knum", "kstr"))
    def ranges(key: String): Seq[(String, String)] = {
      val base = new java.io.File(root.toFile, "rl/data").listFiles()
        .filter(_.getName.startsWith("delta_")).maxBy(_.getName)
      // lpad so the numeric key's string render sorts numerically
      // ("5" -> "0005" before "0010"); the fixed-width kstr values are
      // unchanged by the pad.
      s.read.parquet(base.toString)
        .groupBy(org.apache.spark.sql.functions.input_file_name())
        .agg(org.apache.spark.sql.functions.lpad(
            org.apache.spark.sql.functions.min(col(key)).cast("string"),
            4, "0").as("lo"),
          org.apache.spark.sql.functions.lpad(
            org.apache.spark.sql.functions.max(col(key)).cast("string"),
            4, "0").as("hi"))
        .collect().map(r => (r.getString(1), r.getString(2))).sorted.toSeq
    }.ensuring(_.forall { case (lo, hi) => lo.length <= 4 && hi.length <= 4 },
      "fixture key domain outgrew the 4-char pad (lpad TRUNCATES longer " +
        "renders) — widen the pad or the check goes quietly wrong")
    def nonOverlapping(rs: Seq[(String, String)]): Boolean =
      rs.size > 1 && rs.sliding(2).forall {
        case Seq((_, hi), (lo2, _)) => lo2 >= hi
        case _ => true
      }
    c.compact(s)
    assert(nonOverlapping(ranges("knum")),
      "first fold must range-cluster on knum")
    assert(!nonOverlapping(ranges("kstr")),
      "fixture broken: a knum layout should NOT be clustered on kstr")
    cat.alterCollectionProperties("rl", Map("clustering.key" -> "kstr"))
    // The altered key only takes effect at the NEXT major fold; force
    // one (a no-delta compact is a no-op, so write a tiny delta).
    c.insert(s, Seq((999999L, 0L, "s000")).toDF("id", "knum", "kstr")): Unit
    c.compact(s)
    assert(nonOverlapping(ranges("kstr")),
      "re-fold after alter must range-cluster on the NEW key")
    assert(c.read(s).count() == 4001L)
  }
}
