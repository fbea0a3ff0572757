package graft.operators

import graft.SparkSpec
import graft.store.{Catalog, CollectionDef, FieldDef, IndexDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** Property tests for the search-iterator keyset contract across all
  * three vector families: over randomly generated corpora built from
  * SMALL discrete value sets (so score ties are everywhere and the
  * (score, pk) cursor tiebreak carries the whole ordering), pages of a
  * random batch size must concatenate to EXACTLY the true global
  * order — no gaps, no overlaps, no re-ranks — and resuming from an
  * arbitrary mid-stream cursor must reproduce exactly the suffix.
  * All fixture arithmetic is integer-exact in doubles, so driver-side
  * expected orders equal the engine's codegen'd scores bit-for-bit.
  * (Drives scalacheck Gen directly — the scalatestplus bridge isn't
  * available offline, same pattern as ExprPropertySpec.)
  */
class IteratorPropertySpec extends SparkSpec {

  private lazy val cat =
    new Catalog(Files.createTempDirectory("graft-itprop").toString)
  private var n = 0
  private def freshName(): String = { n += 1; s"itp$n" }

  private case class DenseRow(pk: Long, vec: Seq[Float])

  private val denseCorpus: Gen[(List[DenseRow], Seq[Float], String, Int)] =
    for {
      size <- Gen.choose(30, 90)
      // values from {-2..2}: L2 and IP collide constantly
      vecs <- Gen.listOfN(size, Gen.listOfN(4,
        Gen.choose(-2, 2).map(_.toFloat)))
      q <- Gen.listOfN(4, Gen.choose(-2, 2).map(_.toFloat))
      metric <- Gen.oneOf("L2", "IP")
      batch <- Gen.choose(3, 17)
    } yield (vecs.zipWithIndex.map { case (v, i) =>
      // pk = (3i mod size)*1000 + i: injective for size < 1000 (i is
      // the residue mod 1000), non-monotone so insertion order never
      // matches the pk tiebreak order.
      DenseRow((i.toLong * 3 % size) * 1000 + i, v)
    }, q, metric, batch)

  private def l2(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) =>
      (x.toDouble - y) * (x.toDouble - y) }.sum)
  private def ip(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  /** Page through an iterator to exhaustion; returns pk sequence.
    * Also asserts the page-size guarantee: every page but the last is
    * FULL — a keyset that starves a page mid-stream (filters applied
    * after the cut, off-by-one cursor bounds) would show here.
    */
  private def drain(
      page: Option[(Double, Any)] => Array[org.apache.spark.sql.Row],
      resumeAt: Option[(Double, Any)] = None): Seq[Long] = {
    var cursor: Option[(Double, Any)] = resumeAt
    val sizes = Seq.newBuilder[Int]
    val out = Seq.newBuilder[Long]
    var rows = page(cursor)
    var guard = 0
    while (rows.nonEmpty && guard < 200) {
      sizes += rows.length
      out ++= rows.map(_.getLong(0))
      cursor = Some((rows.last.getDouble(1), rows.last.getLong(0)))
      rows = page(cursor)
      guard += 1
    }
    val ss = sizes.result()
    if (ss.size > 1) {
      val full = ss.head
      assert(ss.init.forall(_ == full),
        s"a non-final page starved: sizes $ss")
    }
    out.result()
  }

  test("dense iterator: random tied corpora page to the exact order; mid-stream resume exact") {
    val s = spark
    import s.implicits._
    (0 until 6).foreach { i =>
      val (rows, q, metric, batch) = denseCorpus
        .pureApply(Gen.Parameters.default, Seed(1000L + i))
      val distinct = rows.groupBy(_.pk).map(_._2.head).toSeq
      val c = cat.createCollection(CollectionDef(freshName(), Seq(
        FieldDef("pk", LongType, nullable = false, isPrimary = true),
        FieldDef("v", ArrayType(FloatType), dim = Some(4)))))
      c.insert(s, distinct.map(r => (r.pk, r.vec)).toDF("pk", "v"))
      val simLike = metric == "IP"
      val score: Seq[Float] => Double =
        if (simLike) ip(_, q) else l2(_, q)
      val expected = distinct.map(r => (r.pk, score(r.vec)))
        .sortBy { case (pk, sc) => (if (simLike) -sc else sc, pk) }
      def page(after: Option[(Double, Any)]) =
        CollectionSearch.searchIterator(s, c, "v", q, batch, after = after,
            searchParams = Map("metric_type" -> metric))
          .orderBy(if (simLike) col("score").desc else col("score").asc,
            col("pk").asc)
          .select("pk", "score").collect()
      val got = drain(page)
      assert(got == expected.map(_._1),
        s"trial $i ($metric, batch $batch): pages != exact order")
      // resume from a random mid-stream cursor: exact suffix
      if (expected.size > 2) {
        val cut = (i * 131 % (expected.size - 1)) + 1
        val (cutPk, cutSc) = expected(cut - 1)
        val suffix = drain(page, resumeAt = Some((cutSc, cutPk)))
        assert(suffix == expected.drop(cut).map(_._1),
          s"trial $i: mid-stream resume at $cut diverged")
      }
      // banded iteration: pick the band from the score distribution's
      // interior quantiles (band edges land ON tied scores, stressing
      // the strict/inclusive boundary conventions), expect exactly the
      // model's band members in order.
      val scoresSorted = expected.map(_._2)
      if (scoresSorted.distinct.size > 3) {
        val lo = scoresSorted(expected.size / 4)
        val hi = scoresSorted(3 * expected.size / 4)
        // L2 (ascending): range_filter <= d < radius with rf=lo, r=hi;
        // IP (descending): radius < s <= range_filter with r=hi (the
        // deeper score — the sorted seq descends for IP so lo >= hi),
        // rf=lo (the page-1 score side). Same assignment either way.
        val params = Map("metric_type" -> metric,
          "radius" -> hi.toString, "range_filter" -> lo.toString)
        val expBand = expected.filter { case (_, sc) =>
          if (simLike) sc > hi && sc <= lo else sc >= lo && sc < hi
        }.map(_._1)
        def bandPage(after: Option[(Double, Any)]) =
          CollectionSearch.searchIterator(s, c, "v", q, batch,
              after = after, searchParams = params)
            .orderBy(if (simLike) col("score").desc else col("score").asc,
              col("pk").asc)
            .select("pk", "score").collect()
        assert(drain(bandPage) == expBand,
          s"trial $i ($metric): banded pages != exact band members")
      }
    }
  }

  test("binary + sparse iterators: random tied corpora page exactly; indexed == unindexed") {
    val s = spark
    import s.implicits._
    (0 until 4).foreach { i =>
      val (size, batch) = ((40 + i * 17) % 80 + 30, 5 + i * 3)
      // binary: single byte from {0..7} — 8 distinct patterns, massive ties
      val bins = (0 until size).map(j =>
        (j.toLong, Array(((j * 2654435761L + i) % 8).toByte)))
      val cb = cat.createCollection(CollectionDef(freshName(), Seq(
        FieldDef("pk", LongType, nullable = false, isPrimary = true),
        FieldDef("b", BinaryType, dim = Some(8)))))
      cb.insert(s, bins.toDF("pk", "b"))
      val qb = Array(3.toByte)
      def ham(a: Byte): Int = Integer.bitCount((a ^ 3) & 0xff)
      val expB = bins.map { case (pk, arr) => (pk, ham(arr(0))) }
        .sortBy { case (pk, d) => (d, pk) }.map(_._1)
      def pageB(after: Option[(Double, Any)]) =
        CollectionSearch.searchIteratorAny(s, cb, "b", qb, batch,
            after = after)
          .orderBy(col("score").asc, col("pk").asc)
          .select("pk", "score").collect()
      assert(drain(pageB) == expB,
        s"binary trial $i: pages != exact Hamming order")
      // sparse: dims {0..4}, weights {1..3}; only overlap docs iterate
      val sps = (0 until size).map { j =>
        val d1 = (j % 5, (j % 3 + 1).toDouble)
        val d2 = ((j * 3 + 1) % 5, (j % 2 + 1).toDouble)
        (j.toLong, Map(d1, d2))
      }
      val cs = cat.createCollection(CollectionDef(freshName(), Seq(
        FieldDef("pk", LongType, nullable = false, isPrimary = true),
        FieldDef("sv", MapType(IntegerType, DoubleType)))))
      cs.insert(s, sps.toDF("pk", "sv"))
      val qs = Map(1 -> 2.0, 3 -> 1.0)
      val expS = sps.map { case (pk, m) =>
        (pk, qs.map { case (d, w) => w * m.getOrElse(d, 0.0) }.sum) }
        .filter(_._2 > 0)
        .sortBy { case (pk, sc) => (-sc, pk) }.map(_._1)
      def pageS(after: Option[(Double, Any)]) =
        CollectionSearch.searchIteratorAny(s, cs, "sv", qs, batch,
            after = after)
          .orderBy(col("score").desc, col("pk").asc)
          .select("pk", "score").collect()
      assert(drain(pageS) == expS,
        s"sparse trial $i: pages != exact descending IP order")
      // banded pages on the distance/similarity families: edges on
      // tied scores (small discrete sets), drained pages == the exact
      // band members.
      val hamBand = bins.map { case (pk, arr) => (pk, ham(arr(0))) }
        .filter { case (_, d) => d >= 1 && d < 3 }
        .sortBy { case (pk, d) => (d, pk) }.map(_._1)
      def pageBBand(after: Option[(Double, Any)]) =
        CollectionSearch.searchIteratorBinary(s, cb, "b", qb, batch,
            after = after, searchParams = Map(
              "radius" -> "3", "range_filter" -> "1"))
          .orderBy(col("score").asc, col("pk").asc)
          .select("pk", "score").collect()
      assert(drain(pageBBand) == hamBand,
        s"binary trial $i: banded pages != exact band")
      val spBand = sps.map { case (pk, m) =>
        (pk, qs.map { case (d, w) => w * m.getOrElse(d, 0.0) }.sum) }
        .filter { case (_, sc) => sc > 2.0 && sc <= 5.0 }
        .sortBy { case (pk, sc) => (-sc, pk) }.map(_._1)
      def pageSBand(after: Option[(Double, Any)]) =
        CollectionSearch.searchIteratorSparse(s, cs, "sv", qs, batch,
            after = after, searchParams = Map(
              "radius" -> "2.0", "range_filter" -> "5.0"))
          .orderBy(col("score").desc, col("pk").asc)
          .select("pk", "score").collect()
      assert(drain(pageSBand) == spBand,
        s"sparse trial $i: banded pages != exact band")
      // partition-scoped pages: a partitioned twin iterates only its
      // partition's docs — through the unindexed scan AND the
      // _part-carrying postings route (directory-pruned). Unscoped
      // inserts route pk % len(partitions) across the declared
      // partitions (the engine's documented reference semantic), so
      // "podd" holds exactly the odd pks.
      if (i == 1) {
        val cp = cat.createCollection(CollectionDef(freshName(), Seq(
          FieldDef("pk", LongType, nullable = false, isPrimary = true),
          FieldDef("sv", MapType(IntegerType, DoubleType))),
          partitions = Seq("peven", "podd")))
        cp.insert(s, sps.toDF("pk", "sv"))
        val expOdd = sps.filter(_._1 % 2 == 1).map { case (pk, m) =>
          (pk, qs.map { case (d, w) => w * m.getOrElse(d, 0.0) }.sum) }
          .filter(_._2 > 0)
          .sortBy { case (pk, sc) => (-sc, pk) }.map(_._1)
        def pageScoped(after: Option[(Double, Any)]) =
          CollectionSearch.searchIteratorSparse(s, cp, "sv", qs, batch,
              after = after, partitionNames = Seq("podd"))
            .orderBy(col("score").desc, col("pk").asc)
            .select("pk", "score").collect()
        assert(drain(pageScoped) == expOdd,
          "partition-scoped sparse pages != the partition's exact order")
        cp.createIndex(s, IndexDef("sv", "SPARSE_INVERTED_INDEX",
          Some("IP"), Map("buckets" -> "8")))
        assert(drain(pageScoped) == expOdd,
          "indexed partition-scoped sparse pages diverged")
      }
      // indexed route must produce the identical page stream
      if (i == 0) {
        cs.createIndex(s, IndexDef("sv", "SPARSE_INVERTED_INDEX",
          Some("IP"), Map("buckets" -> "8")))
        assert(drain(pageS) == expS,
          "indexed sparse iterator diverged from unindexed pages")
        cb.createIndex(s, IndexDef("b", "BIN_IVF_FLAT", Some("HAMMING"),
          Map("nlist" -> "4")))
        assert(drain(pageB) == expB,
          "indexed binary iterator diverged from unindexed pages")
        // the banded pages too: the band must survive the cell-pruned
        // and postings routes unchanged
        assert(drain(pageBBand) == hamBand,
          "indexed binary band diverged from unindexed pages")
        assert(drain(pageSBand) == spBand,
          "indexed sparse band diverged from unindexed pages")
      }
    }
  }
}
