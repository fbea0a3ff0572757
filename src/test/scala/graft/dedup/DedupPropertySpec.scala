package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: prefix-filter n-gram Jaccard dedup is EXACT — on
  * random corpora it returns precisely the pairs a brute-force
  * all-pairs Jaccard finds, at thresholds including boundary-exact
  * values. (Drives scalacheck Gen directly — the scalatestplus bridge
  * isn't available offline.)
  */
class DedupPropertySpec extends SparkSpec {

  // Small vocabulary => shingle sets collide a lot, near-dups are
  // frequent, and hot shingles stress the rare-first prefix ordering.
  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val doc = Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, doc))

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def bruteForce(docs: Seq[(Long, String)], t: Double,
      n: Int): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta, n); sb = shingleSet(tb, n)
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= t
    } yield (ia, ib)).toSet

  test("simhash chunk-blocking pairs == brute-force hamming pairs (maxHamming=3)") {
    // Pigeonhole guarantee under test: 4 chunks of 16 bits, <= 3
    // differing bits => at least one chunk identical, so the chunk
    // equi-join candidate generation loses nothing at maxHamming <= 3.
    val s = spark
    import s.implicits._
    (0 until 6).foreach { i =>
      val texts = corpus(Gen.Parameters.default, Seed(2000L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val sims = Dedup.simhash(df, "text", "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDups(df, "text", "doc_id", maxHamming = 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=${2000 + i}: got $got want $want")
    }
  }

  test("prefix-filter pairs == brute-force pairs on random corpora") {
    val s = spark
    import s.implicits._
    val thresholds = Seq(0.5, 0.7, 0.8)
    (0 until 12).foreach { i =>
      val texts = corpus(Gen.Parameters.default, Seed(1000L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val t = thresholds(i % thresholds.length)
      val got = Dedup.ngramNearDups(df, "text", "doc_id", t, shingleSize = 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteForce(docs, t, 3)
      assert(got == want,
        s"seed=${1000 + i} t=$t: got ${got.toSeq.sorted}, want ${want.toSeq.sorted}\n" +
          docs.mkString("\n"))
    }
  }

  test("connectedComponents == brute-force union-find min labels on random graphs") {
    val s = spark
    import s.implicits._
    val edgeGen = for {
      n <- Gen.choose(5, 40)           // node id space
      m <- Gen.choose(1, 60)           // edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    (0 until 6).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(3000L + i)).get
      if (edges.nonEmpty) {
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        // min-relabel: union-find roots are not necessarily component
        // minima, so normalize both sides by component member minimum
        val wantMin = want.groupBy(_._2).flatMap { case (_, members) =>
          val mn = members.keys.min
          members.keys.map(_ -> mn)
        }
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == wantMin, s"seed=${3000 + i} edges=$edges")
      }
    }
  }
}
