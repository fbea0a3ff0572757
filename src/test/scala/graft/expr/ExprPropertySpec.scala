package graft.expr

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: compiled Milvus expressions agree with the equivalent
  * Spark SQL over a numeric fixture, across randomly generated
  * comparison/boolean/arithmetic expression trees. (Drives scalacheck
  * Gen directly — the scalatestplus bridge isn't available offline.)
  */
class ExprPropertySpec extends SparkSpec {

  private lazy val fixture = {
    val s = spark
    import s.implicits._
    val df = (-50L to 50L).map(i => (i, i * 3 % 17, i.toDouble / 4))
      .toDF("id", "k", "v")
    df.createOrReplaceTempView("prop_fixture")
    df
  }

  private val cmpOps = Gen.oneOf("==", "!=", "<", "<=", ">", ">=")
  private val fields = Gen.oneOf("id", "k", "v")
  private val intLit = Gen.choose(-60L, 60L)

  private case class Pair(milvus: String, sql: String)

  private val leaf: Gen[Pair] = for {
    f <- fields
    op <- cmpOps
    v <- intLit
  } yield Pair(s"$f $op $v", s"$f ${if (op == "==") "=" else op} $v")

  private val chained: Gen[Pair] = for {
    f <- fields
    lo <- Gen.choose(-60L, 0L)
    hi <- Gen.choose(0L, 60L)
  } yield Pair(s"$lo <= $f <= $hi", s"$f >= $lo AND $f <= $hi")

  private val inPair: Gen[Pair] = for {
    f <- Gen.oneOf("id", "k")
    vs <- Gen.nonEmptyListOf(intLit).map(_.take(8))
    neg <- Gen.oneOf(true, false)
  } yield {
    val list = vs.mkString(", ")
    if (neg) Pair(s"$f not in [$list]", s"$f NOT IN ($list)")
    else Pair(s"$f in [$list]", s"$f IN ($list)")
  }

  private val arithPair: Gen[Pair] = for {
    f <- Gen.oneOf("id", "k")
    m <- Gen.choose(2L, 9L)
    r <- Gen.choose(0L, 8L)
  } yield Pair(s"$f % $m == $r", s"$f % $m = $r")

  private def tree(depth: Int): Gen[Pair] =
    if (depth == 0) Gen.oneOf(leaf, chained, inPair, arithPair)
    else
      Gen.frequency(
        3 -> Gen.oneOf(leaf, chained, inPair, arithPair),
        2 -> (for {
          l <- tree(depth - 1); r <- tree(depth - 1)
          op <- Gen.oneOf(("and", "AND"), ("&&", "AND"), ("or", "OR"), ("||", "OR"))
        } yield Pair(s"(${l.milvus}) ${op._1} (${r.milvus})",
          s"(${l.sql}) ${op._2} (${r.sql})")),
        1 -> tree(depth - 1).map(p =>
          Pair(s"not (${p.milvus})", s"NOT (${p.sql})")),
      )

  test("random expression trees match Spark SQL semantics") {
    val df = fixture
    val gen = tree(3)
    (0 until 60).foreach { i =>
      val p = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val viaCompiler = MilvusExpr.filter(df, p.milvus)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val viaSql = spark.sql(
        s"SELECT id FROM prop_fixture WHERE ${p.sql}")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(viaCompiler == viaSql, s"expr: ${p.milvus}")
    }
  }

  test("random like patterns match Spark SQL LIKE semantics") {
    val s = spark
    import s.implicits._
    val words = Seq("content", "contour", "cone", "stars", "star light",
      "parade", "hostel", "store front", "a_b%c", "", "co")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
    df.createOrReplaceTempView("like_fixture")
    val piece = Gen.oneOf("co", "n", "t", "%", "_", "s", "o", "e", "ar")
    val patGen = Gen.listOfN(4, piece).map(_.mkString)
    (0 until 40).foreach { i =>
      val pat = patGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val viaCompiler = MilvusExpr.filter(df, s"""w like "$pat"""")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val viaSql = spark.sql(
        s"SELECT id FROM like_fixture WHERE w LIKE '$pat'")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(viaCompiler == viaSql, s"pattern: $pat")
    }
  }

  test("json-path accesses agree with get_json_object over random keys") {
    val s = spark
    import s.implicits._
    val df = (0L until 30L).map { i =>
      (i, s"""{"k$i": ${i * 2}, "s": "v$i", "nested": {"deep": ${i % 5}}}""")
    }.toDF("id", "js")
    (0L until 30L).foreach { i =>
      val hit = MilvusExpr.filter(df, s"""js["k$i"] == ${i * 2}""").count()
      assert(hit == 1, s"k$i numeric access")
    }
    assert(MilvusExpr.filter(df, """js["nested"]["deep"] == 3""").count() == 6)
    assert(MilvusExpr.filter(df, """js["s"] == "v7"""").count() == 1)
    assert(MilvusExpr.filter(df, """js["absent"] == 1""").count() == 0)
  }

  test("parser accepts every corpus shape from the reference") {
    // One per construct in SURVEY.md §2.6's corpus table.
    val corpus = Seq(
      "category == 27",
      "id > 0",
      "1000 <= timestamp <= 2000",
      "category > 100 and category < 2000000",
      "pk >= 10 && pk <= 20",
      "int64_1 > 100 || float_1 > 100.0",
      "id in [1,2,3]",
      """device_id in ["a","b"]""",
      "device_id in ['AB123', 'CD456']",
      """sensor_lidar_type != "x"""",
      """content like "con%"""",
      """content like "%co%nt"""",
      """content like "%con_ent%"""",
      """json_content["content"] like "%sta%"""",
      """json_content["name"] in ["n1", "n2"]""",
      """json_1["key_0"]["key"] == 5""",
      "array_int64[1] in [1, 2]",
      "array_varchar[0] in [\"a\"]",
      """ARRAY_CONTAINS(sensor_lidar_type,"Livox_Horizon")""",
      """ARRAY_CONTAINS_ANY(timeline_tags,["t1","t2"])""",
      """ARRAY_CONTAINS_ALL(timeline_tags,["t1","t2"])""",
      """array_contains_any(array_varchar, ["a0", "a1"])""",
      """JSON_CONTAINS_ALL(f,[1,2]) AND NOT JSON_CONTAINS(f,"x")""",
      "ST_CONTAINS(location, 'POLYGON((-73.99 40.72, -73.98 40.73, -74.0 40.73, -73.99 40.72))')",
      "expert_collected == True",
      "expert_collected == true",
      """Tenant=="user_17"""",
      """device_id == "SENSOR_A123" and timestamp >= 1000 and timestamp <= 2000""",
      "field =~ \"^pre.*\"",
      "field !~ \"^pre.*\"",
      "f is null",
      "f is not null",
      "r\"raw.string\" == f",
    )
    corpus.foreach { e =>
      MilvusExpr.parse(e) // must not throw
    }
  }
}
