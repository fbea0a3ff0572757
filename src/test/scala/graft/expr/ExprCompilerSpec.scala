package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Compiler spec over a fixture that mirrors the reference's schema shape
  * (2.6/common.py:932-1016: pk id, scalars, json, arrays, geometry,
  * dynamic field).
  */
case class ExprFixtureRow(
    id: Long,
    category: Long,
    score: Double,
    content: String,
    flag: Boolean,
    json_content: String,
    array_int64: Seq[Long],
    array_varchar: Seq[String],
    location: String,
    _meta: String)

class ExprCompilerSpec extends SparkSpec {
  private type R = ExprFixtureRow
  private val R = ExprFixtureRow

  lazy val df: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      R(1, 10, 1.5, "content one", flag = true,
        """{"name": "alice", "content": "star light", "key_0": {"key": 5}, "tags": ["a", "b"], "nums": [1, 2, 3]}""",
        Seq(10L, 20L), Seq("x0", "y0"), "POINT (1 1)", """{"Tenant": "user_17"}"""),
      R(2, 200, 2.5, "contour", flag = false,
        """{"name": "bob", "content": "parade", "key_0": {"key": 6}, "tags": ["b", "c"], "nums": [3, 4]}""",
        Seq(30L, 40L), Seq("x1", "y1"), "POINT (5 5)", """{"Tenant": "user_18"}"""),
      R(3, 3000, 3.5, "stars contents", flag = true,
        """{"name": "carol", "content": "hostel", "key_0": {"key": 7}, "tags": ["c", "d"], "nums": []}""",
        Seq(50L, 20L), Seq("x2", "y0"), "POINT (20 20)", """{"Tenant": "user_17"}"""),
      R(4, -5, 4.5, "cone", flag = false,
        """{"name": "dave", "content": "store front", "key_0": {"key": 8}, "tags": [], "nums": [7]}""",
        Seq(60L), Seq("x3"), "POINT (0 0)", """{"Tenant": "user_19"}"""),
    ).toDF()
  }

  /** ids surviving the compiled filter */
  def ids(expr: String, dyn: Option[String] = None): Seq[Long] =
    MilvusExpr.filter(df, expr, dyn)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("comparisons and boolean operators") {
    assert(ids("category == 200") == Seq(2))
    assert(ids("category != 200") == Seq(1, 3, 4))
    assert(ids("category > 100 and category < 2000000") == Seq(2, 3))
    assert(ids("category >= 0 && score <= 2.5") == Seq(1, 2))
    assert(ids("category < 0 || score > 4.0") == Seq(4))
    assert(ids("not (category > 0)") == Seq(4))
    assert(ids("!(category > 0)") == Seq(4))
    assert(ids("flag == True") == Seq(1, 3))
    assert(ids("flag == false") == Seq(2, 4))
  }

  test("chained range comparison (rewrite_expressions.py form)") {
    assert(ids("10 <= category <= 200") == Seq(1, 2))
    assert(ids("0 < category < 3000") == Seq(1, 2))
  }

  test("arithmetic") {
    assert(ids("id % 2 == 0") == Seq(2, 4))
    assert(ids("category + 5 == 15") == Seq(1))
    assert(ids("-category == 5") == Seq(4))
    assert(ids("id ** 2 == 9") == Seq(3))
  }

  test("in / not in with int and string lists") {
    assert(ids("id in [1, 3]") == Seq(1, 3))
    assert(ids("content in ['cone', 'contour']") == Seq(2, 4))
    assert(ids("id not in [1, 2, 3]") == Seq(4))
  }

  test("like with % and _") {
    assert(ids("content like \"con%\"") == Seq(1, 2, 4))
    assert(ids("content like \"%nt%\"") == Seq(1, 2, 3))
    assert(ids("content like \"%con_ent%\"") == Seq(1, 3))
    assert(ids("content not like \"con%\"") == Seq(3))
  }

  test("regex match (3.0 =~) and negation (!~)") {
    assert(ids("content =~ \"^con\"") == Seq(1, 2, 4))
    assert(ids("content !~ \"^con\"") == Seq(3))
    assert(ids("content !~ \"nt\"") == Seq(4))
  }

  test("json path access with typed comparisons") {
    assert(ids("json_content[\"name\"] == \"alice\"") == Seq(1))
    assert(ids("json_content[\"key_0\"][\"key\"] == 5") == Seq(1))
    assert(ids("json_content[\"key_0\"][\"key\"] >= 7") == Seq(3, 4))
    assert(ids("json_content[\"content\"] like \"%sta%\"") == Seq(1))
    assert(ids("json_content[\"name\"] in [\"alice\", \"carol\"]") == Seq(1, 3))
    assert(ids("json_content[\"nums\"][0] == 3") == Seq(2))
  }

  test("array subscript (0-based) and length") {
    assert(ids("array_int64[1] in [20, 40]") == Seq(1, 2, 3))
    assert(ids("array_varchar[0] in [\"x0\", \"x3\"]") == Seq(1, 4))
    assert(ids("array_length(array_int64) == 1") == Seq(4))
    // ARRAY_LENGTH over a JSON path (the feature inventory's
    // nested-array operator family) — the leaf parses as an array;
    // element shape is irrelevant to the count.
    assert(ids("ARRAY_LENGTH(json_content[\"nums\"]) == 2") == Seq(2))
    assert(ids("array_length(json_content[\"tags\"]) == 0") == Seq(4))
    // a non-array / missing leaf has no length — no match, no error
    assert(ids("array_length(json_content[\"name\"]) >= 0") == Seq.empty)
    assert(ids("array_length(json_content[\"missing\"]) >= 0") == Seq.empty)
  }

  test("ARRAY_CONTAINS family") {
    assert(ids("ARRAY_CONTAINS(array_int64, 20)") == Seq(1, 3))
    assert(ids("array_contains(array_varchar, \"y0\")") == Seq(1, 3))
    assert(ids("ARRAY_CONTAINS_ANY(array_varchar, [\"x1\", \"x3\"])") == Seq(2, 4))
    assert(ids("ARRAY_CONTAINS_ALL(array_int64, [50, 20])") == Seq(3))
  }

  test("JSON_CONTAINS family on json arrays and on array fields") {
    assert(ids("JSON_CONTAINS(json_content[\"tags\"], \"b\")") == Seq(1, 2))
    assert(ids("JSON_CONTAINS_ANY(json_content[\"nums\"], [4, 7])") == Seq(2, 4))
    assert(ids(
      "JSON_CONTAINS_ALL(json_content[\"tags\"], [\"b\", \"c\"]) AND NOT JSON_CONTAINS(json_content[\"tags\"], \"d\")")
      == Seq(2))
    // The go_bench corpus applies JSON_CONTAINS* to ARRAY fields too.
    assert(ids("JSON_CONTAINS(array_int64, 20)") == Seq(1, 3))
    assert(ids("JSON_CONTAINS_ALL(array_varchar, [\"x2\", \"y0\"])") == Seq(3))
  }

  test("ST_CONTAINS point-in-polygon") {
    assert(ids("ST_CONTAINS(location, 'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')")
      == Seq(1, 2, 4))
  }

  test("ST_EQUALS geometric point equality, formatting-tolerant") {
    // the validate_index_compatibility GEOMETRY probe shape (:629-633)
    assert(ids("ST_EQUALS(location, 'POINT (5 5)')") == Seq(2))
    // coordinate equality, not string equality
    assert(ids("ST_EQUALS(location, 'POINT(5.0   5.00)')") == Seq(2))
    assert(ids("ST_EQUALS(location, 'POINT (5 6)')") == Seq.empty)
    // a point never equals a polygon
    assert(ids("ST_EQUALS(location, 'POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))')")
      == Seq.empty)
  }

  test("dynamic field reference (Tenant == user_17)") {
    assert(ids("Tenant == \"user_17\"", dyn = Some("_meta")) == Seq(1, 3))
  }

  test("TEXT_MATCH standard-analyzer term match") {
    assert(ids("TEXT_MATCH(content, \"stars cone\")") == Seq(3, 4))
  }

  test("non-numeric JSON compared to a number is no-match, not an ANSI error") {
    // json_content["name"] holds strings; ANSI cast would throw,
    // Milvus semantics want zero matching rows.
    assert(ids("json_content[\"name\"] > 5") == Seq.empty)
    assert(ids("json_content[\"name\"] in [1, 2]") == Seq.empty)
  }

  test("PHRASE_MATCH with and without slop") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "the quick brown fox"),
      (2L, "the brown quick fox"),
      (3L, "quick red agile brown thing"),
      (4L, "nothing relevant here"))
      .toDF("id", "t")
    def m(e: String) = MilvusExpr.filter(d, e)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // exact phrase: adjacent, in order
    assert(m("PHRASE_MATCH(t, \"quick brown\")") == Seq(1))
    // slop 2 allows two interleaved tokens, order preserved
    assert(m("phrase_match(t, \"quick brown\", 2)") == Seq(1, 3))
    // order matters: "brown quick" only in doc 2
    assert(m("PHRASE_MATCH(t, \"brown quick\")") == Seq(2))
    assert(m("PHRASE_MATCH(t, \"missing phrase\")") == Seq.empty)
  }

  test("is null / is not null") {
    assert(ids("json_content[\"missing\"] is null") == Seq(1, 2, 3, 4))
    assert(ids("content is not null") == Seq(1, 2, 3, 4))
  }

  test("empty expression = full scan") {
    assert(ids("") == Seq(1, 2, 3, 4))
    assert(ids("   ") == Seq(1, 2, 3, 4))
  }

  test("string escaping (format_filter_value semantics)") {
    val s = spark
    import s.implicits._
    val d2 = Seq((1L, """say "hi""""), (2L, """back\slash""")).toDF("id", "v")
    assert(MilvusExpr.filter(d2, "v == \"say \\\"hi\\\"\"")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1))
    assert(MilvusExpr.filter(d2, "v == \"back\\\\slash\"")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2))
  }

  test("parse errors are reported with position") {
    val errs = Seq("category ==", "in [1]", "category in 5",
      "array_contains(array_int64)", "unknownfn(id, 2)", "id @ 3")
    errs.foreach { e =>
      intercept[Exception](ids(e))
    }
  }

  test("unknown field without dynamic field errors") {
    intercept[ParseException](ids("nosuchfield == 1"))
  }
}
