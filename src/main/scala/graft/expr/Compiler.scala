package graft.expr

import graft.Functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Schema-aware compiler: Milvus filter-expression AST → Spark `Column`.
  *
  * Everything lands on built-in (codegen'd) Spark functions; the only
  * custom expressions reached from here are ST_CONTAINS and ST_EQUALS.
  * JSON accesses
  * compile to a single `get_json_object` with the full path, so Catalyst
  * sees one scalar expression per JSON leaf.
  *
  * Null semantics: Milvus filters keep only rows where the predicate is
  * definitively true; SQL three-valued logic does the same at a WHERE
  * boundary, so no special handling is needed.
  */
object Compiler {

  /** Typed value: a column plus what we know about its type, which
    * drives JSON casts and array-element coercions.
    */
  private sealed trait TV { def column: Column }
  private final case class Concrete(column: Column, dt: DataType) extends TV
  /** A JSON leaf: `get_json_object(base, '$<path>')` — string-typed. */
  private final case class JsonVal(base: Column, path: String) extends TV {
    def column: Column = get_json_object(base, "$" + path)
  }
  private final case class Lit(column: Column, node: Node) extends TV

  def compile(input: String, df: DataFrame,
      dynamicField: Option[String] = None): Column =
    compile(input, df.schema, dynamicField)

  def compile(input: String, schema: StructType,
      dynamicField: Option[String]): Column = {
    val trimmed = input.trim
    if (trimmed.isEmpty) lit(true) // empty expr = full scan (Q5)
    else asBool(new Ctx(schema, dynamicField).eval(Parser.parse(trimmed)))
  }

  private def asBool(tv: TV): Column = tv match {
    case Concrete(c, BooleanType) => c
    case Concrete(c, _) => c.cast(BooleanType)
    case j: JsonVal => j.column.cast(BooleanType)
    case Lit(c, BoolLit(_)) => c
    case Lit(c, _) => c.cast(BooleanType)
  }

  private final class Ctx(schema: StructType, dynamicField: Option[String]) {

    def eval(node: Node): TV = node match {
      case IntLit(v) => Lit(lit(v), node)
      case FloatLit(v) => Lit(lit(v), node)
      case StrLit(v) => Lit(lit(v), node)
      case BoolLit(v) => Lit(lit(v), node)
      case id: Ident => resolve(id.name)
      case s: Subscript => subscript(s)
      case l: ListLit =>
        throw new ParseException("bare list literal outside IN/function call")
      case Un("not", e) => Concrete(!asBool(eval(e)), BooleanType)
      case Un("-", e) => numericUnary(e, c => -c)
      case Un("~", e) => Concrete(bitwise_not(numeric(eval(e))), LongType)
      case Un(op, _) => throw new ParseException(s"unknown unary op $op")
      case Bin("and", l, r) => Concrete(asBool(eval(l)) && asBool(eval(r)), BooleanType)
      case Bin("or", l, r) => Concrete(asBool(eval(l)) || asBool(eval(r)), BooleanType)
      case Bin(op, l, r) => arith(op, eval(l), eval(r))
      case Cmp(operands, ops) =>
        val tvs = operands.map(eval)
        val parts = ops.zipWithIndex.map { case (op, i) =>
          comparison(op, tvs(i), tvs(i + 1))
        }
        Concrete(parts.reduce(_ && _), BooleanType)
      case In(e, list, negated) =>
        val c = inList(eval(e), list)
        Concrete(if (negated) !c else c, BooleanType)
      case Like(e, pattern, negated) =>
        // Milvus `like` wildcards (% multi-char, _ single-char) are SQL
        // LIKE semantics — direct mapping.
        val c = stringOf(eval(e)).like(pattern)
        Concrete(if (negated) !c else c, BooleanType)
      case RegexMatch(e, pattern, negated) =>
        val c = stringOf(eval(e)).rlike(pattern)
        Concrete(if (negated) !c else c, BooleanType)
      case IsNull(e, negated) =>
        val c = eval(e).column
        Concrete(if (negated) c.isNotNull else c.isNull, BooleanType)
      case c: Call => call(c)
    }

    private def resolve(name: String): TV =
      schema.fields.find(_.name == name)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(name))) match {
        case Some(f) => Concrete(col(f.name), f.dataType)
        case None =>
          dynamicField match {
            case Some(dyn) =>
              schema.fields.find(_.name == dyn).map(_.dataType) match {
                case Some(MapType(_, vt, _)) =>
                  Concrete(try_element_at(col(dyn), lit(name)), vt)
                case _ => JsonVal(col(dyn), s"['$name']")
              }
            case None =>
              throw new ParseException(
                s"unknown field '$name' (no dynamic field configured)")
          }
      }

    private def subscript(s: Subscript): TV = {
      val target = eval(s.target)
      (target, s.key) match {
        // try_element_at: out-of-bounds / missing key yields null (= no
        // filter match), not an ANSI error — Milvus subscripts never throw.
        case (Concrete(c, ArrayType(et, _)), Left(i)) =>
          // Milvus array subscripts are 0-based; element_at is 1-based.
          Concrete(try_element_at(c, lit((i + 1).toInt)), et)
        case (Concrete(c, MapType(_, vt, _)), Right(k)) =>
          Concrete(try_element_at(c, lit(k)), vt)
        case (Concrete(c, StructType(fields)), Right(k)) =>
          fields.find(_.name == k) match {
            case Some(f) => Concrete(c.getField(k), f.dataType)
            case None => throw new ParseException(s"no struct field '$k'")
          }
        case (Concrete(c, StringType), key) => JsonVal(c, seg(key))
        case (j: JsonVal, key) => JsonVal(j.base, j.path + seg(key))
        case (other, key) =>
          throw new ParseException(s"cannot subscript $other with $key")
      }
    }

    private def seg(key: Either[Long, String]): String = key match {
      case Left(i) => s"[$i]"
      case Right(k) => s"['$k']"
    }

    private def numericUnary(e: Node, f: Column => Column): TV = {
      val tv = eval(e)
      Concrete(f(numeric(tv)), DoubleType)
    }

    /** Numeric view of a value: JSON leaves cast to double. try_cast:
      * a malformed/non-numeric JSON value must mean "no match" (Milvus
      * null semantics), not an ANSI runtime error.
      */
    private def numeric(tv: TV): Column = tv match {
      case j: JsonVal => j.column.try_cast(DoubleType)
      case other => other.column
    }

    private def stringOf(tv: TV): Column = tv match {
      case Concrete(c, StringType) => c
      case Concrete(c, _) => c.cast(StringType)
      case j: JsonVal => j.column
      case Lit(c, _) => c.cast(StringType)
    }

    private def arith(op: String, l: TV, r: TV): TV = {
      val (a, b) = (numeric(l), numeric(r))
      val c = op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
        case "**" => pow(a, b)
        case "&" => a.bitwiseAND(b)
        case "|" => a.bitwiseOR(b)
        case "^" => a.bitwiseXOR(b)
        case other => throw new ParseException(s"unknown operator $other")
      }
      Concrete(c, DoubleType)
    }

    /** Comparison with JSON-aware coercion: the JSON side is cast to the
      * comparable side's type (number/bool/string).
      */
    private def comparison(op: String, l: TV, r: TV): Column = {
      val (a, b) = coerce(l, r)
      op match {
        case "==" => a === b
        case "!=" => a =!= b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
        case other => throw new ParseException(s"unknown comparison $other")
      }
    }

    private def coerce(l: TV, r: TV): (Column, Column) = (l, r) match {
      case (j: JsonVal, other) => (castJson(j, other), other.column)
      case (other, j: JsonVal) => (other.column, castJson(j, other))
      case _ => (l.column, r.column)
    }

    private def castJson(j: JsonVal, other: TV): Column = other match {
      case Lit(_, IntLit(_)) | Lit(_, FloatLit(_)) => j.column.try_cast(DoubleType)
      case Lit(_, BoolLit(_)) => j.column.try_cast(BooleanType)
      case Lit(_, StrLit(_)) => j.column
      case Concrete(_, _: NumericType) => j.column.try_cast(DoubleType)
      case Concrete(_, BooleanType) => j.column.try_cast(BooleanType)
      case _ => j.column
    }

    private def literalValue(n: Node): Any = n match {
      case IntLit(v) => v
      case FloatLit(v) => v
      case StrLit(v) => v
      case BoolLit(v) => v
      case Un("-", IntLit(v)) => -v
      case Un("-", FloatLit(v)) => -v
      case other => throw new ParseException(s"non-literal in IN list: $other")
    }

    private def isNumericLit(n: Node): Boolean = n match {
      case IntLit(_) | FloatLit(_) => true
      case Un("-", IntLit(_)) | Un("-", FloatLit(_)) => true
      case _ => false
    }

    private def inList(e: TV, list: ListLit): Column = {
      val values = list.items.map(literalValue)
      e match {
        case j: JsonVal =>
          val numericList = list.items.forall(isNumericLit)
          if (numericList)
            j.column.try_cast(DoubleType)
              .isin(values.map(v => v.toString.toDouble): _*)
          else j.column.isin(values: _*)
        case other => other.column.isin(values: _*)
      }
    }

    /** Literal array for ARRAY_/JSON_CONTAINS_ANY/_ALL, cast to the
      * target element type when known.
      */
    private def litArray(items: Seq[Node], et: Option[DataType]): Column = {
      val cols = items.map(i => eval(i).column)
      val arr = array(cols: _*)
      et.map(t => arr.cast(ArrayType(t))).getOrElse(arr)
    }

    private def inferElemType(n: Node): DataType = n match {
      case IntLit(_) => LongType
      case FloatLit(_) => DoubleType
      case BoolLit(_) => BooleanType
      case _ => StringType
    }

    /** Array view of the first argument of a CONTAINS-family call. The
      * corpus applies JSON_CONTAINS* to real ARRAY fields too
      * (run_go_bench_horizon.py:113-120), so both families accept both.
      */
    private def arrayView(target: TV, elemHint: DataType): (Column, DataType) =
      target match {
        case Concrete(c, ArrayType(et, _)) => (c, et)
        case j: JsonVal => (from_json(j.column, ArrayType(elemHint)), elemHint)
        case Concrete(c, StringType) => (from_json(c, ArrayType(elemHint)), elemHint)
        case other =>
          throw new ParseException(s"CONTAINS target is not an array: $other")
      }

    private def call(c: Call): TV = c.name match {
      case "array_contains" | "json_contains" =>
        require2(c)
        val hint = inferElemType(c.args(1))
        val (arr, et) = arrayView(eval(c.args(0)), hint)
        Concrete(array_contains(arr, eval(c.args(1)).column.cast(et)), BooleanType)
      case "array_contains_any" | "json_contains_any" =>
        require2(c)
        val items = listArg(c, 1)
        val hint = inferElemType(items.head)
        val (arr, et) = arrayView(eval(c.args(0)), hint)
        Concrete(arrays_overlap(arr, litArray(items, Some(et))), BooleanType)
      case "array_contains_all" | "json_contains_all" =>
        require2(c)
        val items = listArg(c, 1)
        val hint = inferElemType(items.head)
        val (arr, et) = arrayView(eval(c.args(0)), hint)
        Concrete(size(array_except(litArray(items, Some(et)), arr)) === 0,
          BooleanType)
      case "array_length" =>
        // ARRAY_LENGTH over a JSON path (the feature inventory's
        // nested-array operator family): the leaf is a JSON string, so
        // parse it as an array first. Element type only matters for
        // counting — array<string> round-trips any element shape, and
        // a non-array/malformed leaf parses to null → null length →
        // no comparison match, Milvus null semantics.
        val lenOf = eval(c.args(0)) match {
          case j: JsonVal => size(from_json(j.column, ArrayType(StringType)))
          case Concrete(col0, StringType) =>
            size(from_json(col0, ArrayType(StringType)))
          case other => size(other.column)
        }
        Concrete(lenOf.cast(LongType), LongType)
      case "st_contains" =>
        require2(c)
        Concrete(
          Functions.stContains(eval(c.args(0)).column, eval(c.args(1)).column),
          BooleanType)
      case "st_equals" =>
        // GEOMETRY point-probe shape, ST_EQUALS(field, 'POINT (...)')
        // (requests/validate_index_compatibility.py:629-633).
        require2(c)
        Concrete(
          Functions.stEquals(eval(c.args(0)).column, eval(c.args(1)).column),
          BooleanType)
      case "text_match" =>
        // Standard-analyzer term match: any query term appears as a token
        // of the field (reference TEXT_MATCH, feature-inventory doc §3).
        require2(c)
        val fieldToks = split(lower(stringOf(eval(c.args(0)))), "[^\\p{L}\\p{N}]+")
        val query = c.args(1) match {
          case StrLit(s) => s
          case other => throw new ParseException(s"TEXT_MATCH needs a string, got $other")
        }
        val terms = query.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        Concrete(arrays_overlap(fieldToks, lit(terms)), BooleanType)
      case "phrase_match" =>
        // PHRASE_MATCH(field, "a b c"[, slop]) — 3.0 text surface
        // (feature-inventory doc §3): query tokens appear in order
        // within a window of |Q| + slop field tokens. Pure Column
        // machinery: exists over window starts, with an aggregate()
        // pointer walking the query subsequence inside the window.
        if (c.args.length < 2 || c.args.length > 3)
          throw new ParseException("PHRASE_MATCH takes (field, phrase[, slop])")
        val slop = c.args.lift(2).map {
          case IntLit(v) => v.toInt
          case other => throw new ParseException(s"slop must be an int, got $other")
        }.getOrElse(0)
        val qToks = c.args(1) match {
          case StrLit(s) =>
            s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
          case other => throw new ParseException(s"PHRASE_MATCH needs a string, got $other")
        }
        if (qToks.isEmpty) Concrete(lit(true), BooleanType)
        else {
          val qLit = lit(qToks)
          val win = qToks.length + slop
          val fieldToks =
            filter(split(lower(stringOf(eval(c.args(0)))), "[^\\p{L}\\p{N}]+"),
              t => t =!= "")
          // Bind the token array to a lambda variable: Catalyst does no
          // CSE across lambda bodies, so referencing the tokenizer
          // inside the window lambda would re-tokenize per window start
          // (same trap as TextOps.shingles; measured ~10x).
          val matched = element_at(
            transform(array(fieldToks), toks =>
              exists(
                transform(
                  sequence(lit(1), greatest(size(toks) - win + 1, lit(1))),
                  p =>
                    aggregate(slice(toks, p, lit(win)), lit(0),
                      (done, t) => when(
                        done < qToks.length && t === element_at(qLit, done + 1),
                        done + 1).otherwise(done))),
                cnt => cnt === qToks.length)),
            1)
          Concrete(matched, BooleanType)
        }
      case "exists" =>
        Concrete(eval(c.args(0)).column.isNotNull, BooleanType)
      case other =>
        throw new ParseException(s"unknown function $other")
    }

    private def require2(c: Call): Unit =
      if (c.args.length != 2)
        throw new ParseException(s"${c.name} takes 2 arguments, got ${c.args.length}")

    private def listArg(c: Call, i: Int): Seq[Node] = c.args(i) match {
      case ListLit(items) if items.nonEmpty => items
      case ListLit(_) => throw new ParseException(s"${c.name} list must be non-empty")
      case other => throw new ParseException(s"${c.name} arg ${i + 1} must be a list, got $other")
    }
  }
}

/** Public facade: compile Milvus filter-expression strings to Spark
  * `Column`s / filtered DataFrames.
  */
object MilvusExpr {
  def parse(input: String): Node = Parser.parse(input)

  /** Field names referenced by an expression (top-level identifiers;
    * subscripts report their base field). Used for pushdown decisions —
    * e.g. a predicate touching only the PK may run below a
    * merge-on-read window.
    */
  def referencedFields(input: String): Set[String] = {
    def walk(n: Node): Set[String] = n match {
      case Ident(name) => Set(name)
      case Subscript(t, _) => walk(t)
      case ListLit(items) => items.flatMap(walk).toSet
      case Un(_, e) => walk(e)
      case Bin(_, l, r) => walk(l) ++ walk(r)
      case Cmp(operands, _) => operands.flatMap(walk).toSet
      case In(e, list, _) => walk(e) ++ walk(list)
      case Like(e, _, _) => walk(e)
      case RegexMatch(e, _, _) => walk(e)
      case IsNull(e, _) => walk(e)
      case Call(_, args) => args.flatMap(walk).toSet
      case _ => Set.empty
    }
    val trimmed = input.trim
    if (trimmed.isEmpty) Set.empty else walk(Parser.parse(trimmed))
  }

  /** Match a filter that is EXACTLY one point-in-polygon probe —
    * `ST_CONTAINS(field, 'POLYGON(...)')` in either argument order —
    * and return (field, polygonWkt). This is the go_bench horizon
    * query shape (run_go_bench_horizon.py:98-120); Collection.query
    * uses it to route through a declared RTREE grid index.
    */
  def asGeoProbe(input: String): Option[(String, String)] = {
    val trimmed = input.trim
    if (trimmed.isEmpty) return None
    Parser.parse(trimmed) match {
      case Call("st_contains", Seq(a, b)) =>
        (a, b) match {
          case (Ident(f), StrLit(w))
            if w.trim.toUpperCase.startsWith("POLYGON") => Some((f, w))
          case (StrLit(w), Ident(f))
            if w.trim.toUpperCase.startsWith("POLYGON") => Some((f, w))
          case _ => None
        }
      case _ => None
    }
  }

  /** Match a filter that is EXACTLY one point-equality probe —
    * `ST_EQUALS(field, 'POINT (...)')` in either argument order — and
    * return (field, pointWkt). This is the GEOMETRY scalar-probe shape
    * (requests/validate_index_compatibility.py:629-633); Collection
    * .query routes it to a single grid cell of a declared RTREE index.
    */
  def asGeoPointProbe(input: String): Option[(String, String)] = {
    val trimmed = input.trim
    if (trimmed.isEmpty) return None
    Parser.parse(trimmed) match {
      case Call("st_equals", Seq(a, b)) =>
        (a, b) match {
          case (Ident(f), StrLit(w))
            if w.trim.toUpperCase.startsWith("POINT") => Some((f, w))
          case (StrLit(w), Ident(f))
            if w.trim.toUpperCase.startsWith("POINT") => Some((f, w))
          case _ => None
        }
      case _ => None
    }
  }

  def compile(input: String, df: DataFrame,
      dynamicField: Option[String] = None): Column =
    Compiler.compile(input, df, dynamicField)

  def compile(input: String, schema: StructType,
      dynamicField: Option[String]): Column =
    Compiler.compile(input, schema, dynamicField)

  def filter(df: DataFrame, input: String,
      dynamicField: Option[String] = None): DataFrame =
    df.filter(compile(input, df, dynamicField))
}
