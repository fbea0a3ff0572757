package graft.expr

/** AST for the Milvus filter-expression language (SURVEY.md §2.6).
  *
  * The grammar is reconstructed from the reference's expression corpora:
  * /root/reference/go_bench/run_go_bench_horizon.py:98-120 (ST_CONTAINS,
  * ARRAY_CONTAINS*, JSON_CONTAINS*, in-lists, ts ranges),
  * /root/reference/milvus-bricks/milvus_client/search_permanently.py:104-134
  * (like, JSON path, dynamic fields),
  * /root/reference/milvus-bricks/milvus_client/horizonPoc/
  * convert_jsonl_to_expressions.py:40-100 (chained ranges `a <= x <= b`,
  * bool literals, != per not-in value), and
  * /root/reference/go_bench/run_go_bench2.py:30-40 (array subscripts,
  * nested JSON paths, `||` mixed conditions).
  */
sealed trait Node

final case class IntLit(v: Long) extends Node
final case class FloatLit(v: Double) extends Node
final case class StrLit(v: String) extends Node
final case class BoolLit(v: Boolean) extends Node
final case class Ident(name: String) extends Node
/** `arr[0]` (int key) or `json["k"]` (string key), possibly chained. */
final case class Subscript(target: Node, key: Either[Long, String]) extends Node
final case class ListLit(items: Seq[Node]) extends Node
/** Unary op: "not", "-", "+", "~". */
final case class Un(op: String, e: Node) extends Node
/** Binary non-comparison op: and or + - * / % ** & | ^ . */
final case class Bin(op: String, l: Node, r: Node) extends Node
/** Chained comparison `a < b <= c` — operands.length == ops.length + 1. */
final case class Cmp(operands: Seq[Node], ops: Seq[String]) extends Node
final case class In(e: Node, list: ListLit, negated: Boolean) extends Node
final case class Like(e: Node, pattern: String, negated: Boolean) extends Node
/** `field =~ "regex"` (3.0 surface). */
final case class RegexMatch(e: Node, pattern: String, negated: Boolean = false) extends Node
final case class IsNull(e: Node, negated: Boolean) extends Node
/** Function call: ARRAY_CONTAINS(_ANY/_ALL), JSON_CONTAINS(_ANY/_ALL),
  * ARRAY_LENGTH, ST_CONTAINS, TEXT_MATCH — name is lower-cased.
  */
final case class Call(name: String, args: Seq[Node]) extends Node

final class ParseException(msg: String) extends IllegalArgumentException(msg)
