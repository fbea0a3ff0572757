package graft.expr

import graft.expr.Lexer._

/** Recursive-descent parser for the Milvus filter-expression language.
  *
  * Precedence (low → high):
  *   or/|| < and/&& < not/! < comparison (chained) / in / like / is / =~
  *   < bitwise &|^ < additive +- < multiplicative * / % < power ** <
  *   unary -+~ < postfix subscript/call.
  */
object Parser {
  def parse(input: String): Node = {
    val p = new Parser(Lexer.tokenize(input))
    val node = p.orExpr()
    p.expectEnd()
    node
  }

  private final class Parser(tokens: Vector[Token]) {
    private var pos = 0
    private def peek: Token = tokens(pos)
    private def advance(): Token = { val t = tokens(pos); pos += 1; t }

    private def isKw(t: Token, kw: String): Boolean = t match {
      case TIdent(text, _) => text.equalsIgnoreCase(kw)
      case _ => false
    }
    private def isOp(t: Token, op: String): Boolean = t match {
      case TOp(text, _) => text == op
      case _ => false
    }
    private def eatKw(kw: String): Boolean =
      if (isKw(peek, kw)) { pos += 1; true } else false
    private def eatOp(op: String): Boolean =
      if (isOp(peek, op)) { pos += 1; true } else false
    private def expectOp(op: String): Unit =
      if (!eatOp(op))
        throw new ParseException(s"expected '$op' at ${peek.pos}, found $peek")

    def expectEnd(): Unit = peek match {
      case TEnd(_) => ()
      case t => throw new ParseException(s"trailing input at ${t.pos}: $t")
    }

    def orExpr(): Node = {
      var l = andExpr()
      while (isKw(peek, "or") || isOp(peek, "||")) {
        advance()
        l = Bin("or", l, andExpr())
      }
      l
    }

    private def andExpr(): Node = {
      var l = notExpr()
      while (isKw(peek, "and") || isOp(peek, "&&")) {
        advance()
        l = Bin("and", l, notExpr())
      }
      l
    }

    private def notExpr(): Node =
      if (eatKw("not") || eatOp("!")) Un("not", notExpr())
      else cmpExpr()

    private val cmpOps = Seq("==", "!=", "<=", ">=", "<", ">")

    private def cmpExpr(): Node = {
      val first = bitExpr()
      peek match {
        case TOp(op, _) if cmpOps.contains(op) =>
          val operands = Seq.newBuilder[Node]
          val ops = Seq.newBuilder[String]
          operands += first
          while (peek match {
            case TOp(o, _) if cmpOps.contains(o) => true
            case _ => false
          }) {
            ops += advance().asInstanceOf[TOp].text
            operands += bitExpr()
          }
          Cmp(operands.result(), ops.result())
        case TOp("=~", _) =>
          advance()
          RegexMatch(first, expectString("regex pattern"))
        case TOp("!~", _) =>
          advance()
          RegexMatch(first, expectString("regex pattern"), negated = true)
        case t if isKw(t, "in") =>
          advance()
          In(first, expectList(), negated = false)
        case t if isKw(t, "like") =>
          advance()
          Like(first, expectString("like pattern"), negated = false)
        case t if isKw(t, "not") && (isKw(tokens(pos + 1), "in") || isKw(tokens(pos + 1), "like")) =>
          advance()
          if (eatKw("in")) In(first, expectList(), negated = true)
          else { eatKw("like"); Like(first, expectString("like pattern"), negated = true) }
        case t if isKw(t, "is") =>
          advance()
          val neg = eatKw("not")
          if (!eatKw("null"))
            throw new ParseException(s"expected NULL after IS at ${peek.pos}")
          IsNull(first, neg)
        case _ => first
      }
    }

    private def bitExpr(): Node = {
      var l = addExpr()
      while (isOp(peek, "&") || isOp(peek, "|") || isOp(peek, "^")) {
        val op = advance().asInstanceOf[TOp].text
        l = Bin(op, l, addExpr())
      }
      l
    }

    private def addExpr(): Node = {
      var l = mulExpr()
      while (isOp(peek, "+") || isOp(peek, "-")) {
        val op = advance().asInstanceOf[TOp].text
        l = Bin(op, l, mulExpr())
      }
      l
    }

    private def mulExpr(): Node = {
      var l = powExpr()
      while (isOp(peek, "*") || isOp(peek, "/") || isOp(peek, "%")) {
        val op = advance().asInstanceOf[TOp].text
        l = Bin(op, l, powExpr())
      }
      l
    }

    private def powExpr(): Node = {
      val base = unary()
      if (eatOp("**")) Bin("**", base, powExpr()) // right-assoc
      else base
    }

    private def unary(): Node =
      if (eatOp("-")) Un("-", unary())
      else if (eatOp("+")) unary()
      else if (eatOp("~")) Un("~", unary())
      else postfix()

    private def postfix(): Node = {
      var e = primary()
      var continue = true
      while (continue) {
        if (eatOp("[")) {
          val key = advance() match {
            case TInt(v, _) => Left(v)
            case TStr(v, _) => Right(v)
            case t => throw new ParseException(
              s"subscript must be int or string at ${t.pos}, found $t")
          }
          expectOp("]")
          e = Subscript(e, key)
        } else continue = false
      }
      e
    }

    private def primary(): Node = advance() match {
      case TInt(v, _) => IntLit(v)
      case TFloat(v, _) => FloatLit(v)
      case TStr(v, _) => StrLit(v)
      case TIdent(text, _) if text.equalsIgnoreCase("true") => BoolLit(true)
      case TIdent(text, _) if text.equalsIgnoreCase("false") => BoolLit(false)
      case TIdent(text, _) =>
        if (eatOp("(")) {
          val args = Seq.newBuilder[Node]
          if (!isOp(peek, ")")) {
            args += orExpr()
            while (eatOp(",")) args += orExpr()
          }
          expectOp(")")
          Call(text.toLowerCase, args.result())
        } else Ident(text)
      case TOp("(", _) =>
        val e = orExpr()
        expectOp(")")
        e
      case TOp("[", _) =>
        val items = Seq.newBuilder[Node]
        if (!isOp(peek, "]")) {
          items += orExpr()
          while (eatOp(",")) items += orExpr()
        }
        expectOp("]")
        ListLit(items.result())
      case t => throw new ParseException(s"unexpected token $t at ${t.pos}")
    }

    private def expectString(what: String): String = advance() match {
      case TStr(v, _) => v
      case t => throw new ParseException(s"expected $what at ${t.pos}, found $t")
    }

    private def expectList(): ListLit = {
      expectOp("[")
      val items = Seq.newBuilder[Node]
      if (!isOp(peek, "]")) {
        items += orExpr()
        while (eatOp(",")) items += orExpr()
      }
      expectOp("]")
      ListLit(items.result())
    }
  }
}
