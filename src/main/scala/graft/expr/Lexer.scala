package graft.expr

/** Tokenizer for the Milvus filter-expression language. */
object Lexer {
  sealed trait Token { def pos: Int }
  final case class TInt(v: Long, pos: Int) extends Token
  final case class TFloat(v: Double, pos: Int) extends Token
  final case class TStr(v: String, pos: Int) extends Token
  /** Identifier or keyword — keyword-ness decided by the parser
    * (case-insensitive match on the lower-cased text).
    */
  final case class TIdent(text: String, pos: Int) extends Token
  /** Punctuation / operator, canonical text. */
  final case class TOp(text: String, pos: Int) extends Token
  final case class TEnd(pos: Int) extends Token

  // Longest-first so `**`/`==`/`<=`/`&&` win over their prefixes.
  private val ops = Seq(
    "**", "==", "!=", ">=", "<=", "=~", "!~", "&&", "||",
    "(", ")", "[", "]", ",", ">", "<", "+", "-", "*", "/", "%",
    "&", "|", "^", "~", "!")

  def tokenize(s: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '"' || c == '\'') {
        val (str, next) = lexString(s, i)
        out += TStr(str, i)
        i = next
      } else if (c == 'r' && i + 1 < n && (s(i + 1) == '"' || s(i + 1) == '\'')) {
        // Raw string r"..." (3.0 surface): no escape processing.
        val quote = s(i + 1)
        val end = s.indexOf(quote, i + 2)
        if (end < 0) throw new ParseException(s"unterminated raw string at $i")
        out += TStr(s.substring(i + 2, end), i)
        i = end + 1
      } else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val (tok, next) = lexNumber(s, i)
        out += tok
        i = next
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < n && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        out += TIdent(s.substring(i, j), i)
        i = j
      } else {
        ops.find(op => s.startsWith(op, i)) match {
          case Some(op) => out += TOp(op, i); i += op.length
          case None =>
            throw new ParseException(s"unexpected character '$c' at position $i")
        }
      }
    }
    out += TEnd(n)
    out.result()
  }

  private def lexString(s: String, start: Int): (String, Int) = {
    val quote = s(start)
    val sb = new StringBuilder
    var i = start + 1
    while (i < s.length) {
      s(i) match {
        case `quote` => return (sb.toString, i + 1)
        case '\\' if i + 1 < s.length =>
          // Escapes per the reference's format_filter_value
          // (common/validators.py:38-42): backslash and quotes; plus the
          // usual control escapes.
          s(i + 1) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case other => sb += other
          }
          i += 2
        case other => sb += other; i += 1
      }
    }
    throw new ParseException(s"unterminated string starting at $start")
  }

  private def lexNumber(s: String, start: Int): (Token, Int) = {
    var i = start
    val n = s.length
    var isFloat = false
    while (i < n && s(i).isDigit) i += 1
    if (i < n && s(i) == '.' && !(i + 1 < n && s(i + 1) == '.')) {
      isFloat = true; i += 1
      while (i < n && s(i).isDigit) i += 1
    }
    if (i < n && (s(i) == 'e' || s(i) == 'E')) {
      var j = i + 1
      if (j < n && (s(j) == '+' || s(j) == '-')) j += 1
      if (j < n && s(j).isDigit) {
        isFloat = true
        i = j
        while (i < n && s(i).isDigit) i += 1
      }
    }
    val text = s.substring(start, i)
    val tok =
      if (isFloat) TFloat(text.toDouble, start)
      else
        // Fall back to float on overflow (corpus has plain ints only).
        try TInt(text.toLong, start)
        catch { case _: NumberFormatException => TFloat(text.toDouble, start) }
    (tok, i)
  }
}
