package graft.sql

/** Tokenizer for the MLDB SQL dialect. The reference parses with a
  * character-level ParseContext (`/root/reference/sql/sql_expression.cc`);
  * we tokenize up front — same surface: `--` comments, single-quoted
  * strings with '' escaping, double-quoted identifiers, dotted paths
  * handled at the parser level.
  */
object Lexer {

  sealed trait Token { def pos: Int }
  final case class TIdent(v: String, quoted: Boolean, pos: Int) extends Token
  final case class TNum(v: BigDecimal, integral: Boolean, pos: Int) extends Token
  final case class TStr(v: String, pos: Int) extends Token
  final case class TOp(v: String, pos: Int) extends Token
  final case class TEnd(pos: Int) extends Token

  private val multiOps = Seq("<=", ">=", "<>", "!=", "||")
  private val singleOps = "+-*/%<>=&|^~(),.[]{}:$@".toSet

  /** 1-based line:column of a character offset — the reference's
    * error-location convention (MLDB-1601: "1:9"). */
  def lineCol(s: String, pos: Int): String = {
    val upTo = s.take(pos)
    val line = upTo.count(_ == '\n') + 1
    val colPos = pos - (upTo.lastIndexOf('\n') + 1) + 1
    s"$line:$colPos"
  }

  def lex(s: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s(i + 1) == '-') {
        while (i < n && s(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s(i + 1) == '*') {
        // block comment (MLDB-956): NON-nesting like the reference —
        // an inner `/*` does not reopen; the first `*/` closes
        val start = i
        i += 2
        while (i + 1 < n && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        if (i + 1 >= n) throw new IllegalArgumentException(
          s"unterminated block comment at ${lineCol(s, start)}")
        i += 2
      } else if (c == '\'') {
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '\'' && i + 1 < n && s(i + 1) == '\'') { sb += '\''; i += 2 }
          else if (s(i) == '\'') { closed = true; i += 1 }
          else { sb += s(i); i += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"unterminated string literal at ${lineCol(s, start)}")
        out += TStr(sb.toString, start)
      } else if (c == '"') {
        val sb = new StringBuilder
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s(i) == '"' && i + 1 < n && s(i + 1) == '"') { sb += '"'; i += 2 }
          else if (s(i) == '"') { closed = true; i += 1 }
          else { sb += s(i); i += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"unterminated quoted identifier at ${lineCol(s, start)}")
        out += TIdent(sb.toString, quoted = true, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        var hasDot = false
        var hasExp = false
        while (i < n && (s(i).isDigit || (s(i) == '.' && !hasDot && !hasExp) ||
            ((s(i) == 'e' || s(i) == 'E') && !hasExp && i + 1 < n &&
              (s(i + 1).isDigit || s(i + 1) == '-' || s(i + 1) == '+')) ||
            ((s(i) == '-' || s(i) == '+') && i > start &&
              (s(i - 1) == 'e' || s(i - 1) == 'E')))) {
          if (s(i) == '.') hasDot = true
          if (s(i) == 'e' || s(i) == 'E') hasExp = true
          i += 1
        }
        val text = s.substring(start, i)
        out += TNum(BigDecimal(text), integral = !hasDot && !hasExp, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TIdent(s.substring(start, i), quoted = false, start)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (multiOps.contains(two)) { out += TOp(two, i); i += 2 }
        else if (singleOps(c)) { out += TOp(c.toString, i); i += 1 }
        else throw new IllegalArgumentException(
          s"unexpected character '$c' at ${lineCol(s, i)}")
      }
    }
    out += TEnd(n)
    out.result()
  }
}
