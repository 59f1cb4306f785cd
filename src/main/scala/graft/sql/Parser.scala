package graft.sql

import Ast._
import Lexer._

/** Recursive-descent parser for the MLDB SQL dialect.
  *
  * Operator precedence follows the reference's table
  * (`/root/reference/sql/sql_expression.cc:1181-1211`), including the
  * quirk that bitwise & | ^ sit at the same precedence as + and -
  * (level 3); comparisons (incl. LIKE/BETWEEN/IN/IS) bind looser,
  * then NOT, AND, OR.
  */
final class Parser(tokens: Vector[Token], source: String = "") {

  private var p = 0
  private var anonSub = 0
  private def peek: Token = tokens(p)
  private def advance(): Token = { val t = tokens(p); p += 1; t }

  private def isKw(t: Token, w: String): Boolean = t match {
    case TIdent(v, false, _) => v.equalsIgnoreCase(w)
    case _ => false
  }
  private def acceptKw(w: String): Boolean =
    if (isKw(peek, w)) { p += 1; true } else false
  private def expectKw(w: String): Unit =
    if (!acceptKw(w)) fail(s"expected $w")
  private def acceptOp(op: String): Boolean = peek match {
    case TOp(v, _) if v == op => p += 1; true
    case _ => false
  }
  private def expectOp(op: String): Unit =
    if (!acceptOp(op)) fail(s"expected '$op'")
  private def fail(msg: String): Nothing = {
    // report line:column like the reference (MLDB-1601)
    val where =
      if (source.nonEmpty) Lexer.lineCol(source, peek.pos) else s"${peek.pos}"
    throw new IllegalArgumentException(
      s"parse error at $where: $msg (got $peek)")
  }

  private val reserved = Set(
    "select", "named", "from", "when", "where", "group", "having", "order",
    "limit", "offset", "as", "on", "join", "inner", "left", "right", "full",
    "outer", "cross", "and", "or", "not", "is", "null", "true", "false",
    "between", "in", "like", "case", "then", "else", "end", "cast",
    "excluding", "asc", "desc", "distinct", "by", "union", "all", "exists")

  // ---- statement -----------------------------------------------------------

  def parseStatement(): Select = {
    val s = parseSelect()
    peek match {
      case TEnd(_) => s
      case t => fail(s"trailing input")
    }
  }

  def parseSelect(): Select = {
    expectKw("SELECT")
    val distinctOn =
      if (acceptKw("DISTINCT")) {
        // reference validation (MLDB-1841 test_distinct_generic)
        if (!isKw(peek, "ON"))
          throw new IllegalArgumentException(
            "Generic 'DISTINCT' is not currently supported. " +
              "Please use 'DISTINCT ON'.")
        expectKw("ON")
        // reference validation (MLDB-1841 test_distinct_parens)
        if (!acceptOp("("))
          throw new IllegalArgumentException(
            "DISTINCT ON requires a parenthesized expression list")
        val es = parseExprList(); expectOp(")")
        es
      } else Nil
    val items = parseSelectItems()
    val named = if (acceptKw("NAMED")) Some(parseExpr()) else None
    val from = if (acceptKw("FROM")) Some(parseTable()) else None
    val when = if (acceptKw("WHEN")) Some(parseExpr()) else None
    val where = if (acceptKw("WHERE")) Some(parseExpr()) else None
    val groupBy =
      if (acceptKw("GROUP")) { expectKw("BY"); parseExprList() } else Nil
    val having = if (acceptKw("HAVING")) Some(parseExpr()) else None
    val orderBy =
      if (acceptKw("ORDER")) {
        expectKw("BY")
        val items = Vector.newBuilder[OrderItem]
        var more = true
        while (more) {
          val e = parseExpr()
          val asc = if (acceptKw("DESC")) false else { acceptKw("ASC"); true }
          items += OrderItem(e, asc)
          more = acceptOp(",")
        }
        items.result()
      } else Nil
    // reference grammar order is OFFSET then LIMIT; accept both orders
    var offset: Option[Long] = None
    var limit: Option[Long] = None
    var making = true
    while (making) {
      if (offset.isEmpty && acceptKw("OFFSET")) offset = Some(parseIntLit())
      else if (limit.isEmpty && acceptKw("LIMIT")) limit = Some(parseIntLit())
      else making = false
    }
    Select(items, named, distinctOn, from, when, where, groupBy, having,
      orderBy, offset, limit)
  }

  private def parseIntLit(): Long = advance() match {
    case TNum(v, true, _) => v.toLong
    case t => fail("expected integer literal")
  }

  private def parseSelectItems(): Seq[SelectItem] = {
    val items = Vector.newBuilder[SelectItem]
    var more = true
    while (more) {
      items += parseSelectItem()
      more = acceptOp(",")
    }
    items.result()
  }

  private def parseSelectItem(): SelectItem = {
    if (isKw(peek, "COLUMN") && isKw(tokens(p + 1), "EXPR")) {
      p += 2
      // STRUCTURED keeps nested column structure in the reference
      // (MLDB-1933) — the typed engine's columns ARE structured, so
      // the flag parses and is a no-op
      acceptKw("STRUCTURED")
      expectOp("(")
      // `(SELECT <value-expr> …)`: per-column VALUE transform with
      // value() bound to each column (MLDB-1933); a bare SELECT * /
      // SELECT value() is the identity
      val value = if (acceptKw("SELECT")) {
        if (acceptOp("*")) None
        else Some(parseExpr()).filterNot {
          case FnCall("value", Seq(), _) => true
          case _ => false
        }
      } else None
      val as = if (acceptKw("AS")) Some(parseExpr()) else None
      val where = if (acceptKw("WHERE")) Some(parseExpr()) else None
      val orderBy =
        if (acceptKw("ORDER")) {
          expectKw("BY")
          val items = Vector.newBuilder[OrderItem]
          var more = true
          while (more) {
            val e = parseExpr()
            val asc = if (acceptKw("DESC")) false else { acceptKw("ASC"); true }
            items += OrderItem(e, asc)
            more = acceptOp(",")
          }
          items.result()
        } else Nil
      var offset: Option[Long] = None
      var limit: Option[Long] = None
      var making = true
      while (making) {
        if (offset.isEmpty && acceptKw("OFFSET")) offset = Some(parseIntLit())
        else if (limit.isEmpty && acceptKw("LIMIT")) limit = Some(parseIntLit())
        else making = false
      }
      expectOp(")")
      SelectItem(ColumnExprStar(as, where, orderBy, limit, offset, value),
        None)
    } else if (acceptOp("*")) {
      val excl = parseExclList()
      // `* AS *` is the identity rename (column_name_test); a non-star
      // rename after `*` keeps the column names prefixed by it
      val rename =
        if (acceptKw("AS")) {
          if (acceptOp("*")) Some("")
          else { val np = parseIdentName(); expectOp("*"); Some(np) }
        } else None
      SelectItem(Star(excl, "", rename), None)
    } else if (peekQualifiedStar()) {
      // `a.*` / `"a."*` (MLDB-835/1313): a frame alias expands that
      // side's columns; otherwise a column-path prefix (`a.` matches
      // `a.b`). The lowering decides which by looking at the scope.
      val prefix = advance() match {
        case TIdent(v, true, _) => v // quoted: verbatim prefix ("a.")
        case TIdent(v, false, _) =>
          acceptOp(".")
          // further dotted segments before the `*` (MLDBFB-634:
          // `x.a.*` = frame alias x, column prefix a.)
          var s = v + "."
          var cont = true
          while (cont) peek match {
            case TIdent(w, false, _) if tokens.lift(p + 1).exists {
                  case TOp(".", _) => true; case _ => false } =>
              p += 2; s = s + w + "."
            case _ => cont = false
          }
          s
        case _ => fail("expected identifier")
      }
      expectOp("*")
      val excl = parseExclList()
      val rename =
        if (acceptKw("AS")) {
          // `tok.* AS *` strips the qualifier (MLDB-1843's f3)
          if (acceptOp("*")) Some("")
          else { val np = parseIdentName(); expectOp("*"); Some(np) }
        } else None
      SelectItem(Star(excl, prefix, rename), None)
    } else if (peekPrefixWildcard()) {
      val prefix = parseIdentName()
      expectOp("*")
      // `x* EXCLUDING (x3) AS y*` (MLDB-832): exclusion list applies
      // before the prefix rename
      val excl = parseExclList()
      val rename =
        if (acceptKw("AS")) {
          val np = parseIdentName()
          expectOp("*")
          Some(np)
        } else None
      SelectItem(Star(excl, prefix, rename), None)
    } else if (peekNameColon()) {
      // `SELECT x: 1` — the reference's name-first shorthand for
      // `SELECT 1 AS x` (MLDB-2111 uses `SELECT x:1` subselects);
      // dotted `x.y:` names the item x.y (column_name_test)
      var name = parseIdentName()
      while (acceptOp(".")) name = name + "." + parseIdentName()
      expectOp(":")
      SelectItem(parseExpr(), Some(name))
    } else {
      val e = parseExpr()
      val alias =
        if (acceptKw("AS")) {
          // `expr AS *` expands a row literal's fields into columns;
          // `AS x.y` is a dotted output name (column_name_test)
          if (acceptOp("*")) Some("*")
          else {
            var n = parseIdentName()
            while (acceptOp(".")) n = n + "." + parseIdentName()
            Some(n)
          }
        } else peek match {
          // bare alias (ident that is not a clause keyword)
          case TIdent(v, q, _) if q || !reserved(v.toLowerCase) =>
            p += 1; Some(v)
          case _ => None
        }
      SelectItem(e, alias)
    }
  }

  private def parseIdentName(): String = advance() match {
    case TIdent(v, _, _) => v
    case t => fail("expected identifier")
  }

  /** A dotted output PATH inside `f({…})[scores."Iris-setosa"]`
    * (MLDB-647): segments re-quote when they carry dots/quotes so the
    * lowered extraction can split them back. */
  private def parseOutputPath(): String = {
    def seg(): String = {
      val s = parseIdentName()
      if (s.exists(c => c == '.' || c == '"'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    var out = seg()
    while (acceptOp(".")) out = out + "." + seg()
    out
  }

  private def camelFns = Parser.camelFns

  /** Function names are CASE-SENSITIVE in the reference (MLDB-957:
    * `POWER(x,2)` errors while `power(x,2)` works; camelCase builtins
    * like rowName() keep their canonical spelling). Dispatch stays
    * lowercase internally; a mis-cased spelling of a KNOWN builtin is
    * rejected here. Unknown (user-function) names pass through —
    * their registries do their own exact-name lookup. */
  private def fnName(surface: String): String = {
    val lower = surface.toLowerCase
    if (surface != lower && !camelFns.get(lower).contains(surface) &&
        (GraftSql.builtinFunctionNames(lower) || camelFns.contains(lower)))
      fail(s"Unable to find function '$surface'")
    lower
  }

  /** `EXCLUDING (a, x*, b.*)` — entries are names or prefix patterns
    * (trailing `*`, MLDB-832; dotted `a.*`, MLDB-835). Returns pattern
    * strings; a trailing '*' means prefix-match. */
  private def parseExclList(): Seq[String] =
    if (!acceptKw("EXCLUDING")) Nil
    else {
      expectOp("(")
      val names = Vector.newBuilder[String]
      var more = true
      while (more) {
        var n = parseIdentName()
        if (acceptOp(".")) { expectOp("*"); n = n + ".*" }
        else if (acceptOp("*")) n = n + "*"
        names += n
        more = acceptOp(",")
      }
      expectOp(")")
      names.result()
    }

  /** `alias.*` or `"prefix"*` select item (MLDB-835/1313). */
  private def peekQualifiedStar(): Boolean = peek match {
    case TIdent(_, true, _) => tokens.lift(p + 1) match {
      case Some(TOp("*", _)) => true
      case _ => false
    }
    case TIdent(v, false, _) if !reserved(v.toLowerCase) =>
      // scan `ident(.ident)*.` followed by `*` (multi-segment:
      // `x.a.*`, MLDBFB-634); `x.a.b * 2` has no dot before the star
      var k = p
      var ok = false
      var done = false
      while (!done) (tokens.lift(k + 1), tokens.lift(k + 2)) match {
        case (Some(TOp(".", _)), Some(TOp("*", _))) => ok = true; done = true
        case (Some(TOp(".", _)), Some(TIdent(_, false, _))) => k += 2
        case _ => done = true
      }
      ok
    case _ => false
  }

  /** `a*` (and `a* AS b*`) vs `a * b` multiplication: a prefix
    * wildcard is IDENT '*' followed by a list/clause boundary or AS. */
  private def peekNameColon(): Boolean = peek match {
    case TIdent(v, q, _) if q || !reserved(v.toLowerCase) =>
      // `a:` or a DOTTED `x.y:` item name (column_name_test
      // `SELECT x.y:1 + 1` names the item x.y)
      var k = p + 1
      var done = false
      var ok = false
      while (!done) (tokens.lift(k), tokens.lift(k + 1)) match {
        case (Some(TOp(":", _)), _) => ok = true; done = true
        case (Some(TOp(".", _)), Some(TIdent(_, _, _))) => k += 2
        case _ => done = true
      }
      ok
    case _ => false
  }

  private def peekPrefixWildcard(): Boolean = peek match {
    case TIdent(v, false, _) if !reserved(v.toLowerCase) =>
      tokens.lift(p + 1) match {
        case Some(TOp("*", _)) => tokens.lift(p + 2) match {
          // `}` closes a row-literal wildcard field (`{x*}`)
          case Some(TOp(",", _)) | Some(TOp("}", _)) | Some(TEnd(_)) => true
          case Some(TIdent(w, false, _)) =>
            w.equalsIgnoreCase("AS") || w.equalsIgnoreCase("EXCLUDING") ||
              Seq("named", "from", "when", "where",
                "group", "having", "order", "limit", "offset")
              .contains(w.toLowerCase)
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  private def parseExprList(): Seq[Expr] = {
    val out = Vector.newBuilder[Expr]
    var more = true
    while (more) { out += parseExpr(); more = acceptOp(",") }
    out.result()
  }

  // ---- FROM / table expressions -------------------------------------------

  private val tableFns =
    Set("transpose", "merge", "sample", "union", "row_dataset", "atom_dataset")

  def parseTable(): TableExpr = {
    var left = parseTablePrimary()
    var more = true
    while (more) {
      val jt =
        if (acceptKw("JOIN")) "inner"
        else if (acceptKw("INNER")) { expectKw("JOIN"); "inner" }
        else if (acceptKw("LEFT")) { acceptKw("OUTER"); expectKw("JOIN"); "left" }
        else if (acceptKw("RIGHT")) { acceptKw("OUTER"); expectKw("JOIN"); "right" }
        else if (acceptKw("FULL")) { acceptKw("OUTER"); expectKw("JOIN"); "full_outer" }
        // bare OUTER JOIN = FULL OUTER (reference, MLDB-1624
        // test_join_on_false)
        else if (acceptKw("OUTER")) { expectKw("JOIN"); "full_outer" }
        else if (acceptKw("CROSS")) { expectKw("JOIN"); "cross" }
        else ""
      if (jt.isEmpty) more = false
      else {
        val right = parseTablePrimary()
        val on = if (acceptKw("ON")) Some(parseExpr()) else None
        left = JoinExpr(left, right, jt, on)
      }
    }
    left
  }

  private def parseTablePrimary(): TableExpr = {
    if (acceptOp("(")) {
      // extra wrapping parens (the reference writes
      // `transpose((select …))`) — unwrap recursively
      if (isSubSelectStart() && (peek match {
        case TOp("(", _) => true; case _ => false
      })) {
        val inner = parseTablePrimary()
        expectOp(")")
        return inner
      }
      val stmt = parseSelect()
      expectOp(")")
      // alias optional (the reference accepts bare `FROM (SELECT …)`)
      val alias =
        if (acceptKw("AS")) parseIdentName()
        else peek match {
          case TIdent(v, quoted, _) if quoted || !reserved(v.toLowerCase) =>
            p += 1; v
          case _ => anonSub += 1; s"__sub$anonSub"
        }
      SubSelect(stmt, alias)
    } else {
      val name = parseIdentName()
      if (tableFns(name.toLowerCase) && acceptOp("(")) {
        val tbls = Vector.newBuilder[TableExpr]
        val args = Vector.newBuilder[Expr]
        val empty = acceptOp(")")
        if (!empty) {
          var more = true
          while (more) {
            peek match {
              case TIdent(v, false, _)
                  if !reserved(v.toLowerCase) && !isExprStart() =>
                tbls += parseTablePrimary()
              // a parenthesized sub-select is a TABLE argument:
              // transpose((SELECT …)) — possibly doubly wrapped
              case TOp("(", _) if isSubSelectStart() =>
                tbls += parseTablePrimary()
              case _ => args += parseExpr()
            }
            more = acceptOp(",")
          }
          expectOp(")")
        }
        // `atom_dataset({…}) AS t` — the alias scopes qualified column
        // reads and join row-name composition (MLDB-1639)
        val alias =
          if (acceptKw("AS")) Some(parseIdentName())
          else peek match {
            case TIdent(v, q, _) if q || !reserved(v.toLowerCase) =>
              p += 1; Some(v)
            case _ => None
          }
        TableFn(name.toLowerCase, tbls.result(), args.result(), alias)
      } else {
        val alias =
          if (acceptKw("AS")) Some(parseIdentName())
          else peek match {
            case TIdent(v, q, _) if q || !reserved(v.toLowerCase) =>
              p += 1; Some(v)
            case _ => None
          }
        TableRef(name, alias)
      }
    }
  }

  /** lookahead: '(' (possibly repeated) followed by SELECT — a
    * parenthesized sub-select used as a table-function argument. */
  private def isSubSelectStart(): Boolean = {
    var i = p
    while (tokens(i) match { case TOp("(", _) => true; case _ => false }) i += 1
    isKw(tokens(i), "SELECT")
  }

  /** lookahead: does the next token start a scalar expression rather
    * than a table name? (number, string, '(' …) */
  private def isExprStart(): Boolean = tokens(p + 1) match {
    case TOp("(", _) => false // ident( … could be nested table fn
    case _ => peek match {
      case TNum(_, _, _) | TStr(_, _) => true
      case _ => false
    }
  }

  // ---- expressions ---------------------------------------------------------

  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (acceptKw("OR")) l = Binary("or", l, parseAnd())
    l
  }

  private def parseAnd(): Expr = {
    var l = parseNot()
    while (acceptKw("AND")) l = Binary("and", l, parseNot())
    l
  }

  private def parseNot(): Expr =
    if (acceptKw("NOT")) Unary("not", parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAdditive()
    var more = true
    while (more) {
      if (acceptOp("=")) l = Binary("=", l, parseAdditive())
      else if (acceptOp("!=") || acceptOp("<>")) l = Binary("!=", l, parseAdditive())
      else if (acceptOp("<=")) l = Binary("<=", l, parseAdditive())
      else if (acceptOp(">=")) l = Binary(">=", l, parseAdditive())
      else if (acceptOp("<")) l = Binary("<", l, parseAdditive())
      else if (acceptOp(">")) l = Binary(">", l, parseAdditive())
      else if (isKw(peek, "LIKE")) { p += 1; l = LikeExpr(l, parseAdditive(), negated = false) }
      else if (isKw(peek, "NOT") && isKw(tokens(p + 1), "LIKE")) {
        p += 2; l = LikeExpr(l, parseAdditive(), negated = true)
      } else if (isKw(peek, "BETWEEN")) {
        p += 1
        val lo = parseAdditive(); expectKw("AND"); val hi = parseAdditive()
        l = Between(l, lo, hi, negated = false)
      } else if (isKw(peek, "NOT") && isKw(tokens(p + 1), "BETWEEN")) {
        p += 2
        val lo = parseAdditive(); expectKw("AND"); val hi = parseAdditive()
        l = Between(l, lo, hi, negated = true)
      } else if (isKw(peek, "IN") ||
          (isKw(peek, "NOT") && isKw(tokens(p + 1), "IN"))) {
        val neg = isKw(peek, "NOT")
        p += (if (neg) 2 else 1)
        expectOp("(")
        if (isKw(peek, "SELECT")) {
          val sub = parseSelect(); expectOp(")")
          l = InSelect(l, sub, neg)
        } else if ((isKw(peek, "KEYS") || isKw(peek, "VALUES")) &&
            isKw(tokens(p + 1), "OF")) {
          val keys = isKw(peek, "KEYS")
          p += 2
          val container = parseExpr(); expectOp(")")
          l = InKeysOf(l, container, neg, keys)
        } else {
          val items = parseExprList(); expectOp(")")
          l = InList(l, items, neg)
        }
      } else more = false
    }
    l
  }

  /** level 3: + - & | ^ || (bitwise shares additive precedence — the
    * reference's quirk). */
  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var more = true
    while (more) {
      if (acceptOp("+")) l = Binary("+", l, parseMultiplicative())
      else if (acceptOp("-")) l = Binary("-", l, parseMultiplicative())
      else if (acceptOp("&")) l = Binary("&", l, parseMultiplicative())
      else if (acceptOp("|")) l = Binary("|", l, parseMultiplicative())
      else if (acceptOp("^")) l = Binary("^", l, parseMultiplicative())
      else if (acceptOp("||")) l = Binary("||", l, parseMultiplicative())
      else more = false
    }
    l
  }

  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    var more = true
    while (more) {
      if (acceptOp("*")) l = Binary("*", l, parseUnary())
      else if (acceptOp("/")) l = Binary("/", l, parseUnary())
      else if (acceptOp("%")) l = Binary("%", l, parseUnary())
      else if (acceptOp("@")) l = Binary("@", l, parseUnary())
      else more = false
    }
    l
  }

  private def parseUnary(): Expr =
    if (acceptOp("-")) Unary("-", parseUnary())
    else if (acceptOp("~")) Unary("~", parseUnary())
    else if (acceptOp("+")) parseUnary()
    else parsePostfix(parsePrimary())

  /** Postfix operators bind tighter than EVERY binary operator — the
    * reference matches them in its parse loop before binary dispatch
    * (`sql/sql_expression.cc:1480-1540`), so `x + 5 IS NOT NULL`
    * means `x + (5 IS NOT NULL)` (MLDB-1736) and
    * `split_part(x, ' ')["2"]` extracts from the call result. */
  private def parsePostfix(e0: Expr): Expr = {
    var l = e0
    var more = true
    while (more) {
      if (peek match { case TOp("[", _) => true; case _ => false }) {
        p += 1
        val key = parseExpr()
        expectOp("]")
        // a SINGLE-QUOTED string inside user-written brackets is the
        // reference's MLDB-2105 quirk: `a['foo']` evaluates to the
        // STRING 'foo' itself, match or not
        // (testing/square_bracket_accessor_test.py — "It doesn't
        // matter that it matches, it's a string"). Marked so the
        // lowering can tell it from internal field extraction.
        l = key match {
          case s: StrLit => Extract(l, Unary("__bracketstr", s))
          case _ => Extract(l, key)
        }
      } else if (isKw(peek, "IS")) {
        p += 1
        val neg = acceptKw("NOT")
        if (acceptKw("NULL")) l = IsNull(l, neg)
        else {
          // type predicates (`sql_expression_operations.h:164`)
          val tpe = Seq("string", "number", "integer", "timestamp",
            "true", "false").find(acceptKw(_))
            .getOrElse(fail("expected NULL or a type after IS"))
          l = IsType(l, tpe, neg)
        }
      } else more = false
    }
    l
  }

  private def parsePrimary(): Expr = {
    peek match {
      case TNum(v, integral, _) => p += 1; NumLit(v, integral)
      case TStr(v, _) => p += 1; StrLit(v)
      case TOp("(", _) =>
        p += 1
        val e = parseExpr()
        expectOp(")")
        e
      case TOp("$", _) =>
        p += 1
        advance() match {
          case TIdent(v, _, _) => Param(v)
          case TNum(v, true, _) => Param(v.toLong.toString)
          case _ => fail("expected parameter name after $")
        }
      case TOp("[", _) =>
        p += 1
        val items = if (acceptOp("]")) Nil else {
          val xs = parseExprList(); expectOp("]"); xs
        }
        ArrayLit(items)
      case TOp("{", _) =>
        p += 1
        // three field forms, mixable (reference row-literal grammar):
        //   name: expr   |   expr AS name   |   expr  (auto-named _i)
        val fields = Vector.newBuilder[(String, Expr)]
        if (!acceptOp("}")) {
          var more = true
          var i = 0
          while (more) {
            // `name:` or a DOTTED `a.b.c:` field name (column_name_test
            // `{x.y: 1 + 1}` — the name is the nested path x.y)
            val named = {
              var k = p
              var sawIdent = false
              var done = false
              while (!done) (tokens.lift(k), tokens.lift(k + 1)) match {
                case (Some(TIdent(_, _, _)), Some(TOp(":", _))) =>
                  sawIdent = true; done = true
                case (Some(TIdent(_, _, _)), Some(TOp(".", _))) => k += 2
                case _ => done = true
              }
              sawIdent
            }
            def exclList(): Seq[String] = parseExclList()
            if (acceptOp("*")) {
              // `{*}` — the whole row as a struct (the reference's
              // feature-vector idiom, e.g. classifier({features: {*}}));
              // `{* AS row.*}` prefixes every column (MLDB-1273)
              val excl = exclList()
              val rename =
                if (acceptKw("AS")) {
                  if (acceptOp("*")) Some("")
                  else {
                    // `row.*` / `a.b.*` nest under the dotted prefix;
                    // `y*` is a plain prefix rename
                    var np = parseIdentName()
                    var dotted = false
                    var cont = true
                    while (cont && acceptOp(".")) {
                      dotted = true
                      if (acceptOp("*")) cont = false
                      else np = np + "." + parseIdentName()
                    }
                    if (cont) expectOp("*")
                    Some(if (dotted) np + "." else np)
                  }
                } else None
              fields += "*" -> Star(excl, "", rename)
            } else if ((peek, tokens.lift(p + 1), tokens.lift(p + 2)) match {
                case (TIdent(v, false, _), Some(TOp(".", _)),
                    Some(TOp("*", _))) => !reserved(v.toLowerCase)
                case _ => false
              }) {
              // `{labels.* [AS *|AS y*]}` — qualified star inside a
              // row literal expands the container's fields
              // (MLDB-2186 `sum({labels.* AS *})`)
              val prefix = parseIdentName()
              expectOp("."); expectOp("*")
              val excl = exclList()
              val rename =
                if (acceptKw("AS")) {
                  if (acceptOp("*")) Some("")
                  else { val np = parseIdentName(); expectOp("*"); Some(np) }
                } else None
              fields += "*" -> Star(excl, prefix + ".", rename)
            } else if (peekPrefixWildcard()) {
              // `{x*}` / `{x* AS y*}` — prefix wildcard inside a row
              // literal (MLDB-832 `{x*} as z`)
              val prefix = parseIdentName()
              expectOp("*")
              val excl = exclList()
              val rename =
                if (acceptKw("AS")) {
                  val np = parseIdentName(); expectOp("*"); Some(np)
                } else None
              fields += "*" -> Star(excl, prefix, rename)
            } else if (named) {
              var name = parseIdentName()
              while (acceptOp(".")) name = name + "." + parseIdentName()
              expectOp(":")
              fields += name -> parseExpr()
            } else {
              val e = parseExpr()
              val name =
                if (acceptKw("AS")) {
                  // `{expr AS *}` splices expr's row fields into this
                  // literal (MLDB-832 `{{*} as *} as *`); a DOTTED
                  // alias nests the field (`{a AS row.a}` — MLDB-1273)
                  if (acceptOp("*")) "*"
                  else {
                    var nm = parseIdentName()
                    while (acceptOp(".")) nm = nm + "." + parseIdentName()
                    nm
                  }
                } else e match {
                  // a bare ident names its field after itself —
                  // `{who, what}` has columns who/what (MLDB-1554)
                  case Ident(parts) => parts.mkString(".")
                  case _ => s"_$i"
                }
              fields += name -> e
            }
            i += 1
            more = acceptOp(",")
          }
          expectOp("}")
        }
        StructLit(fields.result())
      case TIdent(v, false, _) if v.equalsIgnoreCase("INTERVAL") &&
          (tokens.lift(p + 1) match {
            case Some(TStr(_, _)) => true
            case _ => false
          }) =>
        // INTERVAL '<n><unit> …' literal (MLDB-724). Components stay
        // separate: months (month/year), days (day/week), seconds
        // (s/m/h) — the reference's Interval value type.
        p += 1
        val text = advance() match { case TStr(v2, _) => v2; case _ => fail("interval") }
        var months = 0
        var days = 0
        var seconds = 0.0
        val m = java.util.regex.Pattern
          .compile("(\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)").matcher(text)
        var any = false
        var last = 0
        while (m.find()) {
          any = true
          if (text.substring(last, m.start()).trim.nonEmpty)
            fail(s"bad interval literal '$text'")
          last = m.end()
          val num = m.group(1).toDouble
          m.group(2).toLowerCase match {
            case "s" | "sec" | "second" | "seconds" => seconds += num
            case "m" | "min" | "minute" | "minutes" => seconds += num * 60
            case "h" | "hour" | "hours" => seconds += num * 3600
            case "d" | "day" | "days" => days += num.toInt
            case "w" | "week" | "weeks" => days += num.toInt * 7
            case "month" | "months" | "mon" => months += num.toInt
            case "y" | "year" | "years" => months += num.toInt * 12
            case u => fail(s"unknown interval unit '$u'")
          }
        }
        if (!any || text.substring(last).trim.nonEmpty)
          fail(s"bad interval literal '$text'")
        IntervalLit(months, days, seconds)
      case TIdent(v, false, _) if v.equalsIgnoreCase("TIMESTAMP") &&
          (tokens.lift(p + 1) match {
            case Some(TNum(_, _, _)) | Some(TStr(_, _)) => true
            case Some(TIdent(_, true, _)) => true
            case Some(TIdent(w, false, _)) =>
              // TIMESTAMP <variable> (MLDBFB-335: `WHEN
              // value_timestamp() <= TIMESTAMP time`) — a bare
              // identifier casts like the literal forms, unless it is
              // a clause keyword (so a COLUMN named timestamp still
              // parses: `timestamp AS t`, `timestamp, x`)
              !Set("as", "from", "where", "when", "group", "order",
                "limit", "offset", "having", "named", "and", "or",
                "not", "is", "in", "between", "like", "then", "else",
                "end", "asc", "desc", "union", "join", "inner", "left",
                "right", "outer", "full", "cross", "on", "null", "case",
                "by").contains(w.toLowerCase)
            case _ => false
          }) =>
        // TIMESTAMP <seconds> / TIMESTAMP '<iso>' / TIMESTAMP <column>
        // (the reference's timestamp constant syntax, MLDB-1706)
        p += 1
        FnCall("to_timestamp", Seq(parsePrimary()))
      case TIdent(v, false, _) if v.equalsIgnoreCase("NULL") => p += 1; NullLit()
      case TIdent(v, false, _) if v.equalsIgnoreCase("TRUE") => p += 1; BoolLit(true)
      case TIdent(v, false, _) if v.equalsIgnoreCase("FALSE") => p += 1; BoolLit(false)
      case TIdent(v, false, _) if v.equalsIgnoreCase("CASE") => parseCase()
      case TIdent(v, false, _) if v.equalsIgnoreCase("CAST") =>
        p += 1; expectOp("(")
        val e = parseExpr()
        expectKw("AS")
        val to = parseIdentName()
        expectOp(")")
        CastExpr(e, to.toLowerCase)
      case TIdent(_, _, _) =>
        val name = parseIdentName()
        if (acceptOp("(")) {
          if (acceptOp("*")) { expectOp(")"); FnCall(fnName(name), Nil, star = true) }
          else if (acceptOp(")")) {
            // zero-arg appliable output access: `f()[output]`
            // (MLDB-1320 `poil()[output] AS *`)
            if (acceptOp("[")) {
              val out = parseIdentName()
              expectOp("]")
              FnApply(name, Nil, Some(out))
            } else FnCall(fnName(name), Nil)
          }
          else {
            val distinct = acceptKw("DISTINCT")
            val args = parseExprList()
            expectOp(")")
            val fn = if (distinct) s"${fnName(name)}_distinct"
                     else fnName(name)
            // appliable-function syntax: name({row})[output]. A `[{…}]`
            // key is NOT an output name — it is the postfix
            // project/rename extraction (MLDB-1012), left for
            // parsePostfix's Extract.
            (args, peek, tokens.lift(p + 1)) match {
              case (Seq(StructLit(fields)), TOp("[", _), Some(TOp("{", _))) =>
                FnApply(name, fields, None)
              case (Seq(StructLit(fields)), TOp("[", _), _) =>
                p += 1
                val out = parseOutputPath()
                expectOp("]")
                FnApply(name, fields, Some(out))
              case (Seq(StructLit(fields)), _, _) if !distinct =>
                FnApply(name, fields, None)
              case _ => FnCall(fn, args)
            }
          }
        } else {
          // dotted path a.b.c — or a QUALIFIED dataset-context call
          // `alias.rowName()` (MLDB-1361 join conditions)
          val parts = Vector.newBuilder[String]
          parts += name
          while (acceptOp(".")) parts += parseIdentName()
          val ps = parts.result()
          val ctxFns = Set("rowname", "rowhash", "rowpath", "columncount")
          if (ps.size >= 2 && ctxFns(ps.last.toLowerCase) &&
              acceptOp("(")) {
            expectOp(")")
            QualifiedFn(ps.init.mkString("."), ps.last.toLowerCase)
          } else Ident(ps)
        }
      case t => fail("expected expression")
    }
  }

  private def parseCase(): Expr = {
    expectKw("CASE")
    val operand = if (isKw(peek, "WHEN")) None else Some(parseExpr())
    val branches = Vector.newBuilder[(Expr, Expr)]
    while (acceptKw("WHEN")) {
      val c = parseExpr()
      expectKw("THEN")
      branches += c -> parseExpr()
    }
    val orElse = if (acceptKw("ELSE")) Some(parseExpr()) else None
    expectKw("END")
    CaseWhen(operand, branches.result(), orElse)
  }
}

object Parser {
  /** Builtin names whose canonical spelling is camelCase — dispatch is
    * lowercase internally; the canonical form is what prints back out
    * (expression print(), /details introspection). */
  private[sql] val camelFns = Map(
    "rowname" -> "rowName", "rowhash" -> "rowHash", "rowpath" -> "rowPath",
    "rowpathelement" -> "rowPathElement", "leftrowname" -> "leftRowName",
    "rightrowname" -> "rightRowName", "columncount" -> "columnCount",
    "columnname" -> "columnName", "columnpath" -> "columnPath",
    "rowcount" -> "rowCount", "linenumber" -> "lineNumber")

  def parse(sql: String): Select = {
    // a NUL byte anywhere in the query text is rejected like the
    // reference's UTF-8 validation (testing/MLDB-1603: other control
    // characters are legal in string literals, \0 is not)
    if (sql.indexOf('\u0000') >= 0)
      throw new IllegalArgumentException(
        "query string contains an embedded null character")
    new Parser(Lexer.lex(sql), sql).parseStatement()
  }

  /** Parse a standalone value expression (the reference's
    * `SqlExpression::parse` — used by the join-analysis debug
    * builtins, which receive expression TEXT as arguments). */
  def parseExpression(text: String): Ast.Expr = {
    if (text.indexOf('\u0000') >= 0)
      throw new IllegalArgumentException(
        "expression string contains an embedded null character")
    new Parser(Lexer.lex(text), text).parseExpr()
  }
}
