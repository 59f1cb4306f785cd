package graft.sql

import Ast._

/** Join-condition analysis debug builtins
  * (`/root/reference/sql/builtin_functions.cc:3272-3339`;
  * `sql/join_utils.cc` AnnotatedJoinCondition;
  * testing/MLDB-1562-join-with-in.js):
  *
  *   - `_remove_table_name(exprText, table)` — parse the expression,
  *     strip `table.` qualifications from VARIABLE references (function
  *     calls and wildcards keep their table, like the reference's
  *     `removeTableNameFromExpression`), and return the canonical
  *     `print()` serialization.
  *   - `_analyze_join(left, right, onText, whereText)` — classify the
  *     AND-clauses of on ∧ where into left-only / right-only / cross /
  *     constant conditions, detect the equijoin style, and return the
  *     annotated condition as a row.
  *
  * The `print()` grammar reproduces the reference's exact strings —
  * including its unbalanced-quote quirk in `in("…` — because the test
  * pins them verbatim.
  */
object JoinAnalysis {

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** The reference's SqlExpression::print() serialization for the
    * node types reachable from join conditions. Timestamps on
    * constants print as "NaD" (constants parse at negative infinity).
    */
  def print(e: Expr): String = e match {
    case NullLit() => "constant(null)"
    case BoolLit(b) => s"constant([${if (b) 1 else 0},\"NaD\"])"
    case NumLit(v, _) => s"constant([$v,\"NaD\"])"
    case StrLit(s) => s"constant([${jstr(s)},\"NaD\"])"
    case Ident(parts) => "column(" + jstr(parts.mkString(".")) + ")"
    case QualifiedFn(q, n) =>
      s"function(${jstr(q)},${jstr(Parser.camelFns.getOrElse(n, n))})"
    case FnCall(name, args, _) =>
      // unqualified function: table name prints empty; dispatch names
      // are lowercase internally, canonical camelCase prints back out
      val inner = args.map(a => "," + print(a)).mkString
      s"function(${jstr("")},${jstr(
        Parser.camelFns.getOrElse(name, name))}$inner)"
    case InKeysOf(x, container, _, keys) =>
      // reference quirk: the leading quote after in( is unbalanced,
      // and negation does not print (sql_expression_operations.cc)
      "in(\"" + print(x) + "," + (if (keys) "keys" else "values") + "," +
        print(container) + ")"
    case StructLit(fields) =>
      "select(" + fields.map {
        case ("*", Star(excl, prefix, rename)) =>
          val pfx = prefix.stripSuffix(".")
          val asPfx = rename.map(_.stripSuffix(".")).getOrElse(pfx)
          "columns(" + jstr(pfx) + "," + jstr(asPfx) + ",[" +
            excl.map(jstr).mkString(",") + "])"
        case (n, v) => "computed(" + jstr(n) + "," + print(v) + ")"
      }.mkString(",") + ")"
    case Binary(op, l, r) if Set("=", "!=", "<", ">", "<=", ">=")(op) =>
      s"compare(${jstr(op)},${print(l)},${print(r)})"
    case Binary(op, l, r) if Set("and", "or")(op.toLowerCase) =>
      s"boolean(${jstr(op.toUpperCase)},${print(l)},${print(r)})"
    case Binary(op, l, r) => s"arith(${jstr(op)},${print(l)},${print(r)})"
    case Unary("not", x) => s"boolean(${jstr("NOT")},${print(x)})"
    case Unary(op, x) => s"arith(${jstr(op)},${print(x)})"
    case IsNull(x, neg) =>
      s"istype(${print(x)},${jstr("null")},${if (neg) 0 else 1})"
    case other => throw new IllegalArgumentException(
      s"cannot print expression for join analysis: $other")
  }

  /** removeTableNameFromExpression (`sql/join_utils.cc:72`): rewrite
    * variable references "table.x" → "x"; functions and wildcards
    * keep their qualification. */
  def removeTableName(e: Expr, table: String): Expr = e match {
    case Ident(parts) if parts.length > 1 && parts.head == table =>
      Ident(parts.tail)
    case Ident(_) | NullLit() | BoolLit(_) | NumLit(_, _) | StrLit(_) |
        QualifiedFn(_, _) | Star(_, _, _) => e
    case FnCall(n, args, st) =>
      FnCall(n, args.map(removeTableName(_, table)), st)
    case InKeysOf(x, c, n, k) =>
      InKeysOf(removeTableName(x, table), removeTableName(c, table), n, k)
    case StructLit(fields) => StructLit(fields.map { case (n, v) =>
      (n, removeTableName(v, table)) })
    case Binary(op, l, r) =>
      Binary(op, removeTableName(l, table), removeTableName(r, table))
    case Unary(op, x) => Unary(op, removeTableName(x, table))
    case IsNull(x, n) => IsNull(removeTableName(x, table), n)
    case other => other
  }

  def removeTableNamePrint(exprText: String, table: String): String =
    print(removeTableName(Parser.parseExpression(exprText), table))

  /** Which join sides an expression references: table-qualified
    * variables, functions, and wildcards attribute to their table. */
  private def sidesOf(e: Expr, left: String, right: String): Set[String] = {
    def walk(x: Expr): Set[String] = x match {
      case Ident(parts) if parts.length > 1 && parts.head == left =>
        Set("left")
      case Ident(parts) if parts.length > 1 && parts.head == right =>
        Set("right")
      case Ident(_) => Set.empty
      case QualifiedFn(q, _) =>
        if (q == left) Set("left") else if (q == right) Set("right")
        else Set.empty
      case Star(_, prefix, _) =>
        val p = prefix.stripSuffix(".")
        if (p == left) Set("left") else if (p == right) Set("right")
        else Set.empty
      case StructLit(fields) => fields.map(f => walk(f._2))
        .foldLeft(Set.empty[String])(_ ++ _)
      case FnCall(_, args, _) =>
        args.map(walk).foldLeft(Set.empty[String])(_ ++ _)
      case InKeysOf(a, c, _, _) => walk(a) ++ walk(c)
      case Binary(_, l, r) => walk(l) ++ walk(r)
      case Unary(_, a) => walk(a)
      case IsNull(a, _) => walk(a)
      case _ => Set.empty
    }
    walk(e)
  }

  final case class Annotated(style: String, leftWhere: String,
      rightWhere: String, crossWhere: String, constantWhere: String,
      on: String, where: String)

  /** `_analyze_join`: AND-split on ∧ where, attribute each clause to a
    * side, detect the equijoin pivots (compare("=") with one side
    * each), and print the reassembled per-side/cross/constant where
    * expressions. An absent set of clauses prints as constant true
    * (the reference's `constant([1,"NaD"])`). */
  def analyze(leftTable: String, rightTable: String, onText: String,
      whereText: String): Annotated = {
    val on = Parser.parseExpression(onText)
    val where = Parser.parseExpression(whereText)
    def andSplit(e: Expr): Seq[Expr] = e match {
      case Binary(op, l, r) if op.equalsIgnoreCase("and") =>
        andSplit(l) ++ andSplit(r)
      case BoolLit(true) => Seq.empty // TRUE contributes no clause
      case other => Seq(other)
    }
    val clauses = andSplit(on) ++ andSplit(where)
    val leftOnly = scala.collection.mutable.ArrayBuffer.empty[Expr]
    val rightOnly = scala.collection.mutable.ArrayBuffer.empty[Expr]
    val cross = scala.collection.mutable.ArrayBuffer.empty[Expr]
    val const = scala.collection.mutable.ArrayBuffer.empty[Expr]
    var pivots = 0
    clauses.foreach { c =>
      val sides = sidesOf(c, leftTable, rightTable)
      if (sides == Set("left")) leftOnly += c
      else if (sides == Set("right")) rightOnly += c
      else if (sides.isEmpty) const += c
      else c match {
        case Binary("=", l, r)
            if (sidesOf(l, leftTable, rightTable) == Set("left") &&
              sidesOf(r, leftTable, rightTable) == Set("right")) ||
              (sidesOf(l, leftTable, rightTable) == Set("right") &&
                sidesOf(r, leftTable, rightTable) == Set("left")) =>
          pivots += 1 // equijoin pivot: f(left) = f(right)
        case other => cross += other
      }
    }
    val style =
      if (pivots > 0 && cross.isEmpty) "EQUIJOIN" else "CROSS_JOIN"
    def wherePrint(cs: Seq[Expr]): String =
      if (cs.isEmpty) print(BoolLit(true))
      else print(cs.reduceLeft((a, b) => Binary("AND", a, b)))
    Annotated(style, wherePrint(leftOnly.toSeq), wherePrint(rightOnly.toSeq),
      wherePrint(cross.toSeq), wherePrint(const.toSeq), print(on),
      print(where))
  }
}
