package graft.sql

/** AST for the MLDB SQL dialect (SURVEY §2.1/§2.4).
  *
  * Shape mirrors the reference's `SelectStatement`
  * (`/root/reference/sql/sql_expression.h:1764-1779`): SELECT <select>
  * NAMED <rowName> FROM <from> WHEN <when> WHERE <where> GROUP BY
  * <groupBy> HAVING <having> ORDER BY <orderBy> OFFSET <n> LIMIT <n>.
  * The expression nodes cover `sql_expression_operations.h`'s
  * inventory that is meaningful in wide (typed-column) mode.
  */
object Ast {

  sealed trait Expr
  final case class NullLit() extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  final case class NumLit(v: BigDecimal, isIntegral: Boolean) extends Expr
  final case class StrLit(v: String) extends Expr
  /** Column / path reference, possibly qualified: a.b.c. */
  final case class Ident(parts: Seq[String]) extends Expr
  /** `$name` / `$1` bound query parameter
    * (`sql_expression_operations.h:378`). */
  final case class Param(name: String) extends Expr
  /** `*`, `* EXCLUDING (a, b)`, `prefix*`, or `prefix* AS newprefix*`
    * — only valid as a select item
    * (`doc/builtin/sql/SelectExpression.md:18-41`). */
  final case class Star(excluding: Seq[String], prefix: String = "",
      rename: Option[String] = None) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr
  final case class FnCall(name: String, args: Seq[Expr],
      star: Boolean = false) extends Expr
  /** Appliable-function call `name({a: x, b: y})[out]`
    * (`doc/builtin/sql/ValueExpression.md:244-296`): apply the named
    * user function to the argument row, read output column `out`
    * (None = all outputs as a struct). */
  final case class FnApply(name: String, args: Seq[(String, Expr)],
      output: Option[String]) extends Expr
  final case class CaseWhen(operand: Option[Expr],
      branches: Seq[(Expr, Expr)], orElse: Option[Expr]) extends Expr
  final case class CastExpr(e: Expr, to: String) extends Expr
  final case class Between(e: Expr, lo: Expr, hi: Expr, negated: Boolean) extends Expr
  final case class InList(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr
  final case class InSelect(e: Expr, sub: Select, negated: Boolean) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** `x IS [NOT] STRING|NUMBER|INTEGER|TIMESTAMP|TRUE|FALSE` type
    * predicates (`sql_expression_operations.h:164`). */
  final case class IsType(e: Expr, tpe: String, negated: Boolean) extends Expr
  /** `x [NOT] IN (KEYS OF expr)` / `(VALUES OF expr)`
    * (`sql_expression_operations.h:285-330`). */
  final case class InKeysOf(e: Expr, container: Expr, negated: Boolean,
      keys: Boolean) extends Expr
  /** `COLUMN EXPR (AS … WHERE … ORDER BY … LIMIT … OFFSET …)` —
    * meta-projection over the column set (doc
    * `sql/SelectExpression.md:43-96`); only valid as a select item.
    * The inner expressions see `columnName()`. */
  final case class ColumnExprStar(as: Option[Expr], where: Option[Expr],
      orderBy: Seq[OrderItem], limit: Option[Long],
      offset: Option[Long],
      // `(SELECT <expr>)` per-column value transform, value() bound
      // to each column (MLDB-1933); None = identity
      value: Option[Expr] = None) extends Expr
  final case class LikeExpr(e: Expr, pattern: Expr, negated: Boolean) extends Expr
  /** `e[key]` postfix extraction (reference ExtractExpression,
    * `sql/sql_expression.cc:1495-1506`): string key reads a row/bag
    * field, integer key reads an embedding element (0-based). Binds
    * tighter than every binary operator, like `IS`. */
  final case class Extract(e: Expr, key: Expr) extends Expr
  /** `alias.rowName()` — a dataset-context function qualified by a
    * join-side alias (reference `core/dataset_scope.cc`). */
  final case class QualifiedFn(qualifier: String, name: String) extends Expr
  /** `[a, b, c]` embedding literal. */
  final case class ArrayLit(items: Seq[Expr]) extends Expr
  /** `INTERVAL '1Y2W'` literal (MLDB-724). The reference keeps months
    * / days / seconds as SEPARATE components (1 day ≠ 24 H, 1 month ≠
    * 30 days), so equality is component-wise. */
  final case class IntervalLit(months: Int, days: Int,
      seconds: Double) extends Expr
  /** `{a: x, b: y}` row literal (struct). */
  final case class StructLit(fields: Seq[(String, Expr)]) extends Expr

  final case class SelectItem(e: Expr, alias: Option[String])
  final case class OrderItem(e: Expr, asc: Boolean)

  sealed trait TableExpr
  final case class TableRef(name: String, alias: Option[String]) extends TableExpr
  final case class JoinExpr(l: TableExpr, r: TableExpr, joinType: String,
      on: Option[Expr]) extends TableExpr
  final case class SubSelect(stmt: Select, alias: String) extends TableExpr
  /** Dataset functions: transpose(t), merge(a, b), sample(t, frac). */
  final case class TableFn(name: String, tables: Seq[TableExpr],
      args: Seq[Expr], alias: Option[String] = None) extends TableExpr

  final case class Select(
      items: Seq[SelectItem],
      named: Option[Expr],
      distinctOn: Seq[Expr],
      from: Option[TableExpr],
      when: Option[Expr],
      where: Option[Expr],
      groupBy: Seq[Expr],
      having: Option[Expr],
      orderBy: Seq[OrderItem],
      offset: Option[Long],
      limit: Option[Long])
}
