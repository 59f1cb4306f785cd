package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that the optimizer must not see through — an
  * optimization BARRIER, not a computation.
  *
  * Why it exists: a derived verdict column (e.g. a quality battery's
  * `pass`, a conjunction of 13 metrics that each re-tokenize the
  * document) is routinely used as `.filter(col("pass"))`. Predicate
  * pushdown substitutes the alias's FULL definition into the filter
  * condition and keeps substituting as it descends through stacked
  * projections — the condition's tree multiplies at every level, and
  * on a non-scan input (joins/aggregates below) the battery ends up
  * re-evaluated ~20× per row (measured: 23.4s vs 1.1s at sf0.1 for
  * gopherRepetition-over-lineDedup). Marking the verdict
  * non-deterministic stops both PushDownPredicate and CollapseProject
  * at this boundary, so the battery computes once per row and the
  * filter reads the finished boolean attribute.
  *
  * The wrapped expression must itself be deterministic (the marker
  * lies about non-determinism precisely to fence the optimizer; the
  * value is stable, so correctness and retries are unaffected).
  *
  * Contract (spec-pinned in OperatorsSpec):
  *  - A MATERIALIZED verdict column is an ordinary attribute — group,
  *    join, sort and filter on it freely. Only embedding
  *    `Opaque.column(...)` directly inside a grouping/join/sort
  *    EXPRESSION is rejected (by Catalyst, as any nondeterministic
  *    expression there would be).
  *  - The marker alone would also block UNRELATED predicate
  *    transposition through the projection (Spark's pushdown rule
  *    requires every project field deterministic).
  *    [[PushThroughOpaque]] — installed by `Tables.tune`, i.e. every
  *    graft entry point — restores pushdown for conjuncts touching
  *    only pass-through columns; predicates on computed metric
  *    columns intentionally stay above the barrier. */
case class Opaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_opaque"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): Opaque =
    copy(child = c)
}

object Opaque {
  def column(c: Column): Column =
    GraftColumnBridge.column(Opaque(GraftColumnBridge.expression(c)))
}
