package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{AsOfJoinDirection, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.AsOfJoin

/** As-of (temporal lookup) join: match each left row with the nearest
  * right row by an ordering column, optionally per key and within a
  * tolerance — the standard "latest state at event time" operator for
  * feature pipelines (point-in-time-correct training joins).
  *
  * Not in the reference (MLDB's temporal surface is WHEN + cell
  * timestamps) and not in the public Scala Dataset API; Spark DOES
  * implement it internally for the pandas layer
  * (`catalyst.plans.logical.AsOfJoin`, rewritten by the optimizer to
  * an aggregated join), so we construct that logical node directly —
  * preference (a) "compose existing ops" from the custom-operator
  * ladder, with zero execution code to maintain.
  *
  * Scale: the rewrite plans as a join on the `by` keys with a min_by
  * aggregation over candidates — shuffles both sides once on the key,
  * no global sort, no single-partition window.
  */
object AsOf {

  /** For each left row: the single right row with the greatest
    * `rightOn <= leftOn` (direction backward; forward = smallest
    * `rightOn >= leftOn`; nearest = closest either way), matching on
    * equal `by` keys, within `tolerance` (an interval SQL expression,
    * e.g. "INTERVAL 1 DAY") if given.
    *
    * Column names must not collide across sides (rename before the
    * call); output = left columns ++ matched right columns (nulls when
    * unmatched under left-outer semantics). */
  def join(left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      by: Seq[(String, String)] = Nil,
      tolerance: Option[String] = None,
      allowExactMatches: Boolean = true,
      direction: String = "backward",
      inner: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    val cond: Option[Expression] = by
      .map { case (l, r) =>
        EqualTo(UnresolvedAttribute.quoted(l), UnresolvedAttribute.quoted(r))
          .asInstanceOf[Expression]
      }
      .reduceOption((a, b) => org.apache.spark.sql.catalyst.expressions.And(a, b))
    val tol = tolerance.map(spark.sessionState.sqlParser.parseExpression)
    val plan = AsOfJoin.apply(
      B.logicalPlan(left), B.logicalPlan(right),
      UnresolvedAttribute.quoted(leftOn), UnresolvedAttribute.quoted(rightOn),
      cond,
      if (inner) Inner else LeftOuter,
      tol,
      allowExactMatches,
      AsOfJoinDirection(direction))
    B.ofRows(spark, plan)
  }
}
