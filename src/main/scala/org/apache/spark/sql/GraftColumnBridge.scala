package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ↔ Expression converters — the
  * standard hook point for libraries that define native Catalyst
  * expressions (Spark 4 removed the public `new Column(expr)`
  * constructor in favor of ColumnNode indirection).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Logical-plan access for operators Spark implements internally but
    * does not expose in the Scala Dataset API (e.g. AsOfJoin, which
    * only the pandas-on-Spark layer constructs). */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native expression under a SQL-callable name in this
    * session's function registry — makes graft's expressions reachable
    * from `spark.sql(...)` interop, the SparkSessionExtensions-style
    * integration without requiring a restart-time extension jar. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val session = spark.asInstanceOf[classic.SparkSession]
    session.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => builder(exprs), "scala_udf")
  }
}
