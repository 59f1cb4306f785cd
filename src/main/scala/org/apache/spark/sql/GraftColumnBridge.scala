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

  /** Checkpointed Datasets carry their ORIGIN plan's statistics into
    * the new `LogicalRDD` leaf (so broadcast decisions survive the
    * cut). In an ITERATIVE loop that is a trap: the size-only stats
    * visitor multiplies join children, so round r's carried estimate
    * feeds round r+1's product — a power tower that overflows
    * `BigInteger`'s supported range (~2^2^31) after ~10 rounds and
    * kills planning with an ArithmeticException (observed in the
    * connected-components closure loop). Clamp: when the carried
    * estimate already exceeds Long.MaxValue — beyond any real dataset,
    * so nothing legitimate is lost and genuinely small frames keep
    * their broadcast-eligible stats — rebuild the leaf WITHOUT origin
    * stats, reverting it to `defaultSizeInBytes` and bounding every
    * subsequent round's product. */
  def clampCarriedStats(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.logical match {
      case l: LogicalRDD
          if l.computeStats().sizeInBytes > BigInt(Long.MaxValue) =>
        ofRows(df.sparkSession, new LogicalRDD(l.output, l.rdd,
          l.outputPartitioning, l.outputOrdering, l.isStreaming,
          l.getStream)(ds.sparkSession, None, None))
      case _ => df
    }
  }

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
