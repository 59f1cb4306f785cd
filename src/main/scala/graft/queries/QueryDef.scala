package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle.
  * Column names/types must match the oracle exactly — the driver's
  * comparator sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, Some(oracle))

  def rowsOnly(name: String)(
      impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, None)
}
