package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle.
  * Column names/types must match the oracle exactly — the driver's
  * comparator sorts columns by name and hashes values.
  *
  * The oracle is a THUNK, not a string: Verify dumps oracle_sql.json
  * only after every query has run, so an oracle may embed literals the
  * implementation computed from the data (the q101-DSIR pattern — a
  * fixed-point score table built ONCE driver-side and inlined into
  * both engines' plans keeps cross-engine transcendentals out of the
  * hash contract). Most oracles are plain static strings; by-name
  * conversion wraps them for free.
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracleFn: Option[() => String]) {
  def oracle: Option[String] = oracleFn.map(_())
}

object QueryDef {
  def apply(name: String, oracle: => String)(
      impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, Some(() => oracle))

  def rowsOnly(name: String)(
      impl: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, impl, None)
}
