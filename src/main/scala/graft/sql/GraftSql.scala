package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Public entry point for the MLDB SQL dialect.
  *
  * `GraftSql.query(spark, dir, "SELECT … NAMED … WHEN …")` parses the
  * dialect (recursive descent, reference grammar
  * `/root/reference/sql/sql_expression.cc`) and lowers it to a
  * DataFrame plan — the equivalent of the reference's
  * `GET /v1/query?q=<sql>` path (`server/mldb_server.cc:209-228`)
  * minus the HTTP layer.
  */
object GraftSql {

  /** Query over the driver test tables in `dir`. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame =
    queryTables(spark, name => Tables.load(spark, dir, name) match {
      case df if name == "events" => Tables.events(spark, dir)
      case df => df
    }, sql)

  /** Query over an arbitrary table resolver (the dataset registry). */
  def queryTables(spark: SparkSession, tables: String => DataFrame,
      sql: String, params: Map[String, Any] = Map.empty,
      macros: Map[String, Seq[Ast.SelectItem]] = Map.empty): DataFrame =
    Lowering.run(Lowering.Context(spark, tables, params, macros),
      Parser.parse(sql))

  /** Parameterized query: `$name` placeholders bound from `params`. */
  def query(spark: SparkSession, dir: String, sql: String,
      params: Map[String, Any]): DataFrame =
    queryTables(spark, name => Tables.load(spark, dir, name) match {
      case df if name == "events" => Tables.events(spark, dir)
      case df => df
    }, sql, params)
}
