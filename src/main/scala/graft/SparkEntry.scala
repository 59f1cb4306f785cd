package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EavQueries, FunctionQueries, PipelineQueries, ProcedureQueries, QueryDef, RelationalQueries, SqlDialectQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY §2 (or an
  * LLM-pipeline extension); `oracleSql` carries the DuckDB-equivalent
  * SQL for every ANSI-expressible query. Column names and types are
  * aligned between the two on purpose — the driver sorts columns by
  * name and hashes values.
  */
object SparkEntry {

  val defs: Seq[QueryDef] =
    RelationalQueries.all ++ FunctionQueries.all ++ PipelineQueries.all ++
      ProcedureQueries.all ++ SqlDialectQueries.all ++ EavQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Operators timed by Bench but outside the correctness gate —
    * native-hash fast paths whose oracle is a mechanics twin (see
    * PipelineQueries.benchOnly). */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.benchOnly.toMap
}
