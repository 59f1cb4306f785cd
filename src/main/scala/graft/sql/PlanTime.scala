package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE contract for plan-time data passes.
  *
  * A handful of reference semantics make a query's output SCHEMA
  * depend on the input DATA: dynamic `expr AS *` map keys,
  * `pivot(k, v) AS *` key sets, `transpose()` row ids,
  * `jseval(...) AS *` / `parse_json(..., {...})` JSON schema
  * inference, and sql.query function registration snapshots. Spark
  * needs the schema before planning, so each of these runs exactly
  * one bounded job over the input BEFORE the main plan builds.
  *
  * Shared contract (every plan-time pass in the engine goes through
  * this object — grep for `PlanTime.` to audit them all):
  *  - ONE extra job per query, pushed down like any other plan
  *    (projection + limit reach the scan);
  *  - capped at `spark.graft.planTimeKeyCap` (default 10000) distinct
  *    keys / sampled documents — over-cap fails fast with the site
  *    name, never silently truncates a SCHEMA;
  *  - registration-time ROW materializations (sql.query functions)
  *    cap at the larger driver-materialization bound the caller
  *    passes ([[graft.api.JsHost.maxQueryRows]]) — they ship data,
  *    not schema, and share its documented limit.
  *
  * At 100 TB an uncapped pre-plan pass is a full scan; the cap keeps
  * every one of these sites O(cap) rows on the driver and lets the
  * scan prune to the key column. */
object PlanTime {

  def cap(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.planTimeKeyCap")
      .map(_.toInt).getOrElse(10000)

  /** Distinct non-null keys of `c` over `df`, sorted, capped.
    * `what` names the calling construct in the over-cap error. */
  def keys(df: DataFrame, c: Column, what: String): Seq[String] = {
    val n = cap(df.sparkSession)
    val ks = df.select(c.cast("string").as("__ptk"))
      .filter(col("__ptk").isNotNull).distinct()
      .limit(n + 1).collect().map(_.getString(0)).toSeq
    require(ks.size <= n,
      s"$what: more than $n plan-time keys (cap " +
        "spark.graft.planTimeKeyCap) — the output schema would be " +
        "unbounded; restrict the key expression")
    ks.sorted
  }

  /** JSON schema of string column `c`, inferred from a capped sample.
    * Unmappable fields (corrupt-record channel, all-null, arrays of
    * null) drop — they cannot be typed from the sample. */
  def jsonSchema(df: DataFrame, c: Column,
      what: String): Seq[org.apache.spark.sql.types.StructField] = {
    val spark = df.sparkSession
    import spark.implicits._
    val strs = df.select(c.cast("string").as("__ptj"))
      .filter(col("__ptj").isNotNull).limit(cap(spark)).as[String]
    spark.read.json(strs).schema.fields.toSeq
      .filterNot(f => f.name == "_corrupt_record" ||
        f.dataType == org.apache.spark.sql.types.NullType ||
        f.dataType == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.NullType, true))
  }

  /** Numeric kind of the string expression `c` over `df`: "long" when
    * every sampled non-empty value is an integer literal, "double"
    * when all are numeric, else "string". Backs `implicit_cast`'s
    * typed lowering (`sql/builtin_functions.cc:949` converts per
    * CELL; a Spark column commits to one type, chosen from the capped
    * sample — mixed columns stay strings, documented divergence). */
  def stringNumericKind(df: DataFrame, c: Column, what: String): String = {
    val sample = df.select(c.cast("string").as("__ptv"))
      .filter(col("__ptv").isNotNull && col("__ptv") =!= "")
      .limit(cap(df.sparkSession))
      .agg(count(lit(1)).as("n"),
        count(when(col("__ptv").rlike("^-?[0-9]+$"), 1)).as("ints"),
        count(when(col("__ptv").rlike(
          "^-?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"), 1))
          .as("nums"))
      .head()
    val (total, ints, nums) =
      (sample.getLong(0), sample.getLong(1), sample.getLong(2))
    if (total == 0L) "string"
    else if (ints == total) "long"
    else if (nums == total) "double"
    else "string"
  }

  /** Max sampled length of array expression `c` — sizes the
    * numbered-path expansion of parse_json's arrays:'parse'
    * (MLDB-1779's friends.0.name). One capped, pruned pass. */
  def maxArrayLen(df: DataFrame, c: Column, what: String): Int = {
    val r = df.select(c.as("__pta")).limit(cap(df.sparkSession))
      .agg(max(size(col("__pta")))).head()
    if (r.isNullAt(0)) 0 else math.max(r.getInt(0), 0)
  }

  /** Materialize a registration-time result, bounded by `maxRows`
    * (the driver-materialization cap, not the key cap). */
  def boundedRows(df: DataFrame, maxRows: Int,
      what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: result exceeds $maxRows rows — restrict the input " +
        "before materializing it on the driver")
    rows
  }
}
