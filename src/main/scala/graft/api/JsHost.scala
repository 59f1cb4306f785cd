package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.collection.mutable

import graft.js.JsInterp
import graft.js.JsInterp._

/** Host bindings for engine-side JavaScript — the reference's native
  * plugin/scripting language (`builtin/js/js_plugin_loader.cc`,
  * `builtin/script_procedure.cc`). A script runs with:
  *
  *   - `args`: the request parameters as a JS object (strings),
  *   - `mldb.query(sql)`: the MLDB SQL dialect over the engine's
  *     registered datasets, returning an ARRAY OF OBJECTS (one per
  *     row) — the reference's `mldb.query` shape,
  *   - `mldb.log(...)`: accepted and discarded (results are values,
  *     not logs).
  *
  * `mldb.query` collects driver-side by design — identical to the
  * reference, where plugin JS runs in the server process and a query
  * result is materialized into the V8 heap. The row cap bounds that
  * materialization; datasets at scale stay in Spark and scripts page
  * through them with LIMIT/OFFSET or aggregate before collecting.
  */
object JsHost {

  val maxQueryRows = 100000

  /** External (Row-land) Scala value → JS value. */
  def fromAny(v: Any): JsVal = v match {
    case null => JsNull
    case s: String => JsStr(s)
    case b: Boolean => JsBool(b)
    case n: Byte => JsNum(n.toDouble)
    case n: Short => JsNum(n.toDouble)
    case n: Int => JsNum(n.toDouble)
    case n: Long => JsNum(n.toDouble)
    case n: Float => JsNum(n.toDouble)
    case n: Double => JsNum(n)
    case n: BigDecimal => JsNum(n.toDouble)
    case n: java.math.BigDecimal => JsNum(n.doubleValue())
    case t: java.sql.Timestamp => JsNum(t.getTime.toDouble)
    case t: java.time.Instant => JsNum(t.toEpochMilli.toDouble)
    case t: java.time.LocalDateTime =>
      JsNum(t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli.toDouble)
    case d: java.sql.Date => JsNum(d.getTime.toDouble)
    case d: java.time.LocalDate =>
      JsNum(d.toEpochDay.toDouble * 86400000.0)
    case bytes: Array[Byte] =>
      new JsArrV(mutable.ArrayBuffer.from(
        bytes.map(b => JsNum((b & 0xFF).toDouble): JsVal)))
    case arr: Array[_] =>
      new JsArrV(mutable.ArrayBuffer.from(arr.map(fromAny)))
    case seq: Seq[_] =>
      new JsArrV(mutable.ArrayBuffer.from(seq.map(fromAny)))
    case m: Map[_, _] =>
      val o = mutable.LinkedHashMap.empty[String, JsVal]
      m.foreach { case (k, v2) => o(String.valueOf(k)) = fromAny(v2) }
      new JsObjV(o)
    case r: Row =>
      val o = mutable.LinkedHashMap.empty[String, JsVal]
      r.schema.fieldNames.zipWithIndex.foreach { case (n, i) =>
        o(n) = fromAny(r.get(i))
      }
      new JsObjV(o)
    case other => JsStr(other.toString)
  }

  def rowsToJs(df: DataFrame): JsVal = {
    val rows = df.limit(maxQueryRows + 1).collect()
    if (rows.length > maxQueryRows)
      JsInterp.error(
        s"mldb.query returned more than $maxQueryRows rows; " +
          "add a LIMIT or aggregate before collecting into the script")
    new JsArrV(mutable.ArrayBuffer.from(rows.map(fromAny(_): JsVal)))
  }

  /** The `mldb` host object over a dataset resolver. */
  def mldbObject(spark: SparkSession,
      tables: String => DataFrame): JsObjV = {
    val o = mutable.LinkedHashMap.empty[String, JsVal]
    o("query") = new JsNativeV("query", (_, as) => {
      val sql = toStr(as.headOption.getOrElse(JsUndef))
      rowsToJs(graft.sql.GraftSql.queryTables(spark, tables, sql))
    })
    o("log") = new JsNativeV("log", (_, _) => JsUndef)
    new JsObjV(o)
  }

  /** Run an engine-side JS script: returns the script's result (its
    * `return` value or last expression). */
  def run(spark: SparkSession, tables: String => DataFrame,
      source: String, params: Map[String, String]): JsVal = {
    val argsObj = new JsObjV(mutable.LinkedHashMap.from(
      params.map { case (k, v) => k -> (JsStr(v): JsVal) }))
    JsInterp.run(JsInterp.compile(source), Nil, Nil,
      extraGlobals = Map(
        "mldb" -> mldbObject(spark, tables),
        "args" -> argsObj))
  }

  /** JS value → the JSON the REST layer returns. */
  def resultJson(v: JsVal): String = jsonStringify(v).getOrElse("null")
}
