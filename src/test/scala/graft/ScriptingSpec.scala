package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Scripting

class ScriptingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("script.run compiles, sees args, and returns a DataFrame") {
    val src =
      """(spark: org.apache.spark.sql.SparkSession, args: Map[String, Any]) => {
        |  import org.apache.spark.sql.functions._
        |  val dir = args("dir").asInstanceOf[String]
        |  val cap = args("cap").asInstanceOf[Int]
        |  graft.core.Tables.documents(spark, dir)
        |    .filter(col("doc_id") < cap)
        |    .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        |}""".stripMargin
    val df = Scripting.runQuery(spark, src,
      Map("dir" -> sf, "cap" -> 50))
    val total = df.agg(sum(col("n"))).head.getLong(0)
    assert(total == 50L)
  }

  test("scripts return plain values and compilation is cached") {
    val src = "(s: org.apache.spark.sql.SparkSession, a: Map[String, Any]) => " +
      "a(\"x\").asInstanceOf[Int] * 2"
    assert(Scripting.run(spark, src, Map("x" -> 21)) == 42)
    // same source → same compiled instance (no recompilation)
    assert(Scripting.compile(src) eq Scripting.compile(src))
  }

  test("non-function scripts and non-DataFrame results are rejected") {
    intercept[IllegalArgumentException] {
      Scripting.run(spark, "1 + 1")
    }
    intercept[IllegalArgumentException] {
      Scripting.runQuery(spark,
        "(s: org.apache.spark.sql.SparkSession, a: Map[String, Any]) => 7")
    }
  }

  test("python: mldb.query + args + last-line JSON return, reference-style") {
    import graft.api.PyBridge
    val docs = graft.core.Tables.documents(spark, sf)
    val tables: String => org.apache.spark.sql.DataFrame = {
      case "docs" => docs
      case other => throw new IllegalArgumentException(s"no dataset $other")
    }
    // a reference-style script: query the engine, reduce in python,
    // print progress to stdout, emit the result as the last line
    val src =
      """cap = int(args["cap"])
        |rows = mldb.query("SELECT lang, count(*) AS n FROM docs GROUP BY lang ORDER BY lang")
        |mldb.log("got", len(rows), "langs")
        |print("scanning...")
        |total = sum(r["n"] for r in rows)
        |import json
        |print(json.dumps({"langs": len(rows), "total": total, "cap": cap}))
        |""".stripMargin
    val r = PyBridge.run(spark, tables, src, Map("cap" -> "7"))
    assert(r.returnCode === 0, s"stderr: ${r.stderr}")
    assert(r.stdout === "scanning...")
    assert(r.stderr.contains("langs"))
    val expected = docs.count()
    val ret = r.returnJson.getOrElse(fail("no return JSON"))
    assert(ret.contains(s""""total": $expected""") ||
      ret.contains(s""""total":$expected"""), ret)
    assert(ret.contains("\"cap\": 7") || ret.contains("\"cap\":7"), ret)
  }

  test("python: engine errors surface as python exceptions; no-JSON " +
      "last line means no return value; nonzero exit is reported") {
    import graft.api.PyBridge
    val tables: String => org.apache.spark.sql.DataFrame =
      n => throw new IllegalArgumentException(s"no dataset $n")
    // bad SQL → mldb.query raises → script catches and keeps going
    val caught = PyBridge.run(spark, tables,
      """try:
        |    mldb.query("SELECT * FROM nope")
        |    print("unreachable")
        |except RuntimeError as e:
        |    print("caught:", "nope" in str(e))
        |""".stripMargin)
    assert(caught.returnCode === 0, caught.stderr)
    assert(caught.stdout.contains("caught: True"))
    assert(caught.returnJson === None)
    // a crashing script: nonzero return code, traceback on stderr
    val crash = PyBridge.run(spark, tables, "raise ValueError('boom')")
    assert(crash.returnCode !== 0)
    assert(crash.stderr.contains("boom"))
  }
}
