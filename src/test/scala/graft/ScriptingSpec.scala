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
}
