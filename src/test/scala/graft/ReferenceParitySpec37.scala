package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-seventh batch of replays of the reference's OWN regression
  * tests — MLDB-415-rawquery.js: ORDER BY rowPath(), and GROUP BY with
  * un-aliased aggregates keeping their surface-text names. */
class ReferenceParitySpec37 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = {
    val df = e.query(sql)
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }

  test("MLDB-415: ORDER BY rowPath(); grouped mins keep surface names") {
    e.recordRows("test415",
      """[{"rowName":"ex1","x":0,"y":0,"label":"cat"},
        |{"rowName":"ex2","x":1,"y":1,"label":"dog"},
        |{"rowName":"ex3","x":1,"y":2,"label":"cat"}]""".stripMargin)
    val rows = q(
      "SELECT rowName() as rn, y, label, x FROM test415 ORDER BY rowPath()")
      .collect()
    assert(rows.map(_.getAs[String]("rn")).toSeq ===
      Seq("ex1", "ex2", "ex3"))
    assert(rows(1).getAs[String]("label") === "dog")
    // grouped, un-aliased aggregates name by surface text
    val g = q("SELECT min(x), min(y), label FROM test415 GROUP BY label")
      .collect().map(r =>
        r.getAs[String]("label") ->
          ((r.getAs[Long]("min(x)"), r.getAs[Long]("min(y)")))).toMap
    assert(g("cat") === ((0L, 0L)), g.toString)
    assert(g("dog") === ((1L, 1L)), g.toString)
  }
}
