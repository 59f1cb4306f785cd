package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fifth batch of replays of the reference's OWN regression tests.
  * Each test cites the `/root/reference/testing/` file it reproduces
  * and asserts that file's expected values verbatim. */
class ReferenceParitySpec5 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = e.query(sql)

  // --- MLDB-1305_rowNames_join.py (the MLDB-1454 WHERE battery) ------------

  test("MLDB-1454: dataset-name and alias qualifiers in WHERE, " +
      "including qualified rowName()") {
    e.recordRows("ds1305",
      """[{"rowName":"row1","col1":"a"},{"rowName":"row2","col2":"b"}]""")
    for (sql <- Seq(
        "SELECT * FROM ds1305 WHERE ds1305.col1 = 'a'",
        "SELECT * FROM ds1305 AS blah WHERE blah.col1 = 'a'",
        "SELECT * FROM ds1305 WHERE ds1305.rowName() = 'row1'",
        "SELECT * FROM ds1305 AS blah WHERE blah.rowName() = 'row1'")) {
      val rows = q(sql).collect()
      assert(rows.length === 1, sql)
      assert(rows.head.getAs[String]("col1") === "a", sql)
    }
  }

  // --- MLDB-1012_nested_function_calls.py ----------------------------------

  test("MLDB-1012: nested sql.expression calls with [{...}] " +
      "project-rename extraction") {
    e.createSqlExpressionFunction("f1012a",
      "input.x*2 as x2, input.y*2 as y2")
    e.createSqlExpressionFunction("f1012b",
      "input.x3*2 as x4, input.y3*2 as y4")
    val one = q("select f1012a( {input: {x: 1, y: 2}} ) as *").head()
    assert(one.getAs[Long]("x2") === 2L)
    assert(one.getAs[Long]("y2") === 4L)
    val two = q("""select f1012b( {input: f1012a( {input: {x: 1, y: 2}} )
      |[{x3: x2, y3: y2}] }) as *""".stripMargin).head()
    assert(two.getAs[Long]("x4") === 4L)
    assert(two.getAs[Long]("y4") === 8L)
  }

  // --- MLDB-1440_sqlexpr_ignore_unknown_param.py ---------------------------

  test("MLDB-1440: sql.expression tolerates unknown arguments; a single " +
      "aliased output is a one-field row") {
    e.createSqlExpressionFunction("noIgnore1440", "a+b as rez")
    val known = q("select noIgnore1440({a:1, b:2}) as *")
    assert(known.columns.toSeq === Seq("rez"))
    assert(known.head().getLong(0) === 3L)
    val extra = q("select noIgnore1440({a:1, b:2, c:5}) as *")
    assert(extra.columns.toSeq === Seq("rez"))
    assert(extra.head().getLong(0) === 3L)
  }

  // --- MLDBFB-440_error_on_ds_wo_cols.py -----------------------------------

  test("MLDBFB-440: sum({*}) over a dataset whose rows have no columns " +
      "returns a row, not an error") {
    e.recordRows("noColDs440", """[{"rowName":"row1"}]""")
    val rows = q("SELECT sum({*}) AS s FROM noColDs440").collect()
    assert(rows.length === 1)
  }

  // --- MLDB-768-order-by-missing-function.js -------------------------------

  test("MLDB-768: ORDER BY an unknown function raises the reference's " +
      "'Unable to find function' error") {
    e.recordRows("ds768", """[{"rowName":"ex1","x":0}]""")
    val ex = intercept[IllegalArgumentException] {
      q("SELECT 1 AS one from ds768 order by hello()")
    }
    assert(ex.getMessage.contains("Unable to find function 'hello'"))
  }

  // --- MLDB-1490-grouped-validation.py -------------------------------------

  test("MLDB-1490: aggregate/builtin composition rules under GROUP BY") {
    e.recordRows("sample1490", """[{"rowName":"a","x":1}]""")
    // all valid per the file — unknown columns aggregate to NULL
    for (sql <- Seq(
        "select count(*) AS c, sum(deletions) AS s from sample1490 group by x",
        "select count(*) AS c, ln(sum(deletions)+1) AS l from sample1490 group by x",
        "select count(*) AS c, sum(ln(deletions+1)) AS s from sample1490 group by x",
        "select count(*) AS c, ln(sum(deletions)+1) AS l from sample1490",
        "select count(*) AS c, sum(ln(deletions+1)) AS s from sample1490"))
      assert(q(sql).collect().length === 1, sql)
    // invalid: a bare variable below an aggregate context
    for (sql <- Seq(
        "select count(*) AS c, ln(deletions+1) AS l from sample1490 group by x",
        "select count(*) AS c, ln(deletions+1) AS l from sample1490")) {
      val ex = intercept[IllegalArgumentException] { q(sql) }
      assert(ex.getMessage.contains(
        "variable 'deletions' must appear in the GROUP BY clause"), sql)
    }
  }

  // --- MLDBFB-545-incorrect_result_on_merged_ds.py -------------------------

  test("MLDBFB-545: WHERE on a merged dataset filters correctly when one " +
      "side lacks the column") {
    e.recordRows("mldbfb545_1", """[{"rowName":"user1","converted":"n"}]""")
    e.recordRows("mldbfb545_2", """[{"rowName":"user2","blah":"blah"}]""")
    assert(q("SELECT * FROM mldbfb545_1 WHERE converted='c' LIMIT 1")
      .count() === 0)
    val merged = graft.operators.Reshape.merge(
      e.dataset("mldbfb545_1"), e.dataset("mldbfb545_2"), "rowName")
    e.createDataset("mldbfb545merged", merged)
    assert(q("SELECT * FROM mldbfb545merged WHERE converted='c' LIMIT 1")
      .count() === 0)
    assert(q("SELECT * FROM mldbfb545merged WHERE converted='n'")
      .count() === 1)
  }

  // --- MLDB-813-rowname_in_join.py -----------------------------------------

  test("MLDB-813: joins keyed on rowName(), qualified outputs and " +
      "composed [l]-[r] row names") {
    e.recordRows("ds813a",
      (0 until 10).map(i => s"""{"rowName":"row_$i","x":$i}""")
        .mkString("[", ",", "]"))
    e.recordRows("ds813b",
      (0 until 5).map(i =>
        s"""{"rowName":"row_$i","ds1_row":"row_$i","y":$i}""")
        .mkString("[", ",", "]"))
    val a = q("""SELECT rowName() AS rn, d1.x, d2.y
      |FROM ds813a AS d1 JOIN ds813b AS d2 ON d1.rowName() = d2.ds1_row
      |ORDER BY rowName()""".stripMargin).collect()
    assert(a.length === 5)
    assert(a.map(_.getString(0)).toSeq ===
      (0 until 5).map(i => s"[row_$i]-[row_$i]"))
    assert(a.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      (0 until 5).map(i => (i.toLong, i.toLong)))
    val b = q("""SELECT ds813b.* FROM ds813b
      |INNER JOIN ds813a ON ds813a.rowName() = ds813b.rowName()
      |ORDER BY ds813b.rowName()""".stripMargin)
    assert(b.count() === 5)
    assert(b.columns.toSet.intersect(Set("ds1_row", "y")) === Set("ds1_row", "y"))
  }

  // --- MLDB-784_sqlquery_join.py -------------------------------------------

  test("MLDB-784: a $param sql.query function applies per row inside " +
      "the dialect as a broadcast-style lookup") {
    e.recordRows("ds784a",
      (0 until 5).map(i => s"""{"rowName":"row_$i","x":$i,"y":${2 * i}}""")
        .mkString("[", ",", "]"))
    e.recordRows("ds784b",
      (0 until 5).map(i => s"""{"rowName":"row_$i","a":${3 * i}}""")
        .mkString("[", ",", "]"))
    e.createSqlQueryDialectFunction("patate784",
      "select * from ds784a where rowName() = $id")
    val r = q("""SELECT a, patate784({rowName() as id}) as *
      |from ds784b where rowName() = 'row_2'""".stripMargin).head()
    assert(r.getAs[Long]("a") === 6L)   // the file's expected a
    assert(r.getAs[Long]("x") === 2L)
    assert(r.getAs[Long]("y") === 4L)   // the file's expected y
    // a non-matching key reads NULL (the reference's empty output row)
    val miss = q("SELECT patate784({'nope' as id}) AS v FROM ds784b LIMIT 1")
      .head()
    assert(miss.isNullAt(0))
  }
}
