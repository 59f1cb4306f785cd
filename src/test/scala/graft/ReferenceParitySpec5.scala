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
  private def q(sql: String) = {
    val df = e.query(sql)
    // positional value pins predate the MLDB-409 implicit row-name
    // passthrough (round 8); the engine marks the implicitly carried
    // column with metadata — NAMED/star-selected row names stay
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }

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

  // --- MLDB-668-object-column-name.py --------------------------------------

  test("MLDB-668: { 1 as x } as y names the field y.x, with and without FROM") {
    e.recordRows("ds668", """[{"rowName":"row_0","x":0}]""")
    for (sql <- Seq("SELECT { 1 as x } as y FROM ds668",
        "SELECT { 1 as x } as y")) {
      val df = q(sql)
      assert(df.columns.toSeq.contains("y"), sql)
      val st = df.schema("y").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(st.fieldNames.toSeq === Seq("x"), sql)
      assert(df.head().getStruct(df.columns.indexOf("y")).getLong(0) === 1L, sql)
    }
  }

  // --- MLDB-902-non-ascii-row-names.py -------------------------------------

  test("MLDB-902: non-ascii row names round-trip through SELECT *") {
    e.recordRows("non-ascii-row",
      """[{"rowName":"françois","x":1.5,"label":"0"}]""")
    val r = q("""select * from "non-ascii-row"""").head()
    assert(r.getAs[String]("rowName") === "françois")
  }

  // --- MLDB-1552-where-and-rowname-optim.py --------------------------------

  test("MLDB-1552: combined column and rowName() predicates with " +
      "DESC ordering") {
    e.recordRows("ds1552",
      (0 until 3).map(i => s"""{"rowName":"row_$i","x":$i}""")
        .mkString("[", ",", "]"))
    val rows = q("""SELECT * FROM ds1552
      |WHERE (x IS NOT null) AND rowName() != 'row_1'
      |order by rowName() desc""".stripMargin).collect()
    assert(rows.map(_.getAs[String]("rowName")).toSeq === Seq("row_2", "row_0"))
    assert(rows.map(_.getAs[Long]("x")).toSeq === Seq(2L, 0L))
  }

  // --- MLDB-1702_comparisons_test.py (EAV superposition comparisons) -------

  test("MLDB-1702: comparisons against superposed cells read the " +
      "latest value per cell") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t4 = java.sql.Timestamp.valueOf("1970-01-01 00:00:04")
    val t5 = java.sql.Timestamp.valueOf("1970-01-01 00:00:05")
    // the file's u1 row: b = (1@4, 1@5), d = (0@4, 1@5), e = (1@4, 0@5)
    val cells = Seq(
      ("u1", "a", 1.0, t4),
      ("u1", "b", 1.0, t4), ("u1", "b", 1.0, t5),
      ("u1", "c", 0.0, t4), ("u1", "c", 0.0, t5),
      ("u1", "d", 0.0, t4), ("u1", "d", 1.0, t5),
      ("u1", "e", 1.0, t4), ("u1", "e", 0.0, t5))
      .toDF("rowName", "column", "num", "ts")
      .select(col("rowName"), col("column"),
        struct(col("num"), lit(null).cast("string").as("str"),
          lit(null).cast("timestamp").as("tsv"),
          lit(null).cast("boolean").as("flag")).as("value"), col("ts"))
    val latest = core.Eav.latest(cells)
      .select(col("column"), col("value.num").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the file's per-letter expectations under = / > against 1
    assert(latest("a") === 1.0) // a = 1 → true
    assert(latest("b") === 1.0) // two ones → still 1
    assert(latest("c") === 0.0)
    assert(latest("d") === 1.0) // 0@4 then 1@5 → latest wins
    assert(latest("e") === 0.0) // 1@4 then 0@5 → latest wins
  }

  // --- MLDBFB-192_row_name_as_string_test.py -------------------------------

  test("MLDBFB-192: CSV rows named by source line number (header = 1)") {
    val f = java.nio.file.Files.createTempFile("graft_192", ".csv")
    java.nio.file.Files.write(f, "header\nval1\nval2\n".getBytes("UTF-8"))
    try {
      val df = graft.sources.Sources.importText(spark, f.toString,
        graft.sources.Sources.TextImportConfig(
          named = Some("lineNumber()")))
      val rows = df.orderBy("rowName").collect()
        .map(r => (r.getAs[String]("rowName"), r.getAs[String]("header")))
      assert(rows.toSeq === Seq(("2", "val1"), ("3", "val2")))
    } finally java.nio.file.Files.delete(f)
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
