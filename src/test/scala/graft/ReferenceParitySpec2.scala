package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSql

/** Second batch of replays of the reference's OWN regression tests
  * (see ReferenceParitySpec for the first). Each test cites the
  * `/root/reference/testing/` file it reproduces and asserts that
  * file's expected values verbatim. Documented divergences:
  * booleans render as true/false (MLDB renders 1/0), un-aliased
  * expression columns are named `_cN` (MLDB uses the surface text) —
  * the replays alias where the reference relies on surface names.
  */
class ReferenceParitySpec2 extends AnyFunSuite {

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
  private def one(sql: String): Row = q(sql).head()

  private def rowsOf(sql: String): Seq[Seq[Any]] =
    q(sql).collect().toSeq.map(r => (0 until r.length).map(r.get))

  // --- MLDB-2040_join_tests.py ---------------------------------------------
  // the a/b datasets from the reference's setUpClass

  private lazy val joinData: Unit = {
    e.recordRows("a2040",
      """[{"rowName":"row1","one":1,"two":1},{"rowName":"row2","one":1,"two":2},
        |{"rowName":"row3","one":2,"two":1},{"rowName":"row4","one":2,"two":2}]"""
        .stripMargin.replace("\n", ""))
    e.recordRows("b2040",
      """[{"rowName":"row0","one":0},{"rowName":"row1","one":1},
        |{"rowName":"row2","one":2}]""".stripMargin.replace("\n", ""))
  }

  /** (rowName, a.one, a.two, b.one) in rowName order — the reference's
    * table shape for the a-vs-b queries. */
  private def ab(cond: String, join: String = "LEFT JOIN"): Seq[(String, Any, Any, Any)] = {
    joinData
    q(s"""SELECT rowName() AS rn, a2040.one, a2040.two, b2040.one
         |FROM a2040 $join b2040 ON $cond ORDER BY rn""".stripMargin)
      .collect().toSeq.map(r => (r.getString(0), r.get(1), r.get(2), r.get(3)))
  }

  test("MLDB-2040: left join gt") {
    assert(ab("a2040.one > b2040.one") === Seq(
      ("[row1]-[row0]", 1L, 1L, 0L), ("[row2]-[row0]", 1L, 2L, 0L),
      ("[row3]-[row0]", 2L, 1L, 0L), ("[row3]-[row1]", 2L, 1L, 1L),
      ("[row4]-[row0]", 2L, 2L, 0L), ("[row4]-[row1]", 2L, 2L, 1L)))
  }

  test("MLDB-2040: left join gte") {
    assert(ab("a2040.one >= b2040.one") === Seq(
      ("[row1]-[row0]", 1L, 1L, 0L), ("[row1]-[row1]", 1L, 1L, 1L),
      ("[row2]-[row0]", 1L, 2L, 0L), ("[row2]-[row1]", 1L, 2L, 1L),
      ("[row3]-[row0]", 2L, 1L, 0L), ("[row3]-[row1]", 2L, 1L, 1L),
      ("[row3]-[row2]", 2L, 1L, 2L), ("[row4]-[row0]", 2L, 2L, 0L),
      ("[row4]-[row1]", 2L, 2L, 1L), ("[row4]-[row2]", 2L, 2L, 2L)))
  }

  test("MLDB-2040: left join lt pads unmatched") {
    assert(ab("a2040.one < b2040.one") === Seq(
      ("[row1]-[row2]", 1L, 1L, 2L), ("[row2]-[row2]", 1L, 2L, 2L),
      ("[row3]-[]", 2L, 1L, null), ("[row4]-[]", 2L, 2L, null)))
  }

  test("MLDB-2040: left join lte") {
    assert(ab("a2040.one <= b2040.one") === Seq(
      ("[row1]-[row1]", 1L, 1L, 1L), ("[row1]-[row2]", 1L, 1L, 2L),
      ("[row2]-[row1]", 1L, 2L, 1L), ("[row2]-[row2]", 1L, 2L, 2L),
      ("[row3]-[row2]", 2L, 1L, 2L), ("[row4]-[row2]", 2L, 2L, 2L)))
  }

  test("MLDB-2040: left join no match pads every left row") {
    assert(ab("a2040.one - 100 > b2040.one") === Seq(
      ("[row1]-[]", 1L, 1L, null), ("[row2]-[]", 1L, 2L, null),
      ("[row3]-[]", 2L, 1L, null), ("[row4]-[]", 2L, 2L, null)))
  }

  test("MLDB-2040: left join dual-condition batteries") {
    assert(ab("a2040.one > b2040.one AND a2040.two > b2040.one") === Seq(
      ("[row1]-[row0]", 1L, 1L, 0L), ("[row2]-[row0]", 1L, 2L, 0L),
      ("[row3]-[row0]", 2L, 1L, 0L), ("[row4]-[row0]", 2L, 2L, 0L),
      ("[row4]-[row1]", 2L, 2L, 1L)))
    assert(ab("a2040.one > b2040.one AND a2040.two - 1 < b2040.one") === Seq(
      ("[row1]-[]", 1L, 1L, null), ("[row2]-[]", 1L, 2L, null),
      ("[row3]-[row1]", 2L, 1L, 1L), ("[row4]-[]", 2L, 2L, null)))
    assert(ab("a2040.one >= b2040.one AND a2040.two >= b2040.one") === Seq(
      ("[row1]-[row0]", 1L, 1L, 0L), ("[row1]-[row1]", 1L, 1L, 1L),
      ("[row2]-[row0]", 1L, 2L, 0L), ("[row2]-[row1]", 1L, 2L, 1L),
      ("[row3]-[row0]", 2L, 1L, 0L), ("[row3]-[row1]", 2L, 1L, 1L),
      ("[row4]-[row0]", 2L, 2L, 0L), ("[row4]-[row1]", 2L, 2L, 1L),
      ("[row4]-[row2]", 2L, 2L, 2L)))
    assert(ab("a2040.one >= b2040.one AND a2040.two <= b2040.one") === Seq(
      ("[row1]-[row1]", 1L, 1L, 1L), ("[row2]-[]", 1L, 2L, null),
      ("[row3]-[row1]", 2L, 1L, 1L), ("[row3]-[row2]", 2L, 1L, 2L),
      ("[row4]-[row2]", 2L, 2L, 2L)))
    assert(ab("a2040.one < b2040.one AND a2040.two < b2040.one") === Seq(
      ("[row1]-[row2]", 1L, 1L, 2L), ("[row2]-[]", 1L, 2L, null),
      ("[row3]-[]", 2L, 1L, null), ("[row4]-[]", 2L, 2L, null)))
    assert(ab("a2040.one <= b2040.one AND a2040.two <= b2040.one") === Seq(
      ("[row1]-[row1]", 1L, 1L, 1L), ("[row1]-[row2]", 1L, 1L, 2L),
      ("[row2]-[row2]", 1L, 2L, 2L), ("[row3]-[row2]", 2L, 1L, 2L),
      ("[row4]-[row2]", 2L, 2L, 2L)))
  }

  test("MLDB-2040: equi left/right joins with multi-match rhs") {
    joinData
    e.recordRows("rhs2040",
      """[{"rowName":"row1","one":1,"two":1},{"rowName":"row2","one":1,"two":2},
        |{"rowName":"row22","one":1,"two":2},{"rowName":"row11","one":1,"two":1}]"""
        .stripMargin.replace("\n", ""))
    def names(join: String): Seq[String] =
      q(s"""SELECT rowName() AS rn FROM a2040 $join rhs2040
           |ON a2040.one = rhs2040.one AND a2040.two = rhs2040.two
           |ORDER BY rn""".stripMargin).collect().toSeq.map(_.getString(0))
    // reference order: "]" sorts after digits, so [row11] < [row1]
    assert(names("LEFT JOIN") === Seq(
      "[row1]-[row11]", "[row1]-[row1]", "[row2]-[row22]", "[row2]-[row2]",
      "[row3]-[]", "[row4]-[]"))
    assert(names("RIGHT JOIN") === Seq(
      "[row1]-[row11]", "[row1]-[row1]", "[row2]-[row22]", "[row2]-[row2]"))
  }

  test("MLDB-2040: joins against an empty dataset (columns resolve to NULL)") {
    joinData
    e.createDataset("empty2040", spark.emptyDataFrame)
    val left = q("""SELECT rowName() AS rn, a2040.one, a2040.two
      |FROM a2040 LEFT JOIN empty2040 ON a2040.one = empty2040.one
      |ORDER BY rn""".stripMargin)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(left === Seq(("[row1]-[]", 1L, 1L), ("[row2]-[]", 1L, 2L),
      ("[row3]-[]", 2L, 1L), ("[row4]-[]", 2L, 2L)))
    assert(q("""SELECT rowName() AS rn FROM a2040
      |RIGHT JOIN empty2040 ON a2040.one = empty2040.one""".stripMargin)
      .count() === 0)
  }

  test("MLDB-2040: full join where neither/some sides match (cross_full_*)") {
    joinData
    e.recordRows("crossr",
      """[{"rowName":"row1","one":1,"two":9},{"rowName":"row2","one":1,"two":9}]"""
        .stripMargin)
    val nothing = q("""SELECT rowName() AS rn, b2040.one, crossr.one, crossr.two
      |FROM b2040 FULL JOIN crossr
      |ON b2040.one < crossr.one AND crossr.two < b2040.one
      |ORDER BY rn""".stripMargin)
      .collect().toSeq.map(r => (r.getString(0), r.get(1), r.get(2), r.get(3)))
    assert(nothing === Seq(
      ("[]-[row1]", null, 1L, 9L), ("[]-[row2]", null, 1L, 9L),
      ("[row0]-[]", 0L, null, null), ("[row1]-[]", 1L, null, null),
      ("[row2]-[]", 2L, null, null)))
    e.recordRows("crossr2",
      """[{"rowName":"row1","one":1,"two":0},{"rowName":"row2","one":1,"two":1}]"""
        .stripMargin)
    val some = q("""SELECT rowName() AS rn, b2040.one, crossr2.one, crossr2.two
      |FROM b2040 FULL JOIN crossr2
      |ON b2040.one > crossr2.one AND b2040.one > crossr2.two
      |ORDER BY rn""".stripMargin)
      .collect().toSeq.map(r => (r.getString(0), r.get(1), r.get(2), r.get(3)))
    assert(some === Seq(
      ("[row0]-[]", 0L, null, null), ("[row1]-[]", 1L, null, null),
      ("[row2]-[row1]", 2L, 1L, 0L), ("[row2]-[row2]", 2L, 1L, 1L)))
  }

  // --- MLDB-1841-distinct-on.py --------------------------------------------

  private lazy val distinctData: Unit =
    e.recordRows("ds1841",
      """[{"rowName":"row1","x":1,"y":1,"z":1},{"rowName":"row2","x":2,"y":2,"z":1},
        |{"rowName":"row3","x":1,"y":3,"z":2},{"rowName":"row4","x":1,"y":4,"z":2},
        |{"rowName":"row5","x":2,"y":5,"z":3}]""".stripMargin.replace("\n", ""))

  test("MLDB-1841: DISTINCT ON basic, desc order, where") {
    distinctData
    assert(rowsOf("SELECT DISTINCT ON (x) x, y FROM ds1841 ORDER BY x,y")
      === Seq(Seq(1L, 1L), Seq(2L, 2L)))
    assert(rowsOf("SELECT DISTINCT ON (x) x, z FROM ds1841 ORDER BY x,y DESC")
      === Seq(Seq(1L, 2L), Seq(2L, 3L)))
    assert(rowsOf(
      "SELECT DISTINCT ON (x) x, y FROM ds1841 WHERE y % 2 = 0 ORDER BY x,y")
      === Seq(Seq(1L, 4L), Seq(2L, 2L)))
  }

  test("MLDB-1841: DISTINCT ON with OFFSET/LIMIT applies after the distinct") {
    distinctData
    assert(rowsOf("SELECT DISTINCT ON (z) x, y FROM ds1841 ORDER BY z OFFSET 1")
      === Seq(Seq(1L, 3L), Seq(2L, 5L)))
    assert(rowsOf("SELECT DISTINCT ON (z) x, y FROM ds1841 ORDER BY z LIMIT 2")
      === Seq(Seq(1L, 1L), Seq(1L, 3L)))
    assert(rowsOf(
      "SELECT DISTINCT ON (z) x, y FROM ds1841 ORDER BY z LIMIT 1 OFFSET 1")
      === Seq(Seq(1L, 3L)))
  }

  test("MLDB-1841: DISTINCT ON over GROUP BY, incl. OFFSET/LIMIT") {
    distinctData
    assert(rowsOf("""SELECT DISTINCT ON (max(x)) z, max(x) AS mx
      |FROM ds1841 GROUP BY z ORDER BY max(x)""".stripMargin)
      === Seq(Seq(2L, 1L), Seq(1L, 2L)))
    assert(rowsOf("""SELECT DISTINCT ON (max(x)) z, max(x) AS mx
      |FROM ds1841 GROUP BY z ORDER BY max(x) OFFSET 1""".stripMargin)
      === Seq(Seq(1L, 2L)))
    assert(rowsOf("""SELECT DISTINCT ON (max(x)) z, max(x) AS mx
      |FROM ds1841 GROUP BY z ORDER BY max(x) LIMIT 1""".stripMargin)
      === Seq(Seq(2L, 1L)))
    assert(rowsOf("""SELECT DISTINCT ON (max(x)) z, max(x) AS mx
      |FROM ds1841 GROUP BY z ORDER BY max(x) LIMIT 1 OFFSET 1""".stripMargin)
      === Seq(Seq(1L, 2L)))
  }

  test("MLDB-1841: DISTINCT ON multiple keys, plain and grouped") {
    distinctData
    assert(rowsOf("SELECT DISTINCT ON (x,z) x, z FROM ds1841 ORDER BY x,z")
      === Seq(Seq(1L, 1L), Seq(1L, 2L), Seq(2L, 1L), Seq(2L, 3L)))
    assert(rowsOf("""SELECT DISTINCT ON (max(x),z) max(x) AS mx, z
      |FROM ds1841 GROUP BY z ORDER BY max(x),z""".stripMargin)
      === Seq(Seq(1L, 2L), Seq(2L, 1L), Seq(2L, 3L)))
  }

  test("MLDB-1841: DISTINCT ON in a subselect") {
    distinctData
    assert(rowsOf(
      "SELECT * FROM (SELECT DISTINCT ON (x) x, y FROM ds1841 ORDER BY x,y) ORDER BY x")
      === Seq(Seq(1L, 1L), Seq(2L, 2L)))
    assert(rowsOf(
      """SELECT * FROM (SELECT DISTINCT ON (x) x, y FROM ds1841
        |WHERE y % 2 = 0 ORDER BY x,y) ORDER BY x""".stripMargin)
      === Seq(Seq(1L, 4L), Seq(2L, 2L)))
  }

  test("MLDB-1841: generic DISTINCT and unparenthesized ON raise") {
    distinctData
    val ex = intercept[IllegalArgumentException](
      q("SELECT DISTINCT x FROM ds1841"))
    assert(ex.getMessage.contains("Generic 'DISTINCT' is not currently supported"))
    intercept[IllegalArgumentException](
      q("SELECT DISTINCT ON x FROM ds1841 ORDER BY x"))
  }

  // --- MLDB-2111-group-by-expression.py ------------------------------------

  private lazy val ds2111: Unit =
    e.recordRows("ds2111",
      """[{"rowName":"0","x":1,"y":1},{"rowName":"1","x":1,"y":2},
        |{"rowName":"2","x":2,"y":1},{"rowName":"3","x":2,"y":2}]"""
        .stripMargin.replace("\n", ""))

  test("MLDB-2111: GROUP BY an expression, select it back") {
    assert(rowsOf("SELECT x+1 AS v FROM (SELECT x:1) GROUP BY x+1")
      === Seq(Seq(2L)))
    assert(rowsOf("SELECT x+1 as z FROM (SELECT x:1) GROUP BY x+1")
      === Seq(Seq(2L)))
    assert(rowsOf("SELECT (x+1)*3 as z FROM (SELECT x:1) GROUP BY x+1")
      === Seq(Seq(6L)))
  }

  test("MLDB-2111: multiple expression keys") {
    ds2111
    assert(rowsOf(
      "SELECT x+1 AS v FROM ds2111 GROUP BY x+1, y*2 ORDER BY rowName()")
      === Seq(Seq(2L), Seq(2L), Seq(3L), Seq(3L)))
    // the group row names compose the key values
    assert(q("SELECT rowName() AS rn FROM ds2111 GROUP BY x+1, y*2")
      .collect().map(_.getString(0)).toSet
      === Set("[2,2]", "[2,4]", "[3,2]", "[3,4]"))
  }

  test("MLDB-2111: rowName()/rowHash() under GROUP BY are the group row's") {
    ds2111
    // string keys render Path-printed: quotes doubled and wrapped
    // (the reference test pins "[""0""]")
    val names = q("SELECT rowName() AS rn FROM ds2111 GROUP BY rowName()")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("\"[\"\"0\"\"]\"", "\"[\"\"1\"\"]\"",
      "\"[\"\"2\"\"]\"", "\"[\"\"3\"\"]\""))
    // rowHash() = hash of the composed name, 4 distinct groups
    assert(q("SELECT rowHash() AS h FROM ds2111 GROUP BY rowHash()")
      .collect().map(_.getLong(0)).distinct.length === 4)
  }

  test("MLDB-2111: group key as a function argument and nested call") {
    ds2111
    assert(rowsOf("SELECT sqrt(x * 3) as z FROM ds2111 GROUP BY x * 3 ORDER BY z")
      === Seq(Seq(1.7320508075688772), Seq(2.449489742783178)))
    assert(rowsOf("""SELECT horizontal_sum({x,y}) + 1 as z FROM ds2111
      |GROUP BY horizontal_sum({x,y}) ORDER BY z""".stripMargin)
      === Seq(Seq(3.0), Seq(4.0), Seq(5.0)))
  }

  test("MLDB-2111: NAMED over a group expression") {
    val df = q("SELECT x+1 AS v NAMED (x+1)*2 FROM (SELECT x:1) GROUP BY x+1")
    assert(df.columns.toSeq === Seq("rowName", "v"))
    assert(df.head() === Row("4", 2L))
  }

  test("MLDB-2111: ORDER BY and HAVING over group expressions") {
    ds2111
    assert(rowsOf("SELECT x+1 AS v FROM ds2111 GROUP BY x+1 ORDER BY x+1")
      === Seq(Seq(2L), Seq(3L)))
    assert(rowsOf("SELECT 0 as z FROM ds2111 GROUP BY x+1 HAVING x+1 = 3")
      === Seq(Seq(0L)))
  }

  test("MLDB-2111: inexact group-key references raise the reference error") {
    val ex1 = intercept[IllegalArgumentException](
      q("SELECT x+1 AS v FROM (SELECT x:1) GROUP BY 1+x").collect())
    assert(ex1.getMessage.contains(
      "variable 'x' must appear in the GROUP BY clause"))
    val ex2 = intercept[IllegalArgumentException](
      q("SELECT x+1*3 AS v FROM (SELECT x:1) GROUP BY x+1").collect())
    assert(ex2.getMessage.contains(
      "variable 'x' must appear in the GROUP BY clause"))
  }

  // --- MLDB-1734_case_statement.py -----------------------------------------

  private lazy val ds1734: Unit =
    e.recordRows("ds1734",
      """[{"rowName":"a","x":1},{"rowName":"b","y":1}]""")

  test("MLDB-1734: row-valued CASE with explicit and default ELSE as *") {
    ds1734
    for (els <- Seq("ELSE {}", "")) {
      val df = q(s"""SELECT CASE WHEN x = 1 THEN {z:5, y:8} $els END as *
        |NAMED rowName() FROM ds1734 ORDER BY rowName()""".stripMargin)
      val rows = df.collect().toSeq.map(r =>
        (r.getString(df.columns.indexOf("rowName")),
         r.get(df.columns.indexOf("y")), r.get(df.columns.indexOf("z"))))
      assert(rows === Seq(("a", 8L, 5L), ("b", null, null)), s"else=[$els]")
    }
  }

  test("MLDB-1734: scalar CASE with explicit and default NULL ELSE") {
    ds1734
    for (els <- Seq("ELSE NULL", "")) {
      val rows = q(s"""SELECT CASE WHEN x = 1 THEN 999 $els END AS res
        |NAMED rowName() FROM ds1734 ORDER BY rowName()""".stripMargin)
        .collect().toSeq.map(r => (r.getString(0), r.get(1)))
      assert(rows === Seq(("a", 999L), ("b", null)), s"else=[$els]")
    }
  }

  // --- MLDB-1595-count-distinct.py -----------------------------------------

  test("MLDB-1595: count_distinct over a sparse column and a row") {
    e.recordRows("ds1595",
      """[{"rowName":"a","x":1},{"rowName":"b","x":2},{"rowName":"c"},
        |{"rowName":"d","x":1},{"rowName":"e","x":3}]""".stripMargin.replace("\n", ""))
    assert(one("SELECT count_distinct(x) as v FROM ds1595").getLong(0) === 3L)
    // row form auto-applies per column: v.x = 3 distinct, v.y = 2 distinct
    val r = one("SELECT count_distinct({x as x, x % 2 as y}) as v FROM ds1595")
      .getStruct(0)
    assert(r.getAs[Long]("x") === 3L && r.getAs[Long]("y") === 2L)
  }

  // --- MLDB-1594-aggregator-empty-row.py -----------------------------------

  test("MLDB-1594: sum({*}) over dynamic tokenize columns, with and without the empty row") {
    e.recordRows("toy1594",
      """[{"rowName":"rowA","txt":"hoho things are great!"},
        |{"rowName":"rowB","txt":"! "},
        |{"rowName":"rowC","txt":"things are great, great"}]"""
        .stripMargin.replace("\n", ""))
    for (where <- Seq("WHERE rowName() != 'rowB'", "")) {
      val df = q(s"""SELECT sum({*}) as * NAMED 'pwet' FROM (
        |SELECT tokenize(lower(txt), {splitChars: ' ,.!;:"?', minTokenLength: 2}) as *
        |FROM toy1594 $where)""".stripMargin)
      val r = df.head()
      def v(c: String) = r.getLong(df.columns.indexOf(c))
      assert(r.getString(df.columns.indexOf("rowName")) === "pwet")
      assert((v("are"), v("great"), v("hoho"), v("things")) === ((2L, 3L, 1L, 2L)),
        s"where=[$where]")
    }
  }

  // --- MLDB-1827_operator_null_propagation_test.py -------------------------

  test("MLDB-1827: NULL propagates through + - % / *") {
    e.recordRows("ds1827", """[{"rowName":"row1","val":4}]""")
    for (op <- Seq("+", "-", "%", "/", "*")) {
      assert(one(s"SELECT val $op NULL AS v FROM ds1827").isNullAt(0), s"val $op NULL")
      assert(one(s"SELECT NULL $op NULL AS v FROM ds1827").isNullAt(0), s"NULL $op NULL")
      assert(one(s"SELECT NULL $op val AS v FROM ds1827").isNullAt(0), s"NULL $op val")
    }
  }

  // --- MLDB-238-sorting-missing-values.js ----------------------------------

  test("MLDB-238: rows missing the sort column sort first") {
    e.recordRows("ds238",
      """[{"rowName":"row1","Weight":1,"col2":2},
        |{"rowName":"row2","Weight":2,"col3":2},
        |{"rowName":"row3","Weight2":3,"col3":2}]""".stripMargin.replace("\n", ""))
    val names = q("SELECT rowName() AS rn FROM ds238 ORDER BY Weight, col3")
      .collect().map(_.getString(0)).toSeq
    assert(names === Seq("row3", "row1", "row2"))
  }

  // --- MLDB-1452-like-operator.py ------------------------------------------

  test("MLDB-1452: LIKE in select and where") {
    e.recordRows("ds1452",
      """[{"rowName":"a","x":"acrasial"},{"rowName":"b","x":"blaternation"},
        |{"rowName":"c","x":"citharize"},{"rowName":"d","x":"drollic"},
        |{"rowName":"e","x":"egrote"}]""".stripMargin.replace("\n", ""))
    def likes(p: String): Seq[Boolean] =
      q(s"SELECT x LIKE '$p' as v FROM ds1452 ORDER BY rowName()")
        .collect().map(_.getBoolean(0)).toSeq
    assert(likes("%") === Seq(true, true, true, true, true))
    assert(likes("%o%") === Seq(false, true, false, true, true))
    assert(likes("______") === Seq(false, false, false, false, true))
    assert(likes("___ll__") === Seq(false, false, false, true, false))
    assert(likes("%t_") === Seq(false, false, false, false, true))
    assert(q("SELECT x NOT LIKE '%o%' as v FROM ds1452 ORDER BY rowName()")
      .collect().map(_.getBoolean(0)).toSeq
      === Seq(true, false, true, false, false))
    assert(q("SELECT x FROM ds1452 WHERE x LIKE '%o%' ORDER BY rowName()")
      .collect().map(_.getString(0)).toSeq
      === Seq("blaternation", "drollic", "egrote"))
  }

  test("MLDB-1452: LIKE treats regex metacharacters literally") {
    e.recordRows("ds1452s",
      """[{"rowName":"a","x":"acra[sial"},{"rowName":"b","x":"blate*rnation"},
        |{"rowName":"c","x":"cit.harize"},{"rowName":"d","x":"dro|llic"},
        |{"rowName":"e","x":"eg(ro)te"},{"rowName":"f","x":"famelico$e"},
        |{"rowName":"g","x":"gardev^iance"}]""".stripMargin.replace("\n", ""))
    def matches(p: String): Seq[String] =
      q(s"SELECT x FROM ds1452s WHERE x LIKE '$p' ORDER BY rowName()")
        .collect().map(_.getString(0)).toSeq
    assert(matches("%[____") === Seq("acra[sial"))
    assert(matches("%*%") === Seq("blate*rnation"))
    assert(matches("___.%") === Seq("cit.harize"))
    assert(matches("__o|ll_%") === Seq("dro|llic"))
    assert(matches("%(__)%") === Seq("eg(ro)te"))
    assert(matches("%$%") === Seq("famelico$e"))
    assert(matches("%^%") === Seq("gardev^iance"))
  }

  test("MLDB-1452: NULL LIKE / LIKE NULL are NULL; LIKE binds looser than +") {
    assert(one("SELECT NULL LIKE 'abc' AS res").isNullAt(0))
    assert(one("SELECT 'abc' LIKE NULL AS res").isNullAt(0))
    // MLDB-1617: 'apple' like '%'+'p'+'%' parses as like ('%'+'p'+'%') —
    // the reference only asserts both forms agree (string + string is
    // numeric addition → NULL in both engines)
    val r = one("SELECT 'apple' like ('%' + 'p' + '%') AS a, " +
      "'apple' like '%' + 'p' + '%' AS b")
    assert(r.get(0) === r.get(1))
  }

  test("MLDB-1452: dynamic LIKE pattern from a column") {
    e.recordRows("ds1452d",
      """[{"rowName":"a","x":"hyometer","y":"hyo%"},
        |{"rowName":"b","x":"ichthyarchy","y":"forgetit"}]"""
        .stripMargin.replace("\n", ""))
    assert(q("SELECT x FROM ds1452d WHERE x LIKE y")
      .collect().map(_.getString(0)).toSeq === Seq("hyometer"))
  }

  // --- MLDB-2142-prefix-suffix.py ------------------------------------------

  test("MLDB-2142: remove_prefix / remove_suffix") {
    assert(one("SELECT remove_prefix('awesome', 'awe') AS v").getString(0) === "some")
    assert(one("SELECT remove_prefix('awesome', 'eso') AS v").getString(0) === "awesome")
    assert(one("SELECT remove_suffix('awesome', 'some') AS v").getString(0) === "awe")
    assert(one("SELECT remove_suffix('awesome', 'eso') AS v").getString(0) === "awesome")
  }
}
