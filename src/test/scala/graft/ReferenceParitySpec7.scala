package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Seventh batch of replays of the reference's OWN regression tests.
  * Each test cites the `/root/reference/testing/` file it reproduces
  * and asserts that file's expected values verbatim. */
class ReferenceParitySpec7 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = e.query(sql)

  // --- MLDB-989-complex-order-by.py ----------------------------------------
  // Four rows with index 0..3; each test orders by a CASE over index
  // and pins the reference's expected index sequence.

  private lazy val data989: Unit = {
    e.recordRows("test_data",
      """[{"rowName":"row0","index":0},{"rowName":"row1","index":1},
         |{"rowName":"row2","index":2},{"rowName":"row3","index":3}]"""
        .stripMargin)
  }

  private def orderBy989(orderBy: String): Seq[Long] = {
    data989
    q(s"select index from test_data order by $orderBy")
      .collect().toSeq.map(_.getLong(0))
  }

  test("MLDB-989: row-type ORDER BY, sorted columns") {
    assert(orderBy989(
      "case when index % 4 = 1 then {a:1, b:2} when index % 4 = 2 then " +
        "{a:0, b:3} when index % 4 = 3 then {a:0, c:4} else null end")
      === Seq(0L, 2L, 3L, 1L))
  }

  test("MLDB-989: row-type ORDER BY, unsorted columns") {
    // rows compare as their SORTED (column, value) entry list, so
    // declaration order {b:3, a:0} must not matter
    assert(orderBy989(
      "case when index % 4 = 1 then {a:1, b:2} when index % 4 = 2 then " +
        "{b:3, a:0} when index % 4 = 3 then {c:4, a:0} else null end")
      === Seq(0L, 2L, 3L, 1L))
  }

  test("MLDB-989: mixed-type ORDER BY total order (null < atom < row < embedding)") {
    assert(orderBy989(
      "case when index % 4 = 1 then 3 when index % 4 = 2 then null " +
        "when index % 4 = 3 then {a:1, b:2} else [0,3] end")
      === Seq(2L, 1L, 3L, 0L))
  }

  test("MLDB-989: embedding-type ORDER BY is element-wise") {
    assert(orderBy989(
      "case when index % 4 = 1 then [3.3, 34.0] when index % 4 = 2 then " +
        "[64.2, 34.0] when index % 4 = 3 then [64.1999, 34.0] " +
        "else [3.3, 3.0] end")
      === Seq(0L, 1L, 3L, 2L))
  }

  test("MLDB-989: ORDER BY tokenize bag sorts by sorted entry list") {
    e.recordRows("str_test_data",
      """[{"rowName":"row1","terms":"c++,python,c++,java,c++"},
         |{"rowName":"row2","terms":"scala,scala,java,java,scala,java,scala,c++"},
         |{"rowName":"row3","terms":"python,ada,ada"}]""".stripMargin)
    val names = q(
      "select rowName() as rn from str_test_data order by tokenize(terms)")
      .collect().toSeq.map(_.getString(0))
    assert(names === Seq("row3", "row2", "row1"))
  }

  // --- MLDB-1315-row-table-expressions.js ----------------------------------

  test("MLDB-1315: sql.query over row_dataset($input) applies per call") {
    e.createSqlQueryDialectFunction("poil",
      "SELECT upper(column) AS column, value FROM row_dataset($input) " +
        "WHERE CAST (value AS NUMBER) IS NULL",
      output = "NAMED_COLUMNS")
    val r = q("SELECT poil({input: {x: 1, y: 2, z: 'three'}})[output] as *")
    // only the non-numeric cell survives the CAST filter, uppercased
    assert(r.columns.toSeq === Seq("Z"))
    assert(r.head().getString(0) === "three")
  }

  test("MLDB-1315: row_dataset($input) binds the outer row per call") {
    e.recordRows("rp1315",
      """[{"rowName":"r1","a":"hello","b":7},
         |{"rowName":"r2","a":"55","b":9}]""".stripMargin)
    e.createSqlQueryDialectFunction("strcells",
      "SELECT upper(column) AS column, value FROM row_dataset($input) " +
        "WHERE CAST (value AS NUMBER) IS NULL",
      output = "NAMED_COLUMNS")
    // per-row apply: r1's `a` is non-numeric (kept), r2's casts (null)
    val rows = q("SELECT strcells({input: {a: a}})[output] as * " +
      "from rp1315 order by rowName()").collect().toSeq
    assert(rows.map(r => Option(r.get(0))) === Seq(Some("hello"), None))
  }

  test("MLDB-1374: SELECT * FROM row_dataset(row literal)") {
    val rows = q("SELECT * FROM row_dataset({x:1, y:2, z:'three'}) " +
      "ORDER BY rowName()").collect().toSeq
    assert(rows.map(_.getString(1)) === Seq("x", "y", "z"))
    assert(rows.map(_.getString(2)) === Seq("1", "2", "three"))
  }

  // --- MLDB-238-sorting-missing-values.js ----------------------------------

  test("MLDB-238: ORDER BY columns with missing values (null first)") {
    e.recordRows("ds238",
      """[{"rowName":"row1","Weight":1,"col2":2},
         |{"rowName":"row2","Weight":2,"col3":2},
         |{"rowName":"row3","Weight2":3,"col3":2}]""".stripMargin)
    val names = q("select rowName() as rn from ds238 order by Weight, col3")
      .collect().toSeq.map(_.getString(0))
    assert(names === Seq("row3", "row1", "row2"))
  }
}
