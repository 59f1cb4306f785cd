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

  // --- import.text parity battery ------------------------------------------
  // Replays of the reference's import-side regression tests
  // (`testing/import_text_test.py` and friends), exercising the
  // Sources.importText header/encoding/line-level edges that the
  // SQL-side batches never reach.

  import java.nio.file.Files
  private def tmpCsv(lines: String*): String = {
    val f = Files.createTempFile("graft_import7", ".csv")
    Files.writeString(f, lines.mkString)
    f.toString
  }
  private val S = sources.Sources

  test("import_text_test.py test_base: header row + lineNumber row names") {
    val p = tmpCsv("a,b,c\n", "d,e,f\n")
    val df = S.importText(spark, p,
      S.TextImportConfig(named = Some("lineNumber()")))
    val r = df.select("rowName", "a", "b", "c").head()
    // the header is line 1; the single data row is named "2"
    assert(r.getString(0) === "2")
    assert(Seq(r.getString(1), r.getString(2), r.getString(3))
      === Seq("d", "e", "f"))
  }

  test("import_text_test.py test_gen_headers: generated headers are 0..n-1 (MLDB-1741)") {
    val p = tmpCsv("a,b,c\n", "d,e,f\n")
    val df = S.importText(spark, p,
      S.TextImportConfig(headers = false, autoGenerateHeaders = true))
    assert(df.columns.toSeq === Seq("0", "1", "2"))
    assert(df.count() === 2)
  }

  test("import_text_test.py test_conflicting_header_config: the reference's exact message") {
    val p = tmpCsv("a,b,c\n")
    val ex = intercept[IllegalArgumentException] {
      S.importText(spark, p, S.TextImportConfig(
        autoGenerateHeaders = true, headerNames = Seq("colA", "colB", "colC")))
    }
    assert(ex.getMessage.contains(
      "autoGenerateHeaders cannot be true if headers is defined."))
  }

  test("import_text_test.py test_basea_irregular: too many columns fails the import") {
    val p = tmpCsv("a,b,c\n", "d,e\n", "f,g,h,i\n")
    val df = S.importText(spark, p, S.TextImportConfig())
    assertThrows[Exception] { df.collect() }
  }

  test("import_text_test.py MLDB-1797: filename with whitespaces") {
    val df = S.importText(spark,
      "/root/reference/testing/filename with whitespaces.csv")
    assert(df.columns.toSeq === Seq("a", "b"))
    val r = df.head()
    assert((r.getInt(0), r.getInt(1)) === ((1, 2)))
  }

  test("MLDB-1121: csv import produces no duplicate rows") {
    val df = S.importText(spark,
      "/root/reference/testing/MLDB-1121_test_set.csv",
      S.TextImportConfig(headers = false,
        headerNames = Seq("error_msg", "count")))
    assert(df.count() === 9)
    assert(df.select("error_msg").distinct().count() === 9)
  }

  test("MLDB-1155: a missing last value imports as null, not an error") {
    val p = tmpCsv("a,b\n", "1.0,\n", "1.0,1.0\n", "1.0,\"hello\"\n")
    val df = S.importText(spark, p,
      S.TextImportConfig(named = Some("lineNumber()")))
    assert(df.count() === 3)
    val rows = df.orderBy(org.apache.spark.sql.functions
      .col("rowName").cast("int")).collect()
    assert(rows(0).getString(df.columns.indexOf("b")) === null)
    assert(rows(2).getString(df.columns.indexOf("b")) === "hello")
  }

  test("MLDB-1155: DOS line endings import identically") {
    val p = tmpCsv("a,b\r\n", "1.0,\r\n", "1.0,1.0\r\n", "1.0,\"hello\"\r\n")
    val df = S.importText(spark, p)
    assert(df.count() === 3)
    assert(df.collect().map(r =>
      Option(r.getString(df.columns.indexOf("b")))).toSet
      === Set(None, Some("1.0"), Some("hello")))
  }

  test("MLDB-2168: skipLineRegex composes with a custom quoteChar") {
    // the reference replays MLDB-1312-quotechar.csv with quoteChar '#'
    // and skips the '#b#' line; survivors are (a,b) and ("a,b",c)
    val df = S.importText(spark,
      "/root/reference/testing/MLDB-1312-quotechar.csv",
      S.TextImportConfig(quoteChar = "#", encoding = "latin1",
        skipLineRegex = Some(".*#b#.*")))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("a", "b"), ("a,b", "c")))
  }

  test("MLDB-1502: an empty delimiter imports whole lines as one column") {
    val p = tmpCsv("603,politics,trees,pics\n", "604,funny,AskReddit\n")
    val df = S.importText(spark, p,
      S.TextImportConfig(delimiter = "", quoteChar = "",
        headers = false, headerNames = Seq("customLine")))
    assert(df.columns.toSeq === Seq("customLine"))
    assert(df.collect().map(_.getString(0)).toSet
      === Set("603,politics,trees,pics", "604,funny,AskReddit"))
  }

  test("MLDB-1891: a row-valued import select is rejected with the reference's message") {
    val p = tmpCsv("a,b\n", "patate,2\n")
    val ex = intercept[IllegalArgumentException] {
      S.importText(spark, p, S.TextImportConfig(
        select = "CASE a WHEN 'patate' THEN named_struct('z', 0) ELSE named_struct('z', 1) END AS c"))
    }
    assert(ex.getMessage.contains(
      "Import select expression cannot have row-valued columns"))
    // the scalar CASE variant imports fine (test_case_import)
    val ok = S.importText(spark, p, S.TextImportConfig(
      select = "CASE a WHEN 'patate' THEN 0 ELSE 1 END AS c"))
    assert(ok.head().getInt(0) === 0)
  }

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
