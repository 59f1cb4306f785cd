package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sixth batch of replays of the reference's OWN regression tests.
  * Each test cites the `/root/reference/testing/` file it reproduces
  * and asserts that file's expected values verbatim. */
class ReferenceParitySpec6 extends AnyFunSuite {

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
  private def oneD(sql: String): Double = q(sql).head().get(0) match {
    case d: java.lang.Double => d
    case l: java.lang.Long => l.toDouble
    case o => o.toString.toDouble
  }

  // --- MLDB-826-vector-ops.js ----------------------------------------------

  test("MLDB-826: vector_* over column-built embeddings") {
    e.recordRows("eg826", """[{"rowName":"r1","a":10,"b":20}]""")
    def vec(sql: String): Seq[Double] =
      q(sql).head().getSeq[Any](0).map {
        case d: Double => d
        case l: Long => l.toDouble
      }
    assert(vec("select vector_sum([a,b], [a,b]) AS v from eg826") === Seq(20.0, 40.0))
    assert(vec("select vector_sum([a], [b]) AS v from eg826") === Seq(30.0))
    assert(vec("select vector_diff([a,b], [a,b]) AS v from eg826") === Seq(0.0, 0.0))
    assert(vec("select vector_product([a,b], [a,b]) AS v from eg826") === Seq(100.0, 400.0))
    assert(vec("select vector_quotient([a,b], [a,b]) AS v from eg826") === Seq(1.0, 1.0))
    e.recordRows("eg826b",
      """[{"rowName":"r1","a2":50,"b2":5,"a1":10,"b1":20}]""")
    assert(vec("select vector_sum([a1, a2], [b1, b2]) AS v from eg826b")
      === Seq(30.0, 55.0))
  }

  // --- MLDB-781-numeric-functions.js ---------------------------------------

  test("MLDB-781: abs/power/sqrt/mod/ceil/floor pins") {
    assert(q("SELECT abs(-1) AS v").head().getLong(0) === 1L)
    assert(oneD("SELECT power(4,2) AS v") === 16.0)
    assert(oneD("SELECT sqrt(4) AS v") === 2.0)
    assert(oneD("SELECT sqrt(-1) AS v").isNaN)
    assert(oneD("SELECT sqrt(power(4,2)) AS v") === 4.0)
    assert(q("SELECT mod(-1,2) AS v").head().getLong(0) === -1L)
    assert(oneD("SELECT ceil(12.4343454) AS v") === 13.0)
    assert(oneD("SELECT ceil(-12.4343454) AS v") === -12.0)
    assert(oneD("SELECT floor(12.4343454) AS v") === 12.0)
    assert(oneD("SELECT floor(-12.4343454) AS v") === -13.0)
  }

  test("MLDB-781: log family keeps IEEE domain semantics") {
    assert(oneD("SELECT ln(-1) AS v").isNaN)
    assert(oneD("SELECT ln(0) AS v").isNegInfinity)
    assert(oneD("SELECT ln(1) AS v") === 0.0)
    assert(oneD("SELECT ln(2) AS v") === 0.6931471805599453)
    assert(q("SELECT ln(NULL) AS v").head().isNullAt(0))
    assert(oneD("SELECT log(-1) AS v").isNaN)
    assert(oneD("SELECT log(0) AS v").isNegInfinity)
    assert(oneD("SELECT log(1000) AS v") === 3.0)
    assert(oneD("SELECT log(2, -1) AS v").isNaN)
    assert(oneD("SELECT log(2, 0) AS v").isNegInfinity)
    assert(oneD("SELECT log(2, 16) AS v") === 4.0)
    assert(q("SELECT log(2, NULL) AS v").head().isNullAt(0))
    assert(q("SELECT log(NULL, 2) AS v").head().isNullAt(0))
    val ex = intercept[IllegalArgumentException] { q("SELECT log(1,2,3) AS v") }
    assert(ex.getMessage.contains("expected 1 or 2 arguments, got 3"))
    assert(math.abs(oneD("SELECT exp(1) AS v") - 2.718281828459045) < 1e-15)
    assert(oneD("SELECT exp(0) AS v") === 1.0)
  }

  test("MLDB-781: quantize rounds to the granularity grid") {
    def check(expr: String): Unit =
      assert(q(s"SELECT $expr AS v").head().getBoolean(0), expr)
    check("quantize(2.17, 0.001) = 2.17")
    check("quantize(2.17, 0.01) = 2.17")
    check("quantize(2.17, 0.1) = 2.2")
    check("quantize(2.17, 1) = 2")
    check("quantize(2.17, 10) = 0")
    check("quantize(-0.1, 1) = 0")
    check("quantize(0, 10000) = 0")
    check("quantize(217, 0.1) = 217")
    check("quantize(217, 10) = 220")
    check("quantize(217, 100) = 200")
    check("quantize(-217, 100) = -200")
  }

  // --- MLDB-704-jseval-row.js ----------------------------------------------

  test("MLDB-704: jseval returning an object expands via AS *; " +
      "{*} arguments are sparse (null cells omitted)") {
    e.recordRows("test704",
      """[{"rowName":"ex1","x":0,"y":3},
        |{"rowName":"ex2","x":1,"y":2,"z":"yes"},
        |{"rowName":"ex3","x":2,"y":1},
        |{"rowName":"ex4","x":3,"y":0,"z":"no"}]"""
        .stripMargin.replace("\n", ""))
    val rows = q("""SELECT jseval('return { x: x, y: "yes"}', 'x', x) AS *
      |from test704 order by rowName()""".stripMargin).collect()
    assert(rows.map(_.getAs[Long]("x")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getAs[String]("y")).toSeq === Seq.fill(4)("yes"))
    // MLDB-757: Object.keys over the sparse row counts recorded cells
    val nvals = q("""SELECT jseval_num('return Object.keys(x).length',
      |'x', {x, y, z}) AS nvals from test704 order by rowName()"""
      .stripMargin).collect().map(_.getDouble(0))
    assert(nvals.toSeq === Seq(2.0, 3.0, 2.0, 3.0))
  }

  // --- MLDB-1631-join-transpose-where-rowname.js ---------------------------

  test("MLDB-1631: theta join against a transposed row literal with a " +
      "dynamic regex built from rowName()") {
    val rows = q("""select rowName() AS rn, y.title, x.rating
      |from (select 'this is toy story time' as title) as y
      |join transpose((select {"toy story": 1, "terminator": 5} as *
      |named 'rating')) as x
      |where regex_match(y.title, '.*'+x.rowName()+'.*')""".stripMargin)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "[result]-[toy story]")
    assert(r.getString(1) === "this is toy story time")
    // transposed cells keep NUMBERS when the source is all-numeric
    // (the reference's expected row is ["x.rating", 1, "-Inf"])
    assert(String.valueOf(r.get(2)) === "1")
  }

  // --- MLDB-1636-row-column-path.js ----------------------------------------

  test("MLDB-1636: rowPath()/rowPathElement over structured row names") {
    e.recordRows("test1636",
      (0 until 5).map(i =>
        s"""{"rowName":"examples.$i","who":"w$i"}""").mkString("[", ",", "]"))
    // rowPathElement(-1) = rowPathElement(1) → all five rows
    assert(q("""select who from test1636
      |where rowPathElement(-1) = rowPathElement(1)""".stripMargin)
      .count() === 5)
    val top = q("""select rowPath() AS p, rowPathElement(2) AS x,
      |rowPathElement(0) AS e0 from test1636
      |order by rowPath() desc limit 1""".stripMargin).head()
    assert(top.getSeq[String](0) === Seq("examples", "4"))
    assert(top.isNullAt(1)) // out-of-range element is NULL
    assert(top.getString(2) === "examples")
  }

  // --- MLDB-816-scatter-aggregate.js ---------------------------------------

  test("MLDB-816: pivot(k, v) AS * NAMED <key> under GROUP BY") {
    e.recordRows("test816",
      """[{"rowName":"0","who":"mustard","what":"moved","how":"kitchen"},
        |{"rowName":"1","who":"plum","what":"moved","how":"kitchen"},
        |{"rowName":"2","who":"mustard","what":"stabbed","how":"plum"},
        |{"rowName":"3","who":"mustard","what":"killed","how":"plum"},
        |{"rowName":"4","who":"plum","what":"died","how":"stabbed"}]"""
        .stripMargin.replace("\n", ""))
    val df = q("""SELECT pivot(what, how) AS * NAMED who FROM test816
      |GROUP BY who ORDER BY who""".stripMargin)
    assert(df.columns.toSet.intersect(Set("died", "killed", "moved", "stabbed"))
      === Set("died", "killed", "moved", "stabbed"))
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("rowName")).toSeq === Seq("mustard", "plum"))
    val mustard = rows(0)
    assert(mustard.getAs[String]("killed") === "plum")
    assert(mustard.getAs[String]("moved") === "kitchen")
    assert(mustard.getAs[String]("stabbed") === "plum")
    assert(mustard.getAs[String]("died") === null)
    val plum = rows(1)
    assert(plum.getAs[String]("died") === "stabbed")
    assert(plum.getAs[String]("moved") === "kitchen")
    assert(plum.getAs[String]("killed") === null)
  }

  // --- MLDB-1707-no-context-resolve-table.py -------------------------------

  test("MLDB-1707: input.* in a sql.expression body expands the argument " +
      "row with dotted names") {
    e.createSqlExpressionFunction("f1707", "input.*")
    val df = q("select f1707( {input: {xx: 1, xy: 2}} ) as *")
    assert(df.columns.toSeq === Seq("input.xx", "input.xy"))
    val r = df.head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
  }

  // --- MLDB-1165-where-rowname-in-optim.py ---------------------------------

  test("MLDB-1165/1615: rowName() IN / NOT IN lists, ordered by rowPath()") {
    e.recordRows("ex1165",
      (0 until 200).map(i => s"""{"rowName":"u$i","x":"whatever"}""")
        .mkString("[", ",", "]"))
    val hits = q("""select rowName() AS rn from ex1165 WHERE rowName() IN
      |('u1', 'u12', 'u123', 'u199', 'u9999')""".stripMargin)
      .collect().map(_.getString(0)).sorted
    assert(hits.toSeq === Seq("u1", "u12", "u123", "u199"))
    e.recordRows("ex1615",
      (0 until 10).map(i => s"""{"rowName":"u$i","x":"whatever"}""")
        .mkString("[", ",", "]"))
    val rest = q("""select rowName() AS rn from ex1615 WHERE rowName() NOT IN
      |('u1', 'u3', 'u5', 'u7') order by rowPath()""".stripMargin)
      .collect().map(_.getString(0))
    assert(rest.toSeq === Seq("u0", "u2", "u4", "u6", "u8", "u9"))
  }

  // --- MLDB-957-function-name.py -------------------------------------------

  test("MLDB-957: builtin function names are case-sensitive") {
    e.recordRows("example957", """[{"rowName":"row1","x":15}]""")
    assert(q("select power(x, 2) AS p from example957").head().getDouble(0)
      === 225.0)
    val ex = intercept[IllegalArgumentException] {
      q("select POWER(x, 2) AS p from example957")
    }
    assert(ex.getMessage.contains("POWER"))
    // camelCase builtins keep their canonical spelling
    assert(q("select rowName() AS rn from example957").head().getString(0)
      === "row1")
    intercept[IllegalArgumentException] {
      q("select ROWNAME() AS rn from example957")
    }
  }

  // --- MLDB-1648-path-values.js --------------------------------------------

  test("MLDB-1648: stringify_path and parse_path round-trip") {
    assert(q("select stringify_path([1,2,3]) AS p").head().getString(0)
      === "1.2.3")
    assert(q("select parse_path(stringify_path([1,2,3])) AS p").head()
      .getSeq[String](0) === Seq("1", "2", "3"))
  }

  // --- MLDB-998-get-timestamp-range.js -------------------------------------

  test("MLDB-998: min(earliest_timestamp({*})) / max(latest_timestamp({*}))") {
    e.recordRows("ts998",
      """[{"rowName":"row1","imp":0,"ts":"2015-01-01T00:00:00Z"},
        |{"rowName":"row2","imp":1,"ts":"2015-01-03T00:00:00Z"},
        |{"rowName":"row3","imp":0,"ts":"2015-01-01T00:00:00Z"}]"""
        .stripMargin.replace("\n", ""))
    // wide mode: one timestamp per row; the {*} forms read it
    e.createDataset("ts998t", e.dataset("ts998")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp")))
    val r = q("""select min(earliest_timestamp({*})) as earliest,
      |max(latest_timestamp({*})) as latest from ts998t""".stripMargin).head()
    assert(r.getTimestamp(0).toInstant.toString.startsWith("2015-01-01"))
    assert(r.getTimestamp(1).toInstant.toString.startsWith("2015-01-03"))
  }
}
