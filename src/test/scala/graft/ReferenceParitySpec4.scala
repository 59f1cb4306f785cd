package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Fourth batch of replays of the reference's OWN regression tests
  * (see ReferenceParitySpec/-2/-3). Each test cites the
  * `/root/reference/testing/` file it reproduces and asserts that
  * file's expected values verbatim. */
class ReferenceParitySpec4 extends AnyFunSuite {

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

  // ---- shared fixtures ----------------------------------------------------

  // MLDB-770/809/702/703's dataset: x/y/label over ex1-ex3, with x
  // null on ex3 in the 703 variant
  private lazy val dsTest: Unit = e.recordRows("test",
    """[{"rowName":"ex1","x":0,"y":0,"label":"cat"},
      |{"rowName":"ex2","x":1,"y":1,"label":"dog"},
      |{"rowName":"ex3","x":1,"y":2,"label":"cat"}]"""
      .stripMargin.replace("\n", ""))
  private lazy val dsTest703: Unit = e.recordRows("test703",
    """[{"rowName":"ex1","x":1,"y":2},{"rowName":"ex2","x":2,"z":4},
      |{"rowName":"ex3","x":null,"z":3}]""".stripMargin.replace("\n", ""))
  private lazy val dsD1: Unit = e.recordRows("d1",
    """[{"rowName":"row_0","a":0,"b":1,"c":2,"x1":3,"x2":4,"x3":5}]""")

  // --- MLDBFB-638-groupby-orderby-transform.py -----------------------------

  test("MLDBFB-638: ORDER BY an aggregate that is not in the select list") {
    e.recordRows("dataset638",
      """[{"rowName":"row1","x":"1","y":"1","z":"2"},
        |{"rowName":"row2","x":"2","y":"2","z":"1"}]"""
        .stripMargin.replace("\n", ""))
    val rows = q("SELECT min(x) AS mx FROM dataset638 GROUP BY y ORDER BY min(z), y")
      .collect().toSeq.map(_.getString(0))
    // group y="2" has min(z)="1" → first; the file pins ["2"] then ["1"]
    assert(rows === Seq("2", "1"))
  }

  // --- MLDB-770-group-by-parsing.js ----------------------------------------

  test("MLDB-770: min({*})/max({*}) AS prefix under GROUP BY, and " +
      "whitespace-tolerant parsing") {
    dsTest
    val rows = q("""SELECT min({*}) AS min, max({*}) AS max FROM test
      |GROUP BY label ORDER BY label""".stripMargin).collect()
    // cat: min (cat,0,0), max (cat,1,2); dog: both (dog,1,1)
    val cat = rows(0)
    assert(cat.getStruct(0).toSeq === Seq("cat", 0L, 0L))
    assert(cat.getStruct(1).toSeq === Seq("cat", 1L, 2L))
    val dog = rows(1)
    assert(dog.getStruct(0).toSeq === Seq("dog", 1L, 1L))
    assert(dog.getStruct(1).toSeq === Seq("dog", 1L, 1L))
    // the file re-runs the same query with \n and \t padding
    for (pad <- Seq("select min(x) AS m from test group by y\n",
        "\n\tselect min(x) AS m from test group by y\t",
        "select\nmin(x) AS m\nfrom\ntest \ngroup\nby\ny\n")) {
      assert(q(pad).collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 1L))
    }
  }

  // --- MLDB-809-group-by-rowname.js ----------------------------------------

  test("MLDB-809: NAMED <group key> and NAMED group_key_element(0)") {
    dsTest
    for (named <- Seq("label", "group_key_element(0)")) {
      val rows = q(s"""SELECT min({*}) AS min, max({*}) AS max
        |NAMED $named FROM test GROUP BY label ORDER BY rowName()"""
        .stripMargin).collect()
      assert(rows.map(_.getString(0)).toSeq === Seq("cat", "dog"))
      assert(rows(0).getStruct(2).toSeq === Seq("cat", 1L, 2L)) // max
      assert(rows(1).getStruct(1).toSeq === Seq("dog", 1L, 1L)) // min
    }
  }

  // --- MLDB-703-count-not-null.js ------------------------------------------

  test("MLDB-703: count({*}) counts non-null per column; count(x) = " +
      "count(*) under WHERE x IS NOT NULL") {
    dsTest703
    val c = q("SELECT count({*}) AS c FROM test703 GROUP BY 1").head()
      .getStruct(0)
    // x: 2 non-null (ex3 null), y: 1, z: 2 — the file's expected row
    assert(c.toSeq === Seq(2L, 1L, 2L))
    val viaCountX = q("""SELECT x, count(x) AS a FROM test703
      |WHERE x IS NOT NULL GROUP BY x ORDER BY x""".stripMargin)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val viaCountStar = q("""SELECT x, count(*) AS a FROM test703
      |WHERE x IS NOT NULL GROUP BY x ORDER BY x""".stripMargin)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(viaCountX === viaCountStar && viaCountX.nonEmpty)
  }

  // --- MLDB-702-row-aggregators.py (test_mldb_988 + vertical aliases) ------

  test("MLDB-988: sum(x) GROUP BY x; vertical_* = plain aggregates") {
    dsTest
    val sums = q("SELECT sum(x) AS sum FROM test GROUP BY x ORDER BY x")
      .collect().map(_.getLong(0)).toSeq
    assert(sums === Seq(0L, 2L)) // the file pins [0] and [1]→2
    for ((v, plain) <- Seq("vertical_sum" -> "sum", "vertical_count" -> "count",
        "vertical_avg" -> "avg", "vertical_latest" -> "latest")) {
      val a = q(s"SELECT $plain(x) AS r FROM test GROUP BY x ORDER BY x").collect().toSeq
      val b = q(s"SELECT $v(x) AS r FROM test GROUP BY x ORDER BY x").collect().toSeq
      assert(a === b, v)
    }
  }

  // --- MLDB-832-select_star.py ---------------------------------------------

  private def cols832(select: String): Seq[String] = {
    dsD1
    q(s"SELECT $select FROM d1").columns.toSeq
      .filterNot(_.equalsIgnoreCase("rowName")).sorted
  }

  test("MLDB-832: star structuring forms expand to the file's column sets") {
    assert(cols832("*") === Seq("a", "b", "c", "x1", "x2", "x3"))
    assert(cols832("{*} as *") === Seq("a", "b", "c", "x1", "x2", "x3"))
    assert(cols832("{*\n} as *") === Seq("a", "b", "c", "x1", "x2", "x3"))
    assert(cols832("{{*} as *} as *") === Seq("a", "b", "c", "x1", "x2", "x3"))
    // the MLDB-1205 regression: newline before the closing brace
    assert(cols832("{{*} as *\n} as *") === Seq("a", "b", "c", "x1", "x2", "x3"))
    assert(cols832("* EXCLUDING (a)") === Seq("b", "c", "x1", "x2", "x3"))
    assert(cols832("* EXCLUDING (a,c)") === Seq("b", "x1", "x2", "x3"))
    assert(cols832("* EXCLUDING (x*)") === Seq("a", "b", "c"))
    assert(cols832("* EXCLUDING (a, x*)") === Seq("b", "c"))
    assert(cols832("x* AS y*") === Seq("y1", "y2", "y3"))
    assert(cols832("x* EXCLUDING(x3) AS y*") === Seq("y1", "y2"))
    assert(cols832("a, a") === Seq("a"))
    // structured (single struct column whose FIELDS are the file's
    // dotted z.* columns — the typed-engine shape of the same row)
    val z = q("SELECT {*} as z FROM d1")
    assert(z.columns.toSeq === Seq("z"))
    assert(z.head().getStruct(0).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    val zw = q("SELECT {x*} as z FROM d1")
    assert(zw.head().getStruct(0).toSeq === Seq(3L, 4L, 5L))
    assert(zw.schema("z").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("x1", "x2", "x3"))
  }

  test("MLDB-832: duplicate-name select keeps one copy of the data") {
    dsD1
    val out = q("SELECT a, a FROM d1").collect()
    assert(out.head.toSeq === Seq(0L))
  }

  // --- MLDB-835-table-aliases.py / MLDB-1313 -------------------------------

  private lazy val dsXY: Unit = e.recordRows("x.y",
    """[{"rowName":"row1","a.b":7,"z":11,"id":0},
      |{"rowName":"row2","a.b":5,"z":13,"id":1}]"""
      .stripMargin.replace("\n", ""))

  test("MLDB-835: dotted dataset names, dotted columns, alias paths") {
    dsXY
    def vals(sql: String): Seq[Long] =
      q(sql).collect().toSeq.map(_.getLong(0)).sorted
    assert(vals("""SELECT a.b AS v FROM "x.y"""") === Seq(5L, 7L))
    // MLDB-1313: `a.*` ≡ `"a."*` — both read column a.b
    for (sel <- Seq("\"a.\"*", "a.*")) {
      val df = q(s"""SELECT $sel FROM "x.y"""")
      assert(df.columns.toSeq === Seq("a.b"), sel)
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 7L), sel)
    }
    // * excluding(a.*) = select id, z (+ the carried rowName)
    val ex = q("""select * excluding(a.*) from "x.y"""")
    assert(ex.columns.toSeq.filterNot(_.equalsIgnoreCase("rowName")).sorted
      === Seq("id", "z"))
    // alias-qualified paths, quoted and not
    assert(vals("""SELECT q.r.a.b AS v FROM "x.y" as "q.r"""") === Seq(5L, 7L))
    assert(vals("""SELECT "q.r".a.b AS v FROM "x.y" as "q.r"""") === Seq(5L, 7L))
    assert(vals("""SELECT "q.r"."a.b" AS v FROM "x.y" as "q.r"""") === Seq(5L, 7L))
    assert(vals("""SELECT "q.r"."a.b" AS v FROM "x.y" as "q.r"
      |ORDER BY "q.r"."a.b"""".stripMargin) === Seq(5L, 7L))
    // GROUP BY the dotted column
    assert(q("""SELECT count(1) AS c FROM "x.y" GROUP BY "a.b"""")
      .collect().length === 2)
    assert(q("""SELECT "q.r"."a.b" AS nm FROM "x.y" as "q.r" GROUP BY "a.b"""")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 7L))
  }

  // --- MLDB-869-select-expression.py ---------------------------------------

  test("MLDB-869: multiple bare words after a value is a parse error; " +
      "alias.* expands the aliased frame") {
    dsD1
    intercept[IllegalArgumentException] {
      q("SELECT 5 golden rings, 3 french hens FROM d1")
    }
    e.recordRows("dataset869",
      (0 until 10).map(i => s"""{"rowName":"row_$i","x":$i}""")
        .mkString("[", ",", "]"))
    val rows = q("""SELECT x.* FROM dataset869 AS x
      |ORDER BY rowName() DESC LIMIT 3""".stripMargin).collect()
    assert(rows.map(_.getAs[Long]("x")).toSeq === Seq(9L, 8L, 7L))
  }

  // --- MLDB-956-sql-comments.py --------------------------------------------

  test("MLDB-956: block and line comments, non-nesting, -- inside /* */") {
    e.recordRows("example956", """[{"rowName":"row1","x":15}]""")
    val cases = Seq(
      "select /*We choose to go to the moon*/ power(x, 2) AS p from example956",
      "select --We choose to go to the moon in this decade\n" +
        "power(x, 2) AS p from example956",
      "select /*not because they are easy,\nbut because they are hard*/ " +
        "power(x, 2) AS p from example956",
      "select /*because that goal will serve to organize -- and measure\n" +
        "*/ power(x, 2) AS p from example956",
      "select /*****because that challenge is one that we are willing\n" +
        "to accept --and one which we intend to, /*win, -- and the others\n" +
        "*/ power(x, 2) AS p from example956")
    cases.foreach { sql =>
      assert(q(sql).head().getDouble(0) === 225.0, sql)
    }
  }

  // --- MLDB-724-time-arithmetic.py -----------------------------------------

  test("MLDB-724: INTERVAL literals keep months/days/seconds separate") {
    def equal(sql: String): Boolean = q(sql).head().getBoolean(0)
    // equivalences the file pins true
    for (s <- Seq(
        "select INTERVAL '10 s' = INTERVAL '10second' as equal",
        "select INTERVAL '22S' = INTERVAL '22 SECOND' as equal",
        "select INTERVAL '60 MINUTE' = INTERVAL '1H' as equal",
        "select INTERVAL '10 minute' = INTERVAL '600second' as equal",
        "select INTERVAL '2H' = INTERVAL '120m' as equal",
        "select INTERVAL '24 H' = INTERVAL '86400 s' as equal",
        "select INTERVAL '1 d' = INTERVAL '1day' as equal",
        "select INTERVAL '1 w' = INTERVAL '7day' as equal",
        "select INTERVAL '1MONTH' = INTERVAL '1 month' as equal",
        "select INTERVAL '1 year' = INTERVAL '12month' as equal",
        "select INTERVAL '1YEAR' = INTERVAL '1 Y' as equal",
        "select INTERVAL '1Y2W' = INTERVAL '12MONTH14d' as equal",
        "select INTERVAL '1 day 5H' = INTERVAL '1d 18000 second' as equal"))
      assert(equal(s), s)
    // inequivalences: 1 day ≠ 24 H (DST), 1 month ≠ 30 days / 4 weeks,
    // 1 year ≠ 365 days — components are separate
    for (s <- Seq(
        "select INTERVAL '1 day' = INTERVAL '24H' as equal",
        "select INTERVAL '1 month' = INTERVAL '30day' as equal",
        "select INTERVAL '1 month' = INTERVAL '4 week' as equal",
        "select INTERVAL '1 year' = INTERVAL '365 day' as equal"))
      assert(!equal(s), s)
    // timestamp + INTERVAL applies calendar components
    val plus = q("""SELECT CAST('2015-01-31T00:00:00Z' AS timestamp)
      |+ INTERVAL '1month' AS t""".stripMargin).head().getTimestamp(0)
    assert(plus.toInstant.toString.startsWith("2015-02-28"))
  }

  test("MLDB-724: latest_timestamp ordering and ts + integer = days") {
    e.recordRows("test724",
      """[{"rowName":"a","imp":"2015-01-01T00:00:00Z","click":"2015-01-02T00:00:00Z"},
        |{"rowName":"b","imp":"2015-01-03T00:00:00Z","click":"2015-01-01T00:00:00Z"}]"""
        .stripMargin.replace("\n", ""))
    assert(q("""SELECT rowName() AS rn FROM test724
      |WHERE CAST(imp AS timestamp) < CAST(click AS timestamp)""".stripMargin)
      .head().getString(0) === "a")
    // integers count days on timestamps (binaryPlusOnTimestamp)
    assert(q("""SELECT rowName() AS rn FROM test724
      |WHERE CAST(imp AS timestamp) < CAST(click AS timestamp) + 3
      |ORDER BY rn""".stripMargin).collect().map(_.getString(0)).toSeq
      === Seq("a", "b"))
  }

  // --- MLDB-906-date-function.py -------------------------------------------

  test("MLDB-906: date_part units match the reference's calendar") {
    def part(unit: String, ts: String): Long =
      q(s"SELECT date_part('$unit', CAST('$ts' AS timestamp)) AS v")
        .head().getLong(0)
    val jan1 = "2015-01-01T15:14:39.123456Z"
    val dec31 = "2014-12-31T15:14:39.123456Z"
    assert(part("year", jan1) === 2015L)
    assert(part("month", jan1) === 1L)
    assert(part("day", jan1) === 1L)
    assert(part("hour", jan1) === 15L)
    assert(part("minute", jan1) === 14L)
    assert(part("second", jan1) === 39L)
    assert(part("millisecond", jan1) === 123L)
    assert(part("microsecond", jan1) === 123456L)
    assert(part("dow", jan1) === 4L)      // Thursday, Sunday=0
    assert(part("doy", jan1) === 0L)      // days SINCE Jan 1
    assert(part("isodow", jan1) === 4L)
    assert(part("isodoy", jan1) === 4L)   // ISO year began 2014-12-29
    assert(part("week", jan1) === 0L)
    assert(part("isoweek", jan1) === 1L)
    assert(part("isoyear", jan1) === 2015L)
    assert(part("quarter", jan1) === 1L)
    // the December 31 flip: civil year 2014, ISO year 2015
    assert(part("dow", dec31) === 3L)
    assert(part("doy", dec31) === 364L)
    assert(part("isodow", dec31) === 3L)
    assert(part("isodoy", dec31) === 3L)
    assert(part("week", dec31) === 52L)
    assert(part("isoweek", dec31) === 1L)
    assert(part("isoyear", dec31) === 2015L)
    // the reference's (sic) quarter formula: floor(month/4)+1
    assert(part("quarter", "2015-07-01T00:00:00Z") === 2L)
    assert(part("quarter", "2015-12-01T00:00:00Z") === 4L)
    // a STRING timestamp auto-casts
    e.recordRows("strts906", s"""[{"rowName":"r1","x":"$jan1"}]""")
    assert(q("SELECT date_part('second', x) AS s FROM strts906")
      .head().getLong(0) === 39L)
  }

  // --- MLDB-917_replace_nan_inf.py -----------------------------------------

  test("MLDB-917: replace_nan/inf/not_finite/null lift over rows and " +
      "embeddings") {
    assert(q("select replace_nan(0/0, 5) AS r").head().getDouble(0) === 5.0)
    assert(q("select replace_nan({0/0, 2, 6}, 5) AS r").head().getStruct(0)
      .toSeq === Seq(5.0, 2L, 6L))
    assert(q("select replace_inf(1/0, 98) AS r").head().getDouble(0) === 98.0)
    assert(q("select replace_inf([1/0, 5/0, 23], 98) AS r").head()
      .getSeq[Double](0) === Seq(98.0, 98.0, 23.0))
    assert(q("select replace_not_finite([1/0, 0/0, -1/0, 23], 98) AS r")
      .head().getSeq[Double](0) === Seq(98.0, 98.0, 98.0, 23.0))
    val rn = q("select replace_null([1/0, null, 23], 98) AS r").head()
      .getSeq[Double](0)
    assert(rn(0).isPosInfinity && rn(1) === 98.0 && rn(2) === 23.0)
    // the file's dataset case: {*} with a NaN and an Inf cell
    import spark.implicits._
    e.createDataset("toy917", Seq((54L, Double.NaN, Double.PositiveInfinity))
      .toDF("feat1", "feat2", "label"))
    val fixed = q("select replace_inf(replace_nan({*}, 0), 1) AS r from toy917")
      .head().getStruct(0)
    assert(fixed.toSeq === Seq(54L, 0.0, 1.0))
  }

  // --- MLDB-953-normalize.py -----------------------------------------------

  test("MLDB-953: normalize/norm with p = 0, 1, 2, 3.2, inf; embedding " +
      "arithmetic is element-wise") {
    def one(sql: String): Double = q(sql).head().getDouble(0)
    assert(math.abs(one("select norm(normalize({1, 2, 3, 4}, 1), 1) as x") - 1.0) < 1e-3)
    assert(math.abs(one("select norm(normalize([1, 2, 3, 4], 1), 1) as x") - 1.0) < 1e-3)
    assert(math.abs(one("select norm(normalize([1, 2, 3, 4], 2), 2) as x") - 1.0) < 1e-3)
    assert(math.abs(one("select norm(normalize([1, 2, 3, 4], 3.2), 3.2) as x") - 1.0) < 1e-3)
    // 0-norm counts non-zeros, so normalize-then-norm gives 4
    assert(math.abs(one("select norm(normalize([1, 2, 3, 4], 0), 0) as x") - 4.0) < 1e-3)
    assert(math.abs(one("select norm(normalize([1, 2, 3, 4], inf), inf) as x") - 1.0) < 1e-3)
    assert(one("select norm([1,2,0,4],0) AS n") === 3.0)
    assert(one("select norm([1,2,0,4],1) AS n") === 7.0)
    assert(math.abs(one("select norm([1,2,0,4],2) AS n") - 4.582575) < 1e-5)
    assert(one("select norm([1,2,0,4],inf) AS n") === 4.0)
    // normalize(v,p) == v / norm(v,p), element-wise division
    for (p <- Seq("0", "1", "2", "3.2", "inf"))
      assert(math.abs(one("select horizontal_sum( normalize([1,2,3,4]," + p +
        ") - [1,2,3,4]/norm([1,2,3,4]," + p + ") ) AS h")) < 1e-5, s"p=$p")
  }

  // --- MLDB-989-complex-order-by.py (tokenize comparisons + ORDER BY) ------

  test("MLDB-989: bag comparisons via sorted entry lists; ORDER BY a bag") {
    def cmp(l: String, r: String, op: String): Boolean =
      q(s"select tokenize('$l', {splitChars:' '}) $op " +
        s"tokenize('$r', {splitChars:' '}) as comp").head().getBoolean(0)
    assert(!cmp("string string zoo", "string zoo", "<"))
    assert(!cmp("string zoo", "string zoo", "<"))
    assert(!cmp("zoo string string", "string zoo", "<"))
    assert(cmp("zoo string string", "string zoo string", "="))
    assert(!cmp("zoo string str", "zoo string string", "="))
    assert(!cmp("zoo string string", "string zoo string", ">"))
    assert(cmp("zoo string string string", "zoo string string", ">"))
    e.recordRows("str_test_data",
      """[{"rowName":"row1","terms":"c++,python,c++,java,c++"},
        |{"rowName":"row2","terms":"scala,scala,java,java,scala,java,scala,c++"},
        |{"rowName":"row3","terms":"python,ada,ada"}]"""
        .stripMargin.replace("\n", ""))
    assert(q("""SELECT rowName() AS rn FROM str_test_data
      |ORDER BY tokenize(terms)""".stripMargin).collect()
      .map(_.getString(0)).toSeq === Seq("row3", "row2", "row1"))
  }

  // --- MLDB-1563-keys-values-of.js -----------------------------------------

  test("MLDB-1563: KEYS OF a function's row output filters by rowName") {
    e.createSqlExpressionFunction("identity1563", "input")
    e.recordRows("kv1563",
      """[{"rowName":"1","who":"plum"},{"rowName":"2","who":"mustard"}]""")
    val rows = q("""SELECT who FROM kv1563
      |WHERE rowName() IN (KEYS OF identity1563({input: {"1": 1}})[input])"""
      .stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("plum"))
  }

  // --- MLDB-1567-empty-literal.js ------------------------------------------

  test("MLDB-1567: [] and {} literals are empty but well-typed") {
    assert(q("select [] as x").head().getSeq[Any](0).isEmpty)
    assert(q("select {} as x").head().getStruct(0).length === 0)
  }

  // --- MLDB-1195-query-where-test.py ---------------------------------------

  test("MLDB-1195: IS NULL/IS NOT NULL on columns absent from any frame " +
      "never errors, including over merged datasets") {
    e.recordRows("ds1195a", """[{"rowName":"row1","ds1195a":1}]""")
    e.recordRows("ds1195b", """[{"rowName":"row2","ds1195b":1}]""")
    assert(q("""SELECT * FROM ds1195a
      |WHERE colA IS NULL AND colB IS NOT NULL""".stripMargin).count() === 0)
    val merged = graft.operators.Reshape.merge(
      e.dataset("ds1195a"), e.dataset("ds1195b"), "rowName")
    e.createDataset("merged1195", merged)
    assert(q("""SELECT * FROM merged1195
      |WHERE colA IS NULL AND colB IS NOT NULL""".stripMargin).count() === 0)
    assert(q("""SELECT * FROM merged1195
      |WHERE colA IS NULL AND ds1195a IS NOT NULL""".stripMargin).count() === 1)
  }

  // --- MLDB-1198-sum-inconsistency-test.py ---------------------------------

  test("MLDB-1198: sum/count of a named column equals its sum({*}) AS * twin") {
    e.recordRows("ds1198",
      """[{"rowName":"row1","colA":1},{"rowName":"row2","colA":2},
        |{"rowName":"row3","colA":3}]""".stripMargin.replace("\n", ""))
    val s1 = q("""SELECT sum("colA") as "colA" FROM ds1198""").head().getLong(0)
    val s2 = q("SELECT sum({*}) AS * FROM ds1198")
      .select("colA").head().getLong(0)
    assert(s1 === s2)
    val c1 = q("""SELECT count("colA") as "colA" FROM ds1198""").head().getLong(0)
    val c2 = q("SELECT count({*}) AS * FROM ds1198")
      .select("colA").head().getLong(0)
    assert(c1 === c2)
  }

  // --- MLDB-923-embedding-literal.py ---------------------------------------

  test("MLDB-923: embedding literals, numeric-named rows as vectors, " +
      "element-wise +") {
    assert(q("select [3,2,1] as x").head().getSeq[Long](0) === Seq(3L, 2L, 1L))
    assert(q("""select vector_sum([1,2,3],{"0":3, "1":2, "2":1}) as x""")
      .head().getSeq[Double](0) === Seq(4.0, 4.0, 4.0))
    assert(q("select [1,2,3] + [3,2,1] as x")
      .head().getSeq[Double](0) === Seq(4.0, 4.0, 4.0))
    assert(q("""select [1,2,3] + {"0":3, "1":2, "2":1} as x""")
      .head().getSeq[Double](0) === Seq(4.0, 4.0, 4.0))
  }

  // --- MLDB-761-sub-queries.py ---------------------------------------------

  test("MLDB-761: sub-select shapes, dataset-name star, no-dataset subqueries") {
    e.recordRows("dataset761",
      (0 until 10).map(i => s"""{"rowName":"row_$i","x":$i}""")
        .mkString("[", ",", "]"))
    def n(sql: String): Long = q(sql).count()
    assert(n("SELECT * FROM dataset761") === 10)
    assert(n("SELECT dataset761.* from dataset761") === 10)
    assert(n("SELECT blah.* FROM dataset761 AS blah") === 10)
    assert(n("SELECT blah.* FROM (SELECT * FROM dataset761) AS blah") === 10)
    assert(n("SELECT blah.* FROM (SELECT * FROM dataset761 WHERE (x % 2) = 0) AS blah") === 5)
    assert(n("""SELECT blah.* FROM (SELECT * FROM dataset761
      |WHERE (x % 2) = 0) AS blah WHERE (x%4) = 0""".stripMargin) === 3)
    assert(n("SELECT * FROM (SELECT * FROM dataset761 WHERE x > 4) ORDER BY x") === 5)
    // MLDB-853: sub queries without a dataset
    assert(n("SELECT 1 AS one FROM (SELECT 1 AS i)") === 1)
    assert(n("SELECT x.* FROM (select {1 as y} as z ) as x") === 1)
    // MLDB-855
    assert(n("SELECT * FROM (select {*} as y from dataset761) as x") === 10)
    // MLDB-1257: ln through subquery aliases = ln(10) everywhere
    val expected = q("SELECT ln(10) as r").head().getDouble(0)
    for (sql <- Seq(
        "SELECT ln(x) as r FROM ( SELECT 10 as x )",
        "SELECT ln(x) as r FROM ( SELECT 10 as x ) as t",
        "SELECT ln(t.x) as r FROM ( SELECT 10 as x ) as t",
        "SELECT * FROM ( SELECT ln(x) as r FROM ( SELECT 10 as x ) )"))
      assert(q(sql).select("r").head().getDouble(0) === expected, sql)
  }

  // --- MLDBFB-650-names-aggregators.py -------------------------------------

  test("MLDBFB-650: NAMED min(rowName()) under GROUP BY") {
    e.recordRows("dataset650",
      """[{"rowName":"efgh","x":"1"},{"rowName":"abcd","x":"1"}]""")
    val rows = q("SELECT x AS x NAMED min(rowName()) FROM dataset650 GROUP BY x")
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "abcd") // the file's expected rowName
    assert(rows.head.getString(1) === "1")
  }

  // --- MLDBFB-308-where-outer-join-test.py ---------------------------------

  test("MLDBFB-308: WHERE on a bare numeric column is truthiness, " +
      "even over an ON-less outer join") {
    e.recordRows("ds308",
      """[{"rowName":"userValid","behA":1}]""")
    assert(q("""SELECT 1 AS one FROM ds308 OUTER JOIN
      |(SELECT 2 AS two FROM ds308) WHERE behA""".stripMargin).count() === 1)
    // zero and NULL are falsy
    e.recordRows("ds308b",
      """[{"rowName":"r1","v":1},{"rowName":"r2","v":0},{"rowName":"r3"}]""")
    assert(q("SELECT rowName() AS rn FROM ds308b WHERE v").count() === 1)
  }

  // --- MLDBFB-573_parse_json.py --------------------------------------------

  test("MLDBFB-573: parse_json options form — ignoreErrors, null input, " +
      "non-literal arrays option") {
    e.recordRows("sample573",
      """[{"rowName":"a","x":"{\"artist\": \"Champion Jack\", \"title\": \"No Meat Blues\"}"}]""")
    // bad JSON + ignoreErrors → one __parse_json_error__=true column
    for (arrays <- Seq("parse", "encode")) {
      val r = q("select parse_json('{\"asdf:', " +
        s"{arrays: '$arrays', ignoreErrors:1}) as * from sample573")
      assert(r.columns.toSeq.contains("__parse_json_error__"), arrays)
      assert(r.head().getAs[Boolean]("__parse_json_error__"), arrays)
    }
    // unknown column input → NULL result
    assert(q("select parse_json(y, {arrays: 'parse'}) as pwet from sample573")
      .head().isNullAt(0))
    // non-literal arrays option raises the reference's NULL-value error
    val ex = intercept[IllegalArgumentException] {
      q("SELECT parse_json(x, {arrays: parse}) AS p from sample573")
    }
    assert(ex.getMessage.contains("NULL value found"))
    // well-formed input round-trips the scalar fields
    val ok = q("SELECT parse_json(x, {arrays: 'encode'}) AS p from sample573")
      .head().getStruct(0)
    assert(ok.getAs[String]("artist") === "Champion Jack")
    assert(ok.getAs[String]("title") === "No Meat Blues")
  }

  // --- MLDB-798-sql-operation-precision.py ---------------------------------

  test("MLDB-798: mod is C-style (sign of the dividend) at full precision") {
    // the file's special cases (all exactly divisible) plus sign pins
    assert(q("SELECT -2507820791313827470 % 1534 AS m").head().getLong(0) === 0L)
    assert(q("SELECT 2507820791313827470 % -1534 AS m").head().getLong(0) === 0L)
    assert(q("SELECT -7 % 3 AS m").head().getLong(0) === -1L)
    assert(q("SELECT 7 % -3 AS m").head().getLong(0) === 1L)
  }
}
