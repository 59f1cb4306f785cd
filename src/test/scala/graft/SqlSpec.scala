package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSql

/** MLDB SQL dialect: parser + lowering semantics, including the
  * reference's corner cases (unknown column → NULL, bitwise
  * precedence sharing the additive level, NAMED, DISTINCT ON,
  * * EXCLUDING).
  */
class SqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def q(sql: String) = {
    val df = GraftSql.query(spark, sf, sql)
    // positional value pins predate the MLDB-409 implicit row-name
    // passthrough (round 8); the engine marks the implicitly carried
    // column with metadata — NAMED/star-selected row names stay
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }

  test("scan + where + projection + order + limit") {
    val rows = q("""SELECT r_regionkey, r_name FROM region
                   |WHERE r_regionkey >= 1 ORDER BY r_regionkey DESC LIMIT 2""".stripMargin)
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(0) === 4)
    assert(rows(1).getInt(0) === 3)
  }

  test("unknown column reads as NULL (MLDB semantics)") {
    val rows = q("SELECT r_name, no_such_column AS x FROM region LIMIT 1").collect()
    assert(rows(0).isNullAt(1))
  }

  test("* EXCLUDING drops columns") {
    val df = q("SELECT * EXCLUDING (n_regionkey) FROM nation")
    assert(df.columns.toSeq === Seq("n_nationkey", "n_name"))
  }

  test("NAMED produces rowName column") {
    val df = q("""SELECT r_name NAMED 'region-' || r_regionkey
                 |FROM region ORDER BY r_regionkey LIMIT 1""".stripMargin)
    assert(df.columns.contains("rowName"))
    assert(df.head().getAs[String]("rowName") === "region-0")
  }

  test("impulse / shifted_impulse / reshape (signal battery closure)") {
    val r1 = q("SELECT impulse(4) AS s").head().getSeq[Double](0)
    assert(r1 === Seq(1.0, 0.0, 0.0, 0.0))
    val r2 = q("SELECT shifted_impulse(5, 2) AS s").head().getSeq[Double](0)
    assert(r2 === Seq(0.0, 0.0, 1.0, 0.0, 0.0))
    // pad, truncate, constant-from-null, and 2-D fold
    assert(q("SELECT reshape([1, 2], [4], 0) AS s").head().getSeq[Double](0)
      === Seq(1.0, 2.0, 0.0, 0.0))
    // truncation needs the explicit-fill form: the 2-arg reshape is
    // STRICT like the reference (size change raises, MLDB-1947)
    assert(q("SELECT reshape([1, 2, 3], [2], 0) AS s").head().getSeq[Double](0)
      === Seq(1.0, 2.0))
    assert(q("SELECT reshape(NULL, [3], 7) AS s").head().getSeq[Double](0)
      === Seq(7.0, 7.0, 7.0))
    val m = q("SELECT reshape([1, 2, 3, 4, 5, 6], [2, 3], 0) AS s")
      .head().getSeq[Seq[Double]](0)
    assert(m === Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
  }

  test("proximate_voxels: cubic subvolume of a reshaped 3-D embedding") {
    // the doc's 4x4x4 example (functions/ProximateVoxelsFunction.md):
    // flat 1..64, voxel (z,y,x) = z*16 + y*4 + x + 1
    val flat = (1 to 64).mkString("[", ", ", "]")
    val cube = q(s"SELECT proximate_voxels(reshape($flat, [4, 4, 4]), 1, 1, 1, 1) AS v")
      .head().getSeq[Seq[Seq[Double]]](0)
    assert(cube.size === 3 && cube(0).size === 3 && cube(0)(0).size === 3)
    // center of the subvolume is the queried voxel
    assert(cube(1)(1)(1) === (1 * 16 + 1 * 4 + 1 + 1).toDouble)
    // corner (z=0,y=0,x=0) is voxel 1
    assert(cube(0)(0)(0) === 1.0)
    // out-of-range cells are NULL, not errors
    val edge = q(s"SELECT proximate_voxels(reshape($flat, [4, 4, 4]), 0, 0, 0, 1) AS v")
      .head().getSeq[Seq[Seq[Any]]](0)
    assert(edge(0)(0)(0) == null)
    assert(edge(1)(1)(1) == 1.0)
  }

  test("try(expr) without fallback: recoverable errors surface as NULL") {
    val r = q("""SELECT try(CAST('oops' AS number)) AS a,
                |try(1 / 0) AS b, try(2 + 2) AS c""".stripMargin).head()
    assert(r.isNullAt(0))
    // division keeps IEEE semantics in the reference (MLDB-917):
    // 1/0 is Inf, not an error — try passes it through
    assert(r.getDouble(1).isPosInfinity)
    assert(r.getLong(2) === 4L)
  }

  test("implicit_cast: string column to numeric interpretation, non-string identity") {
    // r_name is a non-numeric string column: the reference keeps the
    // string (CellValue::parse); identity on numeric columns; '' → NULL
    val rows = q("""SELECT implicit_cast(r_regionkey) AS k,
                   |implicit_cast(r_name) AS n,
                   |implicit_cast('') AS e,
                   |implicit_cast('2.5') AS v
                   |FROM region ORDER BY r_regionkey LIMIT 1""".stripMargin).head()
    assert(rows.getInt(0) === 0)
    assert(rows.getString(1) === "AFRICA")
    assert(rows.isNullAt(2))
    assert(rows.getDouble(3) === 2.5)
  }

  test("bitwise ops share additive precedence (reference quirk)") {
    // standard SQL would give 1 + (2 & 3) = 3; MLDB gives (1+2) & 3 = 3 … pick
    // a case where the two differ: 2 + 2 & 3 → MLDB (2+2)&3 = 0; std 2+(2&3)=4
    val v = q("SELECT 2 + 2 & 3 AS x").head().getLong(0)
    assert(v === 0L)
  }

  test("group by + having + nested aggregate expression + order") {
    val rows = q(
      """SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY c_mktsegment HAVING count(*) > 10
        |ORDER BY c_mktsegment""".stripMargin).collect()
    assert(rows.nonEmpty)
    val direct = graft.core.Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 2).as("avg_bal"))
      .filter(col("n") > 10).orderBy(col("c_mktsegment")).collect()
    assert(rows.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
  }

  test("joins with qualified references and aliases") {
    val rows = q(
      """SELECT r.r_name, count(*) AS n
        |FROM nation AS n JOIN region AS r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 25)
  }

  test("DISTINCT ON keeps first row per key in order") {
    val rows = q(
      """SELECT DISTINCT ON (c_mktsegment) c_mktsegment, c_custkey, c_acctbal
        |FROM customer ORDER BY c_mktsegment, c_acctbal DESC""".stripMargin).collect()
    assert(rows.length === 5)
    // each returned row carries its segment's max acctbal
    val expected = graft.core.Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment")).agg(max("c_acctbal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(2) === expected(r.getString(0))))
  }

  test("CASE, CAST, BETWEEN, IN, LIKE, IS NULL") {
    val rows = q(
      """SELECT
        |  CASE WHEN l_quantity BETWEEN 1 AND 25 THEN 'lo' ELSE 'hi' END AS b,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_linestatus LIKE 'F%'
        |  AND l_quantity IS NOT NULL
        |GROUP BY CASE WHEN l_quantity BETWEEN 1 AND 25 THEN 'lo' ELSE 'hi' END
        |ORDER BY b""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSeq === Seq("hi", "lo"))
  }

  test("WHEN clause filters by row timestamp (wide mode)") {
    val n1 = q(
      """SELECT count(*) AS n FROM events
        |WHEN value_timestamp() < CAST('2024-01-10' AS timestamp)""".stripMargin)
      .head().getLong(0)
    val n2 = graft.core.Tables.events(spark, sf)
      .filter(col("ts") < lit("2024-01-10").cast("timestamp")).count()
    assert(n1 === n2 && n1 > 0)
  }

  test("subselect in FROM") {
    val v = q(
      """SELECT max(total) AS m FROM (
        |  SELECT o_custkey, sum(o_totalprice) AS total
        |  FROM orders GROUP BY o_custkey) AS t""".stripMargin).head().getDouble(0)
    assert(v > 0)
  }

  test("table functions: sample and union") {
    val n = q("SELECT count(*) AS n FROM sample(lineitem, 0.5)").head().getLong(0)
    val total = graft.core.Tables.lineitem(spark, sf).count()
    assert(n > total / 4 && n < total * 3 / 4)
    val u = q("SELECT count(*) AS n FROM union(region, region)").head().getLong(0)
    assert(u === 10)
  }

  test("prefix wildcard select and prefix rename") {
    val df = q("SELECT n_* FROM nation")
    assert(df.columns.toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
    val renamed = q("SELECT n_* AS nation_* FROM nation")
    assert(renamed.columns.toSeq ===
      Seq("nation_nationkey", "nation_name", "nation_regionkey"))
    // `a * b` multiplication still parses
    val v = q("SELECT n_nationkey * 2 AS x FROM nation ORDER BY x DESC LIMIT 1")
      .head().getLong(0)
    assert(v === 48L)
  }

  test("IN (SELECT …) lowers to semi-join; NOT IN to anti-join") {
    val n1 = q(
      """SELECT count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderstatus = 'F'""".stripMargin).head().getLong(0)
    val buildings = graft.core.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val expect1 = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .join(buildings, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(n1 === expect1 && n1 > 0)
    val n2 = q(
      """SELECT count(*) AS n FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_mktsegment = 'BUILDING')""".stripMargin)
      .head().getLong(0)
    val expect2 = graft.core.Tables.orders(spark, sf)
      .join(buildings, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(n2 === expect2 && n1 + n2 < graft.core.Tables.orders(spark, sf).count())
  }

  test("row_dataset turns a row literal into a (column, value) table") {
    val rows = q("""SELECT "column", value FROM row_dataset({a: 1, b: 2.5, c: 7})
                   |ORDER BY "column"""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("a", 1.0), ("b", 2.5), ("c", 7.0)))
    val mixed = q("""SELECT count(*) AS n FROM row_dataset({x: 'hi', y: 3})""")
      .head().getLong(0)
    assert(mixed === 2)
  }

  test("{*} row literal passes the whole row (jseval feature-vector idiom)") {
    // the reference's classifier({features: {*}}) / jseval(..., {*})
    // pattern: every scope column becomes a struct field
    val r = q("""SELECT jseval_num(
      |  'var n = 0; for (var k in row) n++; return n;', 'row', {*}) AS n,
      |  jseval_str('return row.n_name;', 'row', {*}) AS nm
      |FROM nation ORDER BY n_nationkey LIMIT 1""".stripMargin).head()
    assert(r.getDouble(0) === 3.0)   // n_nationkey, n_name, n_regionkey
    assert(r.getString(1) === "NATION_0")
    // plain struct shape too
    val s0 = q("SELECT {*} AS all_cols FROM region LIMIT 1").head().getStruct(0)
    assert(s0.schema.fieldNames.toSeq === Seq("r_regionkey", "r_name"))
  }

  test("GROUP BY can reference a select alias") {
    val rows = q(
      """SELECT CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS bucket,
        |  count(*) AS n
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSeq === Seq("hi", "lo"))
    assert(rows.map(_.getLong(1)).sum ===
      graft.core.Tables.lineitem(spark, sf).count())
  }

  test("$param bound parameters substitute literals") {
    val n = GraftSql.query(spark, sf,
      """SELECT count(*) AS n FROM customer
        |WHERE c_mktsegment = $seg AND c_acctbal > $minbal""".stripMargin,
      Map("seg" -> "BUILDING", "minbal" -> 5000.0)).head().getLong(0)
    val expect = graft.core.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000.0)
      .count()
    assert(n === expect && n > 0)
    val err = intercept[IllegalArgumentException] {
      GraftSql.query(spark, sf, "SELECT $missing AS x").collect()
    }
    assert(err.getMessage.contains("unbound parameter"))
  }

  test("scalar function registry spans math/string/date/vector") {
    val r = q(
      """SELECT round(sqrt(16.0), 1) AS a, upper('x') AS b,
        |  date_part('year', CAST('2024-03-05' AS timestamp)) AS c,
        |  clamp(15, 0, 10) AS d,
        |  norm([3.0, 4.0], 2) AS e,
        |  levenshtein_distance('kitten', 'sitting') AS f""".stripMargin).head()
    assert(r.getDouble(0) === 4.0)
    assert(r.getString(1) === "X")
    assert(r.getLong(2) === 2024L)
    assert(r.getLong(3) === 10L)
    assert(r.getDouble(4) === 5.0)
    assert(r.getInt(5) === 3)
  }

  test("string_agg honors a non-comma separator") {
    val v = q("""SELECT string_agg(r_name, ' | ') AS names FROM region""")
      .head().getString(0)
    assert(v === "AFRICA | AMERICA | ASIA | EUROPE | MIDDLE EAST")
  }

  test("parse_json with a schema yields a structured row; without one it infers") {
    val row = q("""SELECT parse_json('{"a": 7, "b": "x"}', 'a INT, b STRING') AS j""")
      .select(col("j.a"), col("j.b")).head()
    assert(row.getInt(0) === 7 && row.getString(1) === "x")
    // the 1-arg form infers with the capped plan-time pass (the
    // reference's dynamic shape — MLDB-1840; was an error pre-round-7)
    val inferred = q("""SELECT parse_json('{"a": 1}') AS j""")
      .select(col("j.a")).head()
    assert(inferred.getLong(0) === 1L)
  }

  test("columncount() counts per-row non-null cells, not schema width") {
    // nation has 3 columns; a sparse row built from CASE nulls one out
    val rows = q(
      """SELECT columncount() AS c FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 2 THEN NULL ELSE n_name END AS maybe_name
        |  FROM nation) AS t
        |ORDER BY n_nationkey""".stripMargin).collect()
    assert(rows(0).getLong(0) === 1L) // n_nationkey only
    assert(rows(2).getLong(0) === 2L) // both non-null
  }

  test("IS type predicates resolve against static column types") {
    val r = q(
      """SELECT n_name IS STRING AS a, n_nationkey IS NUMBER AS b,
        |  n_nationkey IS INTEGER AS c, n_name IS NOT NUMBER AS d,
        |  n_name IS TIMESTAMP AS e,
        |  CAST(n_nationkey AS number) IS INTEGER AS f
        |FROM nation LIMIT 1""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) &&
      r.getBoolean(3) && !r.getBoolean(4) && !r.getBoolean(5))
  }

  test("IS NULL IS STRING: null never satisfies a type predicate") {
    val r = q("SELECT no_col IS STRING AS a, no_col IS NOT STRING AS b FROM region LIMIT 1").head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("IN (KEYS OF tokenize(...)) membership") {
    // reference tokenize is case-preserving with default splitChars ","
    val n = q(
      """SELECT r_name FROM region
        |WHERE 'AFRICA' IN (KEYS OF tokenize(r_name))""".stripMargin).count()
    assert(n === 1)
    val none = q(
      """SELECT r_name FROM region
        |WHERE 'AFRICA' NOT IN (KEYS OF tokenize(r_name))""".stripMargin).count()
    assert(none === 4)
  }

  test("IN (VALUES OF …) checks map values") {
    // tokenize counts: 'middle east' has two tokens each with count 1
    val n = q(
      """SELECT r_name FROM region
        |WHERE 2 IN (VALUES OF tokenize(r_name || ' ' || r_name,
        |                               {splitChars: ' '}))""".stripMargin).count()
    assert(n === 5) // every name duplicated -> counts of 2
  }

  test("COLUMN EXPR filters/orders/limits/renames the column set") {
    val df = q(
      """SELECT COLUMN EXPR (AS columnName() || '_x'
        |  WHERE columnName() != 'n_regionkey'
        |  ORDER BY columnName() DESC LIMIT 2)
        |FROM nation""".stripMargin)
    assert(df.columns.toSeq === Seq("n_nationkey_x", "n_name_x"))
    assert(df.count() === 25)
  }

  test("horizontal_* in both row-literal and plain-arg forms") {
    val r = q(
      """SELECT horizontal_sum({a: 1, b: 2, c: NULL}) AS hs,
        |  horizontal_count({a: 1, b: 2, c: NULL}) AS hc,
        |  horizontal_avg({a: 1, b: 3}) AS ha,
        |  horizontal_min(5, 2, 9) AS hmin,
        |  horizontal_max(5, 2, 9) AS hmax,
        |  horizontal_string_agg({a: 'x', b: 'y'}) AS hsa""".stripMargin).head()
    assert(r.getDouble(0) === 3.0 && r.getLong(1) === 2L && r.getDouble(2) === 2.0)
    assert(r.getLong(3) === 2L && r.getLong(4) === 9L)
    assert(r.getString(5) === "x,y")
  }

  test("temporal_* degenerate wide-mode semantics") {
    val r = q(
      """SELECT temporal_count(n_name) AS c, temporal_count(no_col) AS z,
        |  temporal_max(n_nationkey) AS m
        |FROM nation WHERE n_nationkey = 3""".stripMargin).head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 0L && r.getInt(2) === 3)
  }

  test("string/path/web additions: remove_prefix, token_extract, paths, domain") {
    val r = q(
      """SELECT remove_prefix('NATION_7', 'NATION_') AS a,
        |  remove_suffix('file.csv', '.csv') AS b,
        |  remove_prefix('zebra', 'NATION_') AS c,
        |  regex_search('brown fox', 'fox') AS d,
        |  regex_match('brown fox', 'fox') AS e,
        |  token_extract('alpha beta gamma', 1, {splitChars: ' '}) AS f,
        |  token_extract('alpha beta gamma', -1, {splitChars: ' '}) AS g,
        |  stringify_path(parse_path('a.b.c')) AS h,
        |  path_element(parse_path('a.b.c'), 1) AS i,
        |  CAST(path_length(parse_path('a.b.c')) AS integer) AS j,
        |  extract_domain('https://docs.example.com/x?y=1') AS k,
        |  static_type(1.5)[scalar] AS l,
        |  try(CAST('oops' AS number), -1) AS m""".stripMargin).head()
    assert(r.getString(0) === "7" && r.getString(1) === "file" &&
      r.getString(2) === "zebra")
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getString(5) === "beta" && r.getString(6) === "gamma")
    assert(r.getString(7) === "a.b.c" && r.getString(8) === "b" && r.getLong(9) === 3L)
    assert(r.getString(10) === "docs.example.com")
    // static_type now returns the reference's ValueInfo row
    // (MLDB-1486); 1.5 is an f64 scalar
    assert(r.getString(11) === "f64")
    assert(r.getDouble(12) === -1.0)
  }

  test("tokenize with options row: ngrams + minTokenLength + splitChars") {
    // ngrams join with "_" (reference tokenize.cc:118)
    val r = q(
      """SELECT tokenize('a bb ccc dd', {splitChars: ' ',
        |  minTokenLength: 2, ngramRange: [1, 2]}) AS t""".stripMargin)
      .head().getMap[String, Int](0)
    assert(r.contains("bb") && r.contains("ccc") && r.contains("bb_ccc"))
    assert(!r.contains("a"))
    val s = q("""SELECT tokenize('a-b_c', {splitChars: '-_'}) AS t""")
      .head().getMap[String, Int](0)
    assert(s.keySet === Set("a", "b", "c"))
  }

  test("likelihood_ratio and pivot dialect aggregates") {
    val lr = q(
      """SELECT n_regionkey, round(likelihood_ratio(n_nationkey > 10, n_nationkey > 5), 6) AS lr
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey LIMIT 1""".stripMargin)
      .head()
    assert(!lr.isNullAt(1)) // smoothed ratio always defined
    val pv = q(
      """SELECT r_regionkey % 2 AS par, pivot(r_name, r_regionkey) AS m
        |FROM region GROUP BY r_regionkey % 2""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getMap[String, Int](1)).toMap
    assert(pv(0L)("AFRICA") === 0 && pv(0L)("ASIA") === 2)
    assert(pv(1L).keySet === Set("AMERICA", "EUROPE"))
  }

  test("aggregate over a row literal expands per column: sum({a, b})") {
    val r = q(
      """SELECT sum({k: n_nationkey, r: n_regionkey}) AS s FROM nation""")
      .select(col("s.k"), col("s.r")).head()
    assert(r.getLong(0) === (0 until 25).sum)
    // {*} composes: one aggregate per table column
    val w = q("""SELECT sum({*}) AS s FROM region""").head().getStruct(0)
    assert(w.schema.fieldNames.contains("r_regionkey"))
    assert(w.getAs[Number]("r_regionkey").longValue === (0 until 5).sum)
  }

  test("dynamic LIKE pattern (non-literal)") {
    val n = q(
      """SELECT r_name FROM region WHERE r_name LIKE upper('a') || '%'""")
      .count()
    assert(n === 3) // 'A%' matches AFRICA, AMERICA, ASIA
  }

  test("DISTINCT ON must lead the ORDER BY") {
    val e = intercept[IllegalArgumentException] {
      q("""SELECT DISTINCT ON (r_regionkey) r_name FROM region
          |ORDER BY r_name""".stripMargin).collect()
    }
    assert(e.getMessage.contains("ORDER BY to start with"))
  }

  test("sample table function: rows mode is deterministic") {
    val a = q("SELECT * FROM sample(nation, {rows: 7})").collect()
    val b = q("SELECT * FROM sample(nation, {rows: 7})").collect()
    assert(a.length === 7 && a.map(_.getInt(0)).toSeq === b.map(_.getInt(0)).toSeq)
    val c = q("SELECT * FROM sample(nation, {rows: 7, seed: 9})").collect()
    assert(c.map(_.getInt(0)).toSeq !== a.map(_.getInt(0)).toSeq)
  }

  test("isinf/isfinite, extract_column, print_json, slice") {
    val r = q(
      """SELECT isinf(exp(1000.0)) AS a, isfinite(exp(1000.0)) AS b,
        |  isfinite(2.5) AS c,
        |  extract_column('x', {x: 41, y: 2}) AS d,
        |  print_json({x: 1}) AS e,
        |  slice([10, 20, 30, 40], 2, 2) AS f""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(r.getLong(3) === 41L)
    assert(r.getString(4) === """{"x":1}""")
    assert(r.getSeq[Long](5) === Seq(20L, 30L))
  }

  test("IN (SELECT …) as a value expression, incl. inside CASE") {
    val df = q(
      """SELECT n_name,
        |  n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA') AS in_asia,
        |  CASE WHEN n_regionkey NOT IN (SELECT r_regionkey FROM region
        |    WHERE r_name = 'ASIA') THEN 'out' ELSE 'in' END AS tag
        |FROM nation""".stripMargin)
    assert(df.filter(col("in_asia")).count() === 5)
    assert(df.filter(col("tag") === "in").count() === 5)
    assert(df.count() === 25)
  }

  test("IN (SELECT …) in ORDER BY position") {
    val rows = q(
      """SELECT n_name FROM nation
        |ORDER BY n_regionkey IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA') DESC, n_name
        |LIMIT 5""".stripMargin).collect().map(_.getString(0)).toSeq
    // the 5 ASIA nations (regionkey 2: NATION_{2,7,12,17,22}) sort
    // first (true before false), then lexicographically by name
    assert(rows === Seq("NATION_12", "NATION_17", "NATION_2", "NATION_22", "NATION_7"))
  }

  test("IN (SELECT …) in WHEN position, incl. inside OR") {
    val n = q(
      """SELECT n_name FROM nation
        |WHEN n_regionkey IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA') OR n_name = 'NATION_0'""".stripMargin).count()
    assert(n === 6) // 5 ASIA nations + NATION_0
  }

  test("IN (SELECT …) as the DISTINCT ON key") {
    val rows = q(
      """SELECT DISTINCT ON (n_regionkey IN (SELECT r_regionkey FROM region
        |    WHERE r_name = 'ASIA')) n_name FROM nation
        |ORDER BY n_regionkey IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA') DESC, n_name""".stripMargin)
      .collect().map(_.getString(0)).toSet
    // first row per key group: NATION_12 (in-ASIA group, lexicographic
    // min of NATION_{2,7,12,17,22}), NATION_0 (rest)
    assert(rows === Set("NATION_12", "NATION_0"))
  }

  test("IN (SELECT …) as the ORDER BY key after GROUP BY") {
    val r = q(
      """SELECT n_regionkey AS k, count(*) AS n FROM nation
        |GROUP BY n_regionkey
        |ORDER BY k IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA') DESC, k
        |LIMIT 1""".stripMargin).head()
    assert(r.getInt(0) === 2 && r.getLong(1) === 5L) // ASIA group first
  }

  test("IN (SELECT …) nested inside a post-GROUP-BY ORDER BY expression") {
    // the sub-select sits inside a CASE inside the sort key — the
    // marker join must happen on the aggregated projection
    val r = q(
      """SELECT n_regionkey AS k, count(*) AS n FROM nation
        |GROUP BY n_regionkey
        |ORDER BY CASE WHEN k IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA') THEN 0 ELSE 1 END, k DESC
        |LIMIT 2""".stripMargin).collect()
    // ASIA (k=2) first via the CASE, then the highest remaining key
    assert(r(0).getInt(0) === 2 && r(0).getLong(1) === 5L)
    assert(r(1).getInt(0) === 4)
    // boolean operators around the sub-select work too
    val r2 = q(
      """SELECT n_regionkey AS k, count(*) AS n FROM nation
        |GROUP BY n_regionkey
        |ORDER BY NOT (k IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA')), k
        |LIMIT 1""".stripMargin).head()
    assert(r2.getInt(0) === 2)
  }

  test("IN (SELECT …) in HAVING and in post-aggregation projection items") {
    // HAVING on a group key probe
    val r = q(
      """SELECT n_regionkey AS k, count(*) AS n FROM nation
        |GROUP BY n_regionkey
        |HAVING n_regionkey IN (SELECT r_regionkey FROM region
        |  WHERE r_name = 'ASIA' OR r_name = 'AFRICA')
        |ORDER BY k""".stripMargin).collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(0, 2).sorted ||
      r.length === 2) // two region keys survive
    // projection item: the IN result is a selected value; also nested
    // in CASE; also an aggregate probe
    val r2 = q(
      """SELECT n_regionkey AS k,
        |  n_regionkey IN (SELECT r_regionkey FROM region
        |    WHERE r_name = 'ASIA') AS is_asia,
        |  CASE WHEN count(*) IN (SELECT r_regionkey FROM region)
        |    THEN 'keycount' ELSE 'other' END AS tag,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY k""".stripMargin).collect()
    assert(r2.length === 5)
    assert(r2.count(_.getBoolean(1)) === 1) // only regionkey 2
    // every group has count 5, and 5 is NOT a region key (keys 0..4
    // include 4 but not 5) → count(*) IN (keys) false everywhere
    assert(r2.forall(_.getString(2) === "other"))
    // HAVING with an aggregate probe
    val r3 = q(
      """SELECT n_regionkey AS k, count(*) AS n FROM nation
        |GROUP BY n_regionkey
        |HAVING count(*) IN (SELECT r_regionkey + 1 FROM region
        |  WHERE r_regionkey = 4)""".stripMargin).collect()
    assert(r3.length === 5) // every group has exactly 5 rows
  }

  test("NOT IN (SELECT …) with NULL in the subquery follows tri-logic") {
    val rows = q(
      """SELECT n_regionkey,
        |  n_regionkey NOT IN (SELECT CASE WHEN r_regionkey = 2
        |    THEN CAST(NULL AS integer) ELSE r_regionkey END FROM region) AS ni,
        |  n_regionkey IN (SELECT CASE WHEN r_regionkey = 2
        |    THEN CAST(NULL AS integer) ELSE r_regionkey END FROM region) AS i
        |FROM nation""".stripMargin).collect()
    rows.foreach { r =>
      if (r.getInt(0) == 2) { // no match + NULL in set → NULL, not false
        assert(r.isNullAt(1) && r.isNullAt(2))
      } else { // definite match → IN true, NOT IN false
        assert(!r.getBoolean(1) && r.getBoolean(2))
      }
    }
  }

  test("try keeps a legitimate NULL from a null input column") {
    val rows = q(
      """SELECT try(CAST(x AS number), -1) AS v FROM (
        |  SELECT CASE WHEN r_regionkey = 0 THEN NULL ELSE r_name END AS x
        |  FROM region) t""".stripMargin).collect()
    // r_regionkey=0: x is NULL data → try passes the NULL through;
    // other rows: CAST('AMERICA' AS number) errors→NULL → fallback -1
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.count(r => !r.isNullAt(0) && r.getDouble(0) === -1.0) === 4)
  }

  test("tokenize splitChars containing letters/digits split literally") {
    val r = q("""SELECT tokenize('axbsc', {splitChars: 'sx'}) AS t""")
      .head().getMap[String, Int](0)
    assert(r.keySet === Set("a", "b", "c"))
  }

  test("atom_dataset(table): per-cell rows, WHEN gets cell fidelity") {
    // events has a ts column -> every cell carries the row's event time
    val cells = q(
      """SELECT rowName, column, value_num FROM atom_dataset(events)
        |WHERE column = 'value' LIMIT 5""".stripMargin)
    assert(cells.count() === 5)
    // per-cell WHEN: on the atomized table, the row filter IS the cell
    // filter — counts drop as the WHEN window narrows
    val all = q("SELECT count(*) AS n FROM atom_dataset(events)").head().getLong(0)
    val windowed = q(
      """SELECT count(*) AS n FROM atom_dataset(events)
        |WHEN value_timestamp() < CAST('2024-01-10' AS timestamp)""".stripMargin)
      .head().getLong(0)
    assert(windowed > 0 && windowed < all)
  }

  test("vertical_count and DISTINCT aggregate variants") {
    val r = q(
      """SELECT vertical_count(n_name) AS vc,
        |  sum(DISTINCT n_regionkey) AS sd,
        |  avg(DISTINCT n_regionkey) AS ad
        |FROM nation""".stripMargin).head()
    assert(r.getLong(0) === 25L)
    assert(r.getLong(1) === 10L) // 0+1+2+3+4
    assert(r.getDouble(2) === 2.0)
  }

  test("rowpath()/rowpathelement() decompose the row name") {
    // a NAMED string is ONE path element — dots survive inside it and
    // the printed form quotes them (MLDB-1678), so rowPath() has one
    // element, rowPathElement(1) is NULL, and stringify round-trips
    val r = q(
      """SELECT rowpathelement(0) AS e0, rowpathelement(1) AS e1,
        |  stringify_path(rowpath()) AS p
        |FROM (SELECT r_regionkey, r_name NAMED 'region.' || r_regionkey
        |      FROM region ORDER BY r_regionkey LIMIT 1) AS t""".stripMargin)
      .head()
    assert(r.getString(0) === "region.0")
    assert(r.isNullAt(1))
    assert(r.getString(2) === "\"region.0\"")
  }

  test("offset/limit and rowname()/rowhash() context functions") {
    val rows = q(
      """SELECT rowname() AS rn, rowhash() AS rh, o_orderkey
        |NAMED 'o-' || o_orderkey
        |FROM orders ORDER BY o_orderkey OFFSET 2 LIMIT 3""".stripMargin).collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[String]("rowName") === rows(0).getAs[String]("rn"))
    assert(!rows(0).isNullAt(1))
  }

  test("uint64 beyond int64: 2^63+1 survives literal, import, query, REST") {
    // SURVEY §1.2 / sql/cell_value.h:497-499 ST_UNSIGNED: values above
    // Long.MaxValue must not wrap negative
    val big = "9223372036854775809" // 2^63 + 1
    val r = q(s"SELECT $big AS big, $big + 1 AS big1")
    assert(r.schema("big").dataType
      .isInstanceOf[org.apache.spark.sql.types.DecimalType])
    val row = r.head()
    assert(row.getDecimal(0).toPlainString === big)
    assert(row.getDecimal(1).toPlainString === "9223372036854775810")
    // CSV import round-trip (Spark's inference promotes to decimal)
    val tmp = java.io.File.createTempFile("graft_uint64", ".csv")
    tmp.deleteOnExit()
    java.nio.file.Files.write(tmp.toPath,
      s"id,v\n1,$big\n2,42\n".getBytes("UTF-8"))
    val imported = graft.sources.Sources.importText(spark, tmp.getAbsolutePath)
    val vs = imported.orderBy("id").collect()
    assert(String.valueOf(vs(0).get(1)) === big,
      s"imported as ${vs(0).get(1)} (${imported.schema("v").dataType})")
    // comparisons still work across the 2^63 boundary
    val e = new api.GraftEngine(spark)
    e.createDataset("bigu64", imported)
    assert(e.query(s"SELECT id FROM bigu64 WHERE v = $big").count() === 1)
    assert(e.query("SELECT id FROM bigu64 WHERE v > 9223372036854775808")
      .count() === 1)
    // REST output keeps all digits
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      val qs = java.net.URLEncoder.encode(
        s"SELECT v FROM bigu64 WHERE id = 1", "UTF-8")
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port/v1/query?q=$qs")).GET.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200 && resp.body().contains(big),
        resp.body())
    } finally srv.stop()
  }
}
