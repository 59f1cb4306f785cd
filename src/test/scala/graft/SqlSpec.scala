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
  private def q(sql: String) = GraftSql.query(spark, sf, sql)

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
        |  norm([3.0, 4.0]) AS e,
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

  test("parse_json with a schema yields a structured row; without one it fails loudly") {
    val row = q("""SELECT parse_json('{"a": 7, "b": "x"}', 'a INT, b STRING') AS j""")
      .select(col("j.a"), col("j.b")).head()
    assert(row.getInt(0) === 7 && row.getString(1) === "x")
    val e = intercept[IllegalArgumentException] {
      q("""SELECT parse_json('{"a": 1}') AS j""").collect()
    }
    assert(e.getMessage.contains("schema"))
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

  test("offset/limit and rowname()/rowhash() context functions") {
    val rows = q(
      """SELECT rowname() AS rn, rowhash() AS rh, o_orderkey
        |NAMED 'o-' || o_orderkey
        |FROM orders ORDER BY o_orderkey OFFSET 2 LIMIT 3""".stripMargin).collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[String]("rowName") === rows(0).getAs[String]("rn"))
    assert(!rows(0).isNullAt(1))
  }
}
