package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twenty-eighth batch of replays of the reference's OWN regression
  * tests — dialect / dataset corners:
  *   - MLDB-581-multiple-select.js (repeat-query determinism),
  *   - MLDB-195-column-left-multiplication.js (surface-text naming of
  *     `2.2 * Weight`),
  *   - MLDBFB-646-column-expression-select.js (COLUMN EXPR value
  *     transforms and path-function renames),
  *   - MLDB-927-null-row-output.py (WHEN row filtering agrees between
  *     query and transform),
  *   - MLDB-1500-transpose-query.js (aggregates with `{*}` over a
  *     transposed table),
  *   - MLDB-462-transposed-dataset.js (double transpose = identity;
  *     svd trains over both),
  *   - MLDB-1317-tensor-datatype.js (nested embedding `AS *` naming,
  *     row ± scalar lifting). */
class ReferenceParitySpec28 extends AnyFunSuite {

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

  // --- MLDB-581 ---------------------------------------------------------------------

  test("MLDB-581: the same query answers identically twice") {
    e.recordRows("ds581",
      """[{"rowName":"a","x":1,"y":2},{"rowName":"b","x":3,"y":4},
        |{"rowName":"c","x":5,"y":6}]""".stripMargin)
    def run() = q("select * from ds581 order by rowName() limit 10")
      .collect().map(_.toString).toSeq
    assert(run() === run())
  }

  // --- MLDB-195 ---------------------------------------------------------------------

  test("MLDB-195: left multiplication names the column by its surface text") {
    e.recordRows("ds195", """[{"rowName":"row1","Weight":1,"col2":2}]""")
    val df = q("select 2.2 * Weight from ds195")
    // the name holds a dot (2.2), so it path-prints QUOTED — exactly
    // the reference's expected header "\"2.2 * Weight\""
    assert(df.columns.toSeq === Seq("\"2.2 * Weight\""), df.columns.toSeq)
    assert(math.abs(df.head().getDouble(0) - 2.2) < 1e-12)
  }

  // --- MLDBFB-646 -------------------------------------------------------------------

  test("MLDBFB-646: COLUMN EXPR value transforms and path renames") {
    // (select value() * 10): each column maps through the transform
    val r1 = q("""select column expr(select value() * 10) named 'res'
      from (select x:1, y:2)""").head()
    assert(r1.getAs[Number](r1.fieldIndex("x")).doubleValue === 10.0)
    assert(r1.getAs[Number](r1.fieldIndex("y")).doubleValue === 20.0)
    // a STRUCT-valued transform: each column becomes a row (leaf cells
    // x.a/x.b in the reference; wide mode keeps the struct column)
    val r2 = q("""select column expr(select
        {a: value() * 10, b: value() * 20}) named 'res'
      from (select x:1, y:2)""").head()
    val xs = r2.getStruct(r2.fieldIndex("x"))
    assert(xs.getAs[Number]("a").doubleValue === 10.0)
    assert(xs.getAs[Number]("b").doubleValue === 20.0)
    val ys = r2.getStruct(r2.fieldIndex("y"))
    assert(ys.getAs[Number]("a").doubleValue === 20.0)
    assert(ys.getAs[Number]("b").doubleValue === 40.0)
    // path-function renames keep the dotted names addressable
    val r3 = q("""select column expr(as parse_path(parse_path(columnName())))
        named 'res'
      from (select "x.y.z": 1, "x.y.y": 2)""").head()
    assert(r3.getAs[Number](r3.fieldIndex("x.y.z")).longValue === 1L)
    assert(r3.getAs[Number](r3.fieldIndex("x.y.y")).longValue === 2L)
  }

  // --- MLDB-927 ---------------------------------------------------------------------

  test("MLDB-927: WHEN filters agree between query and transform") {
    e.recordRows("ds927",
      """[{"rowName":"user1","x":1,"y":2,"ts":"2026-08-16T12:00:00Z"},
        |{"rowName":"user2","x":3,"y":4,"ts":"2026-08-15T12:00:00Z"}]"""
        .stripMargin)
    val later = "2026-08-15T13:00:00Z"
    def viaQuery() = q(s"""select x, y from ds927
        when value_timestamp() > TIMESTAMP '$later'
        order by rowHash()""").collect().map(_.toString).toSeq
    assert(viaQuery() === viaQuery(), "query must be deterministic")
    e.runProcedure("transform", Map(
      "inputData" -> (s"select x, y from ds927 when " +
        s"value_timestamp() > TIMESTAMP '$later'"),
      "outputDataset" -> "ds927_out").get _)
    val transformed = e.dataset("ds927_out")
      .select(col("x"), col("y")).collect().map(_.toString).toSeq
    assert(transformed === viaQuery())
    assert(transformed.size === 1, "user2's row is WHEN-filtered")
  }

  // --- MLDB-1500 --------------------------------------------------------------------

  test("MLDB-1500: aggregates with {*} over a transposed table") {
    // columns become rows under transpose; horizontal_count({*}) per
    // transposed row = the column's support
    e.recordRows("ds1500",
      """[{"rowName":"r1","a":1,"b":1,"c":1},
        |{"rowName":"r2","a":1,"b":1},
        |{"rowName":"r3","a":1,"b":1},
        |{"rowName":"r4","a":1}]""".stripMargin)
    val rows = q("""select rowName() as rn,
        sum(horizontal_count({*})) as width
      from transpose(ds1500)
      group by rowName()
      order by sum(horizontal_count({*})) desc, rowName() limit 2""")
      .collect()
    assert(rows.length === 2)
    // group names are path-printed like the reference's
    // "\"[\"\"AskReddit\"\"]\"" shape
    assert(rows(0).getString(0) === "\"[\"\"a\"\"]\"" &&
      rows(0).getLong(1) === 4L, rows.mkString(", "))
    assert(rows(1).getString(0) === "\"[\"\"b\"\"]\"" &&
      rows(1).getLong(1) === 3L, rows.mkString(", "))
  }

  // --- MLDB-462 ---------------------------------------------------------------------

  test("MLDB-462: double transposition is the identity; svd trains on both") {
    e.recordRows("ds462",
      """[{"rowName":"ex00","x":0,"y":0,"label":0},
        |{"rowName":"ex10","x":1,"y":0,"label":1},
        |{"rowName":"ex01","x":0,"y":1,"label":1},
        |{"rowName":"ex111","x":1,"y":1,"label":1},
        |{"rowName":"ex110","x":1,"y":1,"label":0},
        |{"rowName":"ex22","x":2,"y":2,"label":0},
        |{"rowName":"ex31","x":3,"y":1,"label":1}]""".stripMargin)
    val direct = q(
      "select rowName() as rn, x, y, label from ds462 order by rowName()")
      .collect().map(_.toString).toSeq
    val doubled = q("""select rowName() as rn, x, y, label
      from transpose(transpose(ds462)) order by rowName()""")
      .collect().map(_.toString).toSeq
    assert(direct === doubled)
    // svd over the doubly-transposed view matches the direct one
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds462",
      "columnOutputDataset" -> "svd462_cols",
      "numSingularValues" -> "10").get _)
    e.runProcedure("transform", Map(
      "inputData" -> "select * from transpose(transpose(ds462))",
      "outputDataset" -> "ds462_tt").get _)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds462_tt",
      "columnOutputDataset" -> "svd462_cols2",
      "numSingularValues" -> "10").get _)
    assert(e.dataset("svd462_cols").count() === 3)
    // wide-mode transpose melts to a common cell type, so the
    // round-tripped columns train as string one-hots — the pin is that
    // svd runs over BOTH (the reference's assertion); the one-hot
    // retype is the documented transpose divergence
    assert(e.dataset("svd462_cols2").count() >= 3)
  }

  // --- MLDB-1317 --------------------------------------------------------------------

  test("MLDB-1317: nested embeddings expand AS * with dotted indices") {
    val r = q("select [ [ 1, 2 ], [ 3, 4 ] ] as *").head()
    val names = r.schema.fieldNames.toSeq
    assert(names === Seq("0.0", "0.1", "1.0", "1.1"), names)
    assert((0 until 4).map(i => r.getAs[Number](i).longValue) ===
      Seq(1L, 2L, 3L, 4L))
  }

  test("MLDB-1317: row ± scalar lifts element-wise, both operand orders") {
    val r1 = q("select { x: 1, y: 2} + 1 as *").head()
    assert(r1.getAs[Number](r1.fieldIndex("x")).longValue === 2L)
    assert(r1.getAs[Number](r1.fieldIndex("y")).longValue === 3L)
    val r2 = q("select 1 + { x: 1, y: 2} as *").head()
    assert(r2.getAs[Number](r2.fieldIndex("x")).longValue === 2L)
    assert(r2.getAs[Number](r2.fieldIndex("y")).longValue === 3L)
  }

  test("MLDB-1317 tail: 2-D embedding arithmetic, number+string concat, row union") {
    // [[1],[2]] + [[3],[4]] → element-wise into the nested shape
    val add = q("select [ [1], [2] ] + [ [3], [4] ] as *").head()
    assert(add.schema.fieldNames.toSeq === Seq("0.0", "1.0"))
    assert(add.getAs[Number](0).doubleValue === 4.0)
    assert(add.getAs[Number](1).doubleValue === 6.0)
    // + with a string element CONCATENATES (binaryPlus — '1three')
    val cat = q("select [ [1], [2] ] + [ ['three'], ['four'] ] as *").head()
    assert(cat.getString(0) === "1three")
    assert(cat.getString(1) === "2four")
    // row * row takes the union of field names; a one-sided field is
    // NULL
    val u = q("select { x: 1, y: 2} * { x: 3, y: 4, z: 5 } as *").head()
    assert(u.getAs[Number](u.fieldIndex("x")).longValue === 3L)
    assert(u.getAs[Number](u.fieldIndex("y")).longValue === 8L)
    assert(u.isNullAt(u.fieldIndex("z")))
  }

  test("MLDB-1317 tail: 2-D normalize/quantize and static_expression_info") {
    // normalize over the FLATTENED 2-D embedding (p=1: sum = 100)
    val nr = q("select normalize([ [ 10, 20 ], [ 30, 40 ] ], 1) as *").head()
    assert(nr.schema.fieldNames.toSeq === Seq("0.0", "0.1", "1.0", "1.1"))
    assert((0 until 4).map(nr.getDouble) === Seq(0.1, 0.2, 0.3, 0.4))
    // quantize lifts element-wise into the nested shape — including
    // the reference's pinned 0.30000000000000004 double artifact
    val qr = q("select quantize(normalize([ [ 10, 20 ], [ 30, 40 ] ], 1)" +
      ", 0.1) as *").head()
    assert((0 until 4).map(qr.getDouble) ===
      Seq(0.1, 0.2, 0.30000000000000004, 0.4))
    // static_expression_info: embedding kind, 2×2 shape, INT64 storage
    val si = q("select static_expression_info([ [ 10, 20 ], [ 30, 40 ] ])" +
      "[info] as i").select("i.*").head()
    assert(si.getAs[Int]("isConstant") === 1)
    assert(si.getAs[String]("kind") === "embedding")
    assert(si.getAs[Int]("shape.0") === 2)
    assert(si.getAs[Int]("shape.1") === 2)
    assert(si.getAs[String]("type") === "INT64")
    // normalize keeps the shape; storage becomes float (the engine
    // computes float64 where the reference stores float32 — divergence)
    val sn = q("select static_expression_info(normalize(" +
      "[ [ 10, 20 ], [ 30, 40 ] ], 1))[info] as i").select("i.*").head()
    assert(sn.getAs[Int]("isConstant") === 1)
    assert(sn.getAs[String]("kind") === "embedding")
    assert(sn.getAs[Int]("shape.0") === 2)
    assert(sn.getAs[String]("type").startsWith("FLOAT"))
    // the reference binds quantize NON-constant (quirk mirrored)
    val sq = q("select static_expression_info(quantize(normalize(" +
      "[ [ 10, 20 ], [ 30, 40 ] ], 1), 0.1))[info] as i")
      .select("i.*").head()
    assert(sq.getAs[Int]("isConstant") === 0)
    assert(sq.getAs[String]("kind") === "embedding")
    assert(sq.getAs[String]("type") === "FLOAT64")
  }
}
