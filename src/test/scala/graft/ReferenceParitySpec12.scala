package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Twelfth batch of replays of the reference's OWN regression tests:
  * the transform procedure's full structured-inputData surface
  * (named / groupBy / limit / skipEmptyRows / no-FROM constants), the
  * melt procedure's to_fix/to_melt contract, and aggregate row-name
  * composition through procedures. Each test cites the
  * `/root/reference/testing/` file it reproduces and pins that file's
  * expected values. */
class ReferenceParitySpec12 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val client = HttpClient.newHttpClient()

  private def withServer[T](engine: api.GraftEngine)(
      body: ((String => (Int, String)), ((String, String) => (Int, String)),
        ((String, String) => (Int, String))) => T): T = {
    val srv = new api.RestServer(engine)
    val port = srv.start()
    def get(path: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def put(path: String, b: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .PUT(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def post(path: String, b: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try body(get, put, post) finally srv.stop()
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  /** `test` dataset of MLDB-409-transform-dataset.js. */
  private def engine409(): api.GraftEngine = {
    val e = new api.GraftEngine(spark)
    e.recordRows("test",
      """[{"rowName":"ex1","x":0,"y":0,"label":"cat"},
        |{"rowName":"ex2","x":1,"y":1,"label":"dog"},
        |{"rowName":"ex3","x":1,"y":2,"label":"cat"},
        |{"rowName":"ex4","x":6,"y":6,"label":"poil"}]""".stripMargin)
    e
  }

  // --- MLDB-409-transform-dataset.js ---------------------------------------

  test("MLDB-409: structured transform with named/orderBy/limit keeps 3 rows") {
    withServer(engine409()) { (get, put, post) =>
      val (c, b) = put("/v1/procedures/transform",
        """{"type": "transform", "params": {
          |"inputData": {"select": "x, y, x * 10 AS z, y + 6 AS q",
          |  "from": "test", "named": "rowName() + '_transformed'",
          |  "orderBy": "rowName()", "limit": 3},
          |"outputDataset": {"id": "transformed", "type": "sparse.mutable"},
          |"runOnCreation": false}}""".stripMargin)
      assert(c === 201, b)
      assert(post("/v1/procedures/transform/runs", "{}")._1 === 201)
      val (c2, b2) = get("/v1/query?q=" + enc(
        "SELECT x,y,z,q from transformed order by rowName()") +
        "&format=table")
      assert(c2 === 200, b2)
      assert(b2 ===
        """[["_rowName","q","x","y","z"],""" +
        """["ex1_transformed",6,0,0,0],""" +
        """["ex2_transformed",7,1,1,10],""" +
        """["ex3_transformed",8,1,2,10]]""", b2)
    }
  }

  test("MLDB-409: structured transform without limit keeps all 4 rows") {
    withServer(engine409()) { (get, put, post) =>
      assert(put("/v1/procedures/transform2",
        """{"type": "transform", "params": {
          |"inputData": {"select": "x, y, x * 10 AS z, y + 6 AS q",
          |  "from": "test", "orderBy": "rowName()",
          |  "named": "rowName() + '_transformed'"},
          |"outputDataset": {"id": "transformed2", "type": "sparse.mutable"},
          |"runOnCreation": false}}""".stripMargin)._1 === 201)
      assert(post("/v1/procedures/transform2/runs", "{}")._1 === 201)
      val (_, b) = get("/v1/query?q=" + enc(
        "select x,y,z,q from transformed2 order by rowName()") +
        "&format=table")
      assert(b ===
        """[["_rowName","q","x","y","z"],""" +
        """["ex1_transformed",6,0,0,0],""" +
        """["ex2_transformed",7,1,1,10],""" +
        """["ex3_transformed",8,1,2,10],""" +
        """["ex4_transformed",12,6,6,60]]""", b)
    }
  }

  test("MLDB-409: skipEmptyRows drops rows whose selection is all-null") {
    val e = new api.GraftEngine(spark)
    e.recordRows("test2",
      """[{"rowName":"ex1","x":1,"y":2},
        |{"rowName":"ex2","y":3},
        |{"rowName":"ex3","x":4}]""".stripMargin)
    withServer(e) { (get, put, post) =>
      assert(put("/v1/procedures/transform3",
        """{"type": "transform", "params": {
          |"inputData": {"select": "x", "from": "test2",
          |  "orderBy": "rowName()",
          |  "named": "rowName() + '_transformed'"},
          |"outputDataset": {"id": "transformed3", "type": "sparse.mutable"},
          |"skipEmptyRows": true,
          |"runOnCreation": false}}""".stripMargin)._1 === 201)
      assert(post("/v1/procedures/transform3/runs", "{}")._1 === 201)
      val (_, b) = get("/v1/query?q=" + enc(
        "select * from transformed3 order by rowName()") + "&format=table")
      assert(b ===
        """[["_rowName","x"],["ex1_transformed",1],["ex3_transformed",4]]""",
        b)
    }
  }

  test("MLDB-409: structured transform with groupBy composes [key] names") {
    val e = new api.GraftEngine(spark)
    e.recordRows("test2",
      """[{"rowName":"ex1","x":1,"y":2},
        |{"rowName":"ex2","y":3},
        |{"rowName":"ex3","x":4}]""".stripMargin)
    withServer(e) { (get, put, post) =>
      assert(put("/v1/procedures/transform4",
        """{"type": "transform", "params": {
          |"inputData": {"select": "y", "from": "test2",
          |  "named": "rowName() + '_transformed'", "groupBy": "y"},
          |"outputDataset": {"id": "transformed4", "type": "sparse.mutable"},
          |"skipEmptyRows": true,
          |"runOnCreation": false}}""".stripMargin)._1 === 201)
      assert(post("/v1/procedures/transform4/runs", "{}")._1 === 201)
      val (_, b) = get("/v1/query?q=" + enc(
        "select * from transformed4 order by rowName()") + "&format=table")
      assert(b ===
        """[["_rowName","y"],["[2]_transformed",2],["[3]_transformed",3]]""",
        b)
    }
  }

  test("MLDB-409: no-FROM transforms produce constant 'result'/NAMED rows") {
    def runNoFrom(get: String => (Int, String),
        put: (String, String) => (Int, String),
        post: (String, String) => (Int, String),
        query: String): String = {
      assert(put("/v1/procedures/transform_no_from",
        s"""{"type": "transform", "params": {
           |"inputData": ${jsonStr(query)},
           |"outputDataset": {"id": "transformed_no_from",
           |  "type": "sparse.mutable"},
           |"skipEmptyRows": true,
           |"runOnCreation": false}}""".stripMargin)._1 === 201)
      assert(post("/v1/procedures/transform_no_from/runs", "{}")._1 === 201)
      get("/v1/query?q=" + enc("select * from transformed_no_from") +
        "&format=table")._2
    }
    withServer(new api.GraftEngine(spark)) { (get, put, post) =>
      assert(runNoFrom(get, put, post, "select 1 as col") ===
        """[["_rowName","col"],["result",1]]""")
      assert(runNoFrom(get, put, post, "select 1 as col named 'row'") ===
        """[["_rowName","col"],["row",1]]""")
      assert(runNoFrom(get, put, post, "select 1+1 as col named 'row'") ===
        """[["_rowName","col"],["row",2]]""")
      assert(runNoFrom(get, put, post,
        "select to_timestamp('2015-11-25') + INTERVAL '1 month' as chrismas")
        === """[["_rowName","chrismas"],["result","2015-12-25T00:00:00Z"]]""")
      assert(runNoFrom(get, put, post,
        "select now() - to_timestamp('2015-01-01') > INTERVAL '454D' as col")
        === """[["_rowName","col"],["result",true]]""")
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // --- MLDBFB-332-transform_input_sum_doesnt_exist_test.py -----------------

  test("MLDBFB-332: structured sum({*}) transform names the row [] / [1]") {
    val e = new api.GraftEngine(spark)
    e.recordRows("ds", """[{"rowName":"row1","colA":1}]""")
    withServer(e) { (get, _, post) =>
      assert(post("/v1/procedures",
        """{"type": "transform", "params": {
          |"inputData": {"select": "sum({*})", "from": "ds"},
          |"outputDataset": {"id": "res", "type": "sparse.mutable"},
          |"runOnCreation": true}}""".stripMargin)._1 === 201)
      assert(get("/v1/query?q=" + enc("SELECT * FROM res") +
        "&format=table")._2 ===
        """[["_rowName","sum({*}).colA"],["[]",1]]""")
      assert(post("/v1/procedures",
        """{"type": "transform", "params": {
          |"inputData": {"select": "sum({*})", "from": "ds", "groupBy": "1"},
          |"outputDataset": {"id": "res2", "type": "sparse.mutable"},
          |"runOnCreation": true}}""".stripMargin)._1 === 201)
      assert(get("/v1/query?q=" + enc("SELECT * FROM res2") +
        "&format=table")._2 ===
        """[["_rowName","sum({*}).colA"],["[1]",1]]""")
      // named over a grouped aggregate is accepted (tests 3-4 assert
      // only success)
      assert(post("/v1/procedures",
        """{"type": "transform", "params": {
          |"inputData": {"select": "sum({*})", "from": "ds",
          |  "groupBy": "1", "named": "'coco'"},
          |"outputDataset": {"id": "res3", "type": "sparse.mutable"},
          |"runOnCreation": true}}""".stripMargin)._1 === 201)
      assert(get("/v1/query?q=" + enc("SELECT * FROM res3") +
        "&format=table")._2 ===
        """[["_rowName","sum({*}).colA"],["coco",1]]""")
    }
  }

  // --- MLDB-1275_melt_procedure.py (test_key_value_columns) ----------------

  test("MLDB-1275: melt emits one row per cell, named rowName.key") {
    val e = new api.GraftEngine(spark)
    e.recordRows("patate",
      """[{"rowName":"0","x.0":1,"x.1":2},
        |{"rowName":"1","x.0":2,"x.1":3}]""".stripMargin)
    withServer(e) { (get, _, post) =>
      assert(post("/v1/procedures",
        """{"type": "melt", "params": {
          |"inputData": "SELECT {x.* AS *} AS to_melt, {implicit_cast(rowName()) AS orig_rowName} AS to_fix FROM patate",
          |"outputDataset": "poil",
          |"keyColumnName": "k",
          |"valueColumnName": "v",
          |"runOnCreation": true}}""".stripMargin)._1 === 201)
      val (c, b) = get("/v1/query?q=" + enc(
        "select * from poil order by rowName()") + "&format=table")
      assert(c === 200, b)
      assert(b ===
        """[["_rowName","k","orig_rowName","v"],""" +
        """["0.0","0",0,1],""" +
        """["0.1","1",0,2],""" +
        """["1.0","0",1,2],""" +
        """["1.1","1",1,3]]""", b)
    }
  }
}
