package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fifty-first batch: the non-ticket functional tests —
  *
  *   - square-bracket string accessors: `a['foo']` is the STRING
  *     'foo', match or not; chaining and dot-mixing follow
  *     (`testing/square_bracket_accessor_test.py` — the MLDB-2105
  *     quirk)
  *   - anonymous dataset POSTs + in-script createDataset get auto ids
  *     (`mldb_auto_id_test.js`), unknown dataset types answer 400
  *     with a meaningful error (`mldb_create_error_test.js`)
  *   - classifier.test refuses empty test sets: LIMIT 0, large
  *     OFFSET, unmatched WHERE all raise the reference's message
  *     (`classifier_test_err_on_empty_sets.py`)
  *   - beh files carry their type: loading a beh.mutable save as
  *     beh.binary (or vice versa) is the reference's type error
  *     (`beh_type_check_on_load_test.py`); transform into a
  *     beh.binary.mutable file target creates the file
  *     (`beh-binary-mutable-save-test.py`)
  *   - JS plugin error surfaces: garbage source fails the PUT
  *     (`mldb_js_plugin_nocompile.js`), a throwing request handler
  *     surfaces its message (`mldb_js_plugin_requestexc.js`), a
  *     throwing status handler errors the GET without wedging the
  *     server (`mldb_js_plugin_statusexc.js`)
  *   - the iris svd.train pipeline with row/column output datasets
  *     (`procedure_409_test.py`)
  */
class ReferenceParitySpec51 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val client = HttpClient.newHttpClient()

  private def withServer[T](engine: api.GraftEngine)(body: Int => T): T = {
    val srv = new api.RestServer(engine)
    val port = srv.start()
    try body(port) finally srv.stop()
  }

  private def req(port: Int, method: String, path: String,
      body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    val r = method match {
      case "GET" => b.GET.build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "DELETE" => b.DELETE().build()
    }
    client.send(r, HttpResponse.BodyHandlers.ofString())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private def q(e: api.GraftEngine, sql: String) = e.query(sql)

  // ---- square_bracket_accessor_test -----------------------------------------

  test("square brackets: a['foo'] is the string 'foo', match or not") {
    val e = new api.GraftEngine(spark)
    val r1 = q(e, "SELECT a['foo'] FROM (SELECT {foo: 123} AS a)").head()
    assert(r1.getString(r1.fieldIndex("a['foo']")) === "foo")
    val r2 = q(e, "SELECT a['bar'] FROM (SELECT {foo: 123} AS a)").head()
    assert(r2.getString(r2.fieldIndex("a['bar']")) === "bar")
    // chaining: the LAST bracket string wins
    val r3 = q(e,
      "SELECT a['f']['b']['z'] AS v FROM (SELECT {f: {b: 123}} AS a)")
      .head()
    assert(r3.getString(r3.fieldIndex("v")) === "z")
    // dot-mixing
    val r4 = q(e,
      "SELECT a.f['b'] AS v FROM (SELECT {f: {b: 123}} AS a)").head()
    assert(r4.getString(r4.fieldIndex("v")) === "b")
  }

  // ---- mldb_auto_id_test / mldb_create_error_test ----------------------------

  test("auto ids for POSTed and in-script anonymous datasets") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r1 = req(port, "POST", "/v1/datasets",
        """{"type": "sparse.mutable"}""")
      assert(r1.statusCode() === 201, r1.body())
      val script =
        """
          |var dataset = mldb.createDataset({type: 'sparse.mutable'});
          |mldb.get('/v1/query', {q: 'select 1'});
          |"ok"
          |""".stripMargin
      assert(api.JsHost.resultJson(
        api.JsHost.run(spark, e.dataset, script, Map.empty, e)) === "\"ok\"")
      val r2 = req(port, "POST", "/v1/datasets",
        """{"type": "sparse.mutable"}""")
      assert(r2.statusCode() === 201, r2.body())
      val list = req(port, "GET", "/v1/datasets")
      assert(list.body().split("auto_").length - 1 >= 3, list.body())
    }
  }

  test("unknown dataset type answers 400 with a meaningful error") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r = req(port, "PUT", "/v1/datasets/test1",
        """{"type": "mutableasdsdadsasddasdsdasda"}""")
      assert(r.statusCode() === 400, r.body())
      assert(r.body().contains("error"), r.body())
    }
  }

  // ---- classifier_test_err_on_empty_sets -------------------------------------

  test("classifier.test refuses empty test sets with the reference message") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      req(port, "PUT", "/v1/datasets/ds",
        """{"type": "sparse.mutable"}""")
      req(port, "POST", "/v1/datasets/ds/rows",
        """[{"rowName": "row1", "label": 1, "feat1": 1, "feat2": 1},
          | {"rowName": "row2", "label": 0, "feat1": 1, "feat2": 0},
          | {"rowName": "row3", "label": 0, "feat1": 0, "feat2": 0}]"""
          .stripMargin)
      val err = "Cannot run classifier.test procedure on empty test set"
      for (tail <- Seq("LIMIT 0", "OFFSET 100", "WHERE patate=123")) {
        val r = req(port, "POST", "/v1/procedures",
          s"""{"type": "classifier.test", "params": {
             | "runOnCreation": true,
             | "testingData": "SELECT {* EXCLUDING(label)} AS features, label AS score, label AS label FROM ds $tail"}}"""
            .stripMargin)
        assert(r.statusCode() >= 400, s"$tail: ${r.body()}")
        assert(r.body().contains(err), s"$tail: ${r.body()}")
      }
    }
  }

  // ---- beh type checks ---------------------------------------------------------

  test("beh files carry their type; cross-type loads error") {
    val tmpDir = java.nio.file.Files.createTempDirectory("behtype")
    val e = new api.GraftEngine(spark)
    try withServer(e) { port =>
      val behFile = tmpDir.resolve("plain.beh")
      req(port, "PUT", "/v1/datasets/src",
        s"""{"type": "beh.mutable", "params":
           | {"dataFileUrl": "file://$behFile"}}""".stripMargin)
      req(port, "POST", "/v1/datasets/src/rows",
        """{"rowName": "row1", "columns": [["colA", 1, 0]]}""")
      req(port, "POST", "/v1/datasets/src/commit", "{}")

      val ok = req(port, "PUT", "/v1/datasets/beh",
        s"""{"type": "beh", "params":
           | {"dataFileUrl": "file://$behFile"}}""".stripMargin)
      assert(ok.statusCode() < 400, ok.body())

      val bad = req(port, "PUT", "/v1/datasets/error",
        s"""{"type": "beh.binary", "params":
           | {"dataFileUrl": "file://$behFile"}}""".stripMargin)
      assert(bad.statusCode() >= 400, bad.body())
      assert(bad.body().contains(
        "The loaded dataset is not of type beh.binary"), bad.body())

      // and the binary-side save: transform to a beh.binary.mutable
      // file target creates the file (beh-binary-mutable-save-test)
      val binFile = tmpDir.resolve("bin.beh")
      req(port, "PUT", "/v1/datasets/myDataset",
        """{"type": "beh.binary.mutable"}""")
      req(port, "POST", "/v1/datasets/myDataset/rows",
        """{"rowName": "row1", "columns": [["colA", 1, 0]]}""")
      req(port, "POST", "/v1/datasets/myDataset/rows",
        """{"rowName": "row2", "columns": [["colB", 1, 0]]}""")
      val t = req(port, "POST", "/v1/procedures",
        s"""{"type": "transform", "params": {
           | "inputData": "select colA from myDataset",
           | "outputDataset": {"type": "beh.binary.mutable", "params":
           |   {"dataFileUrl": "file://$binFile"}},
           | "runOnCreation": true, "skipEmptyRows": true}}""".stripMargin)
      assert(t.statusCode() < 400, t.body())
      assert(java.nio.file.Files.exists(binFile))
      // cross-load: a beh.binary save does not open as `beh`
      val crossBad = req(port, "PUT", "/v1/datasets/error2",
        s"""{"type": "beh", "params":
           | {"dataFileUrl": "file://$binFile"}}""".stripMargin)
      assert(crossBad.statusCode() >= 400, crossBad.body())
      assert(crossBad.body().contains(
        "The loaded dataset is not of type beh"), crossBad.body())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmpDir.toFile)
  }

  // ---- JS plugin error surfaces -------------------------------------------------

  test("JS plugin error surfaces: nocompile, requestexc, statusexc") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val bad = req(port, "PUT", "/v1/plugins/nocompile",
        """{"type": "javascript", "params":
          | {"source": "this\nwill\nnot compile\nat all\n!!!!!"}}"""
          .stripMargin.replace("\n ", " ").replace("\\n", "\\n"))
      assert(bad.statusCode() === 400, bad.body())

      val reqExcSrc =
        """
          |function handleStatus() { return { "message": "A-OK" }; }
          |function handleRequest(relpath, verb, resource, params, payload,
          |                       contentType, contentLength, headers) {
          |    throw "Exception in handleRequest thrown on purpose for testing";
          |}
          |plugin.setStatusHandler(handleStatus);
          |plugin.setRequestHandler(handleRequest);
          |""".stripMargin
      val esc1 = reqExcSrc.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val c1 = req(port, "PUT", "/v1/plugins/reqexc",
        s"""{"type": "javascript", "params": {"source": "$esc1"}}""")
      assert(c1.statusCode() < 400, c1.body())
      val st = req(port, "GET", "/v1/plugins/reqexc")
      assert(st.statusCode() === 200, st.body())
      assert(st.body().contains("A-OK"), st.body())
      val rt = req(port, "GET", "/v1/plugins/reqexc/routes/any")
      assert(rt.statusCode() >= 400, rt.body())
      assert(rt.body().contains("thrown on purpose"), rt.body())

      val stExcSrc =
        """
          |function handleStatus() { throw "exception in status"; }
          |plugin.setStatusHandler(handleStatus);
          |""".stripMargin
      val esc2 = stExcSrc.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val c2 = req(port, "PUT", "/v1/plugins/stexc",
        s"""{"type": "javascript", "params": {"source": "$esc2"}}""")
      assert(c2.statusCode() < 400, c2.body())
      val st2 = req(port, "GET", "/v1/plugins/stexc")
      assert(st2.statusCode() >= 400, st2.body())
      assert(st2.body().contains("exception in status"), st2.body())
      // the server is still alive after the throwing handler
      assert(req(port, "GET", "/v1/plugins").statusCode() === 200)
    }
  }

  // ---- procedure_409_test: iris svd with output datasets ------------------------

  test("iris svd.train with row/column output datasets runs 2xx") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { i =>
      val cls = Seq("setosa", "versicolor", "virginica")(i % 3)
      (i.toString, 4.0 + rnd.nextDouble() * 3, 2.0 + rnd.nextDouble() * 2,
        1.0 + rnd.nextDouble() * 5, 0.1 + rnd.nextDouble() * 2.4, cls)
    }
    e.createDataset("iris_dataset", rows.toDF("rowName",
      "sepal length", "sepal width", "petal length", "petal width", "class"))
    withServer(e) { port =>
      val c = req(port, "PUT", "/v1/procedures/svd_iris",
        """{"type": "svd.train", "params": {
          | "trainingData": {"from": {"id": "iris_dataset"},
          |   "select": "\"petal width\", \"petal length\", \"sepal length\", \"sepal width\""},
          | "columnOutputDataset": {"type": "sparse.mutable",
          |   "id": "svd_iris_col"},
          | "rowOutputDataset": {"id": "iris_svd_row", "type": "embedding"},
          | "numSingularValues": 4, "numDenseBasisVectors": 2}}"""
          .stripMargin)
      assert(c.statusCode() < 400, c.body())
      val r = req(port, "PUT", "/v1/procedures/svd_iris/runs/1", "{}")
      assert(r.statusCode() >= 200 && r.statusCode() < 300, r.body())
    }
  }
}
