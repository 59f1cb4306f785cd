package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-fifth batch: the type-collection REST surface and the
  * plugin/route protocol tails —
  *
  *   - `/v1/types/<kind>` listings + `/v1/types/<kind>/<t>/info` +
  *     `/v1/typeInfo` (`testing/MLDB-1000-type-documentation-valid.js`,
  *     `MLDB-497-get-config-type-info.js`)
  *   - the TYPE-level script runner
  *     `POST /v1/types/plugins/{javascript,python}/routes/run`
  *     (`MLDB-255-type-routes.js`) with the V8 syntax-error shape
  *     (`MLDB-980-unquoted-string-crash.js`) and remote-address
  *     rejection (`MLDB-251-invalid-script-host.js`)
  *   - python plugin routes over all verbs with handler-chosen status
  *     codes (`MLDB-2114_plugin_post_no_data_404_test.py`) and the
  *     request mirror of ordered rest_params + payload
  *     (`MLDB-444_python_perform_default_args.py`)
  *   - `/v1/query` body-vs-query-string exclusivity
  *     (`MLDB-1893_get_params_mixin.py`)
  *   - failed dataset creation keeps the entity in error state with
  *     readable config; its routes 404 naming the creation error
  *     (`MLDB-572-error-procedure-config.js`)
  *   - no hang on function configs that fail to load
  *     (`MLDB-537-hang-on-put-error.js`)
  *   - exact builtin arity error text
  *     (`MLDB-1907-value-description-error.py`)
  */
class ReferenceParitySpec45 extends AnyFunSuite {

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
      case "GET" =>
        if (body.isEmpty) b.GET.build()
        else b.method("GET", HttpRequest.BodyPublishers.ofString(body)).build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "DELETE" => b.DELETE().build()
    }
    client.send(r, HttpResponse.BodyHandlers.ofString())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private def field(json: String, name: String): Option[String] = {
    val re = ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(json).map(_.group(1)
      .replace("\\n", "\n").replace("\\\"", "\""))
  }

  // ---- MLDB-1000 / MLDB-497: type listings + typeInfo --------------------

  test("MLDB-1000: /v1/types/<kind> listings answer 200 with details") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      for (kind <- Seq("procedures", "functions", "datasets", "plugins")) {
        val r = req(port, "GET", s"/v1/types/$kind?details=true")
        assert(r.statusCode() === 200, s"$kind: ${r.body()}")
        assert(r.body().startsWith("["), r.body())
      }
    }
  }

  test("MLDB-497: typeInfo kinds and svd.train config info") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val s = req(port, "GET", s"/v1/typeInfo?type=${enc("std::string")}")
      assert(s.statusCode() === 200, s.body())

      val vk = req(port, "GET", s"/v1/typeInfo?type=${enc("MLDB::ValueKind")}")
      assert(vk.statusCode() === 200, vk.body())
      assert(field(vk.body(), "typeName") === Some("MLDB::ValueKind"))
      assert(field(vk.body(), "kind") === Some("ENUM"))

      val svd = req(port, "GET", "/v1/types/procedures/svd.train/info")
      assert(svd.statusCode() === 200, svd.body())
      assert(field(svd.body(), "typeName") === Some("MLDB::SvdConfig"))
      assert(field(svd.body(), "kind") === Some("STRUCTURE"))
    }
  }

  // ---- MLDB-255 / MLDB-251 / MLDB-980: the script-run type route ---------

  test("MLDB-255: javascript + python run routes, errors as 400") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val ok = req(port, "POST", "/v1/types/plugins/javascript/routes/run",
        """{"source": "'hello, world from javascript'"}""")
      assert(ok.statusCode() === 200, ok.body())
      assert(field(ok.body(), "result") === Some("hello, world from javascript"))

      val syn = req(port, "POST", "/v1/types/plugins/javascript/routes/run",
        """{"source": "this has a syntax error"}""")
      assert(syn.statusCode() >= 400, syn.body())

      val rt = req(port, "POST", "/v1/types/plugins/javascript/routes/run",
        """{"source": "this.has.a.runtime.error"}""")
      assert(rt.statusCode() >= 400, rt.body())

      val py = req(port, "POST", "/v1/types/plugins/python/routes/run",
        """{"source": "request.set_return('hello, world from python')"}""")
      assert(py.statusCode() === 200, py.body())
      assert(field(py.body(), "result") === Some("hello, world from python"))
    }
  }

  test("MLDB-251: remote script address fails the load") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r = req(port, "POST", "/v1/types/plugins/python/routes/run",
        """{"address": "http://bob.bob"}""")
      assert(r.statusCode() === 400, r.body())
    }
  }

  test("MLDB-980: V8 syntax-error message for a raw newline in a string") {
    val e = new api.GraftEngine(spark)
    // the inner script, loaded by address like the reference test
    val inner = java.nio.file.Files.createTempFile("mldb980", ".js")
    java.nio.file.Files.write(inner,
      "var x = '\\\ny\n';\n".getBytes("UTF-8"))
    try withServer(e) { port =>
      val r = req(port, "POST", "/v1/types/plugins/javascript/routes/run",
        s"""{"address": "file://${inner.toString}"}""")
      assert(r.statusCode() === 400, r.body())
      val msg = field(r.body(), "message")
      assert(msg === Some("Uncaught SyntaxError: Invalid or unexpected token"),
        r.body())
      // while here: backslash-newline continuation alone is LEGAL
      val ok = req(port, "POST", "/v1/types/plugins/javascript/routes/run",
        """{"source": "var x = 'a\\\nb'; x"}""")
      assert(ok.statusCode() === 200, ok.body())
      assert(field(ok.body(), "result") === Some("ab"))
    } finally java.nio.file.Files.deleteIfExists(inner)
  }

  // ---- MLDB-2114: python plugin routes, verbs + status codes -------------

  test("MLDB-2114: set_return picks the status code per verb") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "if request.verb in ['GET', 'DELETE']:\\n" +
        "    request.set_return({}, 200)\\nelse:\\n" +
        "    request.set_return({}, 201)\\n"
      val r1 = req(port, "PUT", "/v1/plugins/mldb2114",
        s"""{"type": "python", "params": {"source": {"routes": "$src"}}}""")
      assert(r1.statusCode() < 400, r1.body())

      assert(req(port, "GET", "/v1/plugins/mldb2114/routes/foo")
        .statusCode() === 200)
      val post = req(port, "POST", "/v1/plugins/mldb2114/routes/foo")
      assert(post.statusCode() === 201, post.body())
      assert(post.body().trim === "{}", post.body())
      assert(req(port, "PUT", "/v1/plugins/mldb2114/routes/foo")
        .statusCode() === 201)
      assert(req(port, "DELETE", "/v1/plugins/mldb2114/routes/foo")
        .statusCode() === 200)
    }
  }

  test("MLDB-2114: null return, missing set_return, invalid code") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      req(port, "PUT", "/v1/plugins/p1",
        """{"type": "python", "params": {"source":
          | {"routes": "request.set_return(None, 200)"}}}""".stripMargin)
      val r = req(port, "GET", "/v1/plugins/p1/routes/foo")
      assert(r.statusCode() === 200, r.body())
      assert(r.body().trim === "null", r.body())

      req(port, "PUT", "/v1/plugins/p2",
        "{\"type\": \"python\", \"params\": {\"source\": {\"routes\": " +
          "\"from mldb import mldb\\nmldb.log('no return')\"}}}")
      val miss = req(port, "GET", "/v1/plugins/p2/routes/foo")
      assert(miss.statusCode() === 500, miss.body())
      assert(miss.body().contains(
        "Return value is required for route handlers but not set"), miss.body())

      req(port, "PUT", "/v1/plugins/p3",
        """{"type": "python", "params": {"source":
          | {"routes": "request.set_return('', 0)"}}}""".stripMargin)
      val bad = req(port, "GET", "/v1/plugins/p3/routes/foo")
      assert(bad.statusCode() === 500, bad.body())
    }
  }

  // ---- MLDB-444: ordered rest_params + payload mirror ---------------------

  test("MLDB-444: route handler sees ordered params and raw payload") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "from mldb import mldb\\n" +
        "request.set_return({'args': request.rest_params, " +
        "'payload': request.payload})\\n"
      val r1 = req(port, "PUT", "/v1/plugins/mirror",
        s"""{"type": "python", "params": {"source": {"routes": "$src"}}}""")
      assert(r1.statusCode() < 400, r1.body())

      val a = req(port, "POST", "/v1/plugins/mirror/routes/pwet")
      assert(a.statusCode() === 200, a.body())
      assert(a.body() === """{"args":[],"payload":"null\n"}""", a.body())

      val b = req(port, "POST", "/v1/plugins/mirror/routes/pwet?patate=5")
      assert(b.body() === """{"args":[["patate","5"]],"payload":"null\n"}""",
        b.body())

      val c = req(port, "POST",
        "/v1/plugins/mirror/routes/pwet?patate=10", """{"ataboy":5}""")
      assert(c.body() ===
        """{"args":[["patate","10"]],"payload":"{\"ataboy\":5}\n"}""",
        c.body())
    }
  }

  // ---- MLDB-1893: query-string/body exclusivity ---------------------------

  test("MLDB-1893: /v1/query takes qs or body params, never both") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    e.createDataset("ds1893", Seq(("row1", 1)).toDF("rowName", "colA"))
    withServer(e) { port =>
      val qs = req(port, "GET",
        s"/v1/query?q=${enc("SELECT colA FROM ds1893")}&format=table")
      assert(qs.statusCode() === 200, qs.body())

      val body = req(port, "GET", "/v1/query",
        """{"q": "SELECT colA FROM ds1893", "format": "table"}""")
      assert(body.statusCode() === 200, body.body())

      val mixed = req(port, "GET",
        s"/v1/query?q=${enc("SELECT colA FROM ds1893")}",
        """{"format": "table"}""")
      assert(mixed.statusCode() === 400, mixed.body())
      assert(mixed.body().contains(
        "You cannot mix query string and body parameters"), mixed.body())
    }
  }

  // ---- MLDB-572: failed creation keeps the entity, error-state routes ----

  test("MLDB-572: errored dataset keeps config; routes 404 name the error") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val put = req(port, "PUT", "/v1/datasets/test",
        """{"type": "merged", "params": {"datasets": [
          | {"id": "doesntexist1"}, {"id": "doesntexist2"}]}}""".stripMargin)
      assert(put.statusCode() >= 400, put.body())

      val get = req(port, "GET", "/v1/datasets/test")
      assert(get.statusCode() === 200, get.body())
      assert(get.body().contains("\"type\": \"merged\""), get.body())
      assert(get.body().contains("\"config\""), get.body())
      assert(get.body().contains("\"id\": \"test\""), get.body())

      val route = req(port, "GET", "/v1/datasets/test/routes/hello")
      assert(route.statusCode() === 404, route.body())
      assert(route.body().contains("not available due to error in creation"),
        route.body())
    }
  }

  // ---- MLDB-537: bad function configs fail fast, no hang ------------------

  test("MLDB-537: classifier with missing model file + serial function") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r1 = req(port, "PUT", "/v1/functions/classifier",
        """{"type": "classifier", "params": {
          | "modelFileUrl": "this.file.does.not.exist.cls"}}""".stripMargin)
      assert(r1.statusCode() >= 400, r1.body())

      // the reference would hang here before the MLDB-537 fix; any
      // prompt answer (the type is unknown for functions) is the pass
      val r2 = req(port, "PUT", "/v1/functions/probabilizer",
        """{"type": "serial", "params": {"steps": [
          | {"id": "classifier"},
          | {"id": "apply_probabilizer", "type": "probabilizer",
          |  "params": {"modelFileUrl": "file://probabilizer.json"}}]}}"""
          .stripMargin)
      assert(r2.statusCode() > 0, r2.body())
    }
  }

  // ---- MLDB-1907: exact arity error text -----------------------------------

  test("MLDB-1907: sqrt arity error names the binding") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      for (q <- Seq("select sqrt(2, NULL)", "select sqrt(2, 1)")) {
        val r = req(port, "GET", s"/v1/query?q=${enc(q)}")
        assert(r.statusCode() === 400, r.body())
        assert(r.body().contains(
          "Binding builtin function sqrt: expected 1 argument, got 2"),
          r.body())
      }
    }
  }
}
