package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fifty-second batch: the python interface surface —
  *
  *   - mldb.log formatting in the run-route logs: scalars str()ed,
  *     dicts/lists pretty-printed 4-space-indented, multi-args joined
  *     with spaces (`testing/python_mldb_log.py` pins exact strings)
  *   - a python plugin whose source does not compile fails the PUT
  *     (`mldb_py_plugin_nocompile.py`)
  *   - the python mldb interface battery: /ping, get errors on
  *     unknown routes, put/post/commit/delete round-trips
  *     (`python_mldb_interface_test.py`)
  *   - source-form python plugins registering
  *     mldb.plugin.set_request_handler answer their routes
  *     (`plugin_delete_test.py`, py3-adjusted — the reference file is
  *     python 2)
  */
class ReferenceParitySpec52 extends AnyFunSuite {

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

  test("python_mldb_log: exact log formatting in run-route logs") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "from mldb import mldb\\n" +
        "mldb.log(\\\"patate\\\")\\n" +
        "mldb.log({\\\"patate\\\":2.44})\\n" +
        "mldb.log([\\\"patate\\\", \\\"pwel\\\"])\\n" +
        "mldb.log(25)\\n" +
        "mldb.log('a', 'b', 2)\\n"
      val r = req(port, "POST", "/v1/types/plugins/python/routes/run",
        s"""{"source": "$src"}""")
      assert(r.statusCode() === 200, r.body())
      val logRe = "\"c\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\")".r
      val logs = logRe.findAllMatchIn(r.body()).map { m =>
        graft.js.JsInterp.jsonParse(m.group(1)) match {
          case graft.js.JsInterp.JsStr(s) => s
          case other => String.valueOf(other)
        }
      }.toSeq
      assert(logs(0) === "patate", logs)
      assert(logs(1) === "{\n    \"patate\": 2.44\n}", logs)
      assert(logs(2) === "[\n    \"patate\",\n    \"pwel\"\n]", logs)
      assert(logs(3) === "25", logs)
      assert(logs(4) === "a b 2", logs)
    }
  }

  test("mldb_py_plugin_nocompile: garbage python source fails the PUT") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r = req(port, "PUT", "/v1/plugins/pynocompile",
        "{\"type\": \"python\", \"params\": {\"source\": {\"routes\": " +
          "\"this\\nwill\\nnot compile\\nat all\\n!!!!!\"}}}")
      assert(r.statusCode() === 400, r.body())
      assert(r.body().toLowerCase.contains("compile"), r.body())
    }
  }

  test("python_mldb_interface: ping, unknown routes, CRUD round-trips") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      assert(req(port, "GET", "/ping").statusCode() === 200)
      assert(req(port, "GET", "/unexisting").statusCode() >= 400)

      assert(req(port, "PUT", "/v1/datasets/test_put",
        """{"type": "sparse.mutable"}""").statusCode() < 400)

      val post = req(port, "POST", "/v1/datasets",
        """{"type": "sparse.mutable"}""")
      assert(post.statusCode() === 201, post.body())
      val id = "\"id\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(post.body()).map(_.group(1)).getOrElse("")
      assert(id.nonEmpty, post.body())
      val rec = req(port, "POST", s"/v1/datasets/$id/rows",
        """{"rowName": "row1", "columns": [["colA", 1, 0]]}""")
      assert(rec.statusCode() < 400, s"$id: ${rec.body()}")
      assert(req(port, "POST", s"/v1/datasets/$id/commit", "{}")
        .statusCode() < 400)

      assert(req(port, "PUT", "/v1/datasets/ds",
        """{"type": "sparse.mutable"}""").statusCode() < 400)
      assert(req(port, "POST", "/v1/datasets/ds/commit", "{}")
        .statusCode() < 400)
      assert(req(port, "DELETE", "/v1/datasets/ds").statusCode() < 400)
    }
  }

  test("plugin_delete_test: source-form set_request_handler answers routes") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "from mldb import mldb\\n" +
        "mldb.log('Constructing plugin!')\\n" +
        "def requestHandler(mldb, remaining, verb, resource, restParams, " +
        "payload, contentType, contentLength, headers):\\n" +
        "    if verb == 'GET' and remaining == '/miRoute':\\n" +
        "        return 'bouya!'\\n" +
        "mldb.plugin.set_request_handler(requestHandler)\\n"
      val c = req(port, "PUT", "/v1/plugins/plugToDel",
        s"""{"type": "python", "params": {"source": {"routes": "$src"}}}""")
      assert(c.statusCode() < 400, c.body())
      val r = req(port, "GET", "/v1/plugins/plugToDel/routes/miRoute")
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("bouya!"), r.body())
      // and the DELETE the test is named for
      assert(req(port, "DELETE", "/v1/plugins/plugToDel")
        .statusCode() === 204)
    }
  }
}
