package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-ninth batch: the script-procedure REST contract, delete of
  * in-construction entities, and concurrent recording —
  *
  *   - script.run over REST: PUT runs/<id> answers 201 with its
  *     Location, the body's `status` is the script's return value, and
  *     runs/<id>/details serves the `logs[i].c` lines — python (print
  *     + mldb.log + mldb.script.args) and javascript (mldb.log +
  *     plugin.args) (`testing/MLDB-642_script_procedure_test.cc`)
  *   - DELETE of a plugin mid-construction answers 204 and the
  *     collection reads empty after
  *     (`MLDB-267-delete-while-loading.cc`)
  *   - concurrent recordRows calls into one sparse.mutable lose no
  *     rows (`MLDB-1360-sparse-mutable-multithreaded-insert.cc` — the
  *     record path's atomicity contract)
  */
class ReferenceParitySpec49 extends AnyFunSuite {

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
      body: String = "", async: Boolean = false): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    if (async) b.header("async", "true")
    val r = method match {
      case "GET" => b.GET.build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "DELETE" => b.DELETE().build()
    }
    client.send(r, HttpResponse.BodyHandlers.ofString())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  // ---- MLDB-642: script procedure over REST --------------------------------

  test("MLDB-642: python script.run — status, location, logs, args") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "from mldb import mldb\\n" +
        "print('hoho')\\n" +
        "mldb.log(str(mldb.script.args))\\n" +
        "request.set_return('babang!')\\n"
      val c = req(port, "PUT", "/v1/procedures/test1",
        s"""{"type": "script.run", "params": {
           | "language": "python",
           | "scriptConfig": {"source": "$src"}}}""".stripMargin)
      assert(c.statusCode() === 201, c.body())

      val r1 = req(port, "PUT", "/v1/procedures/test1/runs/1", "{}")
      assert(r1.statusCode() === 201, r1.body())
      assert(r1.headers().firstValue("Location").orElse("") ===
        "/v1/procedures/test1/runs/1", r1.headers().map().toString)
      assert(r1.body().contains("\"status\": \"babang!\"") ||
        r1.body().contains("\"status\":\"babang!\""), r1.body())
      val d1 = req(port, "GET", "/v1/procedures/test1/runs/1/details")
      assert(d1.statusCode() === 200, d1.body())
      assert(d1.body().contains("\"c\": \"hoho\"") ||
        d1.body().contains("\"c\":\"hoho\""), d1.body())

      // run with args: mldb.script.args carries the run param verbatim
      val r2 = req(port, "PUT", "/v1/procedures/test1/runs/2",
        """{"params": {"args": "make it so!"}}""")
      assert(r2.statusCode() === 201, r2.body())
      assert(r2.headers().firstValue("Location").orElse("") ===
        "/v1/procedures/test1/runs/2")
      val d2 = req(port, "GET", "/v1/procedures/test1/runs/2/details")
      assert(d2.statusCode() === 200, d2.body())
      assert(d2.body().contains("hoho"), d2.body())
      assert(d2.body().contains("make it so!"), d2.body())
    }
  }

  test("MLDB-642: javascript script.run — status, logs, plugin.args") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "mldb.log(\\\"hoho\\\")\\n" +
        "mldb.log(plugin.args)\\n" +
        "\\\"babang!\\\"\\n"
      val c = req(port, "PUT", "/v1/procedures/test_js",
        s"""{"type": "script.run", "params": {
           | "language": "javascript",
           | "scriptConfig": {"source": "$src"}}}""".stripMargin)
      assert(c.statusCode() === 201, c.body())

      val r = req(port, "PUT", "/v1/procedures/test_js/runs/1",
        """{"params": {"args": "engage!"}}""")
      assert(r.statusCode() === 201, r.body())
      assert(r.body().contains("\"status\": \"babang!\"") ||
        r.body().contains("\"status\":\"babang!\""), r.body())
      val d = req(port, "GET", "/v1/procedures/test_js/runs/1/details")
      assert(d.statusCode() === 200, d.body())
      assert(d.body().contains("hoho"), d.body())
      assert(d.body().contains("engage!"), d.body())
    }
  }

  // ---- MLDB-267: delete while loading ---------------------------------------

  test("MLDB-267: DELETE mid-construction answers 204; list reads empty") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      // async creation puts the plugin in 'initializing'; the DELETE
      // must wait out the construction and answer 204
      val c = req(port, "PUT", "/v1/plugins/jsplugin",
        """{"type": "javascript", "params": {
          | "source": "var x = 0; for (var i = 0; i < 2000000; i++) x += i; x"}}"""
          .stripMargin, async = true)
      assert(c.statusCode() < 400, c.body())
      val d = req(port, "DELETE", "/v1/plugins/jsplugin")
      assert(d.statusCode() === 204, d.body())
      val l = req(port, "GET", "/v1/plugins")
      assert(l.statusCode() === 200, l.body())
      assert(l.body().trim === "[]", l.body())
    }
  }

  // ---- MLDB-1468: credentials collection ------------------------------------

  test("MLDB-1468: credential rules PUT/GET/DELETE/POST round-trip") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val missing = req(port, "GET", "/v1/credentials/s3cred")
      assert(missing.statusCode() === 404, missing.body())
      assert(missing.body().contains("doesn't exist"), missing.body())

      val cred = """{"store": {"resourceType": "aws:s3",
        | "resource": "s3://", "credential": {
        |   "provider": "Credentials collection", "protocol": "http",
        |   "location": "s3.amazonaws.com", "id": "this is my key",
        |   "secret": "this is my secret"}}}""".stripMargin
      val put = req(port, "PUT", "/v1/credentials/s3cred", cred)
      assert(put.statusCode() < 400, put.body())

      val get = req(port, "GET", "/v1/credentials/s3cred")
      assert(get.statusCode() === 200, get.body())
      assert(get.body().contains("aws:s3"), get.body())

      assert(req(port, "DELETE", "/v1/credentials/s3cred")
        .statusCode() === 204)
      val gone = req(port, "GET", "/v1/credentials/s3cred")
      assert(gone.statusCode() === 404, gone.body())
      assert(gone.body().contains("doesn't exist"), gone.body())

      val post = req(port, "POST", "/v1/credentials", cred)
      assert(post.statusCode() < 400, post.body())
    }
  }

  // ---- MLDB-1360: concurrent recording --------------------------------------

  test("MLDB-1360: concurrent recordRows lose no rows") {
    val e = new api.GraftEngine(spark)
    e.createDatasetTyped("mt", "sparse.mutable", _ => None)
    val threads = 8
    val rowsPerThread = 25
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            for (i <- 0 until rowsPerThread)
              e.recordRows("mt",
                s"""[{"rowName": "t$t-r$i", "x": ${t * 1000 + i}}]""")
          }
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(e.dataset("mt").count() === threads.toLong * rowsPerThread)
      // every row survived, none doubled
      val F = org.apache.spark.sql.functions
      val distinct = e.dataset("mt")
        .select(F.countDistinct(F.col("rowName")))
        .head().getLong(0)
      assert(distinct === threads.toLong * rowsPerThread)
    } finally pool.shutdownNow()
  }
}
