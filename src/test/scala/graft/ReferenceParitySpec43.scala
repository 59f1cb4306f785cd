package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-third batch: REST protocol tails (r10 verdict "Next round
  * #7") —
  *
  *   - testing/MLDB-305-sync-async.js (sync PUT state "ok", async PUT
  *     state "initializing", polled to completion)
  *   - testing/MLDB-881-DELETE-fails-on-in-construction.py (DELETE of
  *     an in-construction entity waits, answers 204, entity gone)
  *   - testing/MLDB-1570-procedure-progress.py (async run: Location
  *     header, state machine, monotone percentile progress steps)
  *   - testing/MLDBFB-509_pushed_non_printable_char_cant_query.py
  *     (control chars in row names / column names / cells queryable)
  *   - testing/MLDBFB-505_mldb_query_json_error.py (errors keep the
  *     uniform JSON envelope)
  */
class ReferenceParitySpec43 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val client = HttpClient.newHttpClient()

  private def withServer[T](engine: api.GraftEngine)(
      body: Int => T): T = {
    val srv = new api.RestServer(engine)
    val port = srv.start()
    try body(port) finally srv.stop()
  }

  private def req(port: Int, method: String, path: String, body: String,
      headers: Map[String, String] = Map.empty): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val r = method match {
      case "GET" => b.GET.build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "DELETE" => b.DELETE.build()
    }
    client.send(r, HttpResponse.BodyHandlers.ofString())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  private val slowPlugin =
    // non-trivial construction so async states are observable
    """Thread.sleep(300)
      |(spark: org.apache.spark.sql.SparkSession,
      | args: Map[String, String]) => "pong"
      |""".stripMargin

  // --- MLDB-305-sync-async.js ---------------------------------------------------

  test("MLDB-305: sync PUT is 'ok'; async PUT is 'initializing' then completes") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val body = s"""{"source": "${esc(slowPlugin)}"}"""
      val r1 = req(port, "PUT", "/v1/plugins/test1", body)
      assert(r1.statusCode() === 200 || r1.statusCode() === 201, r1.body())
      assert(r1.body().contains("\"state\": \"ok\""), r1.body())
      // async: header form (putAsync) and the {async: true} option both
      // send the async header in the reference client
      val r2 = req(port, "PUT", "/v1/plugins/test2", body,
        Map("async" -> "true"))
      assert(r2.body().contains("\"state\": \"initializing\""), r2.body())
      // poll to completion like the reference script
      var state = "initializing"
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (state == "initializing" && System.nanoTime() < deadline) {
        val g = req(port, "GET", "/v1/plugins/test2", "")
        state = if (g.body().contains("initializing")) "initializing" else "done"
        if (state == "initializing") Thread.sleep(20)
      }
      assert(state === "done")
      val g2 = req(port, "GET", "/v1/plugins/test2", "")
      assert(g2.body().contains("\"state\": \"ok\""), g2.body())
      // the constructed plugin actually serves
      val route = req(port, "GET", "/v1/plugins/test2/routes/ping", "")
      assert(route.statusCode() === 200, route.body())
    }
  }

  // --- MLDB-881-DELETE-fails-on-in-construction.py --------------------------------

  test("MLDB-881: DELETE during construction waits, answers 204, entity gone") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val body = s"""{"source": "${esc(slowPlugin)}"}"""
      val r = req(port, "PUT", "/v1/plugins/dummy2", body,
        Map("async" -> "true"))
      assert(r.body().contains("initializing"),
        "the resource should still be under construction: " + r.body())
      // deleting that resource waits until it is constructed
      val d = req(port, "DELETE", "/v1/plugins/dummy2", "")
      assert(d.statusCode() === 204, s"${d.statusCode()} ${d.body()}")
      // once the DELETE returns the resource is gone
      val g = req(port, "GET", "/v1/plugins/dummy2", "")
      assert(g.statusCode() === 404, g.body())
    }
  }

  // --- MLDB-1570-procedure-progress.py ----------------------------------------------

  test("MLDB-1570: async run Location, state machine, monotone percentile steps") {
    val e = new api.GraftEngine(spark)
    val rows = (0 until 2000).map(i => s"""{"rowName": "$i", "x": $i}""")
    e.recordRows("sample", rows.mkString("[", ",", "]"))
    withServer(e) { port =>
      val conf =
        """{"type": "bucketize", "params": {
          |"inputData": "SELECT * FROM sample ORDER BY x",
          |"outputDataset": {"id": "output", "type": "sparse.mutable"},
          |"percentileBuckets": {"b1": [0, 25], "b2": [25, 50],
          |  "b3": [50, 75], "b4": [75, 100]}}}""".stripMargin
      val rp = req(port, "PUT", "/v1/procedures/bucketize1570", conf)
      assert(rp.statusCode() === 201, rp.body())
      val rr = req(port, "POST", "/v1/procedures/bucketize1570/runs", "{}",
        Map("async" -> "true"))
      assert(rr.statusCode() === 201, rr.body())
      val location = rr.headers().firstValue("Location").orElseThrow()
      assert(location.startsWith("/v1/procedures/bucketize1570/runs/"),
        location)
      var running = true
      var iteratingLast = 0.0
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var sawFinished = false
      while (running && System.nanoTime() < deadline) {
        val g = req(port, "GET", location, "")
        assert(g.statusCode() === 200, g.body())
        val b = g.body()
        assert(b.contains("\"id\""),
          "status is expected to return the id of the run: " + b)
        assert(b.contains("\"state\""),
          "status is expected to return the state of the run: " + b)
        if (b.contains("\"finished\"")) { running = false; sawFinished = true }
        else if (b.contains("\"executing\"")) {
          assert(b.contains("\"progress\""), b)
          assert(b.contains("\"percentile\""), b)
          val v = "\"value\": ([0-9.]+)".r.findFirstMatchIn(b)
            .map(_.group(1).toDouble).getOrElse(0.0)
          assert(v >= iteratingLast, "percent must be increasing")
          iteratingLast = v
        } else if (b.contains("\"error\"")) {
          fail("run errored: " + b)
        }
        if (running) Thread.sleep(5)
      }
      assert(sawFinished, "run did not finish in time")
      // the run produced the output dataset with all four buckets
      assert(e.dataset("output").select("bucket").distinct().count() === 4)
      // the run id also lists under /runs
      val rl = req(port, "GET", "/v1/procedures/bucketize1570/runs", "")
      assert(rl.statusCode() === 200, rl.body())
      assert(rl.body().contains(location.split("/").last), rl.body())
    }
  }

  // --- MLDBFB-509_pushed_non_printable_char_cant_query.py ---------------------------

  test("MLDBFB-509: non-printable chars in row names, column names and cells query fine") {
    val e = new api.GraftEngine(spark)
    val barbarous = "coco"
    // row name
    e.recordRows("ds1", s"""[{"rowName": "coco\\u0011", "colA": 1}]""")
    val r1 = e.query("SELECT * FROM ds1").collect()
    assert(r1.length === 1)
    assert(r1(0).getAs[String]("rowName") === barbarous)
    // column name
    e.recordRows("ds2", s"""[{"rowName": "row1", "coco\\u0011": 1}]""")
    val d2 = e.query("SELECT * FROM ds2")
    assert(d2.columns.contains(barbarous), d2.columns.mkString(","))
    assert(d2.count() === 1)
    // cell value — and it round-trips over REST with the \u escape
    e.recordRows("ds3", s"""[{"rowName": "row1", "colA": "coco\\u0011"}]""")
    assert(e.query("SELECT * FROM ds3").head()
      .getAs[String]("colA") === barbarous)
    withServer(e) { port =>
      val g = req(port, "GET",
        "/v1/query?q=" + enc("SELECT * FROM ds3") + "&format=table", "")
      assert(g.statusCode() === 200, g.body())
      assert(g.body().contains("coco\\u0011"), g.body())
    }
  }

  // --- MLDB-1336 pattern: the rest of the checkArgsSize battery --------------------

  test("builtin arity errors match the reference's checkArgsSize sweep") {
    val e = new api.GraftEngine(spark)
    def err(sql: String): String =
      intercept[IllegalArgumentException](e.query(sql).collect()).getMessage
    // norm/normalize REQUIRE p in the reference (builtin_functions.cc)
    assert(err("select norm([1,2])").contains(
      "Binding builtin function norm: expected 2 arguments, got 1"))
    assert(err("select normalize([1,2])").contains(
      "expected 2 arguments, got 1"))
    assert(err("select levenshtein_distance('a')").contains(
      "expected 2 arguments, got 1"))
    assert(err("select regex_replace('a', 'b')").contains(
      "expected 3 arguments, got 2"))
    assert(err("select blob_length('a', 'b')").contains(
      "expected 1 argument, got 2"))
    assert(err("select to_timestamp(1, 2)").contains(
      "expected 1 argument, got 2"))
    // and the happy paths still bind
    assert(e.query("select norm([3, 4], 2) as n").head().getDouble(0) === 5.0)
    assert(e.query("select regex_replace('abc', 'b', 'x') as r")
      .head().getString(0) === "axc")
  }

  // --- MLDBFB-505_mldb_query_json_error.py -------------------------------------------

  test("MLDBFB-505: dataset/query failures keep the uniform JSON error envelope") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      // an unloadable storage dataset errors as {"error", "httpCode"}
      val garbage = java.nio.file.Files.createTempFile("ds505", ".sqlite")
      java.nio.file.Files.write(garbage,
        "this is not a sqlite file at all".getBytes("UTF-8"))
      val r = req(port, "PUT", "/v1/datasets/ds505",
        s"""{"type": "sqliteSparse", "params": {
          |"dataFileUrl": "file://$garbage"}}""".stripMargin)
      assert(r.statusCode() >= 400, r.body())
      assert(r.body().contains("\"error\""), r.body())
      assert(r.body().contains("\"httpCode\""), r.body())
      // a failing query too
      val g = req(port, "GET",
        "/v1/query?q=" + enc("SELECT * FROM no_such_ds_505"), "")
      assert(g.statusCode() === 404, g.body())
      assert(g.body().contains("\"error\"") &&
        g.body().contains("\"httpCode\""), g.body())
    }
  }
}
