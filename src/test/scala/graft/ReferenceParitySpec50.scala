package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fiftieth batch: transposition identity over a streamed load, and
  * listener-driven run progress —
  *
  *   - a dataset loaded line-by-line through mldb.openStream, then
  *     double-transposed via a NESTED typed dataset config, queries
  *     identically to the original
  *     (`testing/MLDB-494-stream-destructor-hang.js` — the abandoned
  *     stream must also not hang shutdown)
  *   - async run progress is driven by Spark task completions (the
  *     MLDB-2110 listener bridge): values are monotone and reach an
  *     intermediate value strictly between 0 and 100 for a multi-stage
  *     run before finishing at 100
  */
class ReferenceParitySpec50 extends AnyFunSuite {

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

  test("MLDB-494: streamed load + double transposition is the identity") {
    val tmp = java.nio.file.Files.createTempFile("mldb494", ".csv")
    val lines = (1 to 50).map { i =>
      s"row$i," + (0 until 3).map(j => s"c${(i + j) % 7}").mkString(",")
    }.mkString("\n") + "\n"
    java.nio.file.Files.write(tmp, lines.getBytes("UTF-8"))
    val e = new api.GraftEngine(spark)
    try {
      val script =
        s"""
           |var dataset = mldb.createDataset({type: 'sparse.mutable', id: 'test'});
           |var now = new Date("2015-01-01");
           |var stream = mldb.openStream("file://$tmp");
           |var lineNum = 0;
           |while (!stream.eof() && lineNum < 5000) {
           |    ++lineNum;
           |    var line = stream.readLine();
           |    var fields = line.split(',');
           |    var tuples = [];
           |    for (var i = 1; i < fields.length; ++i)
           |        tuples.push([fields[i], 1, now]);
           |    dataset.recordRow(fields[0], tuples);
           |}
           |dataset.commit();
           |// an ABANDONED second stream must not hang anything
           |var orphan = mldb.openStream("file://$tmp");
           |var dataset2 = mldb.createDataset({
           |    type: 'transposed',
           |    id: 'test2',
           |    params: {
           |        dataset: {
           |            type: 'transposed',
           |            params: { dataset: { id: 'test' } }
           |        }
           |    }
           |});
           |var a = mldb.get('/v1/query',
           |    {q: 'select * from test order by rowHash() limit 10'}).json;
           |var b = mldb.get('/v1/query',
           |    {q: 'select * from test2 order by rowHash() limit 10'}).json;
           |// identity on VALUES and TYPES; key order canonicalized
           |// (wide-mode schemas list rowName in different positions)
           |function canon(rows) {
           |    var out = [];
           |    for (var i = 0; i < rows.length; i++) {
           |        var ks = []; for (var k in rows[i]) ks.push(k);
           |        ks.sort();
           |        var o = [];
           |        for (var j = 0; j < ks.length; j++)
           |            o.push([ks[j], rows[i][ks[j]]]);
           |        out.push(o);
           |    }
           |    return JSON.stringify(out);
           |}
           |if (canon(a) != canon(b))
           |    throw "query diff: " + canon(a) + " vs " + canon(b);
           |"success"
           |""".stripMargin
      val res = api.JsHost.run(spark, e.dataset, script, Map.empty, e)
      assert(api.JsHost.resultJson(res) === "\"success\"")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("JS setRequestHandler plugins receive the real verb and payload") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src =
        """
          |function handleRequest(relpath, verb, resource, params, payload,
          |                       contentType, contentLength, headers)
          |{
          |    return {verb: verb, path: relpath, payload: payload};
          |}
          |plugin.setRequestHandler(handleRequest);
          |""".stripMargin
      val esc = src.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val c = req(port, "PUT", "/v1/plugins/echoer",
        s"""{"type": "javascript", "params": {"source": "$esc"}}""")
      assert(c.statusCode() < 400, c.body())
      val r = req(port, "PUT", "/v1/plugins/echoer/routes/some/path",
        """{"k": 1}""")
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("\"verb\": \"PUT\"") ||
        r.body().contains("\"verb\":\"PUT\""), r.body())
      assert(r.body().contains("some/path"), r.body())
      assert(r.body().contains("\"k\""), r.body())
    }
  }

  test("MLDB-2110: listener-driven progress reaches intermediate values") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    withServer(e) { port =>
      // a fast machine (or a loaded one scheduling this thread late)
      // can finish a run between polls — grow the input until an
      // intermediate value is actually observed
      def attempt(rows: Long, tag: Int): Boolean = {
        e.createDataset(s"big2110_$tag",
          spark.range(rows).toDF("x").withColumn("rowName",
            org.apache.spark.sql.functions.col("x").cast("string")))
        val c = req(port, "PUT", s"/v1/procedures/slow2110_$tag",
          s"""{"type": "transform", "params": {
             | "inputData": "SELECT x, x * 7 AS y FROM big2110_$tag ORDER BY y DESC",
             | "outputDataset": {"id": "out2110_$tag"}}}""".stripMargin)
        assert(c.statusCode() < 400, c.body())
        val run = req(port, "POST", s"/v1/procedures/slow2110_$tag/runs",
          "{}", async = true)
        assert(run.statusCode() === 201, run.body())
        val loc = run.headers().firstValue("Location").orElse("")
        val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
        var state = ""
        var tries = 0
        while (state != "finished" && state != "error" && tries < 600) {
          val st = req(port, "GET", loc)
          assert(st.statusCode() === 200, st.body())
          state = "\"state\"\\s*:\\s*\"([a-z]+)\"".r
            .findFirstMatchIn(st.body()).map(_.group(1)).getOrElse("")
          "\"value\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(st.body())
            .foreach(m => seen += m.group(1).toDouble)
          if (state != "finished") Thread.sleep(20)
          tries += 1
        }
        assert(state === "finished", state)
        assert(seen.nonEmpty)
        // the listener bridge, not a 0 → 100 jump
        seen.exists(v => v > 0.0 && v < 100.0)
      }
      val ok = attempt(2000000L, 1) || attempt(8000000L, 2) ||
        attempt(20000000L, 3)
      assert(ok, "no intermediate progress seen across three run sizes")
    }
  }
}
