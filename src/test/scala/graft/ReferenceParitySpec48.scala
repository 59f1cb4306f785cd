package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-eighth batch: external python procedures, re-entrant route
  * calls, raw-protocol robustness, and the pooling pipeline —
  *
  *   - `experimental.external.procedure` pipes stdInData to an
  *     external python script and returns its last-line JSON under
  *     status.return (`testing/MLDB-694_external_python_procedure.py`)
  *   - a python plugin route performing a sub-request against another
  *     route of the same plugin must not deadlock, and a python run
  *     script can POST another run script
  *     (`MLDB-538_route_deadlock.py`)
  *   - raw-socket protocol tolerance: variable-case headers accepted,
  *     unknown methods answered with an error, no hang
  *     (`MLDB-1040-invalid-requests.cc`, the socket battery)
  *   - the pooling pipeline: no-delimiter text import, embedding
  *     dataset, pooling fn composed in a sql.expression over tokenize,
  *     applied across thousands of rows in one plan
  *     (`MLDB-1277-pooling-performance.py`)
  */
class ReferenceParitySpec48 extends AnyFunSuite {

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

  // ---- MLDB-694: external python procedure ---------------------------------

  test("MLDB-694: stdInData reaches the external script; return captured") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "import sys, json\\n" +
        "std_in = sys.stdin.read()\\n" +
        "print(json.dumps({'bouya': 5, 'stdin_data': std_in}))\\n"
      val c = req(port, "PUT", "/v1/procedures/externalProc",
        s"""{"type": "experimental.external.procedure", "params": {
           | "stdInData": "pwet",
           | "scriptConfig": {"source": "$src"}}}""".stripMargin)
      assert(c.statusCode() < 400, c.body())
      val r = req(port, "PUT", "/v1/procedures/externalProc/runs/1", "{}")
      assert(r.statusCode() < 400, r.body())
      assert(r.body().contains("\"bouya\": 5") ||
        r.body().contains("\"bouya\":5"), r.body())
      assert(r.body().contains("\"stdin_data\": \"pwet\"") ||
        r.body().contains("\"stdin_data\":\"pwet\""), r.body())
      assert(r.body().contains("\"status\""), r.body())
    }
  }

  // ---- MLDB-538: re-entrant routes -----------------------------------------

  test("MLDB-538: python run script POSTing another run script") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val inner = "print(1)"
      val src = "from mldb import mldb\\n" +
        "r = mldb.perform('POST', '/v1/types/plugins/python/routes/run', " +
        s"[], {'source': '$inner'})\\n" +
        "request.set_return(r['statusCode'])\\n"
      val r = req(port, "POST", "/v1/types/plugins/python/routes/run",
        s"""{"source": "$src"}""")
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("200"), r.body())
    }
  }

  test("MLDB-538: /deadlock route calling /deadlock2 does not deadlock") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val src = "from mldb import mldb\\n" +
        "mldb.log('got request ' + request.verb + ' ' + request.remaining)\\n" +
        "rp = request\\n" +
        "if str(rp.verb) == 'GET' and str(rp.remaining) == '/deadlock':\\n" +
        "    rval = mldb.perform('GET', " +
        "'/v1/plugins/deadlocker/routes/deadlock2', [], {})\\n" +
        "    request.set_return(rval)\\n" +
        "else:\\n" +
        "    request.set_return('phew')\\n"
      val c = req(port, "PUT", "/v1/plugins/deadlocker",
        s"""{"type": "python", "params": {"source": {"routes": "$src"}}}""")
      assert(c.statusCode() < 400, c.body())
      // a 20 s guard: a deadlock here would block forever
      val fut = java.util.concurrent.CompletableFuture.supplyAsync(() =>
        req(port, "GET", "/v1/plugins/deadlocker/routes/deadlock"))
      val r = fut.get(20, java.util.concurrent.TimeUnit.SECONDS)
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("phew"), r.body())
    }
  }

  // ---- MLDB-1040: raw-socket protocol tolerance -----------------------------

  test("MLDB-1040: variable-case headers accepted; unknown method answered") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      def rawRequest(payload: String): String = {
        val sock = new java.net.Socket("127.0.0.1", port)
        try {
          sock.setSoTimeout(10000)
          sock.getOutputStream.write(payload.getBytes("UTF-8"))
          sock.getOutputStream.flush()
          val buf = new Array[Byte](1000)
          val n = sock.getInputStream.read(buf)
          if (n <= 0) "" else new String(buf, 0, n, "UTF-8")
        } finally sock.close()
      }
      val body = """{"id":"test1","type":"sparse.mutable"}"""
      val ok = rawRequest(
        "PUT /v1/datasets/test1 HTTP/1.1\r\n" +
          "hoSt: localhost\r\n" +
          "coNtenT-tyPe: application/json\r\n" +
          s"COnteNt-LENGTH: ${body.length}\r\n\r\n" + body)
      assert(ok.startsWith("HTTP/1.1 201"), ok)

      val bad = rawRequest(
        "CLAP /v1/datasets/test1 HTTP/1.1\r\nhoSt: localhost\r\n\r\n")
      // the JDK server answers unknown methods with an error status —
      // the pin is an ANSWER (4xx/5xx), never a hang
      assert(bad.isEmpty || "HTTP/1.1 [45]\\d\\d".r
        .findFirstIn(bad).isDefined, bad)
    }
  }

  // ---- MLDB-1277: pooling pipeline ------------------------------------------

  test("MLDB-1277: pooling over tokenize composes and runs in one plan") {
    val tmpDir = java.nio.file.Files.createTempDirectory("mldb1277")
    val e = new api.GraftEngine(spark)
    try withServer(e) { port =>
      // no-delimiter raw lines (the reddit layout: name,sr1,sr2,…)
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      val rawLines = (1 to 2000).map { i =>
        s"user$i," + (0 until 3).map(j => words((i + j) % 5)).mkString(",")
      }.mkString("\n") + "\n"
      val rawPath = tmpDir.resolve("reddit.csv")
      java.nio.file.Files.write(rawPath, rawLines.getBytes("UTF-8"))
      // a 4-D embedding per word
      val embLines = "name,x0,x1,x2,x3\n" + words.zipWithIndex.map {
        case (w, i) => s"$w,${i + 1}.0,${i * 2}.0,1.0,0.5"
      }.mkString("\n") + "\n"
      val embPath = tmpDir.resolve("emb.csv")
      java.nio.file.Files.write(embPath, embLines.getBytes("UTF-8"))

      val imp1 = req(port, "PUT", "/v1/procedures/import_reddit",
        s"""{"type": "import.text", "params": {
           | "dataFileUrl": "file://$rawPath", "delimiter": "",
           | "quoteChar": "",
           | "outputDataset": {"id": "reddit_raw", "type": "sparse.mutable"},
           | "runOnCreation": true}}""".stripMargin)
      assert(imp1.statusCode() < 400, imp1.body())

      val imp2 = req(port, "PUT", "/v1/procedures/import_emb",
        s"""{"type": "import.text", "params": {
           | "dataFileUrl": "file://$embPath", "delimiter": ",",
           | "outputDataset": {"id": "reddit_svd_embedding",
           |   "type": "tabular"},
           | "runOnCreation": true}}""".stripMargin)
      assert(imp2.statusCode() < 400, imp2.body())

      val ren = req(port, "PUT", "/v1/procedures/rename",
        """{"type": "transform", "params": {
          | "inputData": "select * excluding(name) named name from reddit_svd_embedding",
          | "outputDataset": {"id": "reddit_svd_embedding2",
          |   "type": "embedding"},
          | "runOnCreation": true}}""".stripMargin)
      assert(ren.statusCode() < 400, ren.body())

      val pooler = req(port, "PUT", "/v1/functions/pooler",
        """{"type": "pooling", "params":
          | {"embeddingDataset": "reddit_svd_embedding2"}}""".stripMargin)
      assert(pooler.statusCode() < 400, pooler.body())

      val wrapper = req(port, "PUT", "/v1/functions/wrapper",
        """{"type": "sql.expression", "params": {
          | "expression": "pooler({words: tokenize(lineText)})[embedding] as x"}}"""
          .stripMargin)
      assert(wrapper.statusCode() < 400, wrapper.body())

      val t0 = System.nanoTime()
      val q = req(port, "GET", s"/v1/query?q=${enc(
        "select wrapper({lineText}) from reddit_raw limit 10000")}" +
        "&limit=10000")
      val sec = (System.nanoTime() - t0) / 1e9
      assert(q.statusCode() === 200, q.body().take(500))
      // one compiled plan over all rows — minutes would mean a
      // per-row driver loop (the MLDB-1277 regression)
      assert(sec < 60.0, s"pooling query took $sec s")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmpDir.toFile)
  }
}
