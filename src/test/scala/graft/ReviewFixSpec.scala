package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-11 review findings — each test
  * reproduces the exact failure scenario the review named and holds
  * the fix in place:
  *
  *   1. a star feeding an AGGREGATE nested inside a non-aggregator is
  *      legal under GROUP BY; a bare non-aggregator star still 400s
  *   2. continuous.window boundaries compare as instants, not strings
  *      ('2015-01-02 00:00:02' vs '2015-01-02T00:00:00Z' ordering)
  *   3. tf_EncodePng grayscale writes raster samples, not
  *      colorspace-converted setRGB values
  *   4. the SQLite sparse writer builds multi-level interior pages
  *      past ~270 leaves instead of silently corrupting one page
  *   5. DELETE of an async plugin whose construction FAILED answers
  *      204, not 404
  *   6. /batch input is strict JSON — JS expressions are rejected
  *   7. multi-second time quanta floor pre-epoch timestamps
  */
class ReviewFixSpec extends AnyFunSuite {

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

  private def req(port: Int, method: String, path: String, body: String = "",
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

  test("GROUP BY: star under an aggregate nested in a non-aggregator is legal") {
    val e = new api.GraftEngine(spark)
    e.recordRows("gbstar",
      """[{"rowName": "r1", "k": "a", "x": 1, "y": 2},
        |{"rowName": "r2", "k": "a", "x": 3, "y": 4},
        |{"rowName": "r3", "k": "b", "x": 5, "y": 6}]""".stripMargin)
    // horizontal_sum over sum({*}) — the star is consumed by the
    // aggregate, so the non-aggregator wrapper is fine
    val rows = e.query(
      "SELECT horizontal_sum(sum({* EXCLUDING (k)})) AS hs " +
        "FROM gbstar GROUP BY k ORDER BY hs")
      .collect().map(_.getAs[Any]("hs").toString.toDouble)
    assert(rows.toSeq === Seq(10.0, 11.0))
    // the bare non-aggregator star still raises the reference print
    val err = intercept[Exception](
      e.query("SELECT temporal_earliest({*}) FROM gbstar GROUP BY k")
        .collect())
    assert(err.getMessage.contains("Non-aggregator"), err.getMessage)
    // and one HIDING inside a row literal is still caught
    val err2 = intercept[Exception](
      e.query("SELECT horizontal_sum({a: temporal_earliest({*})}) " +
        "FROM gbstar GROUP BY k").collect())
    assert(err2.getMessage.contains("Non-aggregator"), err2.getMessage)
  }

  test("continuous.window includes a same-day save across timestamp formats") {
    val e = new api.GraftEngine(spark)
    val saveDir = java.nio.file.Files.createTempDirectory("ctswinfix")
    withServer(e) { port =>
      val c = req(port, "PUT", "/v1/datasets/rec2",
        """{"type": "continuous", "params": {
          |"metadataDataset": {"id": "meta2", "type": "sparse.mutable"},
          |"commitInterval": "1s"}}""".stripMargin)
      assert(c.statusCode() === 201, c.body())
      req(port, "POST", "/v1/datasets/rec2/rows",
        """[{"rowName": "u1", "funny": 1, "ts": "2015-01-02T00:00:02Z"}]""")
      val s1 = req(port, "POST", "/v1/datasets/rec2/routes/saves",
        s"""{"dataFileUrl": "file://${saveDir.resolve("s1.beh")}"}""")
      assert(s1.statusCode() === 200, s1.body())
      // the save's whole range lies INSIDE the same calendar day the
      // window starts on — a lexical compare would order the metadata's
      // '2015-01-02 00:00:02' before the ISO '2015-01-02T00:00:00Z'
      // and drop the save
      val w = req(port, "PUT", "/v1/datasets/winfix",
        """{"type": "continuous.window", "params": {
          |"metadataDataset": {"id": "meta2"},
          |"from": "2015-01-02T00:00:00Z",
          |"to": "2015-01-02T23:59:59Z"}}""".stripMargin)
      assert(w.statusCode() === 201, w.body())
      assert(e.dataset("winfix").count() === 1)
      // and a window strictly BEFORE the save stays empty
      val w2 = req(port, "PUT", "/v1/datasets/winfix2",
        """{"type": "continuous.window", "params": {
          |"metadataDataset": {"id": "meta2"},
          |"from": "2015-01-01T00:00:00Z",
          |"to": "2015-01-01T23:59:59Z"}}""".stripMargin)
      assert(w2.statusCode() === 201, w2.body())
      assert(e.dataset("winfix2").count() === 0)
    }
  }

  test("tf_EncodePng grayscale: encoded samples ARE the input pixels") {
    val e = new api.GraftEngine(spark)
    val png = e.query("SELECT tf_EncodePng({image: [[[128], [1]], " +
      "[[255], [0]]]}) AS b").head().getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    // read via the raster so the assert is colorspace-free too
    val raster = img.getRaster
    assert(raster.getSample(0, 0, 0) === 128)
    assert(raster.getSample(1, 0, 0) === 1)
    assert(raster.getSample(0, 1, 0) === 255)
    assert(raster.getSample(1, 1, 0) === 0)
  }

  test("SQLite sparse writer: 90k cells build a multi-level tree that reloads") {
    val s2 = spark
    import s2.implicits._
    // ~215 cells/leaf -> ~420 leaves, past the ~272-kid interior-page
    // capacity, so the writer must emit a genuine two-level interior
    // tree (the 40k size the first version used still fit ONE page)
    val n = 90000
    val df = (0 until n).map(i => (f"r$i%06d", i.toLong))
      .toDF("rowName", "v")
    val path = java.nio.file.Files.createTempDirectory("bigsqlite")
      .resolve("big.sqlite").toString
    sources.Sqlite.writeSparse(df, path)
    val back = sources.Sqlite.importSqliteSparse(spark, path)
    assert(back.count() === n)
    val got = back.filter(col("rowName") === "r089999")
      .select(col("column"), col("value.num")).collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "v")
    assert(got(0).getDouble(1) === 89999.0)
    // on-disk format proof: run the REAL sqlite3 binary's
    // integrity_check against the written file, so the b-tree layout
    // claim is regression-pinned, not just round-trippable through our
    // own importer. Skipped (not silently passed) when no sqlite3
    // binary is installed.
    val sqlite3 = Seq("/usr/bin/sqlite3", "/usr/local/bin/sqlite3",
      "/root/miniconda/bin/sqlite3").find(p => new java.io.File(p).canExecute)
      .orElse(sys.env.get("PATH").flatMap(_.split(':')
        .map(d => s"$d/sqlite3").find(p => new java.io.File(p).canExecute)))
    assume(sqlite3.nonEmpty, "no sqlite3 binary on this host")
    val pb = new ProcessBuilder(sqlite3.get, path, "pragma integrity_check;")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    val rc = proc.waitFor()
    assert(rc === 0, s"sqlite3 exited $rc: $out")
    assert(out === "ok", s"integrity_check said: $out")
  }

  test("DELETE of an async plugin whose construction failed answers 204") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r = req(port, "PUT", "/v1/plugins/brokenAsync",
        """{"source": "this is ((( not js"}""",
        Map("async" -> "true"))
      assert(r.body().contains("initializing"), r.body())
      // wait for the background construction to fail
      var state = ""
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (state != "error" && System.nanoTime() < deadline) {
        val g = req(port, "GET", "/v1/plugins/brokenAsync")
        if (g.body().contains("\"error\"")) state = "error"
        else Thread.sleep(10)
      }
      assert(state === "error")
      val d = req(port, "DELETE", "/v1/plugins/brokenAsync")
      assert(d.statusCode() === 204, s"${d.statusCode()} ${d.body()}")
      val g2 = req(port, "GET", "/v1/plugins/brokenAsync")
      assert(g2.statusCode() === 404, g2.body())
    }
  }

  test("/batch input is strict JSON: JS expressions are rejected, JSON works") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r1 = req(port, "PUT", "/v1/functions/score_fix",
        """{"type": "sql.expression", "params": {
          |  "expression": "horizontal_sum(input) AS result",
          |  "prepared": true, "raw": true, "autoInput": true}}""".stripMargin)
      assert(r1.statusCode() === 201 || r1.statusCode() === 200, r1.body())
      val ok = req(port, "GET",
        s"/v1/functions/score_fix/batch?input=${enc("[[1,2],[3]]")}")
      assert(ok.statusCode() === 200, ok.body())
      // a JS IIFE is not JSON — it must be rejected, not executed
      val js = req(port, "GET", s"/v1/functions/score_fix/batch?input=" +
        enc("(function(){return [1]})()"))
      assert(js.statusCode() === 400, s"${js.statusCode()} ${js.body()}")
      // elisions are JS-tolerated but not JSON; malformed input is the
      // CLIENT's mistake — 400, never 500
      val elide = req(port, "GET",
        s"/v1/functions/score_fix/batch?input=${enc("[1,,2]")}")
      assert(elide.statusCode() === 400,
        s"${elide.statusCode()} ${elide.body()}")
    }
  }

  test("multi-second time quanta floor pre-epoch timestamps") {
    assert(api.GraftEngine.quantizeInstant(java.time.Instant.ofEpochSecond(-3), 2.0) ===
      java.time.Instant.ofEpochSecond(-4))
    assert(api.GraftEngine.quantizeInstant(java.time.Instant.ofEpochSecond(3), 2.0) ===
      java.time.Instant.ofEpochSecond(2))
    assert(api.GraftEngine.quantizeInstant(java.time.Instant.ofEpochSecond(-4), 2.0) ===
      java.time.Instant.ofEpochSecond(-4))
  }
}
