package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-sixth batch: the beh-dataset family and record-time
  * timestamp semantics —
  *
  *   - `timeQuantumSeconds` quantization at record time
  *     (`testing/MLDB-987-beh-time-quantization-test.py`: sub-second
  *     quanta ROUND, multi-second quanta FLOOR, default 1 s —
  *     `types/date.cc:437` Date::quantize)
  *   - dataFileUrl protocol validation
  *     (`MLDB-696_uri_causes_crash.py`)
  *   - beh.mutable record → commit → LIMIT query
  *     (`MLDBFB-323-beh-limit.py`) and `1 @ 0` timestamped transform
  *     into beh.mutable (`MLDBFB-320-bits_tbits_assert_fail.py`)
  *   - relative-path beh persistence from a JS script
  *     (`MLDB-563-beh-relative-paths.js`)
  *   - the full save → reload → overwrite cycle: bucketize + merged +
  *     transform into an id-less beh.mutable output with a
  *     dataFileUrl, reloaded under type `beh`
  *     (`MLDB-1254-overwrite_file_test.py`)
  *   - import.git + GROUP BY with the non-aggregator-star error
  *     (`MLDB-1491-get-all-not-implemented-for-datasets.js`)
  */
class ReferenceParitySpec46 extends AnyFunSuite {

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

  // ---- MLDB-987: record-time quantization --------------------------------

  test("MLDB-987: timeQuantumSeconds rounds sub-second, floors multi-second") {
    val samples = Seq(
      ("2015-11-17T13:20:20.956Z", Some("0.001"), "2015-11-17T13:20:20.956Z"),
      ("2015-11-17T13:20:20.956Z", Some("0.01"), "2015-11-17T13:20:20.96Z"),
      ("2015-11-17T13:20:20.956Z", Some("1"), "2015-11-17T13:20:21Z"),
      ("2015-11-17T13:20:20.956Z", None, "2015-11-17T13:20:21Z"),
      ("2015-11-17T13:20:20.956Z", Some("60"), "2015-11-17T13:20:00Z"),
      ("2015-11-17T13:20:59.956Z", Some("60"), "2015-11-17T13:20:00Z"))
    for (tpe <- Seq("sparse.mutable", "beh.binary.mutable")) {
      val e = new api.GraftEngine(spark)
      withServer(e) { port =>
        samples.zipWithIndex.foreach { case ((ts, quantum, expected), i) =>
          val ds = s"q$i"
          val params = quantum
            .map(q => s""", "params": {"timeQuantumSeconds": $q}""")
            .getOrElse("")
          val c = req(port, "PUT", s"/v1/datasets/$ds",
            s"""{"type": "$tpe"$params}""")
          assert(c.statusCode() < 400, c.body())
          val r = req(port, "POST", s"/v1/datasets/$ds/rows",
            s"""{"rowName": "row", "columns": [["column", 1, "$ts"]]}""")
          assert(r.statusCode() < 400, r.body())
          val q = req(port, "GET",
            s"/v1/query?q=${enc(s"select ts from $ds")}")
          assert(q.statusCode() === 200, q.body())
          assert(q.body().contains(expected),
            s"$tpe quantum=$quantum: expected $expected in ${q.body()}")
        }
      }
    }
  }

  // ---- MLDB-696: dataFileUrl needs a protocol -----------------------------

  test("MLDB-696: beh.mutable rejects dataFileUrl without a protocol") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val rel = req(port, "PUT", "/v1/datasets/x",
        """{"type": "beh.mutable", "params":
          | {"dataFileUrl": "relative/path/without/protocol.beh"}}"""
          .stripMargin)
      assert(rel.statusCode() >= 400, rel.body())
      val abs = req(port, "PUT", "/v1/datasets/y",
        """{"type": "beh.mutable", "params":
          | {"dataFileUrl": "/absolute/path/without/protocol.beh"}}"""
          .stripMargin)
      assert(abs.statusCode() >= 400, abs.body())
    }
  }

  // ---- MLDBFB-323 / MLDBFB-320 --------------------------------------------

  test("MLDBFB-323: beh.mutable record, commit, LIMIT query") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      assert(req(port, "PUT", "/v1/datasets/example",
        """{"type": "beh.mutable"}""").statusCode() < 400)
      req(port, "POST", "/v1/datasets/example/rows",
        """{"rowName": "r1", "columns": [["c", 1, 0]]}""")
      req(port, "POST", "/v1/datasets/example/rows",
        """{"rowName": "r2", "columns": [["c", 2, 0]]}""")
      assert(req(port, "POST", "/v1/datasets/example/commit", "{}")
        .statusCode() < 400)
      val q = req(port, "GET", s"/v1/query?q=${enc(
        "select * from example limit 2")}&format=table")
      assert(q.statusCode() === 200, q.body())
      assert(q.body().contains("\"r1\"") && q.body().contains("\"r2\""),
        q.body())
    }
  }

  test("MLDBFB-320: '1 @ 0' timestamped transform into beh.mutable") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      req(port, "PUT", "/v1/datasets/ds",
        """{"type": "sparse.mutable"}""")
      req(port, "POST", "/v1/datasets/ds/rows",
        """{"rowName": "row1", "columns":
          | [["uid", "user1", 0], ["ts", 0, 0]]}""".stripMargin)
      val r = req(port, "POST", "/v1/procedures",
        """{"type": "transform", "params": {
          | "inputData": "SELECT ds.uid, ds.ts, 1 @ 0 AS weight FROM ds",
          | "outputDataset": {"id": "resDs", "type": "beh.mutable"},
          | "runOnCreation": true}}""".stripMargin)
      assert(r.statusCode() < 400, r.body())
      val q = req(port, "GET",
        s"/v1/query?q=${enc("select weight from resDs")}")
      assert(q.statusCode() === 200, q.body())
      assert(q.body().contains("\"weight\":1"), q.body())
    }
  }

  // ---- MLDB-563: relative-path beh persistence from JS ---------------------

  test("MLDB-563: beh.mutable saves to a relative file:// path") {
    val tmpDir = java.nio.file.Files.createTempDirectory("mldb563")
    val target = tmpDir.resolve("MLDB-563.beh")
    val e = new api.GraftEngine(spark)
    try {
      val script =
        s"""
           |var dataset_config = {
           |    type: 'beh.mutable',
           |    id: 'test',
           |    params: { dataFileUrl: "file://$target" }
           |};
           |var dataset = mldb.createDataset(dataset_config);
           |var ts = new Date("2015-01-01");
           |function recordExample(row, x, y)
           |{
           |    dataset.recordRow(row, [ [ "x", x, ts ], ["y", y, ts] ]);
           |}
           |recordExample("ex1", 0, 0);
           |recordExample("ex2", 1, 1);
           |recordExample("ex3", 2, 2);
           |recordExample("ex4", 3, 3);
           |dataset.commit();
           |"success"
           |""".stripMargin
      val res = api.JsHost.run(spark, e.dataset, script, Map.empty, e)
      assert(api.JsHost.resultJson(res) === "\"success\"")
      assert(java.nio.file.Files.exists(target))
      // reload under the immutable beh type
      e.createDatasetTyped("reloaded", "beh",
        k => if (k == "dataFileUrl") Some(s"file://$target") else None)
      assert(e.dataset("reloaded").count() === 4)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tmpDir.toFile)
    }
  }

  // ---- MLDB-1254: save → reload → overwrite cycle --------------------------

  test("MLDB-1254: bucketize + merged + anonymous beh output, twice") {
    val tmp = java.nio.file.Files.createTempFile("mldb1254", ".beh")
    val e = new api.GraftEngine(spark)
    try withServer(e) { port =>
      def createScores(): Unit = {
        assert(req(port, "PUT", "/v1/datasets/ds_write",
          """{"type": "beh.mutable"}""").statusCode() < 400)
        for (i <- 0 until 10)
          req(port, "POST", "/v1/datasets/ds_write/rows",
            s"""{"rowName": "user$i", "columns": [["score", $i, 0],
               | ["prob", ${i * 2}, 0], ["index", ${i * 3}, 0]]}"""
              .stripMargin)
        assert(req(port, "POST", "/v1/datasets/ds_write/commit", "{}")
          .statusCode() < 400)
      }
      def bucket(b: String): Unit = {
        val r = req(port, "POST", "/v1/procedures",
          s"""{"type": "bucketize", "params": {
             | "inputData": "SELECT * FROM ds_write ORDER BY score",
             | "outputDataset": {"id": "bucketed", "type": "beh.mutable"},
             | "percentileBuckets": $b, "runOnCreation": true}}"""
            .stripMargin)
        assert(r.statusCode() < 400, r.body())
      }
      def saveReload(): Unit = {
        assert(req(port, "PUT", "/v1/datasets/merged",
          """{"type": "merged", "params": {"datasets": [
            | {"id": "ds_write"}, {"id": "bucketed"}]}}""".stripMargin)
          .statusCode() < 400)
        val t = req(port, "POST", "/v1/procedures",
          s"""{"type": "transform", "params": {
             | "inputData": "SELECT * FROM merged",
             | "outputDataset": {"type": "beh.mutable", "params":
             |   {"dataFileUrl": "file://$tmp"}},
             | "runOnCreation": true}}""".stripMargin)
        assert(t.statusCode() < 400, t.body())
        val rd = req(port, "PUT", "/v1/datasets/ds_read",
          s"""{"type": "beh", "params":
             | {"dataFileUrl": "file://$tmp"}}""".stripMargin)
        assert(rd.statusCode() < 400, rd.body())
      }
      createScores()
      bucket("""{"1": [0, 10], "2": [10, 30]}""")
      saveReload()
      bucket("""{"1": [0, 40], "2": [60, 80]}""")
      saveReload()
      val q = req(port, "GET",
        s"/v1/query?q=${enc("select count(*) as n from ds_read")}")
      assert(q.statusCode() === 200, q.body())
      assert(q.body().contains("\"n\":10"), q.body())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
  }

  // ---- MLDB-1491: non-aggregator star under GROUP BY ------------------------

  test("MLDB-1491: git group-by aggregates pass; temporal_earliest({*}) 400s") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val imp = req(port, "POST", "/v1/procedures",
        """{"type": "import.git", "params": {
          | "repository": "file:///root/repo", "importStats": true,
          | "outputDataset": {"id": "git"}, "runOnCreation": true}}"""
          .stripMargin)
      assert(imp.statusCode() < 400, imp.body())

      val q1 = req(port, "GET", s"/v1/query?q=${enc(
        "select count(*) as cnt, author, sum(filesChanged) as changes, " +
          "sum(insertions) as insertions, sum(deletions) as deletions " +
          "from git group by author")}&format=table")
      assert(q1.statusCode() === 200, q1.body())

      val q2 = req(port, "GET", s"/v1/query?q=${enc(
        "select count(*) as cnt, author, " +
          "min(earliest_timestamp({*})) as earliest, " +
          "max(latest_timestamp({*})) as latest " +
          "from git group by author")}&format=table")
      assert(q2.statusCode() === 200, q2.body())

      val q3 = req(port, "GET", s"/v1/query?q=${enc(
        "select count(*) as cnt, author, temporal_earliest({*}) " +
          "from git group by author")}&format=table")
      assert(q3.statusCode() === 400, q3.body())
      assert(q3.body().contains(
        "Non-aggregator 'temporal_earliest({*})' with GROUP BY clause " +
          "is not allowed"), q3.body())
    }
  }
}
