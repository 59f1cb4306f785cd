package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-seventh batch: run lifecycle, cancellation, in-script
  * entities, archives, and the classifier pipeline tails —
  *
  *   - run responses carry runStarted/runFinished with start <= finish
  *     (`testing/MLDB-525-procedure-training-timestamp.js`)
  *   - PUT `<run>/state {"state": "cancelled"}` cancels an async run;
  *     polls see `cancelled`, never `error`
  *     (`MLDB-408-task-cancellation.py`)
  *   - `mldb.createFunction(...).call()` pair format + `type()`, and
  *     `mldb.createProcedure(...).run()` (`MLDB-1192-js-procedure-
  *     function.js`)
  *   - `archive+file://…#member` streams, `mldb.ls` member listing,
  *     and import.text from an archive member (`MLDB-900-archives.js`)
  *   - `_fail_memory_allocation()` error shape with
  *     details.context.error, bare / table / join-ON contexts
  *     (`MLDB-1355-explain-bad-alloc.js`)
  *   - the bdt/glz/bs train → test → explain pipeline with
  *     configuration-keyed algorithms
  *     (`MLDB-779_cant_test_bs_cls.py`)
  */
class ReferenceParitySpec47 extends AnyFunSuite {

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

  private def field(json: String, name: String): Option[String] = {
    val re = ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(json).map(_.group(1))
  }

  // ---- MLDB-525: run lifecycle timestamps ---------------------------------

  test("MLDB-525: runStarted <= runFinished on the run response") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    e.createDataset("src525",
      (1 to 100).map(i => (s"r$i", i)).toDF("rowName", "x"))
    withServer(e) { port =>
      val c = req(port, "PUT", "/v1/procedures/t525",
        """{"type": "transform", "params": {
          | "inputData": "SELECT x, x * 2 AS y FROM src525",
          | "outputDataset": {"id": "out525"}}}""".stripMargin)
      assert(c.statusCode() < 400, c.body())
      val r = req(port, "PUT", "/v1/procedures/t525/runs/1", "{}")
      assert(r.statusCode() < 400, r.body())
      val started = field(r.body(), "runStarted")
      val finished = field(r.body(), "runFinished")
      assert(started.isDefined && finished.isDefined, r.body())
      val si = java.time.Instant.parse(started.get)
      val fi = java.time.Instant.parse(finished.get)
      assert(!si.isAfter(fi), s"start $si after finish $fi")
    }
  }

  // ---- MLDB-408: cancellation ----------------------------------------------

  test("MLDB-408: PUT state cancelled stops an async run") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    e.createDataset("big408",
      spark.range(2000000L).toDF("x").withColumn("rowName",
        org.apache.spark.sql.functions.col("x").cast("string")))
    withServer(e) { port =>
      val c = req(port, "PUT", "/v1/procedures/slow408",
        """{"type": "transform", "params": {
          | "inputData": "SELECT x, x * 3 AS y FROM big408 ORDER BY y DESC",
          | "outputDataset": {"id": "out408"}}}""".stripMargin)
      assert(c.statusCode() < 400, c.body())
      val run = req(port, "POST", "/v1/procedures/slow408/runs", "{}",
        async = true)
      assert(run.statusCode() === 201, run.body())
      val loc = run.headers().firstValue("Location").orElse("")
      assert(loc.nonEmpty, run.body())

      val cancel = req(port, "PUT", s"$loc/state",
        """{"state": "cancelled"}""")
      assert(cancel.statusCode() === 200, cancel.body())

      var state = ""
      var tries = 0
      while (state != "cancelled" && tries < 50) {
        val st = req(port, "GET", s"$loc/state")
        assert(st.statusCode() === 200, st.body())
        state = field(st.body(), "state").getOrElse("")
        assert(state != "error", st.body())
        if (state != "cancelled") Thread.sleep(100)
        tries += 1
      }
      assert(state === "cancelled")
    }
  }

  // ---- MLDB-1192: in-script entities ---------------------------------------

  test("MLDB-1192: createFunction call pairs + createProcedure run") {
    val e = new api.GraftEngine(spark)
    val script =
      """
        |var fnConfig = {
        |    type: 'sql.expression',
        |    params: { expression: 'x * 10 as y' }
        |};
        |var fn = mldb.createFunction(fnConfig);
        |if (fn.type() != 'sql.expression')
        |    throw "bad type " + fn.type();
        |var res = fn.call({ x: 10 });
        |if (JSON.stringify(res[0][0]) != JSON.stringify(["y", [100, "-Inf"]]))
        |    throw "bad call result " + JSON.stringify(res);
        |var proc = mldb.createProcedure({ type: "null", params: {} });
        |if (proc.type() != 'null') throw "bad proc type";
        |var out = proc.run({});
        |if (JSON.stringify(out) != "{}") throw "bad run " + JSON.stringify(out);
        |"success"
        |""".stripMargin
    val res = api.JsHost.run(spark, e.dataset, script, Map.empty, e)
    assert(api.JsHost.resultJson(res) === "\"success\"")
  }

  // ---- MLDB-900: archives ---------------------------------------------------

  test("MLDB-900: archive member listing, streaming, and import") {
    val tmp = java.nio.file.Files.createTempFile("mldb900", ".zip")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(tmp))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("data/eucalyptus.arff"))
      val lines = (1 to 823).map(i => s"line$i").mkString("\n") + "\n"
      zos.write(lines.getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new java.util.zip.ZipEntry("ml/links.csv"))
      zos.write(("id,url\n" + (1 to 50).map(i => s"$i,u$i")
        .mkString("\n") + "\n").getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()

    val e = new api.GraftEngine(spark)
    try {
      val url = s"archive+file://$tmp"
      val script =
        s"""
           |var dir = mldb.ls("$url");
           |if (!dir.objects["$url#data/eucalyptus.arff"].exists)
           |    throw "member not listed";
           |var stream = mldb.openStream("$url#data/eucalyptus.arff");
           |var numLines = 0;
           |while (!stream.eof()) {
           |    try { stream.readLine(); ++numLines; } catch (e) { }
           |}
           |numLines
           |""".stripMargin
      val res = api.JsHost.run(spark, e.dataset, script, Map.empty, e)
      assert(api.JsHost.resultJson(res) === "823")

      withServer(e) { port =>
        val imp = req(port, "POST", "/v1/procedures",
          s"""{"type": "import.text", "params": {
             | "dataFileUrl": "$url#ml/links.csv",
             | "outputDataset": {"id": "csv"},
             | "runOnCreation": true, "limit": 20}}""".stripMargin)
        assert(imp.statusCode() < 400, imp.body())
        val q = req(port, "GET",
          s"/v1/query?q=${enc("select count(*) as n from csv")}")
        assert(q.statusCode() === 200, q.body())
        assert(q.body().contains("\"n\":20"), q.body())
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  // ---- MLDB-1355: simulated allocation failure ------------------------------

  test("MLDB-1355: _fail_memory_allocation error shape in three contexts") {
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    e.createDataset("test1355", Seq(
      ("0", "mustard", "moved", "kitchen"),
      ("1", "plum", "moved", "kitchen"),
      ("2", "mustard", "stabbed", "plum"))
      .toDF("rowName", "who", "what", "how"))
    withServer(e) { port =>
      for (q <- Seq(
        "select _fail_memory_allocation()",
        "select *, _fail_memory_allocation() from test1355",
        "select * from test1355 as x join test1355 as y on " +
          "_fail_memory_allocation()")) {
        val r = req(port, "GET", s"/v1/query?q=${enc(q)}")
        assert(r.statusCode() === 400, s"$q: ${r.body()}")
        assert(r.body().contains("\"details\""), r.body())
        assert(r.body().contains("Out of memory"), r.body())
      }
    }
  }

  // ---- MLDB-779: bdt / glz / bs pipelines -----------------------------------

  test("MLDB-779: configuration-keyed algorithms train, test, explain") {
    val tmpDir = java.nio.file.Files.createTempDirectory("mldb779")
    val e = new api.GraftEngine(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val label = i % 3 == 0
      val feats = (0 until 25).map { x =>
        val r = rnd.nextDouble()
        if (r < x / 25.0 || (label && r < 0.4)) 1.0 else 0.0
      }
      (s"example-$i", feats(0), feats(5), feats(10), feats(15), feats(20),
        if (label) "true" else "false")
    }
    e.createDataset("toy", rows.toDF(
      "rowName", "feat0", "feat5", "feat10", "feat15", "feat20", "LABEL"))
    try withServer(e) { port =>
      for (cls <- Seq("bdt", "glz", "bs")) {
        val model = s"file://$tmpDir/tng_$cls.cls"
        req(port, "DELETE", "/v1/procedures/tng_classif")
        val train = req(port, "PUT", "/v1/procedures/tng_classif",
          s"""{"type": "classifier.train", "params": {
             | "trainingData": {
             |   "where": "rowHash() % 3 != 1",
             |   "select": "{* EXCLUDING(LABEL)} as features, LABEL = 'true' as label",
             |   "from": {"id": "toy"}},
             | "configuration": {
             |   "glz": {"type": "glz", "verbosity": 3, "normalize": false,
             |     "link_function": "linear", "regularization": "none"},
             |   "bs": {"type": "boosted_stumps", "min_iter": 10,
             |     "max_iter": 200, "verbosity": 3},
             |   "bdt": {"type": "boosting", "min_iter": 10,
             |     "max_iter": 200,
             |     "weak_learner": {"type": "decision_tree", "max_depth": 1}}},
             | "algorithm": "$cls",
             | "modelFileUrl": "$model"}}""".stripMargin)
        assert(train.statusCode() < 400, s"$cls train: ${train.body()}")
        val run = req(port, "PUT", "/v1/procedures/tng_classif/runs/1", "{}")
        assert(run.statusCode() < 400, s"$cls run: ${run.body()}")
        val det = req(port, "GET", "/v1/procedures/tng_classif/runs/1/details")
        assert(det.statusCode() === 200, det.body())

        req(port, "DELETE", "/v1/functions/tng_scorer")
        val scorer = req(port, "PUT", "/v1/functions/tng_scorer",
          s"""{"type": "classifier", "params":
             | {"modelFileUrl": "$model"}}""".stripMargin)
        assert(scorer.statusCode() < 400, s"$cls scorer: ${scorer.body()}")

        req(port, "DELETE", "/v1/procedures/tng_score_proc")
        req(port, "DELETE", "/v1/datasets/toy_cls_baseline_scorer_rez")
        val test = req(port, "PUT", "/v1/procedures/tng_score_proc",
          s"""{"type": "classifier.test", "params": {
             | "testingData": {
             |   "select": "{*} as features, LABEL = 'true' as label, tng_scorer({{* EXCLUDING(LABEL)} as features})[score] as score",
             |   "from": {"id": "toy"},
             |   "where": "rowHash() % 3 = 1"},
             | "outputDataset": {"id": "toy_cls_baseline_scorer_rez",
             |   "type": "sparse.mutable"}}}""".stripMargin)
        assert(test.statusCode() < 400, s"$cls test: ${test.body()}")
        val testRun = req(port, "POST", "/v1/procedures/tng_score_proc/runs",
          "{}")
        assert(testRun.statusCode() < 400, s"$cls test run: ${testRun.body()}")

        req(port, "DELETE", "/v1/functions/tng_explain")
        val explain = req(port, "PUT", "/v1/functions/tng_explain",
          s"""{"type": "classifier.explain", "params":
             | {"modelFileUrl": "$model"}}""".stripMargin)
        assert(explain.statusCode() < 400, s"$cls explain: ${explain.body()}")
        val eq = req(port, "GET", s"/v1/query?q=${enc(
          "select tng_explain({{* EXCLUDING(LABEL)} as features, " +
            "1 as label})[explanation], * from toy " +
            "where rowHash() % 3 = 1")}&format=sparse")
        assert(eq.statusCode() === 200, s"$cls explain query: ${eq.body()}")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmpDir.toFile)
  }
}
