package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tenth batch of replays of the reference's OWN regression tests —
  * REST formats, the named-procedure lifecycle (PUT + runs), the
  * bucketize family, svd.train/embedRow over REST, and csv export.
  * Each test cites the `/root/reference/testing/` file it reproduces
  * and asserts that file's expected values (divergences are called
  * out inline). */
class ReferenceParitySpec10 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = e.query(sql)
  private val client = HttpClient.newHttpClient()

  private def withServer[T](engine: api.GraftEngine)(
      body: (Int, (String => (Int, String)), ((String, String) => (Int, String)),
        ((String, String) => (Int, String))) => T): T = {
    val srv = new api.RestServer(engine)
    val port = srv.start()
    def get(path: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def put(path: String, b: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .PUT(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def post(path: String, b: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(b)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try body(port, get, put, post) finally srv.stop()
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  // --- MLDB-102-select-formats.js ------------------------------------------

  test("MLDB-102: aos/soa/table/sparse/full formats with _rowName") {
    val engine = new api.GraftEngine(spark)
    engine.recordRows("fmt102",
      """[{"rowName":"ex1","x":0,"y":3},
         |{"rowName":"ex2","x":1,"y":2,"z":"yes"},
         |{"rowName":"ex3","x":2,"y":1},
         |{"rowName":"ex4","x":3,"y":0,"z":"no"}]""".stripMargin)
    withServer(engine) { (_, get, _, _) =>
      // (`SELECT *` carries the row name; a bare explicit select list
      // does not in wide mode — documented divergence, the reference
      // threads _rowName through every result)
      val qq = enc("SELECT * FROM fmt102 ORDER BY rowName()")
      // aos: explicit nulls for selected-but-missing cells, leading
      // _rowName (the reference's expected1)
      assert(get(s"/v1/query?q=$qq&format=aos")._2 ===
        """[{"_rowName":"ex1","x":0,"y":3,"z":null},""" +
          """{"_rowName":"ex2","x":1,"y":2,"z":"yes"},""" +
          """{"_rowName":"ex3","x":2,"y":1,"z":null},""" +
          """{"_rowName":"ex4","x":3,"y":0,"z":"no"}]""")
      // soa (expected2)
      assert(get(s"/v1/query?q=$qq&format=soa")._2 ===
        """{"_rowName":["ex1","ex2","ex3","ex4"],"x":[0,1,2,3],""" +
          """"y":[3,2,1,0],"z":[null,"yes",null,"no"]}""")
      // table with and without headers (expected3)
      assert(get(s"/v1/query?q=$qq&format=table")._2 ===
        """[["_rowName","x","y","z"],["ex1",0,3,null],["ex2",1,2,"yes"],""" +
          """["ex3",2,1,null],["ex4",3,0,"no"]]""")
      assert(get(s"/v1/query?q=$qq&format=table&headers=false")._2 ===
        """[["ex1",0,3,null],["ex2",1,2,"yes"],["ex3",2,1,null],""" +
          """["ex4",3,0,"no"]]""")
      // sparse (expected4) — divergence: wide mode OMITS the null
      // cells a sparse dataset never recorded (the reference renders
      // explicitly-selected-missing columns as ["z", null])
      assert(get(s"/v1/query?q=$qq&format=sparse")._2 ===
        """[[["_rowName","ex1"],["x",0],["y",3]],""" +
          """[["_rowName","ex2"],["x",1],["y",2],["z","yes"]],""" +
          """[["_rowName","ex3"],["x",2],["y",1]],""" +
          """[["_rowName","ex4"],["x",3],["y",0],["z","no"]]]""")
      // full (expected5 shape): rowName + [column, value, ts] cells;
      // wide mode has no per-cell timestamps → ts-less cells read
      // "-Inf" (divergence documented; default format stays aos)
      val full = get(s"/v1/query?q=$qq&format=full")._2
      assert(full.startsWith("""[{"rowName":"ex1","columns":[["x",0,"-Inf"]"""))
      assert(full.contains(""""rowName":"ex2""""))
      assert(full.contains("""["z","yes","-Inf"]"""))
    }
  }

  // --- MLDB-543-column-named-zero.js ---------------------------------------

  test("MLDB-543: a column named 0 and numeric row names render in table") {
    val engine = new api.GraftEngine(spark)
    engine.recordRows("t543",
      """[{"rowName":"0","0":0},{"rowName":"1","0":0}]""")
    withServer(engine) { (_, get, _, _) =>
      val r1 = get(s"/v1/query?q=${enc("select * from t543 order by rowName()")}&format=table")._2
      assert(r1 === """[["_rowName","0"],["0",0],["1",0]]""")
      // a QUOTED "0" identifier selects the same column; the implicit
      // row name passes through an explicit select list (MLDB-409)
      val r2 = get(s"/v1/query?q=${enc("select \"0\" from t543 order by rowName()")}&format=table")._2
      assert(r2 === """[["_rowName","0"],["0",0],["1",0]]""")
    }
  }

  // --- MLDB-1120-sparse-mutable-values.js ----------------------------------

  test("MLDB-1120: sparse format shows only present cells, all widths") {
    val engine = new api.GraftEngine(spark)
    engine.recordRows("t1120",
      """[{"rowName":"rowa1","a":"a"},{"rowName":"rowa3","abc":"abc"},
         |{"rowName":"rowb1","é":"é"},{"rowName":"rowb7","ébcdefg":"ébcdefg"},
         |{"rowName":"rowc1","x":0},{"rowName":"rowc3","x":-1}]""".stripMargin)
    withServer(engine) { (_, get, _, _) =>
      val r = get(s"/v1/query?q=${enc("select * from t1120 order by rowName()")}&format=sparse")._2
      assert(r ===
        """[[["_rowName","rowa1"],["a","a"]],""" +
          """[["_rowName","rowa3"],["abc","abc"]],""" +
          """[["_rowName","rowb1"],["é","é"]],""" +
          """[["_rowName","rowb7"],["ébcdefg","ébcdefg"]],""" +
          """[["_rowName","rowc1"],["x",0]],""" +
          """[["_rowName","rowc3"],["x",-1]]]""")
    }
  }

  // --- MLDB-1010-put-no-payload-error.js -----------------------------------

  test("MLDB-1010: bodyless PUT/POST on procedures → 400 'empty payload'") {
    val engine = new api.GraftEngine(spark)
    withServer(engine) { (_, _, put, post) =>
      val (c1, b1) = put("/v1/procedures/test", "")
      assert(c1 === 400 && b1.contains("empty payload"), b1)
      val (c2, b2) = post("/v1/procedures", "")
      assert(c2 === 400 && b2.contains("empty payload"), b2)
    }
  }

  // --- MLDB-1043-bucketize-procedure.js ------------------------------------

  private def loadScores(engine: api.GraftEngine): Unit =
    engine.recordRows("rNamedScores",
      """[{"rowName":"roger","score":1},{"rowName":"rolland","score":0},
         |{"rowName":"ricardo","score":4},{"rowName":"rita","score":4},
         |{"rowName":"rantanplan","score":7},{"rowName":"rudolph","score":6},
         |{"rowName":"rim","score":3}]""".stripMargin)

  test("MLDB-1043: bucketize assigns named percentile buckets (tests 1,3,4,5)") {
    val engine = new api.GraftEngine(spark)
    loadScores(engine)
    withServer(engine) { (_, get, put, post) =>
      def run(n: Int, buckets: String): Map[String, String] = {
        val (pc, pb) = put(s"/v1/procedures/test$n",
          s"""{"type": "bucketize", "params": {
             |"inputData": "select 1 from rNamedScores order by score DESC, rowName()",
             |"outputDataset": {"id": "test$n", "type": "sparse.mutable"},
             |"percentileBuckets": $buckets}}""".stripMargin)
        assert(pc === 201, pb)
        val (rc, rb) = post(s"/v1/procedures/test$n/runs", "{}")
        assert(rc === 201, rb)
        engine.query(s"select rowName() as rn, bucket from test$n")
          .select("rn", "bucket")
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      }
      // test 1: 50-50 (ricardo/rita tie on 4 → deterministic here via
      // the rowName tiebreak we appended)
      val g1 = run(1, """{"b1": [0, 50], "b2": [50, 100]}""")
      assert(g1("rantanplan") === "b1" && g1("rudolph") === "b1")
      assert(g1("roger") === "b2" && g1("rim") === "b2" && g1("rolland") === "b2")
      assert(Set("b1", "b2")(g1("ricardo")) && Set("b1", "b2")(g1("rita")))
      // test 3: tiny first range → everything lands in b2
      val g3 = run(3, """{"b1": [0, 10], "b2": [10, 100]}""")
      assert(g3.size === 7 && g3.values.forall(_ === "b2"))
      // test 4: varied sizes
      val g4 = run(4, """{"b1": [0, 25], "b2": [25, 75], "b3": [75, 100]}""")
      assert(g4("rantanplan") === "b1")
      assert(g4("roger") === "b3" && g4("rolland") === "b3")
      assert(g4("rudolph") === "b2" && g4("rim") === "b2")
      // test 5: bucket GAP → uncovered rows are dropped from the output
      val g5 = run(5, """{"b1": [0, 25], "b3": [75, 100]}""")
      assert(g5.size === 3)
      assert(g5("rantanplan") === "b1")
      assert(g5("roger") === "b3" && g5("rolland") === "b3")
    }
  }

  test("MLDB-1043: invalid bucketize configs are rejected at PUT (tests 2,6-9)") {
    val engine = new api.GraftEngine(spark)
    loadScores(engine)
    withServer(engine) { (_, _, put, post) =>
      def tryPut(buckets: String): Int =
        put("/v1/procedures/bucketizeMyScoreInvalid",
          s"""{"type": "bucketize", "params": {
             |"inputData": "select * from rNamedScores order by score DESC",
             |"outputDataset": {"id": "bucketedScoresInvalid"},
             |"percentileBuckets": $buckets}}""".stripMargin)._1
      // overlapping ranges (test 2)
      assert(tryPut("""{"b1": [0, 80], "b2": [50, 100]}""") === 400)
      // out-of-range lower bound (test 6)
      assert(tryPut("""{"b1": [-0.2, 50], "b2": [50, 100]}""") === 400)
      // out-of-range upper bound (test 7)
      assert(tryPut("""{"b1": [0, 50], "b2": [50, 100.1]}""") === 400)
      // inverted bounds (test 8)
      assert(tryPut("""{"b1": [50, 0], "b2": [50, 100]}""") === 400)
      // test 9: bucketize over an EMPTY dataset registers and runs
      engine.createDataset("emptyDataset",
        engine.query("select 1 as score from rNamedScores where score > 99"))
      assert(put("/v1/procedures/bucketizeEmptyDataset",
        """{"type": "bucketize", "params": {
          |"inputData": "select * from emptyDataset order by score DESC",
          |"outputDataset": {"id": "bucketedEmptyDataset"},
          |"percentileBuckets": {"b1": [0, 50], "b2": [50, 100]}}}"""
          .stripMargin)._1 === 201)
      assert(post("/v1/procedures/bucketizeEmptyDataset/runs", "{}")._1 === 201)
      assert(engine.query("select * from bucketedEmptyDataset").count() === 0)
    }
  }

  // --- MLDB-1267-bucketize-ts-test.py --------------------------------------

  test("MLDB-1267: bucketize output keeps the input's latest timestamp") {
    val engine = new api.GraftEngine(spark)
    withServer(engine) { (_, get, put, post) =>
      assert(put("/v1/datasets/input1267",
        """{"type": "sparse.mutable"}""")._1 === 201)
      // the reference's columns-form row recording, cell ts in epoch
      // seconds
      assert(post("/v1/datasets/input1267/rows",
        """{"rowName": "row1", "columns": [["score", 5, 6]]}""")._1 === 200)
      assert(post("/v1/datasets/input1267/rows",
        """{"rowName": "row2", "columns": [["score", 1, 5]]}""")._1 === 200)
      assert(post("/v1/datasets/input1267/commit", "{}")._1 === 200)
      assert(post("/v1/procedures",
        """{"type": "bucketize", "params": {
          |"inputData": "SELECT * FROM input1267 ORDER BY score",
          |"outputDataset": {"id": "output1267", "type": "sparse.mutable"},
          |"percentileBuckets": {"b1": [0, 50], "b2": [50, 100]}}}"""
          .stripMargin)._1 === 201) // POST creation answers 201
      // the pinned value: latest_timestamp = the max input cell ts (6s)
      val rows = engine.query(
        "SELECT latest_timestamp({*}) AS lt FROM output1267").select("lt")
        .collect().map(_.getString(0)).toSet
      assert(rows === Set("1970-01-01T00:00:06Z"), rows.toString)
    }
  }

  // --- MLDB-1025-dataset-output-with-default.py ----------------------------

  test("MLDB-1025: outputDataset forms — {id,type}, {id}, string, overwrite") {
    val engine = new api.GraftEngine(spark)
    engine.recordRows("dataset1",
      (0 until 9).map(i =>
        s"""{"rowName":"$i","x":$i,"y":$i}""").mkString("[", ",", "]"))
    withServer(engine) { (_, get, put, post) =>
      def runTransform(outJson: String, id: String): Long = {
        assert(put("/v1/procedures/transform_procedure",
          s"""{"type": "transform", "params": {
             |"inputData": "select * from dataset1 where rowName() = '2'",
             |"outputDataset": $outJson,
             |"runOnCreation": true}}""".stripMargin)._1 === 201)
        engine.query(s"SELECT * FROM $id").count()
      }
      assert(runTransform(
        """{"id": "dataset2", "type": "sparse.mutable"}""", "dataset2") === 1)
      assert(runTransform("""{"id": "dataset3"}""", "dataset3") === 1)
      assert(runTransform("\"dataset4\"", "dataset4") === 1)
      // overwrite works
      assert(runTransform(
        """{"id": "dataset2", "type": "sparse.mutable"}""", "dataset2") === 1)
      // svd.train with row/column output datasets (both default forms)
      assert(put("/v1/procedures/svd1025",
        """{"type": "svd.train", "params": {
          |"trainingData": "select * from dataset1",
          |"rowOutputDataset": "svd_row",
          |"columnOutputDataset": {"id": "svd_column"}}}""".stripMargin)._1
        === 201)
      assert(post("/v1/procedures/svd1025/runs", "{}")._1 === 201)
      assert(engine.query("select * from svd_row").count() === 9)
      assert(engine.query("select * from svd_column").count() === 2)
      // kmeans.train creates exactly the centroids dataset
      val before = engine.listDatasets.size
      assert(put("/v1/procedures/kmeans1025",
        """{"type": "kmeans.train", "params": {
          |"trainingData": "select * from dataset1",
          |"centroidsDataset": {"id": "kmeans_centroids"},
          |"numClusters": 2, "metric": "euclidean",
          |"runOnCreation": false}}""".stripMargin)._1 === 201)
      assert(post("/v1/procedures/kmeans1025/runs", "{}")._1 === 201)
      val after = engine.listDatasets.size
      assert(after === before + 1,
        s"only the centroids dataset must have been created ($before -> $after)")
      assert(engine.query("select * from kmeans_centroids").count() === 2)
    }
  }

  // --- MLDB-805-apply_func_svd_embed.py ------------------------------------

  test("MLDB-805: svd.train → svd.embedRow function → application + query") {
    val engine = new api.GraftEngine(spark)
    val rnd = new scala.util.Random(805)
    engine.recordRows("ds805",
      (0 until 50).map(i =>
        s"""{"rowName":"row_$i","x":${rnd.nextDouble()},"y":${rnd.nextDouble()}}""")
        .mkString("[", ",", "]"))
    withServer(engine) { (port, get, put, post) =>
      assert(put("/v1/procedures/train_svd",
        """{"type": "svd.train", "params": {
          |"trainingData": "select * from ds805",
          |"modelFileUrl": "file://tmp/MLDB-805.svd",
          |"numSingularValues": 5, "numDenseBasisVectors": 10}}"""
          .stripMargin)._1 === 201)
      assert(post("/v1/procedures/train_svd/runs", "{}")._1 === 201)
      assert(put("/v1/functions/embed805",
        """{"type": "svd.embedRow", "params": {
          |"modelFileUrl": "file://tmp/MLDB-805.svd"}}""".stripMargin)._1
        === 200)
      // single-row application with a nested row argument
      val input = enc("""{"row": {"x": 0.5, "y": 0.5}}""")
      val (ac, ab) = get(s"/v1/functions/embed805/application?input=$input")
      assert(ac === 200 && ab.contains("embedding"), ab)
      // and whole-column use in a query
      val n = engine.query("SELECT embed805({row: {*}}) AS e FROM ds805")
        .count()
      assert(n === 50)
    }
  }

  // --- MLDB-1127-order-by-and-where-in-svd.py ------------------------------

  test("MLDB-1127: svd respects orderBy/where/offset/limit (rank 3 vs 2)") {
    val engine = new api.GraftEngine(spark)
    val rnd = new scala.util.Random(1127)
    // first 50 rows: 3 independent columns; last 50: y == x (rank 2)
    val rows = (0 until 50).flatMap { i =>
      val (x, y, z) = (rnd.nextInt(1000) + 1, rnd.nextInt(1000) + 1,
        rnd.nextInt(1000) + 1)
      Seq(
        s"""{"rowName":"row_$i","x":$x,"y":$y,"z":$z,"index":$i}""",
        s"""{"rowName":"row_n${i + 50}","x":$x,"y":$x,"z":$z,"index":${i + 50}}""")
    }
    engine.recordRows("svd_example", rows.mkString("[", ",", "]"))
    def trainCols(orderBy: String, where: String, offset: Int,
        limit: Int): Long = {
      engine.runProcedure("svd.train", Map(
        "select" -> "x, y, z", "from" -> "svd_example",
        "orderBy" -> orderBy, "where" -> where,
        "offset" -> offset.toString, "limit" -> limit.toString,
        "rowOutputDataset" -> "svd_row1127").get _)
      // columns of the row output = number of singular values kept
      engine.query("select * from svd_row1127").columns.count(_ != "rowName")
    }
    assert(trainCols("rowName() ASC", "true", 0, 50) === 3)
    assert(trainCols("rowName() DESC", "true", 0, 50) === 2)
    assert(trainCols("rowName() ASC", "index < 50", 0, 100) === 3)
    assert(trainCols("rowName() ASC", "index > 50", 0, 100) === 2)
  }

  // --- MLDB-1272-regression-training-failure.py ----------------------------

  test("MLDB-1272: glz regression mode predicts with low average error") {
    import spark.implicits._
    val rnd = new scala.util.Random(1272)
    def label(f1: Int, f2: Int) = 2.0 * f1 + f2 + 5 + rnd.nextGaussian() * 3
    val train = (0 until 500).map { _ =>
      val (f1, f2) = (rnd.nextInt(20) + 1, rnd.nextInt(100) + 1)
      (f1.toDouble, f2.toDouble, label(f1, f2))
    }.toDF("feat1", "feat2", "label")
    val test = (0 until 50).map { _ =>
      val (f1, f2) = (rnd.nextInt(20) + 1, rnd.nextInt(100) + 1)
      (f1.toDouble, f2.toDouble)
    }.toDF("feat1", "feat2")
    val model = ml.Models.regressionTrain(train,
      Seq("feat1", "feat2"), "label")
    val scored = model.transform(test)
    val diffs = scored.select(col("feat1"), col("feat2"), col("prediction"))
      .collect().map { r =>
        val expected = 2.0 * r.getDouble(0) + r.getDouble(1) + 5
        val score = r.getDouble(2)
        assert(!score.isNaN, "score must be a float, not NaN")
        math.abs(score - expected)
      }
    val avg = diffs.sum / diffs.length
    assert(avg < 3.0, s"average regression error $avg >= 3.0")
  }

  // --- MLDB-1098-csv-export.py ---------------------------------------------

  test("MLDB-1098: csv export round-trips utf8 rows with rowName") {
    val engine = new api.GraftEngine(spark)
    engine.recordRows("myDataset",
      """[{"rowName":"ascii row","colA":1,"colB":2},
         |{"rowName":"utf8 row","colA":"Ǆώύψ","colB":"ăØÆÅ"}]""".stripMargin)
    val dir1 = java.nio.file.Files.createTempDirectory("graft1098").toString
    engine.runProcedure("export.csv", Map(
      "exportData" ->
        "select rowName() as rowName, colA, colB from myDataset",
      "dataFileUrl" -> s"file://$dir1/out").get _)
    def readLines(dir: String): Seq[String] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".csv")).toSeq
        .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    }
    val lines = readLines(s"$dir1/out")
    assert(lines.contains("rowName,colA,colB"))
    assert(lines.contains("utf8 row,Ǆώύψ,ăØÆÅ"))
    assert(lines.contains("ascii row,1,2"))
    // re-import (named by the exported rowName column) and re-export
    engine.runProcedure("import.text", Map(
      "dataFileUrl" -> s"$dir1/out",
      "named" -> "rowName",
      "outputDataset" -> "myDataset2").get _)
    assert(engine.query("select colA, colB from myDataset2").count() === 2)
    // headers=false + delimiter (the quoteChar subtest is skipped:
    // Spark's CSV writer quotes only when necessary, the reference
    // quotes values containing its quoteChar — documented divergence)
    val dir2 = java.nio.file.Files.createTempDirectory("graft1098b").toString
    engine.runProcedure("export.csv", Map(
      "exportData" ->
        "select rowName() as rowName, colA, colB from myDataset2",
      "dataFileUrl" -> s"file://$dir2/out",
      "headers" -> "false", "delimiter" -> ";").get _)
    val lines2 = readLines(s"$dir2/out")
    assert(lines2.exists(_.startsWith("utf8 row;")))
    assert(!lines2.exists(_.startsWith("rowName")))
  }

  // --- MLDB-1884-timestamp-consistency.py ----------------------------------

  test("MLDB-1884: constant selects succeed (null, string, NULL LIKE)") {
    assert(q("SELECT null AS v").count() === 1)
    assert(q("SELECT 'patate' AS v").head().getString(0) === "patate")
    // tri-logic: NULL LIKE 'abc' is null, and the query succeeds
    assert(q("SELECT NULL LIKE 'abc' AS v").head().isNullAt(0))
  }

  // --- MLDB-1781-path-flattening.js ----------------------------------------

  test("MLDB-1781: replace_nan over a row flattens nested paths") {
    val r = q("SELECT replace_nan({*}, -1) AS res " +
      "FROM (select 0/0 as x, 0/0 as \"x.y\")")
    // the reference pins res.x and res.x.y both -1
    val flat = r.select(col("res").getField("x").as("a"),
      col("res").getField("x.y").as("b")).head()
    assert(flat.getDouble(0) === -1.0)
    assert(flat.getDouble(1) === -1.0)
  }

  // --- MLDB-1142-sparse-mutable-failing-with-underflow.py ------------------

  test("MLDB-1142: recording small float rows queries back cleanly") {
    val rnd = new scala.util.Random(1142)
    e.recordRows("kmeans_example_1142",
      (0 until 10).map(j =>
        s"""{"rowName":"row_$j","x":${rnd.nextInt(11) - 5}.0,""" +
          s""""y":${rnd.nextInt(11) - 5}.0}""").mkString("[", ",", "]"))
    assert(q("select * from kmeans_example_1142").count() === 10)
  }
}
