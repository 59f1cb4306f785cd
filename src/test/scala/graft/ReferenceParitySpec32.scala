package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-second batch of replays of the reference's OWN regression
  * tests:
  *   - MLDB-991-svm.py (svm.train + the svm function entity over
  *     arbitrary numeric labels, kernel config accepted),
  *   - MLDB-541-record-column.js (column-oriented record routes:
  *     /columns and /multicolumns merge cells onto named rows —
  *     column-recorded datasets equal row-recorded ones),
  *   - MLDB-1750 test_real_time (the getStats realtime increment and
  *     persist routes). */
class ReferenceParitySpec32 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = {
    val df = e.query(sql)
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }
  private val client = HttpClient.newHttpClient()

  // --- MLDB-991 ---------------------------------------------------------------------

  test("MLDB-991: svm.train + svm function classify with arbitrary labels") {
    e.recordRows("svm991",
      """[{"rowName":"1","label":39,"x":0.2,"y":-0.3},
        |{"rowName":"2","label":39,"x":0.6,"y":-0.7},
        |{"rowName":"3","label":39,"x":0.9,"y":-0.4},
        |{"rowName":"4","label":72,"x":-0.2,"y":0.9},
        |{"rowName":"5","label":72,"x":-0.45,"y":0.5},
        |{"rowName":"6","label":72,"x":-0.56,"y":0.2}]""".stripMargin)
    e.runProcedure("svm.train", Map(
      "trainingData" -> "select * from svm991",
      "modelFileUrl" -> "file://tmp/MLDB-991.svm").get _)
    e.createSvmFunction("svm_function991", "file://tmp/MLDB-991.svm")
    assert(q("select svm_function991({embedding: {x: 1, y: -1}})[output] as o")
      .head().getLong(0) === 39L)
    assert(q("select svm_function991({embedding: {x: -1, y: 1}})[output] as o")
      .head().getLong(0) === 72L)
    // a kernel config is accepted (linear substitutes — divergence
    // documented in Models.svmTrain)
    e.runProcedure("svm.train", Map(
      "trainingData" -> "select * from svm991",
      "configuration" -> """{"kernel": 1}""",
      "modelFileUrl" -> "file://tmp/MLDB-991-2.svm").get _)
    e.createSvmFunction("svm_function991b", "file://tmp/MLDB-991-2.svm")
    assert(q("select svm_function991b({embedding: {x: 1, y: -1}})[output] as o")
      .head().getLong(0) === 39L)
    // REST creation + application of the svm type
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      val put = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/functions/svm991c"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"type": "svm", "params": {"modelFileUrl": "file://tmp/MLDB-991.svm"}}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(put.statusCode() < 400, put.body())
      val in = java.net.URLEncoder.encode(
        """{"embedding": {"x": -1, "y": 1}}""", "UTF-8")
      val app = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/functions/svm991c/" +
          s"application?input=$in")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      assert(app.statusCode() === 200 && app.body().contains("72"),
        app.body())
    } finally srv.stop()
  }

  // --- MLDB-541 ---------------------------------------------------------------------

  test("MLDB-541: column-recorded datasets equal row-recorded ones") {
    val srv = new api.RestServer(e)
    val port = srv.start()
    def post(path: String, body: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      // row-style reference dataset
      e.recordRows("rows541",
        """[{"rowName":"r1","a":1,"b":10},
          |{"rowName":"r2","a":2},
          |{"rowName":"r3","b":30}]""".stripMargin)
      // column-style: one POST per column onto the same rows
      e.createDatasetTyped("cols541", "sparse.mutable", _ => None)
      val (c1, b1) = post("/v1/datasets/cols541/columns",
        """{"columnName": "a", "rows": [["r1", 1, 0], ["r2", 2, 0]]}""")
      assert(c1 < 400, b1)
      val (c2, b2) = post("/v1/datasets/cols541/columns",
        """{"columnName": "b", "rows": [["r1", 10, 0], ["r3", 30, 0]]}""")
      assert(c2 < 400, b2)
      def snapshot(ds: String) = q(
        s"select rowName() as rn, a, b from $ds order by rowName()")
        .collect().map(_.toString).toSeq
      assert(snapshot("cols541") === snapshot("rows541"))
      // multicolumns: both columns in one call
      e.createDatasetTyped("multi541", "sparse.mutable", _ => None)
      val (c3, b3) = post("/v1/datasets/multi541/multicolumns",
        """[["a", [["r1", 1, 0], ["r2", 2, 0]]],
          |["b", [["r1", 10, 0], ["r3", 30, 0]]]]""".stripMargin)
      assert(c3 < 400, b3)
      assert(snapshot("multi541") === snapshot("rows541"))
    } finally srv.stop()
  }

  // --- MLDB-1750 test_real_time -------------------------------------------------------

  test("MLDB-1750: getStats realtime increment and persist") {
    e.recordRows("bid_rt1750",
      """[{"rowName":"row0","host":"patate.com","price":1,"order_":0},
        |{"rowName":"row1","host":"poil.com","price":3,"order_":1},
        |{"rowName":"row2","host":"poil.com","price":7,"order_":2}]"""
        .stripMargin)
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" -> "SELECT host FROM bid_rt1750 ORDER BY order_",
      "outcomes" -> """[["price", "price"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750-rt.dt",
      "functionName" -> "get_stats_rt",
      "statistics" -> """["last", "min", "sum"]""").get _)
    // incrementing an untrained table is the reference's error
    val ex = intercept[IllegalArgumentException](
      e.distTableIncrement("get_stats_rt",
        Seq("hosti234234" -> "pwet"), Seq(50.0)))
    assert(ex.getMessage.contains("Unknown dist table 'hosti234234'"),
      ex.getMessage)
    def stats(host: String, fn: String = "get_stats_rt"): (Double, Double, Double) = {
      val st = q(s"""select $fn({features: {host: '$host'}})[stats] as s""")
        .head().getStruct(0)
      (st.getAs[Double]("price.host.last"),
        st.getAs[Double]("price.host.min"),
        st.getAs[Double]("price.host.sum"))
    }
    // an unseen value reads the empty stats
    val s0 = stats("patate")
    assert(s0._1.isNaN && s0._2.isNaN && s0._3 === 0.0, s0.toString)
    // first increment
    e.distTableIncrement("get_stats_rt", Seq("host" -> "patate"), Seq(50.0))
    assert(stats("patate") === ((50.0, 50.0, 50.0)))
    // second increment: last follows, min stays, sum accumulates
    e.distTableIncrement("get_stats_rt", Seq("host" -> "patate"), Seq(150.0))
    assert(stats("patate") === ((150.0, 50.0, 200.0)))
    // persist under a new url; a fresh getStats reads the updates
    e.distTablePersist("get_stats_rt", "file://tmp/mldb-1750-rt-persist.dt")
    e.createDistTableGetStatsFunction("get_stats_reloaded",
      "file://tmp/mldb-1750-rt-persist.dt",
      Some(Seq("last", "min", "sum")))
    assert(stats("patate", "get_stats_reloaded") === ((150.0, 50.0, 200.0)))
    // the trained values survived alongside the live updates
    val st = q("""select get_stats_rt({features: {host: 'poil.com'}})
        [stats] as s""").head().getStruct(0)
    assert(st.getAs[Double]("price.host.sum") === 10.0, st.toString)
  }
}
