package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-fifth batch of replays of the reference's OWN regression
  * tests — feedback-ticket (MLDBFB) corners:
  *   - MLDBFB-458_jseval_exception_message.py (a thrown value's text
  *     reaches the query error),
  *   - MLDBFB-422_sql_invalid_count_issue.py (count(*) over WHERE
  *     equals the sum over GROUP BY counts, NULL group included),
  *   - MLDBFB-404-case_into_beh_test.py (colon aliases + CASE operand
  *     + `@` re-timestamp through transform),
  *   - MLDBFB-208_procedure_params_overwrite_test.py (run-body params
  *     override the stored config; the reference's unknown-dataset
  *     message),
  *   - MLDB-986-recording.py (typed {"num": "NaN"/"Inf"} cells record
  *     and do arithmetic). */
class ReferenceParitySpec35 extends AnyFunSuite {

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

  // --- MLDBFB-458 -------------------------------------------------------------------

  test("MLDBFB-458: a thrown jseval value's text reaches the error") {
    e.recordRows("ds458", """[{"rowName":"row1","x":1}]""")
    // the clean form works ({*} as the bound argument)
    val ok = q("""SELECT jseval('return {"foo": "bar"};', 'cols', {*})
        AS * FROM ds458""").head()
    assert(ok.schema.fieldNames.contains("foo"), ok.toString)
    // the throwing form carries the thrown text
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception](
      q("""SELECT jseval('throw "this query is weird";
          return {"foo": "bar"};', 'cols', {*}) AS * FROM ds458""")
        .collect())
    assert(msgs(ex).exists(_.contains("this query is weird")), ex.toString)
  }

  // --- MLDBFB-422 -------------------------------------------------------------------

  test("MLDBFB-422: WHERE counts equal grouped counts, NULL group included") {
    e.recordRows("ds422",
      """[{"rowName":"a","testConv":1,"score":10},
        |{"rowName":"b","testConv":0,"score":20},
        |{"rowName":"c","testConv":1,"score":30},
        |{"rowName":"d","score":40},
        |{"rowName":"e","score":50}]""".stripMargin)
    val direct = q(
      "SELECT count(*) as n FROM ds422 WHERE testConv IS NOT NULL")
      .head().getLong(0)
    val viaGroups = q("""SELECT sum(c) as n FROM (
        SELECT testConv, c: count(*) FROM ds422 GROUP BY testConv)
      WHERE testConv IS NOT NULL""").head().getLong(0)
    assert(direct === viaGroups && direct === 3L)
    val directNull = q(
      "SELECT count(*) as n FROM ds422 WHERE testConv IS NULL")
      .head().getLong(0)
    val nullGroup = q("""SELECT c as n FROM (
        SELECT testConv, c: count(*) FROM ds422 GROUP BY testConv)
      WHERE testConv IS NULL""").head().getLong(0)
    assert(directNull === nullGroup && directNull === 2L)
  }

  // --- MLDBFB-404 -------------------------------------------------------------------

  test("MLDBFB-404: colon alias + CASE operand + @ re-timestamp transform") {
    e.recordRows("ds404",
      """[{"rowName":"user1","behA":1},
        |{"rowName":"user2","behB":1},
        |{"rowName":"user3","behA":1,"behC":1}]""".stripMargin)
    e.runProcedure("transform", Map(
      "inputData" -> ("SELECT conv : CASE (behA AND behC) " +
        "WHEN 1 THEN 1 ELSE 0 END @ 0 FROM ds404"),
      "outputDataset" -> "conv404").get _)
    val rows = e.dataset("conv404").collect()
      .map(r => r.getAs[String]("rowName") -> r.getAs[Number]("conv").longValue)
      .toMap
    assert(rows === Map("user1" -> 0L, "user2" -> 0L, "user3" -> 1L), rows)
    // the filtered constant form too
    e.runProcedure("transform", Map(
      "inputData" -> "SELECT conv: 1 @ 0 FROM ds404 WHERE behA AND behC",
      "outputDataset" -> "conv404b").get _)
    assert(e.dataset("conv404b").count() === 1)
  }

  // --- MLDBFB-208 -------------------------------------------------------------------

  test("MLDBFB-208: run-body params override the stored config") {
    e.recordRows("ds208", """[{"rowName":"row1","colA":1}]""")
    val srv = new api.RestServer(e)
    val port = srv.start()
    def send(method: String, path: String, body: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      assert(send("PUT", "/v1/procedures/transform208",
        """{"type": "transform", "params": {
          |"inputData": "SELECT * FROM foo208",
          |"outputDataset": "bar208"}}""".stripMargin)._1 < 400)
      val (cr, br) = send("POST", "/v1/procedures/transform208/runs",
        """{"params": {"inputData": "SELECT * FROM ds208",
          |"outputDataset": "out208"}}""".stripMargin)
      assert(cr === 201, br)
      // bar208 was never created — reading it is the reference's error
      val enc = java.net.URLEncoder.encode("SELECT * FROM bar208", "UTF-8")
      val (cq, bq) = send("GET", s"/v1/query?q=$enc", "")
      assert(cq >= 400 && bq.contains("dataset entry 'bar208' doesn't exist"),
        s"$cq $bq")
      // out208 holds the transformed row
      val r = q("SELECT colA FROM out208").head()
      assert(r.getAs[Long]("colA") === 1L)
    } finally srv.stop()
  }

  // --- MLDB-986 ---------------------------------------------------------------------

  test("MLDB-986: typed num cells record NaN/Inf and do arithmetic") {
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
      e.createDatasetTyped("example986", "sparse.mutable", _ => None)
      assert(post("/v1/datasets/example986/rows",
        """{"rowName": "first row",
          |"columns": [["x", {"num": "NaN"}, 0]]}""".stripMargin)._1 < 400)
      assert(post("/v1/datasets/example986/rows",
        """{"rowName": "third row",
          |"columns": [["z", {"num": "Inf"}, 0]]}""".stripMargin)._1 < 400)
      val x = q("""select x + 1 as output from example986
          where x IS NOT null""").head().getDouble(0)
      assert(x.isNaN, x.toString)
      val z = q("""select z + 1 as output from example986
          where z IS NOT null""").head().getDouble(0)
      assert(z.isPosInfinity, z.toString)
    } finally srv.stop()
  }
}
