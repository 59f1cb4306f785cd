package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-third batch of replays of the reference's OWN regression
  * tests — REST semantics and path-cell corners:
  *   - MLDB-2063-sparse-mutable-encodeVal.py (row_dataset over
  *     space-bearing keys; CAST AS path + path_element/path_length),
  *   - MLDB-1869_json_payload_test.py (payloads with unix/dos
  *     newlines create cleanly),
  *   - MLDB-299-post-sync.js (POST /v1/datasets answers state ok),
  *   - MLDB-348-put-post-id.js (a contradicting body id is a 400;
  *     PUT/POST answer 201),
  *   - MLDB-985-create-entity-return-details.js (the createEntity
  *     procedure reports kind/config/status),
  *   - MLDB-434-beh-dataset-nulls.js (null cells round-trip). */
class ReferenceParitySpec33 extends AnyFunSuite {

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
  private def withServer(f: (Int,
      (String, String) => (Int, String),
      (String, String) => (Int, String)) => Unit): Unit = {
    val srv = new api.RestServer(e)
    val port = srv.start()
    def put(path: String, body: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def post(path: String, body: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try f(port, put, post) finally srv.stop()
  }

  // --- MLDB-2063 --------------------------------------------------------------------

  test("MLDB-2063: row_dataset keys with spaces; CAST AS path reads elements") {
    e.runProcedure("transform", Map(
      "inputData" -> ("SELECT column AS title FROM " +
        "(SELECT * FROM row_dataset({\"My Value\": 1}))"),
      "outputDataset" -> "keywords2063").get _)
    val r = q("select title from keywords2063").head()
    assert(r.getString(0) === "My Value")
    // a dotted path cast splits into elements
    e.runProcedure("transform", Map(
      "inputData" -> "SELECT CAST ('1.2.3' AS path) AS name",
      "outputDataset" -> "sparse2063").get _)
    val p = q("""SELECT path_element(name, 0) AS a,
        path_element(name, 1) AS b,
        path_element(name, 2) AS c,
        path_length(name) AS length
      FROM sparse2063""").head()
    assert(p.getString(0) === "1" && p.getString(1) === "2" &&
      p.getString(2) === "3", p.toString)
    assert(p.getAs[Number](3).longValue === 3L)
    // an all-digit single element stays ONE element
    e.runProcedure("transform", Map(
      "inputData" -> "SELECT CAST ('1123' AS path) AS name",
      "outputDataset" -> "sparse2063b").get _)
    assert(q("SELECT path_element(name, 0) AS col FROM sparse2063b")
      .head().getString(0) === "1123")
  }

  // --- MLDB-1869 / MLDB-299 / MLDB-348 -----------------------------------------------

  test("MLDB-1869/299/348: REST creation payload and id semantics") {
    withServer { (_, put, post) =>
      // clean PUT answers 201 (MLDB-348)
      assert(put("/v1/datasets/ds1869",
        """{"type" : "sparse.mutable"}""")._1 === 201)
      // unix and dos newlines in the payload are fine (MLDB-1869)
      assert(put("/v1/datasets/ds_linux1",
        "{\"type\" : \"sparse.mutable\"}\n")._1 === 201)
      assert(put("/v1/datasets/ds_linux2",
        "{\n\"type\" : \"sparse.mutable\"\n}\n")._1 === 201)
      assert(put("/v1/datasets/ds_dos1",
        "{\"type\" : \"sparse.mutable\"}\r\n")._1 === 201)
      // a body id that contradicts the path is a 400 (MLDB-348)
      val (cBad, bBad) = put("/v1/datasets/test2_348",
        """{"id": "test1_348", "type": "sparse.mutable"}""")
      assert(cBad === 400, bBad)
      // a MATCHING body id is fine
      assert(put("/v1/datasets/test5_348",
        """{"id": "test5_348", "type": "sparse.mutable"}""")._1 === 201)
      // POST without id answers 201 and state ok (MLDB-299/348)
      val (cp, bp) = post("/v1/datasets",
        """{"type": "sparse.mutable"}""")
      assert(cp === 201, bp)
      // POST with id answers 201 too
      assert(post("/v1/datasets",
        """{"id": "test3_348", "type": "sparse.mutable"}""")._1 === 201)
    }
  }

  // --- MLDB-985 ---------------------------------------------------------------------

  test("MLDB-985: createEntity reports kind, config and status") {
    val rez = e.runProcedure("createEntity", Map(
      "kind" -> "dataset",
      "type" -> "sparse.mutable",
      "id" -> "created985").get _)
    assert(rez.contains(""""kind": "dataset""""), rez)
    assert(rez.contains(""""type": "sparse.mutable""""), rez)
    assert(rez.contains(""""rowCount": 0"""), rez)
    assert(e.listDatasets.contains("created985"))
    // an unsupported kind errors clearly
    val ex = intercept[IllegalArgumentException](
      e.runProcedure("createEntity", Map(
        "kind" -> "plugin", "type" -> "javascript").get _))
    assert(ex.getMessage.contains("not supported"), ex.getMessage)
  }

  // --- MLDB-434 ---------------------------------------------------------------------

  test("MLDB-434: null cells round-trip") {
    e.recordRows("test434",
      """[{"rowName":"ex111","x":1,"y":1,"label":1},
        |{"rowName":"ex112","x":1,"y":1,"label":null}]""".stripMargin)
    val r = q("SELECT x, y, label from test434 where rowName() = 'ex112'")
      .head()
    assert(r.getAs[Long]("x") === 1L)
    assert(r.getAs[Long]("y") === 1L)
    assert(r.isNullAt(r.fieldIndex("label")), r.toString)
  }
}
