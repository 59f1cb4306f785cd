package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-eighth batch of replays of the reference's OWN regression
  * tests:
  *   - MLDB-558-python-unicode.py (UTF-8 entity ids over REST, both
  *     percent-escaped and raw),
  *   - MLDB-153_pyscript_state_pollution.py (two python scripts never
  *     share interpreter state). */
class ReferenceParitySpec38 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private val client = HttpClient.newHttpClient()

  test("MLDB-558: UTF-8 dataset ids round-trip over REST") {
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      val id = "épluche"
      val enc = java.net.URLEncoder.encode(id, "UTF-8")
      val put = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/datasets/$enc"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"type": "sparse.mutable"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(put.statusCode() === 201, put.body())
      assert(e.listDatasets.contains(id), e.listDatasets)
      // percent-escaped GET answers the id
      val got = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/datasets/$enc"))
        .GET.build(), HttpResponse.BodyHandlers.ofString())
      assert(got.statusCode() === 200, got.body())
      assert(got.body().contains(id), got.body())
      // the id queries through the dialect too (quoted)
      e.recordRows(id, """[{"rowName":"r1","x":1}]""")
      assert(e.query(s"""select x from "$id"""").count() === 1)
    } finally srv.stop()
  }

  test("MLDB-153: python scripts do not share interpreter state") {
    // the first script defines test1/test2 at module scope
    val first = graft.api.PyBridge.run(spark, _ => fail("no tables"),
      """def test1():
        |    return "one"
        |def test2():
        |    return test1()
        |print('["' + test2() + '"]')""".stripMargin)
    assert(first.returnJson.exists(_.contains("one")), first.toString)
    // the second script must NOT see them (the reference runs each
    // script in a fresh interpreter context)
    val second = graft.api.PyBridge.run(spark, _ => fail("no tables"),
      """try:
        |    test1()
        |    print('["polluted"]')
        |except NameError:
        |    print('["clean"]')""".stripMargin)
    assert(second.returnJson.exists(_.contains("clean")), second.toString)
  }
}
