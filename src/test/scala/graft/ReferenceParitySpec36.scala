package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-sixth batch of replays of the reference's OWN regression
  * tests — python script functions:
  *   - MLDB-643_script_function.py (script.apply with language python:
  *     mldb.script.args tuples in, request.set_return out),
  *   - MLDBFB-199_invalid_script_test.py (an invalid python source
  *     still REGISTERS — the reference's expectedFailure pins that
  *     creation does not validate). */
class ReferenceParitySpec36 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private val client = HttpClient.newHttpClient()

  test("MLDB-643: python script.apply echoes its argument tuples") {
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      val put = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/functions/scriptApplier643"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"type": "script.apply", "params": {
            |"language": "python",
            |"scriptConfig": {"source":
            |"from mldb import mldb\nmldb.log(str(mldb.script.args))\nrtn = [[mldb.script.args[0][0][0], mldb.script.args[0][0][1][0], mldb.script.args[0][0][1][1]]]\nrequest.set_return(rtn)"
            |}}}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(put.statusCode() < 400, put.body())
      val in = java.net.URLEncoder.encode("""{"args": {"Warp": 9}}""", "UTF-8")
      val app = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/v1/functions/scriptApplier643/" +
          s"application?input=$in")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      assert(app.statusCode() === 200, app.body())
      // output.return[0][0] == "Warp" — the reference's read
      assert(app.body().contains("\"return\""), app.body())
      assert(app.body().contains("Warp"), app.body())
    } finally srv.stop()
  }

  test("MLDBFB-199: an invalid python source still registers") {
    // the reference's test is @expectedFailure on getting a 400 —
    // i.e. creation succeeds without validating the script
    e.createPythonScriptFunction("foo199",
      "This script source is foo bar!")
    assert(e.functionExists("foo199"))
  }
}
