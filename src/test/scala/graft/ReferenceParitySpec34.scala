package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Thirty-fourth batch of replays of the reference's OWN regression
  * tests:
  *   - MLDB-40-sparse-continuous-svd.js (svd over rows with MISSING
  *     cells — 6 row embeddings, 2 column embeddings),
  *   - MLDB-326-put-post-training-ids.js (the null procedure and the
  *     run-id PUT/POST semantics). */
class ReferenceParitySpec34 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private val client = HttpClient.newHttpClient()

  test("MLDB-40: svd over rows with missing cells") {
    e.recordRows("test40",
      """[{"rowName":"ex0","x":0,"y":0},
        |{"rowName":"ex1","x":1,"y":1},
        |{"rowName":"ex2","x":2,"y":2},
        |{"rowName":"ex3","x":3},
        |{"rowName":"ex4","x":4,"y":4},
        |{"rowName":"ex5","x":5,"y":5}]""".stripMargin)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from test40",
      "rowOutputDataset" -> "svdRowOutput40",
      "columnOutputDataset" -> "svdColOutput40",
      "modelFileUrl" -> "file://tmp/MLDB-40.svd").get _)
    assert(e.dataset("svdRowOutput40").count() === 6)
    assert(e.dataset("svdColOutput40").count() === 2)
  }

  test("MLDB-326: null procedure and run-id semantics") {
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
      assert(send("PUT", "/v1/procedures/null326",
        """{"type": "null"}""")._1 === 201)
      // PUT without a run name is the reference's 404
      assert(send("PUT", "/v1/procedures/null326/runs", "{}")._1 === 404)
      // PUT with a run name works
      assert(send("PUT", "/v1/procedures/null326/runs/test5", "{}")._1
        === 201)
      // a contradicting body id is a 400
      val (cBad, bBad) = send("PUT", "/v1/procedures/null326/runs/test2",
        """{"id": "test1"}""")
      assert(cBad === 400, bBad)
      // POST with and without an id both work
      assert(send("POST", "/v1/procedures/null326/runs", "{}")._1 === 201)
      assert(send("POST", "/v1/procedures/null326/runs",
        """{"id": "test3"}""")._1 === 201)
    } finally srv.stop()
  }
}
