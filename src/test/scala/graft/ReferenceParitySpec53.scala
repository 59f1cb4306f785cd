package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fifty-third batch: the procedure-creation bombardment that exposed
  * the reference's rest-collection deadlock —
  *
  *   - `testing/MLDB-2120_procedure_deadlock.py` hammers the procedure
  *     collection with hundreds of async transform creations (each an
  *     ORDER BY + LIMIT/OFFSET slice of a small table) and requires
  *     every run to reach `finished` — never `error`, never a wedge.
  *     The reference's deadlock lived in rest_collection_impl under
  *     exactly this load. Our replay drives the same shape from 16
  *     client threads (concurrent PUT + async run POST + interleaved
  *     collection GETs) against the cached-thread-pool server; the
  *     inception/tensorflow scoring body is out of scope (no model
  *     assets in this environment), but the collection contention —
  *     what the ticket tests — is identical.
  */
class ReferenceParitySpec53 extends AnyFunSuite {

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

  private def req(port: Int, method: String, path: String, body: String,
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

  test("MLDB-2120: procedure-creation bombardment — every run finishes, " +
      "no deadlock, no error") {
    val e = new api.GraftEngine(spark)
    val rows = (0 until 10).map(i => s"""{"rowName": "r$i", "x": $i}""")
    e.recordRows("files", rows.mkString("[", ",", "]"))
    withServer(e) { port =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val locations =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val futs = for (it <- 0 until 12; idx <- 0 until 5) yield Future {
        val name = s"proc_${it}_$idx"
        val conf =
          s"""{"type": "transform", "params": {
            |"inputData": "SELECT x, x * 2 AS y FROM files
            | ORDER BY rowName() LIMIT 1 OFFSET $idx",
            |"outputDataset": {"id": "out_${it}_$idx",
            |  "type": "sparse.mutable"}}}"""
            .stripMargin.replace("\n", " ")
        val rp = req(port, "PUT", s"/v1/procedures/$name", conf)
        assert(rp.statusCode() === 201, rp.body())
        val rr = req(port, "POST", s"/v1/procedures/$name/runs", "{}",
          Map("async" -> "true"))
        assert(rr.statusCode() === 201, rr.body())
        locations.add(rr.headers().firstValue("Location").orElseThrow())
        // interleaved collection reads — the reference's deadlock was
        // between collection mutation and iteration
        assert(req(port, "GET", "/v1/procedures", "").statusCode() === 200)
      }
      Await.result(Future.sequence(futs), 120.seconds)
      pool.shutdown()
      assert(locations.size === 60)
      // every async run must reach finished within the deadline —
      // the reference's sleep_counter==100 "too long" guard
      val deadline = System.nanoTime() + 110L * 1000 * 1000 * 1000
      import scala.jdk.CollectionConverters._
      for (loc <- locations.asScala) {
        var done = false
        while (!done) {
          assert(System.nanoTime() < deadline,
            s"too long, $loc should be finished by now")
          val g = req(port, "GET", loc, "")
          assert(g.statusCode() === 200, s"$loc → ${g.body()}")
          val b = g.body()
          assert(!b.contains("\"state\": \"error\""),
            "there should be no error: " + b)
          if (b.contains("\"finished\"")) done = true
          else Thread.sleep(10)
        }
      }
      // spot-check the transforms actually materialized their slices
      assert(e.dataset("out_0_3").count() === 1)
      assert(e.dataset("out_11_4").count() === 1)
    }
  }
}
