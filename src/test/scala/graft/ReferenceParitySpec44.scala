package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Forty-fourth batch: the multiple-prediction cookbook example —
  * `testing/MLDB-2022-multiple-prediction-example.js` (named
  * explicitly by the r9/r10 verdicts) —
  *
  *   - a `prepared: true, raw: true, autoInput: true` sql.expression
  *     applied over a JSON ARRAY via `GET /v1/functions/<n>/batch`
  *     (`builtin/sql_functions.cc` SqlExpressionFunction batch route)
  *   - a sql.query NAMED_COLUMNS over `row_dataset($input)` composed
  *     inside another sql.expression and applied with
  *     `outputFormat=json` (bare values, integer-named columns → array)
  *   - a JS plugin that serves `/predict` through
  *     `plugin.setRequestHandler(handleRequest)`, scoring each row via
  *     `mldb.createFunction({type: 'sql.expression', …}).callJson(row)`
  *     — params reach the handler as the reference's [name, value]
  *     pair array.
  */
class ReferenceParitySpec44 extends AnyFunSuite {

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
    }
    client.send(r, HttpResponse.BodyHandlers.ofString())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  /** Parse a JSON body into comparable Scala values via the JS host
    * (numbers all become Double, like the reference's JS asserts). */
  private def parsed(json: String): Any = {
    import graft.js.JsInterp._
    def conv(v: JsVal): Any = v match {
      case JsNull | JsUndef => null
      case JsBool(b) => b
      case JsNum(n) => n
      case JsStr(s) => s
      case a: JsArrV => a.elems.toList.map(conv)
      case o: JsObjV => o.fields.map { case (k, v2) => k -> conv(v2) }.toMap
      case other => toStr(other)
    }
    conv(eval("(" + json + ")"))
  }

  test("MLDB-2022: raw+autoInput sql.expression scores a /batch array") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r1 = req(port, "PUT", "/v1/functions/score_one",
        """{"type": "sql.expression", "params": {
          |  "expression": "horizontal_sum(input) AS result",
          |  "prepared": true, "raw": true, "autoInput": true}}""".stripMargin)
      assert(r1.statusCode() === 200 || r1.statusCode() === 201, r1.body())

      val res = req(port, "GET", s"/v1/functions/score_one/batch?input=" +
        enc("[[1,2,3],[4,5],[6],[]]"))
      assert(res.statusCode() === 200, res.body())
      assert(parsed(res.body()) === List(6.0, 9.0, 6.0, 0.0), res.body())
    }
  }

  test("MLDB-2022: NAMED_COLUMNS row_dataset composition, outputFormat=json") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      val r1 = req(port, "PUT", "/v1/functions/score_many",
        """{"type": "sql.query", "params": {
          |  "query": "select horizontal_sum(value) as value, column FROM row_dataset($input)",
          |  "output": "NAMED_COLUMNS"}}""".stripMargin)
      assert(r1.statusCode() === 200 || r1.statusCode() === 201, r1.body())

      val r2 = req(port, "PUT", "/v1/functions/scorer",
        """{"type": "sql.expression", "params": {
          |  "expression": "score_many({input: rowsToScore})[output] AS *",
          |  "prepared": true}}""".stripMargin)
      assert(r2.statusCode() === 200 || r2.statusCode() === 201, r2.body())

      val input = """{"rowsToScore": [{"x": 1, "y": 2}, {"a": 2, "b": 3, "c": 4}]}"""
      val res = req(port, "GET", s"/v1/functions/scorer/application?" +
        s"input=${enc(input)}&outputFormat=json")
      assert(res.statusCode() === 200, res.body())
      assert(parsed(res.body()) === List(3.0, 9.0), res.body())
    }
  }

  test("MLDB-2022: JS plugin /predict route via setRequestHandler + callJson") {
    val e = new api.GraftEngine(spark)
    withServer(e) { port =>
      // the reference test's plugin source, verbatim
      val functionSource =
        """
          |var fnconfig = {
          |    type: "sql.expression",
          |    params: {
          |        expression: "horizontal_sum({*}) AS result",
          |        prepared: true
          |   }
          |};
          |var predictfn = mldb.createFunction(fnconfig);
          |
          |function handleRequest(relpath, verb, resource, params, payload, contentType, contentLength,
          |                       headers)
          |{
          |    if (verb == "GET" && relpath == "/predict") {
          |        mldb.log(params);
          |        if (params[0][0] != "rowsToScore")
          |            throw "Unknown parameter name " + params[0][0];
          |        var allParams = JSON.parse(params[0][1]);
          |        for (p in allParams) {
          |            allParams[p] = predictfn.callJson(allParams[p])['result'];
          |        }
          |        return allParams;
          |    }
          |    throw "Unknown route " + verb + " " + relpath;
          |}
          |
          |plugin.setRequestHandler(handleRequest);
          |""".stripMargin
      val esc = functionSource.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      val r1 = req(port, "PUT", "/v1/plugins/myapi",
        s"""{"type": "javascript", "params": {"source": "$esc",
           | "language": "javascript"}}""".stripMargin)
      assert(r1.statusCode() === 200 || r1.statusCode() === 201, r1.body())

      val rows = """[{"x": 1, "y": 2}, {"a": 2, "b": 3, "c": 4}]"""
      val res = req(port, "GET",
        s"/v1/plugins/myapi/routes/predict?rowsToScore=${enc(rows)}")
      assert(res.statusCode() === 200, res.body())
      assert(parsed(res.body()) === List(3.0, 9.0), res.body())
      // unknown route: the handler's throw surfaces as an error
      val bad = req(port, "GET", "/v1/plugins/myapi/routes/nope?x=1")
      assert(bad.statusCode() >= 400, bad.body())
    }
  }
}
