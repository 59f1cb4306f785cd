package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal REST façade over GraftEngine, mirroring the reference's
  * `/v1` surface (`/root/reference/server/mldb_server.cc:209-228`):
  *
  *   GET  /v1/query?q=<dialect sql>&format=json&limit=<n>
  *   GET  /v1/datasets                         — list
  *   GET  /v1/datasets/<name>?limit=<n>        — sample rows
  *   PUT  /v1/datasets/<name>?path=<parquet>   — register
  *   GET  /v1/functions                        — list
  *   POST /v1/procedures/transform  body: {"inputQuery": …,
  *        "outputDataset": …}                  — INSERT-INTO-SELECT
  *
  * Built on the JDK's HttpServer (zero added dependencies). Row
  * serialization uses Spark's own `toJSON` codec. This is a
  * single-node control plane — queries execute on the cluster;
  * only result rows flow through this process, capped by `limit`
  * (default 1000) exactly like the reference's REST row limits.
  */
final class RestServer(engine: GraftEngine, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def start(): Int = {
    server.createContext("/v1/query", (ex: HttpExchange) => handle(ex) {
      val params = queryParams(ex)
      val q = params.getOrElse("q",
        throw new IllegalArgumentException("missing q parameter"))
      val limit = params.get("limit").map(_.toInt).getOrElse(1000)
      rowsJson(engine.query(q), limit)
    })
    server.createContext("/v1/datasets", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/datasets")
        .stripPrefix("/")
      (ex.getRequestMethod, path) match {
        case ("GET", "") =>
          engine.listDatasets.map(jsonStr).mkString("[", ",", "]")
        case ("GET", name) =>
          val limit = queryParams(ex).get("limit").map(_.toInt).getOrElse(100)
          rowsJson(engine.dataset(name), limit)
        case ("PUT", name) =>
          val p = queryParams(ex).getOrElse("path",
            throw new IllegalArgumentException("missing path parameter"))
          engine.createDatasetFromParquet(name, p)
          s"""{"created": ${jsonStr(name)}}"""
        case (m, _) => throw new IllegalArgumentException(s"unsupported $m")
      }
    })
    server.createContext("/v1/functions", (ex: HttpExchange) => handle(ex) {
      engine.listFunctions.map(jsonStr).mkString("[", ",", "]")
    })
    server.createContext("/v1/procedures/transform", (ex: HttpExchange) => handle(ex) {
      val body = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
      // tiny fixed-shape body parse (no JSON lib): "inputQuery" and
      // "outputDataset" string fields
      val input = extractField(body, "inputQuery")
      val outName = extractField(body, "outputDataset")
      val out = engine.runTransform(input, outName)
      s"""{"outputDataset": ${jsonStr(outName)}, "rowCount": ${out.count()}}"""
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def rowsJson(df: org.apache.spark.sql.DataFrame, limit: Int): String =
    df.limit(limit).toJSON.collect().mkString("[", ",", "]")

  private def handle(ex: HttpExchange)(body: => String): Unit = {
    val (code, payload) =
      try (200, body)
      catch {
        case e: IllegalArgumentException => (400, errJson(e))
        case e: NoSuchElementException => (404, errJson(e))
        case e: Exception => (500, errJson(e))
      }
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def errJson(e: Exception): String =
    s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}"""

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def queryParams(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
  }

  /** extract "field": "value" (with escaped quotes) from a flat JSON body. */
  private def extractField(body: String, field: String): String = {
    val re = ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(body) match {
      case Some(m) => m.group(1)
        .replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\")
      case None => throw new IllegalArgumentException(s"missing field $field")
    }
  }
}
