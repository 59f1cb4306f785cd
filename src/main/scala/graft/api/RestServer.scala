package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal REST façade over GraftEngine, mirroring the reference's
  * `/v1` surface (`/root/reference/server/mldb_server.cc:209-228`):
  *
  *   GET  /v1/query?q=<dialect sql>&format=aos|table|soa|sparse|full|
  *        atom&headers=<bool>&limit=<n>
  *   GET  /v1/datasets                         — list
  *   GET  /v1/datasets/<name>?limit=<n>        — sample rows
  *   PUT  /v1/datasets/<name>?path=<parquet>   — register
  *   GET  /v1/functions                        — list
  *   POST /v1/procedures/transform  body: {"inputQuery": …,
  *        "outputDataset": …}                  — INSERT-INTO-SELECT
  *   POST /v1/procedures  body: {"type": …, <flat params>} — typed
  *        dispatch to every batch procedure (transform, import.text/
  *        json/xlsx/git/sqlite/sentiwordnet, export.csv, tsne.train,
  *        script.run); the reference's {type, params} config model
  *        with a flat param object
  *
  * Built on the JDK's HttpServer (zero added dependencies). Row
  * serialization uses Spark's own `toJSON` codec. This is a
  * single-node control plane — queries execute on the cluster;
  * only result rows flow through this process, capped by `limit`
  * (default 1000) exactly like the reference's REST row limits.
  */
final class RestServer(engine: GraftEngine, port: Int = 0) {

  RestServer.ensureNoDelay()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def start(): Int = {
    server.createContext("/v1/query", (ex: HttpExchange) => handle(ex) {
      val params = queryParams(ex)
      val q = params.getOrElse("q",
        throw new IllegalArgumentException("missing q parameter"))
      val limit = params.get("limit").map(_.toInt).getOrElse(1000)
      val format = params.getOrElse("format", "aos")
      val headers = params.get("headers").forall(_.toBoolean)
      formatJson(engine.query(q), limit, format, headers)
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
          queryParams(ex).get("path") match {
            case Some(p) =>
              engine.createDatasetFromParquet(name, p)
            case None =>
              // typed creation, the reference's config model:
              // body {"type": "merged"|"sampled"|"transposed"|
              // "union"|"sub"|"tabular"|"sparse.mutable", <params>}
              val body = new String(ex.getRequestBody.readAllBytes,
                StandardCharsets.UTF_8)
              val tpe = extractFieldOpt(body, "type").getOrElse("")
              engine.createDatasetTyped(name, tpe,
                k => extractFieldOpt(body, k))
          }
          s"""{"created": ${jsonStr(name)}}"""
        case ("POST", nameRows) if nameRows.endsWith("/rows") =>
          // record API (`core/dataset.h:417-539`): body = JSON array
          // of flat row objects
          val name = nameRows.stripSuffix("/rows")
          val body = new String(ex.getRequestBody.readAllBytes,
            StandardCharsets.UTF_8)
          val n = engine.recordRows(name, body)
          s"""{"recorded": $n}"""
        case (m, _) => throw new IllegalArgumentException(s"unsupported $m")
      }
    })
    server.createContext("/v1/sensors", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/sensors")
        .stripPrefix("/")
      path match {
        case "" => engine.listSensors.map(jsonStr).mkString("[", ",", "]")
        case latest if latest.endsWith("/latest") =>
          rowsJson(engine.sensorLatest(latest.stripSuffix("/latest")), 100)
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    })
    server.createContext("/v1/functions", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/functions")
        .stripPrefix("/")
      path match {
        case "" => engine.listFunctions.map(jsonStr).mkString("[", ",", "]")
        case name if ex.getRequestMethod == "PUT" && !name.contains("/") =>
          // typed creation (`PUT /v1/functions/<n> {type, params}`):
          // sql.expression → dialect macro; sql.query → $param-ized
          // per-row lookup (MLDB-784) or registration-time row
          // function (MLDB-1320) when parameterless
          val body = new String(ex.getRequestBody.readAllBytes,
            StandardCharsets.UTF_8)
          val tpe = extractField(body, "type")
          tpe match {
            case "sql.expression" =>
              engine.createSqlExpressionFunction(name,
                extractField(body, "expression"))
            case "sql.query" =>
              val q = extractField(body, "query")
              val out = extractFieldOpt(body, "output").getOrElse("FIRST_ROW")
              if (q.contains("$"))
                engine.createSqlQueryDialectFunction(name, q, out)
              else engine.createSqlQueryRowFunction(name, q, out)
            // NLP function entities (plugins/nlp) alias the dialect
            // builtins with the reference's pinned input names
            // (MLDB-1030/1126). `language` selects the Snowball
            // algorithm (english/french/german/spanish) and is
            // validated at CREATION time like the reference
            // (`nlp.cc:277` sb_stemmer_new check).
            case "stemmer" =>
              val lang = extractFieldOpt(body, "language").getOrElse("english")
              graft.functions.SnowballStemmer.validate(lang)
              engine.createSqlExpressionFunction(name,
                s"stemmer({words: words, language: '$lang'})[words] AS words")
            case "stemmerdoc" =>
              val lang = extractFieldOpt(body, "language").getOrElse("english")
              graft.functions.SnowballStemmer.validate(lang)
              engine.createSqlExpressionFunction(name,
                s"stemmerdoc({document: document, language: '$lang'})" +
                  "[document] AS document")
            case "filter_stopwords" =>
              // the reference ships an english-only stopword table and
              // rejects anything else at creation (`nlp.cc:73-76`)
              val lang = extractFieldOpt(body, "language").getOrElse("english")
              if (lang != "english") throw new IllegalArgumentException(
                s"Unsupported language: $lang")
              engine.createSqlExpressionFunction(name,
                "filter_stopwords({words: words})[words] AS words")
            case "pooling" =>
              val ds = extractField(body, "embeddingDataset")
              // extractFieldOpt flattens a JSON array to a bare comma
              // list (avg,max); rebuild a dialect array of SINGLE-quoted
              // string literals — double quotes would lex as quoted
              // identifiers and the pooling handler requires StrLits.
              val aggs = extractFieldOpt(body, "aggregators")
                .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                .getOrElse(Seq("avg"))
              val arr = aggs.map(a => s"'$a'").mkString("[", ",", "]")
              engine.createSqlExpressionFunction(name,
                s"pooling({words: words, embeddingDataset: '$ds', " +
                  s"aggregators: $arr})[embedding] AS embedding")
            case "feature_hasher" =>
              val bits = extractFieldOpt(body, "numBits").getOrElse("8")
              val mode = extractFieldOpt(body, "mode").getOrElse("columns")
              engine.createSqlExpressionFunction(name,
                s"feature_hasher({columns: columns, numBits: $bits, " +
                  s"mode: '$mode'})[hash] AS hash")
            case other => throw new IllegalArgumentException(
              s"unknown function type '$other'")
          }
          s"""{"created": ${jsonStr(name)}}"""
        case app if app.endsWith("/application") =>
          // single-row function application
          // (`server/mldb_server.cc` application route)
          val name = app.stripSuffix("/application")
          val input = queryParams(ex).getOrElse("input",
            throw new IllegalArgumentException("missing input parameter"))
          // rows come straight from the compiled projection (no
          // Dataset, no planning) — the thousands-of-calls/s path
          val (schema, rows) = engine.applyFunctionJsonRows(name, input)
          rows.iterator.map(r => structJson(r, schema))
            .mkString("[", ",", "]")
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    })
    server.createContext("/v1/plugins", (ex: HttpExchange) => handle(ex) {
      // the fifth entity kind (core/mldb_entity.h): named script +
      // custom routes. PUT registers (compiles — bad code → 400),
      // GET lists/statuses, DELETE unloads,
      // GET <name>/routes/<path>?… dispatches to the plugin handler.
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/plugins")
        .stripPrefix("/")
      (ex.getRequestMethod, path) match {
        case ("GET", "") =>
          engine.listPlugins.map(jsonStr).mkString("[", ",", "]")
        case ("PUT", name) if !name.contains("/") =>
          val body = new String(ex.getRequestBody.readAllBytes,
            StandardCharsets.UTF_8)
          // the script toolbox signals compile failures as a bare
          // Throwable (ToolBoxError), not an Exception — surface as 400
          try engine.createPlugin(name, extractField(body, "source"),
            extractFieldOpt(body, "language").getOrElse("scala"))
          catch {
            case e: IllegalArgumentException => throw e
            case e: Throwable => throw new IllegalArgumentException(
              s"plugin did not compile: ${e.getMessage}")
          }
          s"""{"created": ${jsonStr(name)}}"""
        case ("DELETE", name) if !name.contains("/") =>
          engine.deletePlugin(name)
          s"""{"deleted": ${jsonStr(name)}}"""
        case ("GET", name) if !name.contains("/") =>
          if (!engine.listPlugins.contains(name))
            throw new NoSuchElementException(s"plugin '$name' not found")
          s"""{"name": ${jsonStr(name)}, "state": "loaded"}"""
        case ("GET", routed) if routed.contains("/routes/") =>
          val Array(name, route) = routed.split("/routes/", 2)
          engine.pluginRoute(name, route, queryParams(ex)) match {
            // any Dataset (typed or Row) renders as rows — a script's
            // s.range(n) without .toDF must not ClassCast
            case ds: org.apache.spark.sql.Dataset[_] => rowsJson(ds.toDF(), 100)
            case raw: RawJson => raw.json
            case s: String => jsonStr(s)
            case n: (java.lang.Number) => n.toString
            case b: java.lang.Boolean => b.toString
            case null => "null"
            case other => jsonStr(String.valueOf(other))
          }
        case (m, p) => throw new IllegalArgumentException(s"unsupported $m /$p")
      }
    })
    server.createContext("/v1/procedures/transform", (ex: HttpExchange) => handle(ex) {
      val path = ex.getRequestURI.getPath
        .stripPrefix("/v1/procedures/transform").stripPrefix("/")
      (ex.getRequestMethod, path) match {
        case ("POST", "") =>
          val body = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
          // tiny fixed-shape body parse (no JSON lib): "inputQuery" and
          // "outputDataset" string fields
          val input = extractField(body, "inputQuery")
          val outName = extractField(body, "outputDataset")
          val out = engine.runTransform(input, outName)
          s"""{"outputDataset": ${jsonStr(outName)}, "rowCount": ${out.count()}}"""
        case ("POST", "runs") =>
          // async run: returns immediately with a pollable run id
          val body = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
          val input = extractField(body, "inputQuery")
          val outName = extractField(body, "outputDataset")
          val id = engine.startTransformRun(input, outName)
          s"""{"runId": ${jsonStr(id)}, "state": "executing"}"""
        case ("GET", runPath) if runPath.startsWith("runs/") =>
          val run = engine.runStatus(runPath.stripPrefix("runs/"))
          val err = run.error.map(e => s""", "error": ${jsonStr(e)}""").getOrElse("")
          s"""{"runId": ${jsonStr(run.id)}, "state": ${jsonStr(run.state)}, "rowCount": ${run.rowCount}$err}"""
        case (m, p) => throw new IllegalArgumentException(s"unsupported $m /$p")
      }
    })
    server.createContext("/v1/procedures", (ex: HttpExchange) => handle(ex) {
      // typed procedure dispatch: POST /v1/procedures
      // body {"type": "...", <flat params>} — longer-prefix contexts
      // (/v1/procedures/transform) keep their dedicated routes
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/procedures")
      (ex.getRequestMethod, path) match {
        case ("POST", "" | "/") =>
          val body = new String(ex.getRequestBody.readAllBytes, StandardCharsets.UTF_8)
          val tpe = extractField(body, "type")
          engine.runProcedure(tpe, k => extractFieldOpt(body, k))
        case (m, p) => throw new IllegalArgumentException(s"unsupported $m /$p")
      }
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  /** The reference's query output formats
    * (`doc/builtin/sql/QueryAPI.md:7-28`): `aos` (array of objects,
    * the default here), `table` (positional arrays with an optional
    * header row), `soa` (one array per column), `sparse` (rows as
    * [column, value] pair arrays), `atom` (single cell or 400).
    * `full` serves the sparse shape: this engine's wide mode has no
    * per-cell timestamps to add (documented divergence — rowName /
    * rowHash are ordinary columns in the typed data model, so the
    * reference's `_rowName`/`_rowHash` implicit columns are expressed
    * in the query itself). NaN/Inf follow the reference's cell
    * conventions: `{"num": "NaN"}` everywhere except `table`, which
    * stringifies. */
  private def formatJson(df0: org.apache.spark.sql.DataFrame, limit: Int,
      format: String, headers: Boolean): String = {
    // the reference's row-oriented formats see nested rows FLATTENED
    // to dotted columns (`y.x` — MLDB-668/832, `x() AS *` in
    // MLDB-1315 yields columns `output.a`, `output.b`): the typed
    // engine keeps struct columns internally, so the format layer —
    // and only it — unnests them for table/sparse consumers
    val df = format match {
      case "table" | "sparse" | "full" => flattenStructs(df0)
      case _ => df0
    }
    val schema = df.schema
    val rows = df.take(limit)
    def cell(r: org.apache.spark.sql.Row, i: Int, table: Boolean): String =
      if (r.isNullAt(i)) "null"
      else valueJsonFmt(r.get(i), schema.fields(i).dataType, table)
    format match {
      case "aos" =>
        rows.iterator.map(r => structJson(r, schema)).mkString("[", ",", "]")
      case "table" =>
        val header = if (headers)
          Seq(schema.fields.map(f => jsonStr(f.name)).mkString("[", ",", "]"))
        else Seq.empty
        (header ++ rows.iterator.map(r =>
          schema.fields.indices.map(cell(r, _, table = true))
            .mkString("[", ",", "]"))).mkString("[", ",", "]")
      case "soa" =>
        schema.fields.indices.map { i =>
          s"${jsonStr(schema.fields(i).name)}:${
            rows.iterator.map(cell(_, i, table = false)).mkString("[", ",", "]")}"
        }.mkString("{", ",", "}")
      case "sparse" | "full" =>
        rows.iterator.map(r =>
          schema.fields.indices.filterNot(r.isNullAt).map { i =>
            s"[${jsonStr(schema.fields(i).name)},${cell(r, i, table = false)}]"
          }.mkString("[", ",", "]")).mkString("[", ",", "]")
      case "atom" =>
        if (rows.length != 1 || schema.fields.length != 1)
          throw new IllegalArgumentException(
            s"format=atom needs exactly one row and one column, got ${
              rows.length} rows x ${schema.fields.length} cols")
        cell(rows(0), 0, table = false)
      case other =>
        throw new IllegalArgumentException(s"unknown format $other")
    }
  }

  /** Struct columns → dotted leaf columns, recursively (plan-time
    * rename only — no data movement). */
  private def flattenStructs(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.StructType
    def leaves(prefix: String, c: org.apache.spark.sql.Column,
        dt: org.apache.spark.sql.types.DataType): Seq[org.apache.spark.sql.Column] =
      dt match {
        case st: StructType => st.fields.toSeq.flatMap(f =>
          leaves(s"$prefix.${f.name}", c.getField(f.name), f.dataType))
        case _ => Seq(c.as(prefix))
      }
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[StructType])) df
    else df.select(df.schema.fields.toSeq.flatMap(f =>
      leaves(f.name, df.col(s"`${f.name}`"), f.dataType)): _*)
  }

  /** valueJson plus the reference's non-finite-number convention. */
  private def valueJsonFmt(v: Any, dt: org.apache.spark.sql.types.DataType,
      table: Boolean): String = {
    val nonFinite = v match {
      case d: Double if d.isNaN || d.isInfinite =>
        Some(if (d.isNaN) "NaN" else if (d > 0) "Inf" else "-Inf")
      case f: Float if f.isNaN || f.isInfinite =>
        Some(if (f.isNaN) "NaN" else if (f > 0) "Inf" else "-Inf")
      case _ => None
    }
    nonFinite match {
      case Some(s) => if (table) jsonStr(s) else s"""{"num":${jsonStr(s)}}"""
      case None => valueJson(v, dt)
    }
  }

  /** Render rows to JSON on the DRIVER (null fields omitted, matching
    * Spark's toJSON). `take` on a fully-local plan (the single-row
    * function-application route after ConvertToLocalRelation) executes
    * with zero Spark jobs — `toJSON.collect()` here forced a
    * mapPartitions job per call, capping scoring at ~40 calls/s where
    * the reference claims thousands. */
  private def rowsJson(df: org.apache.spark.sql.DataFrame, limit: Int): String = {
    val schema = df.schema
    df.take(limit).iterator.map(r => structJson(r, schema)).mkString("[", ",", "]")
  }

  private def structJson(r: org.apache.spark.sql.Row,
      st: org.apache.spark.sql.types.StructType): String =
    st.fields.indices.filterNot(r.isNullAt).map { i =>
      s"${jsonStr(st.fields(i).name)}:${valueJson(r.get(i), st.fields(i).dataType)}"
    }.mkString("{", ",", "}")

  private def valueJson(v: Any,
      dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => jsonStr(v.toString)
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType | _: DecimalType => v.toString
      case TimestampType | TimestampNTZType =>
        jsonStr(v.toString.replace(' ', 'T'))
      case DateType => jsonStr(v.toString)
      case BinaryType => jsonStr(java.util.Base64.getEncoder
        .encodeToString(v.asInstanceOf[Array[Byte]]))
      case ArrayType(et, _) => v.asInstanceOf[scala.collection.Seq[_]]
        .map(e => if (e == null) "null" else valueJson(e, et))
        .mkString("[", ",", "]")
      case st: StructType => structJson(v.asInstanceOf[org.apache.spark.sql.Row], st)
      case MapType(_, vt, _) => v.asInstanceOf[scala.collection.Map[_, _]]
        .map { case (k, mv) =>
          s"${jsonStr(String.valueOf(k))}:${
            if (mv == null) "null" else valueJson(mv, vt)}"
        }.mkString("{", ",", "}")
      case _ => jsonStr(String.valueOf(v))
    }
  }

  private def handle(ex: HttpExchange)(body: => String): Unit = {
    val (code, payload) =
      try (200, body)
      catch {
        case e: IllegalArgumentException => (400, errJson(e))
        case e: NoSuchElementException => (404, errJson(e))
        // Throwable, not Exception: a handler error that escapes here
        // (e.g. a scripting ToolBoxError) would otherwise close the
        // connection with no response at all
        case e: Throwable => (500, errJson(e))
      }
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def errJson(e: Throwable): String =
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
  private def extractField(body: String, field: String): String =
    extractFieldOpt(body, field).getOrElse(
      throw new IllegalArgumentException(s"missing field $field"))

  private def extractFieldOpt(body: String, field: String): Option[String] = {
    val re = ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(body).map(_.group(1)
        .replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\"))
      .orElse { // numeric / boolean scalar: "rows": 10
        val scal = ("\"" + field + "\"\\s*:\\s*(-?[0-9.eE+]+|true|false)").r
        scal.findFirstMatchIn(body).map(_.group(1))
      }
      .orElse { // {"id": "x"} object form: "dataset": {"id": "toy"}
        val obj = ("\"" + field +
          "\"\\s*:\\s*\\{[^}]*\"id\"\\s*:\\s*\"([^\"]+)\"").r
        obj.findFirstMatchIn(body).map(_.group(1))
      }
      .orElse { // array form → comma list; elements may be bare
        // strings or {"id": …} objects ("datasets": [{"id": "a"}, …])
        val arr = ("\"" + field + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
        arr.findFirstMatchIn(body).map { m =>
          val inner = m.group(1)
          val ids = "\"id\"\\s*:\\s*\"([^\"]+)\"".r
            .findAllMatchIn(inner).map(_.group(1)).toSeq
          if (ids.nonEmpty) ids.mkString(",")
          else "\"([^\"]*)\"".r.findAllMatchIn(inner)
            .map(_.group(1)).mkString(",")
        }
      }
  }
}

object RestServer {
  /** TCP_NODELAY on the JDK HttpServer's sockets. Without it, small
    * keep-alive responses interleave Nagle with the peer's delayed
    * ACK and every scoring round-trip stalls ~40 ms (23 calls/s
    * instead of ~1,000). The property is read once when
    * sun.net.httpserver.ServerConfig class-loads, so it must be set
    * before the first HttpServer.create in the process. */
  private lazy val ensured: Unit = {
    if (System.getProperty("sun.net.httpserver.nodelay") == null)
      System.setProperty("sun.net.httpserver.nodelay", "true")
  }
  private[api] def ensureNoDelay(): Unit = ensured
}
