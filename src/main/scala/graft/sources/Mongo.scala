package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MongoDB import without a driver: OP_MSG (opcode 2013) framing plus
  * a minimal BSON codec, pure JVM — closing the reference's
  * `mongodb.import` surface (`plugins/mongodb/mongo_import.cc:228`;
  * there: the C++ driver behind a plugin, here: the wire format
  * itself, since the environment ships no client library).
  *
  * Documents are schemaless, so the Spark-first route to a typed
  * DataFrame is: decode BSON → canonical JSON lines → let
  * `spark.read.json` infer (ObjectId → hex string, datetime → ISO
  * instant, int32/64 → long, double, bool, nested docs/arrays
  * preserved — the same flattening fidelity the reference's cell
  * import keeps). Pass `schema` to pin types instead of inferring.
  *
  * Scale shape: with `partitionField` (numeric), each Spark task runs
  * its own `find` carrying a disjoint `{field: {$mod: [n, i]}}`
  * filter and drains its own cursor (`getMore` loop) — rows stream
  * executor-side; the driver only issues the schema-inference pass.
  *
  * Auth: none (the reference's mongo plugin likewise targets
  * uriConnectionScheme deployments; SCRAM would need SASL).
  */
object Mongo {

  final case class MongoConfig(host: String, port: Int = 27017)

  // ---- BSON encode (documents we SEND: find/getMore commands) -----------

  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  /** Typed wrappers so the encoder (and the spec's mock server) can
    * emit the non-JSON BSON types. */
  private[graft] final case class ObjId(hex: String)
  private[graft] final case class Dt(millis: Long)
  private[graft] case object BNull

  /** Encode a small command document. Values: String, Int, Long,
    * Double, Boolean, Seq[_] (array), Map[String, _] (subdocument),
    * ObjId, Dt, BNull. */
  private[graft] def bsonDoc(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    fields.foreach { case (k, v) => putElem(body, k, v) }
    val total = 4 + body.size() + 1
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(body.toByteArray)
    out.put(0.toByte)
    out.array()
  }

  private def putElem(o: ByteArrayOutputStream, k: String, v: Any): Unit = {
    def le32(x: Int) = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(x).array()
    def le64(x: Long) = ByteBuffer.allocate(8)
      .order(ByteOrder.LITTLE_ENDIAN).putLong(x).array()
    v match {
      case s: String =>
        o.write(0x02); o.write(cstr(k))
        val b = s.getBytes(StandardCharsets.UTF_8)
        o.write(le32(b.length + 1)); o.write(b); o.write(0)
      case i: Int =>
        o.write(0x10); o.write(cstr(k)); o.write(le32(i))
      case l: Long =>
        o.write(0x12); o.write(cstr(k)); o.write(le64(l))
      case d: Double =>
        o.write(0x01); o.write(cstr(k))
        o.write(le64(java.lang.Double.doubleToLongBits(d)))
      case b: Boolean =>
        o.write(0x08); o.write(cstr(k)); o.write(if (b) 1 else 0)
      case m: Map[_, _] =>
        o.write(0x03); o.write(cstr(k))
        o.write(bsonDoc(m.toSeq.map { case (kk, vv) => (kk.toString, vv) }))
      case xs: Seq[_] =>
        o.write(0x04); o.write(cstr(k))
        o.write(bsonDoc(xs.zipWithIndex.map { case (x, i) => (i.toString, x) }))
      case ObjId(hex) =>
        o.write(0x07); o.write(cstr(k))
        o.write(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      case Dt(ms) =>
        o.write(0x09); o.write(cstr(k)); o.write(le64(ms))
      case BNull =>
        o.write(0x0A); o.write(cstr(k))
      case other => throw new IllegalArgumentException(
        s"unsupported BSON command value: $other")
    }
  }

  // ---- BSON decode (documents we RECEIVE) → canonical JSON --------------

  /** Decode one BSON document starting at `buf.position()` into a
    * canonical JSON object string; leaves the buffer past the doc. */
  private[graft] def bsonToJson(buf: ByteBuffer): String = {
    val start = buf.position()
    val len = buf.getInt(start)
    val sb = new StringBuilder("{")
    buf.position(start + 4)
    var first = true
    var done = false
    while (!done) {
      val tpe = buf.get()
      if (tpe == 0) done = true
      else {
        val key = readCstr(buf)
        if (!first) sb.append(',')
        first = false
        sb.append(jsonStr(key)).append(':').append(readValueJson(buf, tpe))
      }
    }
    buf.position(start + len)
    sb.append('}').toString
  }

  private def readCstr(buf: ByteBuffer): String = {
    val sb = new ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  /** Walks an embedded BSON document and returns its `errmsg` string
    * field, leaving the buffer positioned past the document. Decoding
    * straight off the wire (not a regex over re-serialized JSON) keeps
    * messages with escaped quotes/backslashes intact. */
  private def readDocErrmsg(buf: ByteBuffer): Option[String] = {
    val dStart = buf.position()
    val dLen = buf.getInt(dStart)
    buf.position(dStart + 4)
    var res: Option[String] = None
    var done = false
    while (!done) {
      val t = buf.get()
      if (t == 0) done = true
      else {
        val name = readCstr(buf)
        if (name == "errmsg" && t == 0x02) {
          val sl = buf.getInt
          val b = new Array[Byte](sl - 1); buf.get(b); buf.get()
          res = Some(new String(b, StandardCharsets.UTF_8))
        } else skipValue(buf, t)
      }
    }
    buf.position(dStart + dLen)
    res
  }

  private def readValueJson(buf: ByteBuffer, tpe: Byte): String = tpe match {
    case 0x01 =>
      val d = java.lang.Double.longBitsToDouble(buf.getLong)
      if (d.isNaN || d.isInfinite) jsonStr(d.toString) else d.toString
    case 0x02 =>
      val len = buf.getInt
      val b = new Array[Byte](len - 1); buf.get(b); buf.get() // NUL
      jsonStr(new String(b, StandardCharsets.UTF_8))
    case 0x03 => bsonToJson(buf)
    case 0x04 =>
      // arrays are documents keyed "0","1",…; re-render as JSON array
      val inner = bsonToJson(buf)
      arrayFromDocJson(inner)
    case 0x05 => // binary: subtype byte + payload → base64 string
      val len = buf.getInt; buf.get()
      val b = new Array[Byte](len); buf.get(b)
      jsonStr(java.util.Base64.getEncoder.encodeToString(b))
    case 0x07 => // ObjectId: 12 bytes → hex
      val b = new Array[Byte](12); buf.get(b)
      jsonStr(b.map(x => f"$x%02x").mkString)
    case 0x08 => if (buf.get() == 0) "false" else "true"
    case 0x09 => // UTC datetime millis → ISO instant
      jsonStr(java.time.Instant.ofEpochMilli(buf.getLong).toString)
    case 0x0A => "null"
    case 0x10 => buf.getInt.toString
    case 0x11 => java.lang.Long.toUnsignedString(buf.getLong) // ts
    case 0x12 => buf.getLong.toString
    case other => throw new IllegalArgumentException(
      f"unsupported BSON type 0x$other%02x")
  }

  /** {"0":a,"1":b,…} → [a,b,…] without reparsing values: split at the
    * top level of the rendered doc. */
  private def arrayFromDocJson(doc: String): String = {
    val sb = new StringBuilder("[")
    var depth = 0
    var inStr = false
    var esc = false
    var valueStart = -1
    var first = true
    var i = 1 // skip '{'
    while (i < doc.length - 1) {
      val c = doc.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ':' if depth == 0 && valueStart < 0 => valueStart = i + 1
        case ',' if depth == 0 =>
          if (!first) sb.append(',')
          // defensive: valueStart >= 0 here for well-formed docs
          sb.append(doc.substring(math.max(valueStart, 0), i)); first = false
          valueStart = -1
        case _ =>
      }
      i += 1
    }
    if (valueStart >= 0) {
      if (!first) sb.append(',')
      sb.append(doc.substring(valueStart, doc.length - 1))
    }
    sb.append(']').toString
  }

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

  // ---- OP_MSG framing ----------------------------------------------------

  private final class Conn(cfg: MongoConfig) extends AutoCloseable {
    private val sock = new Socket(cfg.host, cfg.port)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = sock.getOutputStream
    private var reqId = 0

    /** Send one command document as OP_MSG, return the reply doc. */
    def command(doc: Array[Byte]): ByteBuffer = {
      reqId += 1
      val total = 16 + 4 + 1 + doc.length
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(total).putInt(reqId).putInt(0).putInt(2013)
      b.putInt(0)          // flagBits
      b.put(0.toByte)      // section kind 0: single body document
      b.put(doc)
      out.write(b.array()); out.flush()
      // reply: same framing
      val hdr = new Array[Byte](16)
      in.readFully(hdr)
      val h = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
      val len = h.getInt(0)
      val op = h.getInt(12)
      require(op == 2013, s"unexpected reply opcode $op")
      val body = new Array[Byte](len - 16)
      in.readFully(body)
      val r = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      r.getInt          // flagBits
      val kind = r.get()
      require(kind == 0, s"unexpected section kind $kind")
      r
    }

    def close(): Unit = sock.close()
  }

  // ---- cursor walk: find + getMore → JSON lines -------------------------

  /** Extract cursor id and batch documents from a find/getMore reply.
    * Walks the raw BSON rather than round-tripping through JSON. */
  private def readCursor(reply: ByteBuffer,
      batchField: String): (Long, Seq[String], Boolean) = {
    val start = reply.position()
    val len = reply.getInt(start)
    reply.position(start + 4)
    var cursorId = 0L
    var docs = Vector.empty[String]
    var ok = false
    var done = false
    while (!done) {
      val tpe = reply.get()
      if (tpe == 0) done = true
      else {
        val key = readCstr(reply)
        (key, tpe) match {
          case ("ok", 0x01) => ok = reply.getDouble == 1.0
          case ("cursor", 0x03) =>
            val cStart = reply.position()
            val cLen = reply.getInt(cStart)
            reply.position(cStart + 4)
            var cDone = false
            while (!cDone) {
              val ct = reply.get()
              if (ct == 0) cDone = true
              else {
                val ck = readCstr(reply)
                (ck, ct) match {
                  case ("id", 0x12) => cursorId = reply.getLong
                  case (f, 0x04) if f == batchField || f == "firstBatch" ||
                      f == "nextBatch" =>
                    val aStart = reply.position()
                    val aLen = reply.getInt(aStart)
                    reply.position(aStart + 4)
                    var aDone = false
                    while (!aDone) {
                      val at = reply.get()
                      if (at == 0) aDone = true
                      else { readCstr(reply); docs = docs :+ bsonToJson(reply) }
                    }
                    reply.position(aStart + aLen)
                  case (_, t) => skipValue(reply, t)
                }
              }
            }
            reply.position(cStart + cLen)
          case ("errmsg", 0x02) =>
            val elen = reply.getInt
            val b = new Array[Byte](elen - 1); reply.get(b); reply.get()
            throw new IllegalArgumentException(
              "mongo error: " + new String(b, StandardCharsets.UTF_8))
          case ("writeErrors", 0x04) =>
            // per-document failures (duplicate key, validation) come
            // back with ok:1.0 — a write reply carrying a NON-EMPTY
            // array here is an ERROR, not an acknowledgement; read the
            // first entry's errmsg (from the decoded BSON document —
            // a regex over serialized JSON truncated at escaped
            // quotes). A present-but-empty array is an acknowledgement.
            val aStart = reply.position()
            val aLen = reply.getInt(aStart)
            reply.position(aStart + 4)
            var msg: Option[String] = None
            var hasError = false
            var aDone = false
            while (!aDone) {
              val at = reply.get()
              if (at == 0) aDone = true
              else {
                readCstr(reply)
                if (at == 0x03) {
                  hasError = true
                  if (msg.isEmpty) msg = readDocErrmsg(reply)
                  else skipValue(reply, at)
                } else skipValue(reply, at)
              }
            }
            reply.position(aStart + aLen)
            if (hasError) throw new IllegalArgumentException(
              s"mongo write error: ${msg.getOrElse("write error")}")
          case (_, t) => skipValue(reply, t)
        }
      }
    }
    reply.position(start + len)
    (cursorId, docs, ok)
  }

  private def skipValue(buf: ByteBuffer, tpe: Byte): Unit = tpe match {
    case 0x01 | 0x09 | 0x11 | 0x12 => buf.position(buf.position() + 8)
    case 0x02 => val l = buf.getInt; buf.position(buf.position() + l)
    case 0x03 | 0x04 => buf.position(buf.position() + buf.getInt(buf.position()))
    case 0x05 => val l = buf.getInt; buf.position(buf.position() + 1 + l)
    case 0x07 => buf.position(buf.position() + 12)
    case 0x08 => buf.get()
    case 0x0A => ()
    case 0x10 => buf.position(buf.position() + 4)
    case other => throw new IllegalArgumentException(
      f"cannot skip BSON type 0x$other%02x")
  }

  private def findAll(cfg: MongoConfig, db: String, coll: String,
      filter: Map[String, Any], batchSize: Int): Seq[String] = {
    val conn = new Conn(cfg)
    try {
      val find = bsonDoc(Seq(
        "find" -> coll, "$db" -> db, "filter" -> filter,
        "batchSize" -> batchSize))
      var (cursor, docs, _) = readCursor(conn.command(find), "firstBatch")
      var all = docs
      while (cursor != 0L) {
        val more = bsonDoc(Seq(
          "getMore" -> cursor, "collection" -> coll, "$db" -> db,
          "batchSize" -> batchSize))
        val (c2, d2, _) = readCursor(conn.command(more), "nextBatch")
        cursor = c2
        all = all ++ d2
      }
      all
    } finally conn.close()
  }

  // ---- write path (recorder direction) -----------------------------------

  /** Spark value → BSON-encodable value for [[bsonDoc]]. */
  private def toBson(v: Any): Any = v match {
    case null => BNull
    case t: java.sql.Timestamp => Dt(t.getTime)
    case d: java.sql.Date => Dt(d.getTime)
    case s: scala.collection.Seq[_] => s.toSeq.map(toBson)
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq.map(toBson)).toMap
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => k.toString -> toBson(mv) }.toMap
    case f: Float => f.toDouble
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case bd: java.math.BigDecimal => bd.doubleValue
    case bd: BigDecimal => bd.doubleValue
    case other => other // String / Int / Long / Double / Boolean
  }

  /** `mongodb.record`: write a DataFrame into a collection — one
    * connection per partition, `insert` commands of `batchDocs`
    * documents. Timestamps/dates become BSON datetimes, structs/maps
    * subdocuments, nulls BSON nulls. Server errors (errmsg) raise. */
  def exportCollection(df: org.apache.spark.sql.DataFrame, cfg: MongoConfig,
      db: String, coll: String, batchDocs: Int = 500): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = new Conn(cfg)
        try rows.grouped(batchDocs).foreach { batch =>
          val docs = batch.map { r =>
            schema.fieldNames.toSeq.zip(r.toSeq.map(toBson)).toMap
          }
          val cmd = bsonDoc(Seq(
            "insert" -> coll, "$db" -> db, "documents" -> docs))
          val (_, _, ok) = readCursor(conn.command(cmd), "firstBatch")
          require(ok, s"mongo insert into $db.$coll not acknowledged")
        } finally conn.close()
      }
    }
  }

  // ---- public API --------------------------------------------------------

  /** `mongodb.import`: one collection → DataFrame. With
    * `partitionField` each Spark task drains its own
    * `{field: {$mod: [n, i]}}` cursor; otherwise a single task reads
    * the collection. Schema comes from Spark JSON inference over the
    * canonical-JSON form — NOTE inference materializes the cursors a
    * first time, so large imports should pass `schema` (one read, no
    * inference pass), exactly like schema-given CSV import. */
  def importCollection(spark: SparkSession, cfg: MongoConfig, db: String,
      coll: String, partitionField: Option[String] = None,
      numPartitions: Int = 1, batchSize: Int = 1000,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    require(numPartitions >= 1, "numPartitions must be >= 1")
    val lines: org.apache.spark.sql.Dataset[String] = partitionField match {
      case None =>
        spark.createDataset(findAll(cfg, db, coll, Map.empty, batchSize))
      case Some(field) =>
        spark.sparkContext
          .parallelize(0 until numPartitions, numPartitions)
          .flatMap { i =>
            // $mod returns NEGATIVE remainders for negative dividends,
            // so partition i also claims remainder i−n — otherwise
            // documents with negative field values match no partition
            // and silently vanish (Postgres.importTable normalizes the
            // same way with ((col % n) + n) % n)
            val mods = (Seq(i) ++ (if (i > 0) Seq(i - numPartitions) else Nil))
              .map(r => Map(field -> Map("$mod" -> Seq(numPartitions, r))))
            findAll(cfg, db, coll,
              if (mods.size == 1) mods.head else Map("$or" -> mods),
              batchSize)
          }.toDS()
    }
    schema.map(spark.read.schema(_)).getOrElse(spark.read).json(lines)
  }
}
