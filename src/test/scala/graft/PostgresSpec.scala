package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Postgres
import graft.sources.Postgres.PgConfig

/** The wire-protocol reader against a MOCK postgres server speaking
  * the v3 protocol over a real socket — the same local-fixture
  * strategy as the fetcher's HTTP spec (no egress, no server binary
  * in the environment). The mock serves a fixed `items` table and
  * understands the reader's partition predicates, so the spec can
  * assert type fidelity, partitioned-read disjointness, md5 auth and
  * error surfacing against genuine protocol bytes. */
class PostgresSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (id int8, name text, score float8, ok bool, ts timestamptz, val numeric)
  private val oids = Seq(20, 25, 701, 16, 1184, 1700)
  private val names = Seq("id", "name", "score", "ok", "ts", "val")
  private val rows: Seq[Array[String]] = Seq(
    Array("1", "alice", "1.5", "t", "2024-01-01 10:00:00+00", "10.25"),
    Array("2", "bob", "-2.25", "f", "2024-01-01 11:30:00+02", "0.5"),
    Array("3", null, "0.0", "t", "2024-01-02 00:00:00+00", "3"),
    Array("4", "dave", "7.75", "f", "2024-01-03 12:00:00+00", "-1.125"))

  /** Minimal v3-protocol server: one thread per connection.
    * `tamperScramSig` makes the server send a WRONG final signature —
    * the client must refuse it (anti-impersonation check). */
  private final class MockPg(requireMd5: Boolean = false,
      requireScram: Boolean = false, tamperScramSig: Boolean = false,
      user: String = "u", pass: String = "pw",
      tls: Boolean = false, tlsRefuse: Boolean = false,
      scramPlus: Boolean = false) {
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile private var running = true

    private def md5Hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          new Thread(() => try serve(s) catch { case _: Throwable => () }).start()
        } catch { case _: Throwable => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def port: Int = server.getLocalPort
    def stop(): Unit = { running = false; server.close() }

    private def serve(sock0: Socket): Unit = {
      // TLS upgrade: consume the SSLRequest, answer S/N, wrap the
      // socket server-side with the spec's self-signed context —
      // exactly the upgrade dance a real postgres performs
      val sock: Socket =
        if (!tls && !tlsRefuse) sock0
        else {
          val din = new DataInputStream(sock0.getInputStream)
          val len = din.readInt()
          val code = din.readInt()
          val o = sock0.getOutputStream
          if (tlsRefuse || len != 8 || code != 80877103) {
            o.write('N'); o.flush()
            if (tlsRefuse) return else { sock0.close(); return }
          }
          o.write('S'); o.flush()
          val s = PostgresSpec.serverSslContext.getSocketFactory
            .createSocket(sock0, "127.0.0.1", sock0.getPort, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          s.setUseClientMode(false)
          s.startHandshake()
          s
        }
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      def msg(tpe: Char, body: Array[Byte]): Unit = {
        out.writeByte(tpe)
        out.writeInt(4 + body.length)
        out.write(body)
      }
      def i32(v: Int) = Array[Byte](
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      def i16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
      def ready(): Unit = { msg('Z', Array('I'.toByte)); out.flush() }
      // startup
      val len = in.readInt()
      val startup = new Array[Byte](len - 4)
      in.readFully(startup)
      if (requireScram) {
        def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
          val m = javax.crypto.Mac.getInstance("HmacSHA256")
          m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
          m.doFinal(data)
        }
        def sha256(b: Array[Byte]): Array[Byte] =
          java.security.MessageDigest.getInstance("SHA-256").digest(b)
        def b64(b: Array[Byte]): String =
          java.util.Base64.getEncoder.encodeToString(b)
        def fail(): Unit = {
          msg('E', Array('S'.toByte) ++ "FATAL\u0000".getBytes ++
            Array('M'.toByte) ++
            "password authentication failed\u0000".getBytes ++
            Array[Byte](0))
          out.flush(); sock.close()
        }
        // AuthenticationSASL with the mechanism list (-PLUS first
        // when this listener is TLS and advertises channel binding)
        val mechList =
          if (scramPlus) "SCRAM-SHA-256-PLUS\u0000SCRAM-SHA-256\u0000\u0000"
          else "SCRAM-SHA-256\u0000\u0000"
        msg('R', i32(10) ++ mechList.getBytes)
        out.flush()
        // SASLInitialResponse: mech cstring + i32 + client-first
        val t1 = in.readByte().toChar
        val l1 = in.readInt() - 4
        val b1 = new Array[Byte](l1)
        in.readFully(b1)
        if (t1 != 'p') { fail(); return }
        val mechEnd = b1.indexOf(0.toByte)
        val chosenMech = new String(b1, 0, mechEnd, StandardCharsets.UTF_8)
        val clientFirst = new String(
          b1.drop(mechEnd + 1 + 4), StandardCharsets.UTF_8)
        // gs2 header = everything through the second comma
        // ("n,," / "y,," / "p=tls-server-end-point,,")
        val gs2End = clientFirst.indexOf(',', clientFirst.indexOf(',') + 1) + 1
        val gs2 = clientFirst.substring(0, gs2End)
        val clientFirstBare = clientFirst.substring(gs2End)
        if (scramPlus && chosenMech != "SCRAM-SHA-256-PLUS") {
          fail(); return // a binding-capable server rejects a downgrade
        }
        if (chosenMech == "SCRAM-SHA-256-PLUS" && !gs2.startsWith("p=")) {
          fail(); return
        }
        // under -PLUS the client-final c= must bind THIS server's
        // certificate: b64(gs2 bytes ++ SHA-256(cert DER))
        val expectCb =
          if (chosenMech == "SCRAM-SHA-256-PLUS")
            Some(b64(gs2.getBytes(StandardCharsets.UTF_8) ++
              java.security.MessageDigest.getInstance("SHA-256")
                .digest(PostgresSpec.serverCert.getEncoded)))
          else None
        val cnonce = clientFirstBare.split(",").find(_.startsWith("r="))
          .map(_.drop(2)).getOrElse("")
        val snonce = cnonce + "mockSrvNonce123"
        val salt = "mock-salt-0123".getBytes(StandardCharsets.UTF_8)
        val iters = 4096
        val serverFirst = s"r=$snonce,s=${b64(salt)},i=$iters"
        msg('R', i32(11) ++ serverFirst.getBytes(StandardCharsets.UTF_8))
        out.flush()
        // client-final: verify the proof against the known password
        val t2 = in.readByte().toChar
        val l2 = in.readInt() - 4
        val b2 = new Array[Byte](l2)
        in.readFully(b2)
        val clientFinal = new String(b2, 0, l2 - 1, StandardCharsets.UTF_8)
        val withoutProof = clientFinal.substring(0,
          clientFinal.lastIndexOf(",p="))
        val cAttr = withoutProof.split(",").find(_.startsWith("c="))
          .map(_.drop(2)).getOrElse("")
        if (expectCb.exists(_ != cAttr)) { fail(); return }
        val proof = clientFinal.drop(clientFinal.lastIndexOf(",p=") + 3)
        val salted = javax.crypto.SecretKeyFactory
          .getInstance("PBKDF2WithHmacSHA256")
          .generateSecret(new javax.crypto.spec.PBEKeySpec(
            pass.toCharArray, salt, iters, 256)).getEncoded
        val clientKey = hmac(salted, "Client Key".getBytes)
        val storedKey = sha256(clientKey)
        val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
        val clientSig = hmac(storedKey, authMessage.getBytes)
        val expectedProof =
          b64(clientKey.zip(clientSig).map(x => (x._1 ^ x._2).toByte))
        if (t2 != 'p' || proof != expectedProof) { fail(); return }
        val serverKey = hmac(salted, "Server Key".getBytes)
        val serverSig0 = hmac(serverKey, authMessage.getBytes)
        val serverSig =
          if (tamperScramSig) serverSig0.map(b => (b ^ 0x5A).toByte)
          else serverSig0
        msg('R', i32(12) ++ s"v=${b64(serverSig)}".getBytes)
        out.flush()
      }
      if (requireMd5) {
        val salt = Array[Byte](1, 2, 3, 4)
        msg('R', i32(5) ++ salt); out.flush()
        val t = in.readByte().toChar
        val plen = in.readInt() - 4
        val pbody = new Array[Byte](plen)
        in.readFully(pbody)
        val got = new String(pbody, 0, plen - 1, StandardCharsets.UTF_8)
        val expect = "md5" + md5Hex(
          md5Hex((pass + user).getBytes).getBytes ++ salt)
        if (t != 'p' || got != expect) {
          msg('E', Array('S'.toByte) ++ "FATAL\u0000".getBytes ++
            Array('M'.toByte) ++
            "password authentication failed\u0000".getBytes ++
            Array[Byte](0))
          out.flush(); sock.close(); return
        }
      }
      msg('R', i32(0)) // AuthenticationOk
      msg('S', "server_version\u000016.0\u0000".getBytes) // ParameterStatus
      ready()
      // query loop
      var open = true
      while (open) {
        val t = try in.readByte().toChar catch { case _: Throwable => 'X' }
        if (t == 'X') { open = false }
        else {
          val qlen = in.readInt() - 4
          val qb = new Array[Byte](qlen)
          in.readFully(qb)
          val sql = new String(qb, 0, qlen - 1, StandardCharsets.UTF_8)
          queries.add(sql)
          if (sql.startsWith("CREATE") || sql.startsWith("INSERT")) {
            val n = if (sql.startsWith("INSERT"))
              sql.count(_ == '(') - 1 else 0 // tuples = parens minus col list
            msg('C', s"INSERT 0 $n ".getBytes)
            ready()
          } else if (sql.contains("no_such_table")) {
            msg('E', Array('S'.toByte) ++ "ERROR\u0000".getBytes ++
              Array('C'.toByte) ++ "42P01\u0000".getBytes ++
              Array('M'.toByte) ++
              "relation \"no_such_table\" does not exist\u0000".getBytes ++
              Array[Byte](0))
            ready()
          } else {
            // RowDescription
            val fields = names.zip(oids).map { case (n, oid) =>
              n.getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0) ++
                i32(0) ++ i16(0) ++ i32(oid) ++ i16(-1) ++ i32(-1) ++ i16(0)
            }
            msg('T', i16(names.length) ++ fields.flatten.toArray)
            val served =
              if (sql.contains("LIMIT 0")) Seq.empty
              else {
                val part = "% (\\d+) = (\\d+)".r.findFirstMatchIn(sql)
                part match {
                  case Some(m) =>
                    val (n, i) = (m.group(1).toLong, m.group(2).toLong)
                    rows.filter(r => ((r(0).toLong % n) + n) % n == i)
                  case None => rows
                }
              }
            served.foreach { r =>
              val cols = r.map {
                case null => i32(-1)
                case v =>
                  val b = v.getBytes(StandardCharsets.UTF_8)
                  i32(b.length) ++ b
              }
              msg('D', i16(r.length) ++ cols.flatten.toArray)
            }
            msg('C', s"SELECT ${served.length}\u0000".getBytes)
            ready()
          }
        }
      }
      sock.close()
    }
  }

  test("importQuery: typed text-protocol decode (int/float/bool/tz/numeric/null)") {
    val pg = new MockPg()
    try {
      val df = Postgres.importQuery(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u"), "SELECT * FROM items")
      import org.apache.spark.sql.types._
      assert(df.schema.map(_.dataType) === Seq(LongType, StringType,
        DoubleType, BooleanType, TimestampType, DecimalType(38, 18)))
      val m = df.collect().map(r => r.getLong(0) -> r).toMap
      assert(m(1L).getString(1) === "alice" && m(1L).getDouble(2) === 1.5 &&
        m(1L).getBoolean(3))
      assert(m(3L).isNullAt(1))
      // timestamptz +02 normalizes to the same instant in UTC
      assert(m(2L).getTimestamp(4).toInstant ===
        java.time.Instant.parse("2024-01-01T09:30:00Z"))
      assert(m(4L).getDecimal(5).doubleValue() === -1.125)
    } finally pg.stop()
  }

  test("importTable partitioned: one connection per task, disjoint mod slices") {
    val pg = new MockPg()
    try {
      val df = Postgres.importTable(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u"), "items",
        partitionColumn = Some("id"), numPartitions = 2)
      assert(df.rdd.getNumPartitions === 2)
      assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L))
      val qs = pg.queries.toArray.map(_.toString)
      // 1 schema probe + 2 partition slices with distinct predicates
      assert(qs.count(_.contains("LIMIT 0")) === 1)
      assert(qs.count(_.contains("% 2) + 2) % 2 = 0")) === 1, qs.toSeq)
      assert(qs.count(_.contains("% 2) + 2) % 2 = 1")) === 1, qs.toSeq)
    } finally pg.stop()
  }

  test("md5 auth: correct double-hash accepted, wrong password surfaces the error") {
    val pg = new MockPg(requireMd5 = true, user = "u", pass = "sekret")
    try {
      val ok = Postgres.importQuery(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u", password = "sekret"),
        "SELECT * FROM items")
      assert(ok.count() === 4)
      val e = intercept[IllegalArgumentException] {
        Postgres.importQuery(spark,
          PgConfig("127.0.0.1", pg.port, "db", "u", password = "wrong"),
          "SELECT * FROM items")
      }
      assert(e.getMessage.contains("authentication failed"))
    } finally pg.stop()
  }

  test("scram-sha-256 auth: full SASL exchange, wrong password rejected") {
    val pg = new MockPg(requireScram = true, user = "u", pass = "s3cret")
    try {
      val ok = Postgres.importQuery(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u", password = "s3cret"),
        "SELECT * FROM items")
      assert(ok.count() === 4)
      val e = intercept[IllegalArgumentException] {
        Postgres.importQuery(spark,
          PgConfig("127.0.0.1", pg.port, "db", "u", password = "nope"),
          "SELECT * FROM items")
      }
      assert(e.getMessage.contains("authentication failed"))
    } finally pg.stop()
  }

  test("scram-sha-256: a forged server signature is refused by the client") {
    val pg = new MockPg(requireScram = true, tamperScramSig = true,
      user = "u", pass = "s3cret")
    try {
      val e = intercept[IllegalArgumentException] {
        Postgres.importQuery(spark,
          PgConfig("127.0.0.1", pg.port, "db", "u", password = "s3cret"),
          "SELECT * FROM items").count()
      }
      assert(e.getMessage.contains("server signature mismatch"), e.getMessage)
    } finally pg.stop()
  }

  test("exportTable: per-partition multi-row INSERT batches, typed literals") {
    import spark.implicits._
    val pg = new MockPg()
    try {
      val df = Seq(
        (1L, "alice", true, 1.5),
        (2L, "o'brien", false, -2.0), // quote must escape
        (3L, null.asInstanceOf[String], true, 0.25),
        (4L, "dave", false, 9.0),
        (5L, "eve", true, 3.5)
      ).toDF("id", "name", "ok", "score").repartition(2)
      Postgres.exportTable(df, PgConfig("127.0.0.1", pg.port, "db", "u"),
        "out_items", createTable = true, batchRows = 2)
      val qs = pg.queries.toArray.map(_.toString)
      val creates = qs.filter(_.startsWith("CREATE"))
      assert(creates.length === 1 &&
        creates(0).contains("\"id\" int8") &&
        creates(0).contains("\"name\" text") &&
        creates(0).contains("\"ok\" boolean") &&
        creates(0).contains("\"score\" float8"), creates.toSeq)
      val inserts = qs.filter(_.startsWith("INSERT"))
      // 5 rows, batches of ≤2 → at least 3 INSERTs across 2 partitions
      assert(inserts.length >= 3, inserts.toSeq)
      val all = inserts.mkString("\n")
      assert(all.contains("'o''brien'"))
      assert(all.contains("NULL"))
      // every row lands exactly once
      (1 to 5).foreach(i => assert(
        inserts.count(_.matches(s"(?s).*\\($i, .*")) === 1, s"row $i"))
    } finally pg.stop()
  }

  test("postgresql.import dispatches over REST into a registered dataset") {
    val pg = new MockPg()
    val engine = new graft.api.GraftEngine(spark)
    val srv = new graft.api.RestServer(engine)
    val port = srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val body = s"""{"type": "postgresql.import", "host": "127.0.0.1", """ +
        s""""port": "${pg.port}", "database": "db", "user": "u", """ +
        s""""table": "items", "partitionColumn": "id", """ +
        s""""numPartitions": "2", "outputDataset": "pg_items"}"""
      val r = client.send(java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/v1/procedures"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 201 && r.body().contains("\"rowCount\": 4"),
        r.body())
      assert(engine.dataset("pg_items").count() === 4)
    } finally { srv.stop(); pg.stop() }
  }

  test("server errors surface with code and message, connection drains cleanly") {
    val pg = new MockPg()
    try {
      val e = intercept[IllegalArgumentException] {
        Postgres.importQuery(spark,
          PgConfig("127.0.0.1", pg.port, "db", "u"),
          "SELECT * FROM no_such_table")
      }
      assert(e.getMessage.contains("42P01") &&
        e.getMessage.contains("does not exist"))
    } finally pg.stop()
  }

  test("TLS: SSLRequest upgrade + SCRAM inside the encrypted channel") {
    val pg = new MockPg(requireScram = true, tls = true)
    try {
      val df = Postgres.importQuery(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u", password = "pw",
          ssl = true, sslVerify = false),
        "SELECT * FROM items")
      assert(df.count() === 4)
      assert(df.select("name").collect().map(_.getString(0)).toSet
        === Set("alice", "bob", null, "dave"))
    } finally pg.stop()
  }

  test("TLS: SCRAM-SHA-256-PLUS channel binding (tls-server-end-point)") {
    // the mock advertises -PLUS, requires the client to pick it, and
    // verifies the c= attribute binds ITS OWN certificate hash — a
    // MITM with a different cert would produce a different binding
    val pg = new MockPg(requireScram = true, tls = true, scramPlus = true)
    try {
      val df = Postgres.importQuery(spark,
        PgConfig("127.0.0.1", pg.port, "db", "u", password = "pw",
          ssl = true, sslVerify = false),
        "SELECT * FROM items")
      assert(df.count() === 4)
    } finally pg.stop()
  }

  test("TLS: a server answering N fails loudly — no plaintext fallback") {
    val pg = new MockPg(tlsRefuse = true)
    try {
      val e = intercept[IllegalStateException] {
        Postgres.importQuery(spark,
          PgConfig("127.0.0.1", pg.port, "db", "u",
            ssl = true, sslVerify = false),
          "SELECT * FROM items")
      }
      assert(e.getMessage.contains("refused TLS"))
    } finally pg.stop()
  }
}

object PostgresSpec {
  /** Self-signed server key material, generated once per JVM with the
    * JDK's own keytool (no fixture files, no external deps). */
  lazy val serverKeyStore: java.security.KeyStore = {
    val ks = java.nio.file.Files.createTempFile("mockpg", ".p12")
    java.nio.file.Files.delete(ks)
    val keytool = new java.io.File(System.getProperty("java.home"),
      "bin/keytool").getAbsolutePath
    val rc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "pg",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", "changeit",
      "-dname", "CN=127.0.0.1", "-validity", "2")
      .redirectErrorStream(true).start().waitFor()
    require(rc == 0, s"keytool failed with $rc")
    val kstore = java.security.KeyStore.getInstance("PKCS12")
    val is = java.nio.file.Files.newInputStream(ks)
    try kstore.load(is, "changeit".toCharArray) finally is.close()
    kstore
  }

  /** The mock's certificate — the channel-binding anchor. */
  lazy val serverCert: java.security.cert.X509Certificate =
    serverKeyStore.getCertificate("pg")
      .asInstanceOf[java.security.cert.X509Certificate]

  lazy val serverSslContext: javax.net.ssl.SSLContext = {
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance("SunX509")
    kmf.init(serverKeyStore, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
