package graft

import java.io.DataInputStream
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Mongo
import graft.sources.Mongo.{BNull, Dt, MongoConfig, ObjId}

/** The OP_MSG reader against a MOCK mongod speaking the wire protocol
  * over a real socket (the PostgresSpec strategy). The mock serves a
  * typed collection in 2-document batches so the getMore cursor loop
  * is genuinely exercised, and applies the reader's `$mod` partition
  * filters so disjointness is proven from protocol bytes. */
class MongoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def doc(n: Long): Seq[(String, Any)] = Seq(
    "_id" -> ObjId(f"${n}%024x"),
    "n" -> n,
    "name" -> (if (n == 3) null else s"doc$n"),
    "score" -> (n * 1.5),
    "active" -> (n % 2 == 0),
    "created" -> Dt(1704067200000L + n * 1000),
    "tags" -> Seq("a", s"t$n"),
    "meta" -> Map("depth" -> 2, "label" -> s"m$n"))
    .map { case (k, v) => if (v == null) (k, BNull) else (k, v) }

  private val docs: Seq[Seq[(String, Any)]] = (1L to 5L).map(doc)

  private final class MockMongo {
    val server = new ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val finds = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val inserts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile private var running = true

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

    private def serve(sock: java.net.Socket): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      // per-connection cursor state: remaining docs
      var pending: Seq[Seq[(String, Any)]] = Nil
      var open = true
      while (open) {
        val hdr = new Array[Byte](16)
        try in.readFully(hdr) catch { case _: Throwable => open = false }
        if (open) {
          val h = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
          val len = h.getInt(0)
          val reqId = h.getInt(4)
          val body = new Array[Byte](len - 16)
          in.readFully(body)
          val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          b.getInt; b.get() // flags + kind
          val cmdJson = Mongo.bsonToJson(b)
          if (cmdJson.contains("\"insert\":")) {
            inserts.add(cmdJson)
            val n = "\\{".r.findAllIn(
              cmdJson.drop(cmdJson.indexOf("\"documents\""))).size
            val reply = Mongo.bsonDoc(Seq("n" -> n, "ok" -> 1.0))
            val total = 16 + 4 + 1 + reply.length
            val rb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
            rb.putInt(total).putInt(999).putInt(reqId).putInt(2013)
            rb.putInt(0); rb.put(0.toByte); rb.put(reply)
            out.write(rb.array()); out.flush()
          } else {
          val isFind = cmdJson.contains("\"find\"")
          if (isFind) finds.add(cmdJson)
          val batch: Seq[Seq[(String, Any)]] =
            if (isFind) {
              val m = "\\$mod\":\\[(\\d+),(\\d+)\\]".r.findFirstMatchIn(cmdJson)
              val selected = m match {
                case Some(g) =>
                  val (n, i) = (g.group(1).toLong, g.group(2).toLong)
                  docs.filter(d =>
                    d.collectFirst { case ("n", v: Long) => v }.get % n == i)
                case None => docs
              }
              pending = selected
              Seq.empty // batches come below
            } else Seq.empty
          // serve 2 docs per reply to force the getMore loop
          val (now, rest) = pending.splitAt(2)
          pending = rest
          val cursorId = if (pending.nonEmpty) 77L else 0L
          val batchField = if (isFind) "firstBatch" else "nextBatch"
          val reply = Mongo.bsonDoc(Seq(
            "cursor" -> Map(
              batchField -> now.map(_.toMap),
              "id" -> cursorId,
              "ns" -> "db.items"),
            "ok" -> 1.0))
          val total = 16 + 4 + 1 + reply.length
          val rb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
          rb.putInt(total).putInt(999).putInt(reqId).putInt(2013)
          rb.putInt(0); rb.put(0.toByte); rb.put(reply)
          out.write(rb.array()); out.flush()
          val _ = batch
          }
        }
      }
      sock.close()
    }
  }

  test("importCollection: BSON types decode and infer (getMore loop exercised)") {
    val pg = new MockMongo()
    try {
      val df = Mongo.importCollection(spark,
        MongoConfig("127.0.0.1", pg.port), "db", "items")
      assert(df.count() === 5) // 3 batches of 2/2/1 via getMore
      val m = df.collect().map(r => r.getAs[Long]("n") -> r).toMap
      assert(m(1L).getAs[String]("name") === "doc1")
      assert(m(3L).getAs[String]("name") === null)
      assert(m(2L).getAs[Double]("score") === 3.0)
      assert(m(2L).getAs[Boolean]("active"))
      assert(m(1L).getAs[String]("_id") === f"${1L}%024x")
      assert(m(4L).getAs[String]("created") === "2024-01-01T00:00:04Z")
      assert(m(5L).getAs[scala.collection.Seq[String]]("tags") ===
        Seq("a", "t5"))
      assert(m(5L).getAs[org.apache.spark.sql.Row]("meta")
        .getAs[String]("label") === "m5")
    } finally pg.stop()
  }

  test("partitioned import: disjoint $mod cursors, one per task") {
    val pg = new MockMongo()
    try {
      val df = Mongo.importCollection(spark,
        MongoConfig("127.0.0.1", pg.port), "db", "items",
        partitionField = Some("n"), numPartitions = 2)
      assert(df.select("n").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L, 5L))
      // schema inference reads the RDD once before the collect, so
      // each partition's find runs twice — assert the PREDICATES are
      // the two disjoint mod classes and nothing else
      val qs = pg.finds.toArray.map(_.toString)
      val preds = qs.flatMap(
        "\\$mod\":\\[2,(\\d)\\]".r.findFirstMatchIn(_).map(_.group(1))).toSet
      assert(preds === Set("0", "1"), qs.toSeq)
    } finally pg.stop()
  }

  test("exportCollection: per-partition insert batches with typed BSON") {
    import spark.implicits._
    val pg = new MockMongo()
    try {
      val df = Seq(
        (1L, "alice", 1.5, true),
        (2L, "o\"brien", -2.0, false),
        (3L, null.asInstanceOf[String], 0.25, true),
        (4L, "dave", 9.0, false),
        (5L, "eve", 3.5, true)
      ).toDF("id", "name", "score", "ok")
        .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
        .repartition(2)
      Mongo.exportCollection(df, MongoConfig("127.0.0.1", pg.port),
        "db", "out_items", batchDocs = 2)
      val ins = pg.inserts.toArray.map(_.toString)
      // 5 rows in ≤2-doc batches over 2 partitions → ≥3 inserts
      assert(ins.length >= 3, ins.toSeq)
      val all = ins.mkString("\n")
      assert(all.contains("\"name\":\"o\\\"brien\""))
      assert(all.contains("\"name\":null"))
      assert(all.contains("\"ts\":\"2024-01-01T00:00:00Z\"")) // BSON datetime
      (1 to 5).foreach(i => assert(
        ins.count(_.contains(s"\"id\":$i,")) === 1, s"row $i"))
    } finally pg.stop()
  }

  test("explicit schema pins types without inference") {
    import org.apache.spark.sql.types._
    val pg = new MockMongo()
    try {
      val schema = StructType(Seq(
        StructField("n", LongType), StructField("score", DoubleType),
        StructField("created", TimestampType)))
      val df = Mongo.importCollection(spark,
        MongoConfig("127.0.0.1", pg.port), "db", "items", schema = Some(schema))
      assert(df.schema === schema)
      assert(df.filter(col("n") === 2)
        .head().getTimestamp(2).toInstant ===
        java.time.Instant.parse("2024-01-01T00:00:02Z"))
    } finally pg.stop()
  }
}
