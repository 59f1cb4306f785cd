package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.StatsTable
import graft.streaming.Continuous

class StreamingStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("windowed aggregation totals equal batch group-by") {
    val ev = Tables.events(spark, sf)
    val win = Continuous.windowedAgg(ev, "ts", "event_type", "value",
      windowLen = "6 hours", watermark = "1 hour")
    // over a batch input, windowed sums partition the total exactly
    val winTotal = win.agg(sum("n"), round(sum("total"), 2)).head()
    val batch = ev.agg(count(lit(1)), round(sum("value"), 2)).head()
    assert(winTotal.getLong(0) === batch.getLong(0))
    assert(winTotal.getDouble(1) === batch.getDouble(1))
    // windows align to the 6h grid
    val misaligned = win.filter(
      unix_timestamp(col("window_start")) % (6 * 3600) =!= 0).count()
    assert(misaligned === 0)
  }

  test("streaming exact dedup: re-sent events within the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val deduped = Continuous.dedupStream(
      in.toDF.toDF("event_id", "ts", "value"), "ts", Seq("event_id"),
      watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 1.0))
    q.processAllAvailable()
    // duplicate id re-sent in a LATER batch, still within the watermark
    in.addData((2L, ts(3), 2.0), (3L, ts(4), 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 3L))
    // batch frames pass through plain dropDuplicates semantics
    val batch = Seq((1L, ts(0), 1.0), (1L, ts(5), 1.0), (2L, ts(1), 2.0))
      .toDF("event_id", "ts", "value")
    assert(Continuous.dedupStream(batch, "ts", Seq("event_id")).count() === 2)
  }

  test("stateful sessionize matches the window-based sessionizer") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("user_id").as("key"), unix_micros(col("ts")).as("tsMicros"),
        col("value"))
      .as[Continuous.SessionEvent]
    val gap = 86400000000L // 1 day, matches q39
    val sessions = Continuous.sessionize(ev, gap).cache()
    // same session count as the SQL/window formulation (q39 logic)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"))
    val viaWindow = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new", when(col("prev").isNull ||
        col("us") - col("prev") > gap, 1).otherwise(0))
      .agg(sum("new")).head().getLong(0)
    assert(sessions.count() === viaWindow)
    // event conservation
    assert(sessions.agg(sum("nEvents")).head().getLong(0) ===
      Tables.events(spark, sf).count())
    // sessions respect the gap internally and between consecutive ones
    val bad = sessions.filter(col("endMicros") < col("startMicros")).count()
    assert(bad === 0)
  }

  test("streaming sessionize emits the idle session on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("key", "ts", "value")
    val sessions = Continuous.sessionizeStream(df, "ts", "key", "value",
      gapMicros = 60L * 1000 * 1000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((1L, t("2024-01-01 00:00:00"), 1.0),
        (1L, t("2024-01-01 00:00:30"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // session still open
      // an event on ANOTHER key advances the watermark past key 1's
      // last + gap; the next batch fires key 1's timeout
      input.addData((2L, t("2024-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      input.addData((2L, t("2024-01-01 01:00:01"), 5.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[Continuous.SessionOut].collect()
      assert(rows.exists(r => r.key == 1L && r.nEvents == 2 && r.total == 3.0),
        s"expected key 1 session emitted via timeout, got ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("streaming sessionize: a late event merges without regressing " +
      "the session end") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("key", "ts", "value")
    // the 1-hour watermark DELAY keeps the straggler ahead of the
    // watermark (a row behind it is filtered before the operator), so
    // the out-of-order merge branch genuinely runs
    val sessions = Continuous.sessionizeStream(df, "ts", "key", "value",
      gapMicros = 300L * 1000 * 1000, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((1L, t("2024-01-01 00:01:40"), 1.0),
        (1L, t("2024-01-01 00:02:40"), 2.0))
      q.processAllAvailable()
      // a STRAGGLER behind the session's last event but within the
      // watermark delay: it must merge as min(start)/max(last), not
      // rewrite last=50s and emit an end < start session
      input.addData((1L, t("2024-01-01 00:00:50"), 4.0))
      q.processAllAvailable()
      // advance the watermark far past key 1's last+gap via key 2
      input.addData((2L, t("2024-01-01 02:00:00"), 5.0))
      q.processAllAvailable()
      input.addData((2L, t("2024-01-01 02:00:01"), 5.0))
      q.processAllAvailable()
      val rows = spark.table("sess_late").as[Continuous.SessionOut]
        .collect().filter(_.key == 1L)
      assert(rows.length === 1, rows.mkString(","))
      val s = rows.head
      assert(s.nEvents === 3 && s.total === 7.0, s.toString)
      assert(s.endMicros >= s.startMicros, s.toString)
      // end stayed at 00:02:40, start absorbed the straggler — 110 s
      assert(s.endMicros - s.startMicros === 110L * 1000 * 1000, s.toString)
    } finally q.stop()
  }

  test("stateful sessionize recovers its open sessions across a restart") {
    // MLDBFB-530 analog for STATE: an open session recorded before a
    // stop must survive into the restarted stream (checkpointed
    // flatMapGroupsWithState), then close via the usual event-time
    // timeout. A lost state would emit nothing (or a 1-event session).
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sess_restart").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def write(sub: String, rows: (Long, java.sql.Timestamp, Double)*): Unit =
      rows.toSeq.toDF("key", "ts", "value")
        .coalesce(1).write.parquet(s"$base/in/$sub")
    val schema = Seq((1L, t("2024-01-01 00:00:00"), 1.0))
      .toDF("key", "ts", "value").schema
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
      val sessions = Continuous.sessionizeStream(in, "ts", "key", "value",
        gapMicros = 60L * 1000 * 1000, watermark = "0 seconds")
      val q = sessions.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // phase 1: key 1's session opens (two events inside the gap)
    write("p1", (1L, t("2024-01-01 00:00:00"), 1.0),
      (1L, t("2024-01-01 00:00:30"), 2.0))
    runOnce()
    // phase 2 (after restart): key 2 events advance the watermark far
    // past key 1's gap — the recovered key-1 state must emit via timeout
    write("p2a", (2L, t("2024-01-01 01:00:00"), 5.0))
    write("p2b", (2L, t("2024-01-01 01:00:01"), 5.0))
    runOnce()
    write("p3", (2L, t("2024-01-01 01:00:02"), 5.0))
    runOnce()
    val out = spark.read.parquet(s"$base/out").as[Continuous.SessionOut]
      .collect().toSeq
    assert(out.exists(r => r.key == 1L && r.nEvents == 2 && r.total == 3.0),
      s"open session not recovered across restart: ${out.mkString(",")}")
  }

  test("stateless pipeline ops run unchanged on a stream (quality gate + redaction)") {
    // gopherQuality / redactPii / langId are pure per-row Column math,
    // so the SAME operator code drives a streaming quality filter —
    // no foreachBatch, no state. This is the 100 TB ingest-gate shape:
    // filter documents as they arrive, before anything shuffles.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val good = "the quick brown fox jumps over that lazy dog because " +
      "we have seen it move with great speed and of course style"
    in.addData((1L, good), (2L, "## ## ## ##"), (3L, good + " email me at a@b.com"))
    val docs = in.toDF().toDF("doc_id", "text")
    val gated = graft.operators.TextAnalysis
      .gopherQuality(docs.withColumn("clean",
        graft.functions.TextFunctions.redactPii(col("text"))),
        "doc_id", "text", keep = Seq("clean"))
      .filter(col("pass"))
    val q = gated.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, clean FROM gate_out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet === Set(1L, 3L))
      assert(!out(3L).contains("a@b.com"))
    } finally q.stop()
    // the newer batteries are the same stateless per-row shape — the
    // repetition battery and C4 rules gate a stream with the same code
    val in2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // the passing doc needs enough distinct tokens that its single
    // longest 4-gram stays under the paper's 0.16 char threshold now
    // that once-occurring top grams count (Rae 2021 definition)
    val good2 = (1 to 60).map(i => f"tok$i%02d").mkString(" ") + "."
    in2.addData((1L, good2), (2L, "spam spam spam spam spam spam."))
    val docs2 = in2.toDF().toDF("doc_id", "text")
    val both = graft.operators.TextAnalysis.gopherRepetition(
        graft.operators.TextAnalysis.c4Clean(docs2, "doc_id", "text",
          minSentences = 1).filter(col("keep")),
        "doc_id", "text").filter(col("pass"))
    val q2 = both.writeStream.format("memory").queryName("gate_out2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM gate_out2")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L), "repetitive doc must be gated out on-stream")
    } finally q2.stop()
  }

  test("statsTable getCounts on new data with cold-start zeros") {
    import spark.implicits._
    val trained = StatsTable.table(Tables.events(spark, sf), "event_type",
      col("value") > 100)
    val fresh = Seq("click", "error", "brand_new_type").toDF("event_type")
    val out = StatsTable.getCounts(fresh, trained, "event_type").collect()
    val byType = out.map(r => r.getString(0) ->
      (r.getAs[Long]("trials"), r.getAs[Long]("successes"))).toMap
    assert(byType("brand_new_type") === ((0L, 0L)))
    assert(byType("click")._1 > 0)
  }
}
