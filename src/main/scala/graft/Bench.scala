package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once (parquet footers, codegen, JIT)
    // so per-query timings measure the query, not first-touch setup.
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Throughput counters matching BASELINE.md's reference claims
    // ("several million rows per second" CSV ingest; "up to 500,000
    // events/sec" continuous ingest). Setup (staging files) untimed.
    val throughput = try {
      import org.apache.spark.sql.functions.col
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
      // CSV ingest: stage lineitem as CSV, time schema-given re-import
      val li = graft.core.Tables.lineitem(spark, sfDir)
      graft.sources.Sources.exportCsv(li, s"$tmp/csv")
      val schema = li.schema
      val nRows = li.count()
      val t0 = System.nanoTime()
      val csvN = graft.sources.Sources.importText(spark, s"$tmp/csv",
        graft.sources.Sources.TextImportConfig(schema = Some(schema))).count()
      val csvSec = (System.nanoTime() - t0) / 1e9
      // streaming ingest: events through the continuous dataset
      val ev = graft.core.Tables.events(spark, sfDir)
      ev.write.parquet(s"$tmp/stream_in")
      val evN = ev.count()
      val streamIn = spark.readStream
        .schema(spark.read.parquet(s"$tmp/stream_in").schema)
        .parquet(s"$tmp/stream_in")
      val t1 = System.nanoTime()
      val q = graft.streaming.Continuous.record(streamIn, "ts",
        s"$tmp/store", s"$tmp/ckpt", availableNowForTest = true)
      q.awaitTermination(300000)
      val streamSec = (System.nanoTime() - t1) / 1e9
      s""","csv_ingest_rows_per_sec":${(csvN / csvSec).toLong}""" +
        s""","stream_ingest_events_per_sec":${(evN / streamSec).toLong}"""
    } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$throughput,"sf":"$sfDir"}""")
    spark.stop()
  }
}
