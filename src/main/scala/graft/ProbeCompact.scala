package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: q127 wall time vs compaction pool size. */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val fn = SparkEntry.queries("q127_compact_store")
    fn(spark, "/root/testdata/sf0.001").count() // warm
    for (t <- Seq("8", "16", "8", "16", "4", "12")) {
      spark.conf.set("graft.compact.threads", t)
      val t0 = System.nanoTime()
      fn(spark, d).count()
      println(f"[probe] threads=$t%-3s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
