package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling entry — times plan variants for hot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    // mimic Bench warmup: tables + tiny-SF query pass
    graft.core.Tables.documents(spark, d).count()
    time("warm q46 sf0.001")(SparkEntry.queries("q46_dedup_minhash")(spark, "/root/testdata/sf0.001").count())
    // timed, Bench-like single shot at sf0.1
    val docs = {
      import graft.core.Tables
      val dd = Tables.documents(spark, d)
      dd.unionByName(dd.select((col("doc_id") + 1000000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
    }
    time("base persist+count") {
      val base = docs.select(col("doc_id").as("id"),
        graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("sh"))
        .withColumn("sig", graft.functions.TextFunctions.minHashFromHashes(col("sh"), 32))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
    }
    time("q46 bench-like")(SparkEntry.queries("q46_dedup_minhash")(spark, d).count())
    time("q46 again")(SparkEntry.queries("q46_dedup_minhash")(spark, d).count())
    spark.stop()
  }
}
