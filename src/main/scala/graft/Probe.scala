package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling entry — times plan variants for hot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val emb = graft.core.Tables.embeddings(spark, d)
    time("scan count")(emb.count())
    time("scan count again")(emb.count())
    time("q44 full")(SparkEntry.queries("q44_embedding_norm")(spark, d).count())
    time("q44 collect-ish")(SparkEntry.queries("q44_embedding_norm")(spark, d)
      .agg(sum("l2")).count())
    time("norm only")(emb.select(
      graft.functions.VectorFunctions.norm(col("embedding")).as("l2"))
      .agg(sum("l2")).count())
    time("q42 token_freq")(SparkEntry.queries("q42_token_freq")(spark, d).count())
    time("q46 minhash")(SparkEntry.queries("q46_dedup_minhash")(spark, d).count())
    spark.stop()
  }
}
