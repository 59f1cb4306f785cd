package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does q46's time go? */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    import graft.functions.{TextFunctions => T}
    val d = "/root/testdata/sf0.1"
    SparkEntry.queries("q46_dedup_minhash")(spark, "/root/testdata/sf0.001").count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n)")
    }
    val docs = Tables.documents(spark, d)
    for (_ <- 1 to 3) {
      time("shingle+sig pass (count)") {
        docs.select(col("doc_id").as("id"),
          T.shingleHashes(col("text"), 3).as("sh"))
          .withColumn("sig", T.minHashFromHashes(col("sh"), 32))
          .write.format("noop").mode("overwrite").save(); 1
      }
      time("minHashPairs (cut incl.)") {
        graft.operators.Dedup.minHashPairs(docs, "text", "doc_id").count()
      }
      time("q46 full") {
        SparkEntry.queries("q46_dedup_minhash")(spark, d).count()
      }
    }
    spark.stop()
  }
}
