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
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    val d = "/root/testdata/sf0.1"
    import graft.core.Tables
    import graft.operators.{Dedup, TextAnalysis}
    import graft.functions.{TextFunctions => T}
    // warm
    SparkEntry.queries("q105_curation_capstone")(spark, "/root/testdata/sf0.001").count()
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val doubled = docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("source"), col("text")))
    val ded = Dedup.exact(doubled, "text", "doc_id")
    time("exact dedup")(ded.count())
    val pages = ded.select(col("doc_id"), col("source"), concat(
      lit("PROMO click here to subscribe\n"),
      lit("shared quote block "),
      floor(col("doc_id") / lit(7.0)).cast("long").cast("string"),
      lit("\n"), col("text")).as("text"))
    val cleaned = TextAnalysis.lineDedup(pages, "doc_id", "text",
      dropThreshold = 50L)
      .join(pages.select(col("doc_id"), col("source")), Seq("doc_id"))
    time("+ lineDedup")(cleaned.count())
    val qualGated = TextAnalysis.gopherQuality(cleaned, "doc_id", "text",
        keep = Seq("text", "source"),
        stopwords = Seq("the", "a", "table", "value"), minStop = 3)
      .filter(col("pass")).select("doc_id", "text", "source")
    time("+ quality gate")(qualGated.count())
    val gated = TextAnalysis.gopherRepetition(qualGated, "doc_id", "text",
        keep = Seq("text", "source"))
      .filter(col("pass")).select("doc_id", "text", "source")
    time("+ gated (both)")(gated.count())
    val bench = Tables.documents(spark, d).filter(col("doc_id") < 50)
    val keepIds = TextAnalysis
      .contamination(gated, "doc_id", "text", bench, "text")
      .filter(col("contamination") < 0.8)
      .select(col("id").as("doc_id"))
    time("+ contamination")(keepIds.count())
    val fin = gated.join(keepIds, Seq("doc_id"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(T.tokenCount(col("text")).cast("long")).as("n_tokens"))
    time("full chain")(fin.count())
    spark.stop()
  }
}
