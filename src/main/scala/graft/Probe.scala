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
    import graft.procedures.Procedures
    // warm: JIT + parquet footers
    SparkEntry.queries("q126_summary_quartiles")(spark, "/root/testdata/sf0.001").count()
    val li = Tables.lineitem(spark, d).select("l_extendedprice", "l_quantity")
    li.count()
    time("pass1 agg only") {
      val aggs = Seq("l_extendedprice", "l_quantity").flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"),
          countDistinct(col(c).cast("string")).as(s"${c}__u"),
          min(col(c)).as(s"${c}__mn"), max(col(c)).as(s"${c}__mx"),
          avg(col(c)).as(s"${c}__av"), stddev_samp(col(c)).as(s"${c}__sd"))
      }
      li.agg(aggs.head, aggs.tail: _*).head(); 1
    }
    time("summaryStatisticsReference") {
      Procedures.summaryStatisticsReference(li,
        Seq("l_extendedprice", "l_quantity")).size
    }
    time("ssr again (warm)") {
      Procedures.summaryStatisticsReference(li,
        Seq("l_extendedprice", "l_quantity")).size
    }
    val grouped = li.select(explode(array(
      struct(lit("l_extendedprice").as("c"), col("l_extendedprice").as("v")),
      struct(lit("l_quantity").as("c"), col("l_quantity").as("v")))).as("cv"))
      .select(col("cv.c").as("c"), col("cv.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("c"), col("v")).agg(count(lit(1)).as("cnt"))
    time("grouped count table")(grouped.count())
    val pinned = graft.core.DfOps.cut(grouped)
    val nn = Map("l_extendedprice" -> 600572L, "l_quantity" -> 600572L)
    time("quartile frame")(Procedures.numericQuartileFrame(pinned, nn).collect().length)
    time("top-10 frame")(Procedures.topFrequentFrame(pinned).collect().length)
    spark.stop()
  }
}
