package graft

import org.apache.spark.sql.SparkSession

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
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"== $d")
      // warm
      SparkEntry.queries("q70_svm")(spark, "/root/testdata/sf0.001").collect()
      SparkEntry.queries("q71_categorical")(spark, "/root/testdata/sf0.001").collect()
      time("q70_svm")(SparkEntry.queries("q70_svm")(spark, d)
        .collect().map(r => r.getString(0) + "=" + r.getLong(1)).mkString(","))
      time("q71_categorical")(SparkEntry.queries("q71_categorical")(spark, d)
        .collect().map(r => r.getString(0) + "=" + r.getLong(1)).mkString(","))
      time("q56_classifier")(SparkEntry.queries("q56_classifier")(spark, d)
        .collect().map(r => r.getString(0) + "=" + r.getLong(1)).mkString(","))
    }
    spark.stop()
  }
}
