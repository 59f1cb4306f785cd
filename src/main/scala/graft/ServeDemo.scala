package graft
import org.apache.spark.sql.SparkSession
/** Demo main: serve the REST façade for a fixed window (dev tool). */
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = new graft.api.GraftEngine(spark)
    graft.core.Tables.names.foreach(t =>
      e.createDatasetFromParquet(t, s"/root/testdata/sf0.001/$t.parquet"))
    val srv = new graft.api.RestServer(e, 18642)
    srv.start()
    println("[serve] listening on 18642")
    Thread.sleep(args.headOption.map(_.toLong).getOrElse(45000L))
    srv.stop()
    spark.stop()
  }
}
