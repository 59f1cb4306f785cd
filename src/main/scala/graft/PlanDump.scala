package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries into
  * `plans/r15/<query>_<tag>.txt` — the optimization round's
  * before/after plan evidence. Usage:
  *   sbt "runMain graft.PlanDump [dir=plans/rNN] <tag> <query> [<query> ...]"
  * Tag is typically `before` or `after`. Uses the Bench session shape
  * (AQE on, shuffle.partitions = SPARK_GRAFT_CPUS) so the captured
  * initial plans match what Bench executes.
  */
object PlanDump {
  def main(args0: Array[String]): Unit = {
    val outDir = args0.find(_.startsWith("dir="))
      .map(_.drop(4)).getOrElse("plans/r15")
    val args = args0.filterNot(_.startsWith("dir="))
    require(args.length >= 2, "usage: PlanDump [dir=...] <tag> <query>...")
    val tag = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    names.foreach { n =>
      val fn = all.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      // eager side work inside some query builders (count-table
      // collects, checkpoint cuts) runs here — the dumped plan is the
      // FINAL returned frame's, which is what Bench's action executes
      val df = fn(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(out.resolve(s"${n}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
