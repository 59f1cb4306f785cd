package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: median-of-N timings for the r14-touched queries, in
  * interleaved sweeps (the Bench discipline) so a load spike lands on
  * at most one sample per query. */
object ProbeTouched {
  def main(args: Array[String]): Unit = {
    // a leading /path argument selects the data dir (the sbt server
    // keeps its own env, so PROBE_SF_DIR doesn't reach a forked run)
    val (dirArg, nameArgs) = args.toSeq.partition(_.startsWith("/"))
    val names =
      if (nameArgs.nonEmpty) nameArgs
      else Seq("q89_lm_perplexity", "q100_semantic_dedup", "q101_dsir",
        "q103_pipeline_e2e", "q114_dedup_transitive",
        "q126_summary_quartiles", "q127_compact_store")
    val reps = sys.env.getOrElse("PROBE_REPS", "5").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = dirArg.headOption
      .getOrElse(sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1"))
    println(s"[probe] data dir: $d")
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    // warm: JIT/codegen at the small SF
    names.foreach(n => try all(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () })
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      try all(n)(spark, d).count() catch { case _: Throwable => () }
      samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val s = samples(n).sorted
      val med = s(s.length / 2)
      println(f"[probe] $n%-28s med=$med%6.2f  min=${s.head}%6.2f  max=${s.last}%6.2f")
    }
    spark.stop()
  }
}
