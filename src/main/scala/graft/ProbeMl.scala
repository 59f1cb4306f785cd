package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: attribute the ML block's time (q55-q64 battery) —
  * per-query wall time, GC time delta, and Spark job count, at a
  * configurable core count. Args: optional /data/dir, optional c=N
  * (cores, default 32), optional r=N (reps, default 5), then query
  * names (default: the ML block in bench order). */
object ProbeMl {
  def main(args: Array[String]): Unit = {
    val dirArg = args.find(_.startsWith("/"))
    val cpus = args.find(_.startsWith("c="))
      .map(_.drop(2).toInt).getOrElse(32)
    val reps = args.find(_.startsWith("r="))
      .map(_.drop(2).toInt).getOrElse(5)
    val names0 = args.filterNot(a => a.startsWith("/") ||
      a.startsWith("c=") || a.startsWith("r=")).toSeq
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = dirArg.getOrElse("/root/testdata/sf0.1")
    println(s"[probe] data dir: $d cores: $cpus reps: $reps")
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyQueries
    val names =
      if (names0.nonEmpty) names0.map(n => all.keys.find(_.startsWith(n)).getOrElse(n))
      else Seq("q55_kmeans", "q56_classifier", "q57_svd", "q58_tfidf",
        "q59_regression", "q60_sql_agg", "q61_sql_join", "q62_sql_named_when",
        "q63_sql_distinct_on", "q64_sql_case_scan")
    if (args.contains("floor")) {
      // raw Spark-core job overhead: treeAggregate loop over a cached
      // 1-partition RDD of 10k small vectors (the MLlib iteration shape)
      val rdd = spark.sparkContext.parallelize(
        (1 to 10000).map(i => Array.fill(17)(i.toDouble)), 1).cache()
      rdd.count()
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < 100) {
          rdd.treeAggregate(new Array[Double](17))(
            (acc, v) => { var j = 0; while (j < 17) { acc(j) += v(j); j += 1 }; acc },
            (a, b) => { var j = 0; while (j < 17) { a(j) += b(j); j += 1 }; a })
          i += 1
        }
        println(f"[probe] floor: 100 treeAggregate jobs in ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      }
      spark.stop(); return
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val traceJobs = args.contains("trace")
    val listener = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) starts.put(j.jobId, (System.nanoTime(),
          j.properties.getProperty("callSite.short", "?")))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (traceJobs) Option(starts.remove(j.jobId)).foreach { case (t0, cs) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $cs")
        }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // warm: JIT/codegen at the small SF
    names.foreach(n => try all(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[probe] warm $n: $e") })
    val samples = scala.collection.mutable.Map.empty[String, Vector[(Double, Long, Int, Int)]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; n <- names) {
      Thread.sleep(50) // let the listener bus drain between queries
      val (g0, j0, k0) = (gcMs, listener.jobs.get, listener.tasks.get)
      val t0 = System.nanoTime()
      try all(n)(spark, d).count() catch { case e: Throwable => println(s"[probe] $n: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      samples(n) = samples(n) :+ ((sec, gcMs - g0, listener.jobs.get - j0,
        listener.tasks.get - k0))
    }
    println(f"[probe] ${"query"}%-26s med    min    max   gcMed jobs tasks")
    names.foreach { n =>
      val s = samples(n).sortBy(_._1)
      val m = s(s.length / 2)
      println(f"[probe] $n%-26s ${m._1}%5.2f  ${s.head._1}%5.2f  ${s.last._1}%5.2f  ${m._2}%5d ${m._3}%4d ${m._4}%5d")
    }
    spark.stop()
  }
}
