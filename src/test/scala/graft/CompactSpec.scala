package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.procedures.Compact

/** Store compaction: small files per partition rewrite to target-sized
  * ones, data and partition layout (pruning) unchanged, re-runs are
  * no-ops, and a streaming sink's _spark_metadata is handled
  * explicitly (refusal by default; retirement on request, after which
  * batch readers see ALL files again — including compacted ones the
  * log would have hidden). */
class CompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_compact_$tag").toString

  private def leafFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("partitioned store: files drop to the byte target, data and " +
      "pruning unchanged, rerun is a no-op") {
    val store = tmpDir("part") + "/store"
    val df = spark.range(0, 3000, 1, 1).toDF("id")
      .withColumn("p_date",
        concat(lit("2026-01-0"), (col("id") % 3 + 1).cast("string")))
      .withColumn("v", col("id") * 7 % 101)
    // force many small files: 12 tasks × 3 partition values
    df.repartition(12).write.partitionBy("p_date").parquet(store)
    val dirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p_date="))
    assert(dirs.length === 3)
    val before = dirs.map(d => leafFiles(d).length)
    assert(before.forall(_ > 1), before.toSeq.toString)
    val wantBefore = spark.read.parquet(store)
      .select(col("id"), col("v"), col("p_date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsScanned === 3)
    assert(rep.partitionsCompacted === 3)
    assert(rep.filesBefore === before.sum)
    assert(rep.filesAfter === 3)
    dirs.foreach(d => assert(leafFiles(d).length === 1, d.toString))

    val after = spark.read.parquet(store)
      .select(col("id"), col("v"), col("p_date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after === wantBefore)
    // partition pruning still works: the directory layout is intact
    val oneDay = spark.read.parquet(store)
      .filter(col("p_date") === "2026-01-02")
    assert(oneDay.count() === wantBefore.count(_._3 == "2026-01-02"))
    assert(oneDay.queryExecution.executedPlan.toString
      .contains("p_date"), "partition filter lost")
    // idempotent: a second run touches nothing
    val rep2 = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep2.partitionsCompacted === 0)
    assert(rep2.filesAfter === 3)
  }

  test("byte target controls the output file count") {
    val store = tmpDir("bytes") + "/store"
    spark.range(0, 20000, 1, 16).toDF("id")
      .withColumn("pad", md5(col("id").cast("string")))
      .write.parquet(store)
    val root = new java.io.File(store)
    val bytes = leafFiles(root).map(_.length).sum
    assert(leafFiles(root).length === 16)
    // pick a target that lands strictly between 1 and 16 files
    val target = bytes / 4
    val rep = Compact.compactStore(spark, store, targetBytes = target)
    val want = ((bytes + target - 1) / target).toInt
    assert(rep.partitionsCompacted === 1)
    assert(leafFiles(root).length === want)
    assert(spark.read.parquet(store).count() === 20000)
  }

  test("nested leaves compact independently: a parent leaf's rewrite " +
      "never absorbs its children's rows") {
    val store = tmpDir("nest") + "/store"
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    spark.range(100, 200, 1, 4).toDF("id").write.parquet(s"$store/sub=1")
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsScanned === 2)
    assert(rep.partitionsCompacted === 2)
    val root = new java.io.File(store)
    val sub = new java.io.File(s"$store/sub=1")
    assert(leafFiles(root).length === 1)
    assert(leafFiles(sub).length === 1)
    // the parent's single compacted file holds ONLY the parent rows —
    // a directory-based rewrite would have recursed into sub=1 and
    // duplicated its rows at this level
    val rootIds = spark.read
      .parquet(leafFiles(root).map(_.getAbsolutePath): _*)
      .collect().map(_.getLong(0)).toSet
    assert(rootIds === (0L until 100L).toSet)
    val subIds = spark.read.parquet(s"$store/sub=1")
      .collect().map(_.getLong(0)).toSet
    assert(subIds === (100L until 200L).toSet)
  }

  test("crash AFTER the commit marker: recovery completes the swap — " +
      "new generation only, no duplicates, marker cleared") {
    val store = tmpDir("crash_post") + "/store"
    // generation 1 visible in the leaf
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    val root = new java.io.File(store)
    val gen1 = leafFiles(root).map(_.getName)
    assert(gen1.size === 4)
    // generation 2 fully staged in the hidden tmp (as step 2 leaves it)
    spark.read.parquet(store).repartition(1)
      .write.parquet(s"$store/.compact_tmp")
    // the commit marker names generation 1 (as step 3 writes it) —
    // this is the exact on-disk state of a crash after the commit
    // point, before any delete/move
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/.compact_commit"),
      gen1.mkString("\n").getBytes("UTF-8"))
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    // recovery ran: exactly the staged generation, nothing doubled
    assert(leafFiles(root).length === 1)
    assert(spark.read.parquet(store).count() === 100)
    assert(spark.read.parquet(store).select("id").distinct().count() === 100)
    assert(!new java.io.File(s"$store/.compact_commit").exists())
    assert(!new java.io.File(s"$store/.compact_tmp").exists())
    assert(rep.partitionsScanned === 1)
  }

  test("crash BEFORE the commit marker: the stale tmp is discarded " +
      "and the old generation compacts normally") {
    val store = tmpDir("crash_pre") + "/store"
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    // a stale, possibly half-written tmp with NO marker — the exact
    // state of a crash before the commit point. Plant WRONG rows in
    // it to prove recovery never trusts an uncommitted generation.
    spark.range(500, 600, 1, 2).toDF("id")
      .write.parquet(s"$store/.compact_tmp")
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    val root = new java.io.File(store)
    assert(rep.partitionsCompacted === 1)
    assert(leafFiles(root).length === 1)
    val ids = spark.read.parquet(store).collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 100L).toSet, "uncommitted tmp leaked in")
    assert(!new java.io.File(s"$store/.compact_tmp").exists())
  }

  test("reader-concurrent swap: readStore sees exactly one complete " +
      "generation at every crash/interleave point") {
    val store = tmpDir("reader") + "/store"
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    val root = new java.io.File(store)
    val gen1 = leafFiles(root).map(_.getName).sorted
    assert(gen1.size === 4)
    // stage generation 2 (two files) in the hidden tmp, tagged cg1- —
    // the exact state step 2 leaves behind
    spark.read.parquet(store).repartition(2)
      .write.parquet(s"$store/.compact_tmp")
    val tmpF = new java.io.File(s"$store/.compact_tmp")
    val staged = Option(tmpF.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(staged.size === 2)
    staged.foreach { f =>
      assert(f.renameTo(new java.io.File(tmpF, s"cg1-${f.getName}")))
    }
    def readState() = {
      val df = Compact.readStore(spark, store)
      (df.collect().map(_.getLong(0)).toSeq.sorted,
        df.inputFiles.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet)
    }
    // state A: tmp complete, NO marker → the OLD generation is live
    val (idsA, filesA) = readState()
    assert(idsA === (0L until 100L))
    assert(filesA.forall(!_.startsWith("cg1-")), filesA)
    // state B: marker committed, nothing moved → the NEW generation is
    // live, served straight from the hidden tmp
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/.compact_commit"),
      ("gen=1\n" + gen1.mkString("\n")).getBytes("UTF-8"))
    val (idsB, filesB) = readState()
    assert(idsB === (0L until 100L))
    assert(filesB.forall(_.startsWith("cg1-")), filesB)
    // state C: HALF the new generation moved in, old fully present —
    // a plain reader double-counts here; readStore must not. Plus a
    // concurrent INGEST file landing mid-swap (not in the marker):
    // always visible.
    val newNames = tmpF.listFiles().filter(_.getName.startsWith("cg1-"))
      .map(_.getName).sorted
    assert(new java.io.File(tmpF, newNames.head)
      .renameTo(new java.io.File(root, newNames.head)))
    spark.range(100, 110, 1, 1).toDF("id")
      .write.parquet(s"$store/.ingest_stage")
    val ing = new java.io.File(s"$store/.ingest_stage").listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_")).head
    assert(ing.renameTo(new java.io.File(root, "part-ingest-mid.parquet")))
    val (idsC, filesC) = readState()
    assert(idsC === (0L until 110L))
    assert(filesC.filterNot(_ == "part-ingest-mid.parquet")
      .forall(_.startsWith("cg1-")), filesC)
    // state D: new generation fully moved in, old fully present
    assert(new java.io.File(tmpF, newNames.last)
      .renameTo(new java.io.File(root, newNames.last)))
    assert(readState()._1 === (0L until 110L))
    // state E: some old deleted
    gen1.take(2).foreach(n => assert(new java.io.File(root, n).delete()))
    assert(readState()._1 === (0L until 110L))
    // state F: all old deleted, marker still pending
    gen1.drop(2).foreach(n => assert(new java.io.File(root, n).delete()))
    assert(readState()._1 === (0L until 110L))
    // state G: marker cleared — swap complete; readStore and a PLAIN
    // reader agree again
    assert(new java.io.File(s"$store/.compact_commit").delete())
    assert(readState()._1 === (0L until 110L))
    assert(spark.read.parquet(store).collect().map(_.getLong(0))
      .toSeq.sorted === (0L until 110L))
  }

  test("readStore on a PARTITIONED store mid-swap keeps partition " +
      "columns and per-leaf generation isolation") {
    val store = tmpDir("reader_part") + "/store"
    spark.range(0, 300, 1, 4).toDF("id")
      .withColumn("p", (col("id") % 3).cast("string"))
      .write.partitionBy("p").parquet(store)
    // freeze the swap inside leaf p=1 only: stage + commit marker,
    // move nothing
    val leaf = new java.io.File(s"$store/p=1")
    val old1 = leafFiles(leaf).map(_.getName).sorted
    assert(old1.nonEmpty)
    spark.read.parquet(leaf.getAbsolutePath).repartition(1)
      .write.parquet(s"$store/p=1/.compact_tmp")
    val tmpF = new java.io.File(s"$store/p=1/.compact_tmp")
    tmpF.listFiles().filter(f => f.isFile &&
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .foreach(f =>
        assert(f.renameTo(new java.io.File(tmpF, s"cg1-${f.getName}"))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/p=1/.compact_commit"),
      ("gen=1\n" + old1.mkString("\n")).getBytes("UTF-8"))
    val df = Compact.readStore(spark, store)
    assert(df.columns.toSet === Set("id", "p"))
    // partition values are INFERRED on read ("1" → int) — stringify
    val byP = df.groupBy("p").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byP === Map("0" -> 100L, "1" -> 100L, "2" -> 100L))
    // the p=1 rows came from the staged generation (inputFiles lists
    // the whole relation, so inspect per-leaf paths directly)
    val p1Files = df.inputFiles.filter(_.contains("/p=1/"))
    assert(p1Files.nonEmpty && p1Files.forall(_.contains("cg1-")),
      p1Files.toSeq)
    // and the untouched leaves read their normal files
    assert(df.inputFiles.filter(_.contains("/p=0/"))
      .forall(!_.contains("cg1-")))
    // p=1 id set is exactly the original rows
    val p1 = df.filter(col("p") === "1").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(p1 === (0L until 300L).filter(_ % 3 == 1).toSet)
  }

  test("compaction lock: a held .compact_lock fails fast; a completed " +
      "run releases it") {
    val store = tmpDir("lock") + "/store"
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/.compact_lock"),
      "pid=held\n".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      Compact.compactStore(spark, store, targetBytes = 1L << 30)
    }
    assert(err.getMessage.contains(".compact_lock"))
    // the held lock was not touched by the failed attempt
    assert(new java.io.File(s"$store/.compact_lock").exists())
    assert(new java.io.File(s"$store/.compact_lock").delete())
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsCompacted === 1)
    assert(!new java.io.File(s"$store/.compact_lock").exists(),
      "lock not released after a successful run")
    assert(spark.read.parquet(store).count() === 100)
  }

  test("non-atomic-rename schemes refuse unless acknowledged") {
    // the guard itself (package-visible): object-store schemes refuse…
    val err = intercept[IllegalArgumentException] {
      Compact.checkRenameAtomicity("s3a", allowNonAtomicRename = false)
    }
    assert(err.getMessage.contains("atomic rename"))
    assert(err.getMessage.contains("allowNonAtomicRename"))
    // …unless explicitly acknowledged; atomic schemes always pass
    Compact.checkRenameAtomicity("s3a", allowNonAtomicRename = true)
    Seq("file", "hdfs", "viewfs").foreach(
      Compact.checkRenameAtomicity(_, allowNonAtomicRename = false))
  }

  test("compacted leaves re-read and recompact across generations " +
      "(cg tags increment, reruns stay no-ops)") {
    val store = tmpDir("gens") + "/store"
    spark.range(0, 5000, 1, 8).toDF("id")
      .withColumn("pad", md5(col("id").cast("string")))
      .write.parquet(store)
    val root = new java.io.File(store)
    val bytes = leafFiles(root).map(_.length).sum
    // first compaction: 8 → ~2 files, tagged cg1-
    val rep1 = Compact.compactStore(spark, store, targetBytes = bytes / 2)
    assert(rep1.partitionsCompacted === 1)
    assert(leafFiles(root).forall(_.getName.startsWith("cg1-")))
    assert(spark.read.parquet(store).count() === 5000)
    // second compaction with a bigger target: cg1 → one cg2 file
    val rep2 = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep2.partitionsCompacted === 1)
    val after = leafFiles(root)
    assert(after.length === 1 && after.head.getName.startsWith("cg2-"),
      after.map(_.getName).toSeq)
    assert(spark.read.parquet(store).count() === 5000)
    assert(spark.read.parquet(store).select("id").distinct().count() === 5000)
    // and a rerun is a no-op
    val rep3 = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep3.partitionsCompacted === 0)
  }

  test("schema evolution across a leaf's files survives compaction " +
      "(footers merged, not sampled)") {
    val store = tmpDir("schema") + "/store"
    spark.range(0, 50, 1, 1).toDF("id").write.parquet(store)
    spark.range(50, 100, 1, 1).toDF("id")
      .withColumn("extra", col("id") * 2)
      .write.mode("append").parquet(store)
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsCompacted === 1)
    val df = spark.read.option("mergeSchema", "true").parquet(store)
    assert(df.columns.toSet === Set("id", "extra"),
      "evolved column dropped by the rewrite")
    assert(df.count() === 100)
    assert(df.filter(col("extra").isNotNull).count() === 50)
  }

  test("continuous.window on a retired store reads through readStore: " +
      "correct mid-swap, day leaves outside the range never listed") {
    import graft.streaming.Continuous
    val store = tmpDir("window") + "/store"
    // three day partitions, several files each, NO sink log (the
    // archived/compactable state)
    val events = spark.range(0, 300, 1, 4).toDF("id")
      .withColumn("ts", timestamp_micros(
        lit(1767225600000000L) + col("id") * 600000000L)) // 2026-01-01+
      .withColumn("p_date", date_format(col("ts"), "yyyy-MM-dd"))
    events.repartition(4).write.partitionBy("p_date").parquet(store)
    val days = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("p_date=")).map(_.getName).sorted
    assert(days.length >= 3)
    // freeze a swap inside the SECOND day: stage cg1, commit marker,
    // move nothing — a plain reader would see an empty leaf after the
    // deletes; readStore must serve the staged generation
    val leaf = new java.io.File(s"$store/${days(1)}")
    val old = leafFiles(leaf).map(_.getName).sorted
    spark.read.parquet(leaf.getAbsolutePath).repartition(1)
      .write.parquet(s"${leaf.getAbsolutePath}/.compact_tmp")
    val tmpF = new java.io.File(leaf, ".compact_tmp")
    tmpF.listFiles().filter(f => f.isFile &&
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .foreach(f =>
        assert(f.renameTo(new java.io.File(tmpF, s"cg1-${f.getName}"))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${leaf.getAbsolutePath}/.compact_commit"),
      ("gen=1\n" + old.mkString("\n")).getBytes("UTF-8"))
    old.foreach(n => assert(new java.io.File(leaf, n).delete()))

    // window ends MID day 2, so day 3 is outside even the inclusive
    // partition-date range and must be pruned from the walk entirely
    val from = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L))
    val to = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L + 129600L))
    val win = Continuous.window(spark, store, "ts", from, to)
    val ids = win.select("id").collect().map(_.getLong(0)).toSet
    // exactly the in-range rows — including the mid-swap day, whose
    // visible leaf is EMPTY right now
    val want = (0L until 300L).filter(_ * 600 < 129600L).toSet
    assert(ids === want, s"got ${ids.size}, want ${want.size}")
    // pruning: the third day's files are not part of the relation
    assert(win.inputFiles.forall(p => !p.contains(days(2))),
      win.inputFiles.filter(_.contains(days(2))).toSeq)
    // and a window over a range with no matching day is empty, not an
    // error (the schema-resolution fallback)
    val none = Continuous.window(spark, store, "ts",
      java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2030-01-02 00:00:00"))
    assert(none.count() === 0)
  }

  test("dataset.compact dispatches as a procedure type") {
    val e = new api.GraftEngine(spark)
    val store = tmpDir("proc") + "/store"
    spark.range(0, 1000, 1, 8).toDF("id")
      .withColumn("p", (col("id") % 2).cast("string"))
      .write.partitionBy("p").parquet(store)
    val res = e.runProcedure("dataset.compact", Map(
      "storeUrl" -> s"file://$store",
      "targetBytes" -> (1L << 30).toString).get _)
    assert(res.contains("\"partitionsCompacted\": 2"), res)
    assert(spark.read.parquet(store).count() === 1000)
    val dirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
    dirs.foreach(d => assert(leafFiles(d).length === 1))
  }

  test("streaming store: refuses without retireStreamMetadata, then " +
      "retires the sink log and keeps continuous.window reads intact") {
    import graft.streaming.Continuous
    val base = tmpDir("stream")
    val events = spark.range(0, 500, 1, 4).toDF("id")
      .withColumn("ts", timestamp_micros(
        lit(1767225600000000L) + col("id") * 60000000L)) // 2026-01-01+
      .withColumn("user_id", col("id") % 7)
    events.select("id", "ts", "user_id").write
      .mode("overwrite").parquet(s"$base/in")
    val streamIn = spark.readStream
      .schema(spark.read.parquet(s"$base/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
    val q = Continuous.record(streamIn, "ts", s"$base/store",
      s"$base/ckpt", availableNowForTest = true)
    q.awaitTermination(120000)
    assert(new java.io.File(s"$base/store/_spark_metadata").exists())
    val from = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L))
    val to = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L + 86400L * 5))
    val want = Continuous.window(spark, s"$base/store", "ts", from, to)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty)

    val refused = intercept[IllegalArgumentException] {
      Compact.compactStore(spark, s"$base/store")
    }
    assert(refused.getMessage.contains("_spark_metadata"))

    val rep = Compact.compactStore(spark, s"$base/store",
      targetBytes = 1L << 30, retireStreamMetadata = true)
    assert(!new java.io.File(s"$base/store/_spark_metadata").exists())
    assert(rep.partitionsCompacted >= 1)
    val after = Continuous.window(spark, s"$base/store", "ts", from, to)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(after === want)
  }

  test("legacy (pre-generation) marker: readStore serves the complete " +
      "UNTAGGED tmp generation, even after the old protocol's deletes") {
    val store = tmpDir("legacy") + "/store"
    spark.range(0, 100, 1, 4).toDF("id").write.parquet(store)
    val root = new java.io.File(store)
    val gen1 = leafFiles(root).map(_.getName).sorted
    // the OLD protocol: tmp generation written with PLAIN (untagged,
    // gen-0) names, marker has no gen= header
    spark.read.parquet(store).repartition(1)
      .write.parquet(s"$store/.compact_tmp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/.compact_commit"),
      gen1.mkString("\n").getBytes("UTF-8"))
    // mid-crash with marker committed: a gen-filtering reader would
    // drop the whole untagged tmp and serve leaf-minus-oldNames
    val dfA = Compact.readStore(spark, store)
    assert(dfA.collect().map(_.getLong(0)).toSeq.sorted === (0L until 100L))
    // worst case — the legacy protocol deleted old files FIRST: the
    // leaf is empty except the marker; everything must come from tmp
    gen1.foreach(n => assert(new java.io.File(root, n).delete()))
    val dfB = Compact.readStore(spark, store)
    assert(dfB.collect().map(_.getLong(0)).toSeq.sorted === (0L until 100L))
    // and compactStore recovery completes the legacy swap for real
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsScanned === 1)
    assert(spark.read.parquet(store).collect().map(_.getLong(0))
      .toSeq.sorted === (0L until 100L))
    assert(!new java.io.File(s"$store/.compact_commit").exists())
  }

  test("janitor: stale tmp/staging orphans with no marker are reaped " +
      "even on the already-compact no-op path") {
    val store = tmpDir("janitor") + "/store"
    // ONE file — already compact, so the rewrite branch never runs
    spark.range(0, 50, 1, 1).toDF("id").write.parquet(store)
    // crash garbage from a dead run: uncommitted tmp + staging marker
    spark.range(900, 950, 1, 1).toDF("id")
      .write.parquet(s"$store/.compact_tmp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/.compact_commit_staging"),
      "gen=9\nwhatever.parquet".getBytes("UTF-8"))
    val rep = Compact.compactStore(spark, store, targetBytes = 1L << 30)
    assert(rep.partitionsCompacted === 0, "no-op leaf must stay no-op")
    assert(!new java.io.File(s"$store/.compact_tmp").exists(),
      "orphaned tmp generation not reaped")
    assert(!new java.io.File(s"$store/.compact_commit_staging").exists(),
      "orphaned staging marker not reaped")
    assert(spark.read.parquet(store).collect().map(_.getLong(0))
      .toSeq.sorted === (0L until 50L))
  }

  test("continuous.window on a retired store with ZERO data files " +
      "returns an empty frame instead of throwing") {
    import graft.streaming.Continuous
    val store = tmpDir("emptywin") + "/store"
    assert(new java.io.File(store).mkdirs())
    val from = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L))
    val to = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1767225600L + 86400L))
    val df = Continuous.window(spark, store, "ts", from, to)
    assert(df.count() === 0L)
  }

  test("concurrent local compactors: the raw-FS O_EXCL lock admits " +
      "exactly one") {
    val store = tmpDir("race") + "/store"
    spark.range(0, 2000, 1, 8).toDF("id").write.parquet(store)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val attempts = Await.result(Future.sequence((1 to 4).map(_ =>
      Future(
        try Right(Compact.compactStore(spark, store,
          targetBytes = 1L << 30))
        catch { case e: IllegalStateException => Left(e) }))),
      Duration.Inf)
    val winners = attempts.collect { case Right(r) => r }
    // at least one run wins; losers fail FAST on the lock, and the
    // store is intact and fully compacted afterwards
    assert(winners.nonEmpty)
    attempts.collect { case Left(e) => e }.foreach(e =>
      assert(e.getMessage.contains(".compact_lock")))
    assert(!new java.io.File(s"$store/.compact_lock").exists())
    assert(spark.read.parquet(store).collect().map(_.getLong(0))
      .toSeq.sorted === (0L until 2000L))
  }
}
