package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Git

/** Builds a throwaway git repository with planted commits (names,
  * dates, line counts, a binary file) and asserts the import
  * reproduces them — the full CLI-parse path, no mocks. */
class GitImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(dir: String, env: Map[String, String], cmd: String*): Unit = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(dir))
    val e = pb.environment()
    env.foreach { case (k, v) => e.put(k, v) }
    val p = pb.start()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")}: $err")
  }

  private def fixtureRepo(): String = {
    val dir = Files.createTempDirectory("gitimport").toString
    val envBase = Map(
      "GIT_AUTHOR_NAME" -> "Ada Author", "GIT_AUTHOR_EMAIL" -> "ada@x.org",
      "GIT_COMMITTER_NAME" -> "Cab Committer",
      "GIT_COMMITTER_EMAIL" -> "cab@x.org",
      "GIT_CONFIG_GLOBAL" -> "/dev/null", "GIT_CONFIG_SYSTEM" -> "/dev/null")
    run(dir, envBase, "git", "init", "-q", "-b", "main")
    Files.write(Paths.get(dir, "a.txt"), "one\ntwo\nthree\n".getBytes)
    Files.write(Paths.get(dir, "b.bin"), Array[Byte](0, 1, 2, 0, 3))
    run(dir, envBase, "git", "add", ".")
    run(dir, envBase ++ Map(
      "GIT_AUTHOR_DATE" -> "1700000000 +0000",
      "GIT_COMMITTER_DATE" -> "1700000000 +0000"),
      "git", "commit", "-q", "-m", "first commit")
    Files.write(Paths.get(dir, "a.txt"), "one\nTWO\nthree\nfour\nfive\n".getBytes)
    run(dir, envBase, "git", "add", ".")
    run(dir, envBase ++ Map(
      "GIT_AUTHOR_DATE" -> "1700000100 +0000",
      "GIT_COMMITTER_DATE" -> "1700000100 +0000"),
      "git", "commit", "-q", "-m", "second commit\n\nwith body")
    dir
  }

  test("git import reproduces planted history, stats, and identities") {
    val dir = fixtureRepo()
    val df = Git.importGit(spark, dir).orderBy(col("ts"))
    val rows = df.collect()
    assert(rows.length == 2)

    val first = rows(0)
    assert(first.getAs[String]("committer") == "Cab Committer")
    assert(first.getAs[String]("committerEmail") == "cab@x.org")
    assert(first.getAs[String]("author") == "Ada Author")
    assert(first.getAs[String]("authorEmail") == "ada@x.org")
    assert(first.getAs[String]("message") == "first commit")
    assert(first.getAs[Int]("parentCount") == 0)
    assert(first.getAs[java.sql.Timestamp]("ts").getTime == 1700000000000L)
    // a.txt +3, b.bin binary (null counts, still counted as a file)
    assert(first.getAs[Long]("insertions") == 3L)
    assert(first.getAs[Long]("filesChanged") == 2L)
    val files1 = first.getSeq[org.apache.spark.sql.Row](first.fieldIndex("files"))
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(files1("a.txt") == ((Some(3L), Some(0L))))
    assert(files1("b.bin") == ((None, None)))

    val second = rows(1)
    assert(second.getAs[String]("message") == "second commit\n\nwith body")
    assert(second.getAs[Int]("parentCount") == 1)
    assert(second.getSeq[String](second.fieldIndex("parents")) ==
      Seq(first.getAs[String]("commit")))
    // one line changed + two added = +3 -1
    assert(second.getAs[Long]("insertions") == 3L)
    assert(second.getAs[Long]("deletions") == 1L)
    assert(second.getAs[Long]("filesChanged") == 1L)

    // distributed form: per-file explode matches the numstat detail
    val exploded = df.select(col("commit"), explode(col("files")).as("f"))
      .select(col("f.path")).collect().map(_.getString(0))
    assert(exploded.count(_ == "a.txt") == 2)
  }

  test("git import without stats leaves counters null") {
    val dir = fixtureRepo()
    val df = Git.importGit(spark, dir, importStats = false)
    assert(df.filter(col("insertions").isNotNull ||
      col("files").isNotNull).count() == 0)
    assert(df.count() == 2)
  }
}
