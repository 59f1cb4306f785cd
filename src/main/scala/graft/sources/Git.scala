package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `import.git` — import a git repository's commit history as a
  * dataset, mirroring the reference's
  * `plugins/git/git.cc:317-356` row shape: one row per commit keyed
  * by the commit id, with committer/author identity, message, parent
  * ids, and (when `importStats`) the insertions/deletions/filesChanged
  * counters plus per-file numstat detail. Cell timestamp = the commit
  * time, exactly as the reference stamps every cell.
  *
  * The reference walks the repo with libgit2; this implementation
  * drives the `git` CLI (`git log --numstat`) and streams its output —
  * same data, no native dependency. Per-file detail lands in a typed
  * `files array<struct<path,insertions,deletions>>` column instead of
  * the reference's dotted `file.<path>.insertions` EAV columns (§1.4
  * mapping: nested data is a typed struct, not a name encoding);
  * `explode(files)` recovers the per-file view. Binary files (numstat
  * `-`) carry null counts. Renames keep numstat's `old => new` path
  * syntax.
  *
  * Scale: history parsing is inherently a single sequential walk of
  * one repository (the reference is single-node here too); the parsed
  * history enters the cluster as a DataFrame, so downstream analytics
  * distribute. For many repositories, call per repo and union.
  */
object Git {

  private val fileSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("insertions", LongType),
    StructField("deletions", LongType)))

  private val schema = StructType(Seq(
    StructField("commit", StringType, nullable = false),
    StructField("committer", StringType),
    StructField("committerEmail", StringType),
    StructField("author", StringType),
    StructField("authorEmail", StringType),
    StructField("ts", TimestampType),
    StructField("message", StringType),
    StructField("parentCount", IntegerType),
    StructField("parents", ArrayType(StringType, containsNull = false)),
    StructField("insertions", LongType),
    StructField("deletions", LongType),
    StructField("filesChanged", LongType),
    StructField("files", ArrayType(fileSchema, containsNull = false))))

  // record separator \x01 … field separator \x02 … message terminator \x03
  private val Fmt = "%x01%H%x02%cN%x02%cE%x02%aN%x02%aE%x02%ct%x02%P%x02%B%x03"

  def importGit(spark: SparkSession, repoPath: String,
      revisions: Seq[String] = Seq("HEAD"),
      importStats: Boolean = true,
      limit: Option[Int] = None): DataFrame = {
    val cmd = Seq("git", "-C", repoPath, "log", s"--format=$Fmt") ++
      (if (importStats) Seq("--numstat") else Seq.empty) ++
      limit.map(n => s"-n$n").toSeq ++ revisions
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(false).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    if (proc.waitFor() != 0)
      throw new IllegalArgumentException(
        s"git log failed for $repoPath: ${err.take(500)}")

    val rows = ArrayBuffer.empty[Row]
    // records are \x01-delimited; inside each: 8 \x02-separated fields,
    // the last (message) \x03-terminated, then numstat lines
    for (rec <- out.split('\u0001') if rec.nonEmpty) {
      val msgEnd = rec.indexOf('\u0003')
      if (msgEnd >= 0) {
        val fields = rec.substring(0, msgEnd).split("\u0002", -1)
        if (fields.length >= 8) {
          val parents = fields(6).trim match {
            case "" => Array.empty[String]
            case p => p.split(' ')
          }
          val files = ArrayBuffer.empty[Row]
          var ins = 0L; var del = 0L
          for (line <- rec.substring(msgEnd + 1).split('\n')
               if line.contains('\t')) {
            val parts = line.split('\t')
            if (parts.length >= 3) {
              val i = parseCount(parts(0))
              val d = parseCount(parts(1))
              ins += i.map(_.longValue).getOrElse(0L)
              del += d.map(_.longValue).getOrElse(0L)
              files += Row(parts(2), i.orNull, d.orNull)
            }
          }
          rows += Row(
            fields(0), fields(1), fields(2), fields(3), fields(4),
            new java.sql.Timestamp(fields(5).trim.toLong * 1000L),
            fields(7).trim,
            parents.length, parents.toSeq,
            if (importStats) ins else null,
            if (importStats) del else null,
            if (importStats) files.size.toLong else null,
            if (importStats) files.toSeq else null)
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 10000)),
      schema)
  }

  private def parseCount(s: String): Option[java.lang.Long] =
    if (s == "-") None else try Some(Long.box(s.trim.toLong)) catch {
      case _: NumberFormatException => None
    }
}
