package graft.procedures

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Parquet store compaction — the operational fix for the small-files
  * problem every long-running ingest accumulates (the continuous
  * store's own docs measure the failure mode: thousands of per-batch
  * files turned streaming ingest into file-creation overhead, and on
  * the read side every query pays a task per file). Not part of the
  * reference surface: its single-node storage rotates behemoth files
  * by commit interval (`plugins/behaviour` dataset docs); a
  * partitioned parquet store at 100 TB needs the opposite —
  * periodically rewriting each partition's accumulated small files
  * into ~target-sized ones.
  *
  * Mechanics, per leaf directory (a partition dir like
  * `p_date=2026-01-07`, or the store root when unpartitioned) — a
  * marker-file write-ahead protocol, so a crash at ANY point loses no
  * rows and duplicates none:
  *
  *  0. RECOVER: a pending marker from an interrupted run means its
  *     hidden tmp generation was fully written — finish that swap
  *     first (delete the old files the marker lists, move the
  *     remaining tmp files in, clear the marker);
  *  1. list the parquet data files; skip the leaf when
  *     `ceil(bytes / targetBytes)` already matches the file count
  *     (re-running is a no-op);
  *  2. rewrite the CAPTURED file list as `ceil(bytes/targetBytes)`
  *     files into a hidden sibling dir (dot-prefixed, so a concurrent
  *     lister never sees it);
  *  3. COMMIT: atomically rename a marker file into place listing the
  *     old generation's names; only then delete the old files and
  *     move the new ones in, and finally clear the marker.
  *
  * Crash matrix: before 3's marker → old generation intact, stale tmp
  * ignored and rebuilt on rerun; after the marker → step 0 completes
  * the swap on the next run. At no point are both generations visible
  * (old files are deleted BEFORE new ones move in; in that window the
  * data lives only in the hidden tmp — invisible to a concurrent
  * reader, which is why this is an offline/maintenance operation by
  * contract, like every parquet compactor).
  *
  * A store written by a STREAMING sink carries `_spark_metadata`;
  * batch readers then trust that log and would not see compacted
  * files, so compaction refuses unless `retireStreamMetadata = true`,
  * which renames the log aside (`_spark_metadata` → hidden
  * `.spark_metadata_retired*`) and drops the store back to plain
  * directory listing — the right shape for a finished/archived
  * stream (day partitions are immutable once the watermark passes).
  * Partition-pruning behavior is unchanged: the directory layout is
  * preserved, only files within each leaf are rewritten.
  */
object Compact {

  final case class LeafReport(dir: String, filesBefore: Int,
      filesAfter: Int, bytes: Long, compacted: Boolean)

  final case class CompactReport(leaves: Seq[LeafReport]) {
    def partitionsScanned: Int = leaves.size
    def partitionsCompacted: Int = leaves.count(_.compacted)
    def filesBefore: Int = leaves.map(_.filesBefore).sum
    def filesAfter: Int = leaves.map(_.filesAfter).sum
  }

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
  }

  private def isHidden(p: Path): Boolean =
    p.getName.startsWith("_") || p.getName.startsWith(".")

  /** Leaf dirs = directories that directly contain parquet data files.
    * The walk is driver-side but #files-sized — the same cost every
    * Spark read of the store already pays in its file index. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).toSeq
      val subdirs = entries.filter(e => e.isDirectory && !isHidden(e.getPath))
      // a pending commit marker counts as data: the crash it records
      // may have deleted every visible file, and recovery must still
      // find the leaf
      val hasData = entries.exists(e =>
        e.isFile && isDataFile(e.getPath)) ||
        entries.exists(e => e.getPath.getName == ".compact_commit")
      (if (hasData) Seq(dir) else Nil) ++ subdirs.flatMap(e => walk(e.getPath))
    }
    walk(root)
  }

  def compactStore(spark: SparkSession, storePath: String,
      targetBytes: Long = 128L << 20,
      retireStreamMetadata: Boolean = false): CompactReport = {
    require(targetBytes > 0, "targetBytes must be positive")
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no store at $storePath")
    val meta = new Path(root, "_spark_metadata")
    if (fs.exists(meta)) {
      require(retireStreamMetadata,
        s"$storePath carries _spark_metadata (a streaming sink log); " +
          "batch readers trust it and would miss compacted files. Pass " +
          "retireStreamMetadata=true to rename it aside — only do this " +
          "for a finished/archived stream.")
      var i = 0
      var dest = new Path(root, ".spark_metadata_retired")
      while (fs.exists(dest)) { i += 1
        dest = new Path(root, s".spark_metadata_retired$i") }
      require(fs.rename(meta, dest),
        s"could not retire $meta to $dest")
    }
    // tmp and marker live INSIDE the leaf (hidden, so listers skip
    // them): a crash that already deleted the leaf's data files must
    // still leave the leaf discoverable for recovery, and the store
    // root has no usable parent
    def tmpOf(leaf: Path) = new Path(leaf, ".compact_tmp")
    def markerOf(leaf: Path) = new Path(leaf, ".compact_commit")

    /** Delete the old generation, move the tmp generation in, clear
      * the marker — each half idempotent, so this is both the normal
      * step-3 swap and the step-0 crash recovery. */
    def completeSwap(leaf: Path, oldNames: Seq[String]): Int = {
      val tmp = tmpOf(leaf); val marker = markerOf(leaf)
      oldNames.foreach(n => fs.delete(new Path(leaf, n), false))
      val moved =
        if (fs.exists(tmp))
          fs.listStatus(tmp).toSeq
            .filter(e => e.isFile && isDataFile(e.getPath))
            .map { f =>
              require(fs.rename(f.getPath,
                new Path(leaf, f.getPath.getName)),
                s"could not move ${f.getPath} into $leaf")
              f.getPath.getName
            }
        else Nil
      fs.delete(marker, false)
      fs.delete(tmp, true)
      moved.size
    }

    def readMarker(marker: Path): Seq[String] = {
      val in = fs.open(marker)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').toSeq.filter(_.nonEmpty)
      finally in.close()
    }

    def writeMarker(leaf: Path, oldNames: Seq[String]): Unit = {
      // stage the content under a different hidden name, then RENAME
      // into place — rename is the atomic primitive, so a half-written
      // marker can never be mistaken for a commit
      val marker = markerOf(leaf)
      val staging = new Path(leaf, ".compact_commit_staging")
      val out = fs.create(staging, true)
      try out.write(oldNames.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(staging, marker), s"could not commit $marker")
    }

    def compactLeaf(leaf: Path): LeafReport = {
      // step 0: a pending marker means a prior run crashed after its
      // commit point — its tmp generation is complete; finish the swap
      val marker = markerOf(leaf)
      if (fs.exists(marker)) completeSwap(leaf, readMarker(marker))
      val old = fs.listStatus(leaf).toSeq
        .filter(e => e.isFile && isDataFile(e.getPath))
      val bytes = old.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (old.size <= want)
        LeafReport(leaf.toString, old.size, old.size, bytes,
          compacted = false)
      else {
        // hidden sibling: dot-prefixed paths are invisible to Spark's
        // file listing, so a crash can never expose a half-written dir.
        // A stale tmp with NO marker is a pre-commit crash — rebuild.
        val tmp = tmpOf(leaf)
        if (fs.exists(tmp)) fs.delete(tmp, true)
        // read the CAPTURED file list, not the directory: a directory
        // read would recurse into nested partition subdirs and the
        // swap would then duplicate their rows at this level
        spark.read.parquet(old.map(_.getPath.toString): _*)
          .repartition(want)
          .write.parquet(tmp.toString)
        writeMarker(leaf, old.map(_.getPath.getName))
        val after = completeSwap(leaf, old.map(_.getPath.getName))
        LeafReport(leaf.toString, old.size, after, bytes,
          compacted = true)
      }
    }
    // leaves are independent (distinct dirs) and each rewrite is a
    // small job, so run them through a FIXED 8-thread pool — 8 leaves
    // stay in flight continuously (a batched barrier would gate each
    // batch on its slowest leaf; one fat partition per batch would
    // idle the other seven slots)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val exec = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(exec)
    val reports =
      try Await.result(
        Future.sequence(leafDirs(fs, root).map(l =>
          Future(compactLeaf(l)))), Duration.Inf)
      finally exec.shutdown()
    CompactReport(reports)
  }
}
