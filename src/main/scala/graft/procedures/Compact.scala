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
  * `p_date=2026-01-07`, or the store root when unpartitioned):
  *
  *  1. list the parquet data files; skip the leaf when
  *     `ceil(bytes / targetBytes)` already matches the file count
  *     (re-running is a no-op);
  *  2. read ONLY that leaf and rewrite it as `ceil(bytes/targetBytes)`
  *     files into a hidden sibling dir (dot-prefixed, so a concurrent
  *     lister never sees it);
  *  3. move the new files in, THEN delete the old ones (captured in
  *     step 1). A crash between 3's halves can leave both
  *     generations visible — a RERUN SELF-HEALS: it compacts
  *     old+new together and deletes both. The brief double-read
  *     window makes this an offline/maintenance operation by
  *     contract, like every parquet compactor.
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
      val hasData = entries.exists(e => e.isFile && isDataFile(e.getPath))
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
    def compactLeaf(leaf: Path): LeafReport = {
      val old = fs.listStatus(leaf).toSeq
        .filter(e => e.isFile && isDataFile(e.getPath))
      val bytes = old.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (old.size <= want)
        LeafReport(leaf.toString, old.size, old.size, bytes,
          compacted = false)
      else {
        // hidden sibling: dot-prefixed paths are invisible to Spark's
        // file listing, so a crash can never expose a half-written dir
        val tmp = new Path(leaf.getParent, s".compact_tmp_${leaf.getName}")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        // read the CAPTURED file list, not the directory: a directory
        // read would recurse into nested partition subdirs and the
        // swap would then duplicate their rows at this level
        spark.read.parquet(old.map(_.getPath.toString): _*)
          .repartition(want)
          .write.parquet(tmp.toString)
        val fresh = fs.listStatus(tmp).toSeq
          .filter(e => e.isFile && isDataFile(e.getPath))
        // move in, then delete the captured old generation — see the
        // crash-window contract in the class doc
        fresh.foreach { f =>
          require(fs.rename(f.getPath, new Path(leaf, f.getPath.getName)),
            s"could not move ${f.getPath} into $leaf")
        }
        old.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
        LeafReport(leaf.toString, old.size, fresh.size, bytes,
          compacted = true)
      }
    }
    // leaves are independent (distinct dirs) and each rewrite is a
    // small job, so submit a bounded window of them concurrently —
    // a 90-day store compacts as ~8 parallel streams of tiny jobs
    // instead of 90 back-to-back driver round-trips
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val reports = leafDirs(fs, root).grouped(8).flatMap { batch =>
      Await.result(
        Future.sequence(batch.map(l => Future(compactLeaf(l)))),
        Duration.Inf)
    }.toSeq
    CompactReport(reports)
  }
}
