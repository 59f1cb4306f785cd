package graft.procedures

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * marker-file write-ahead protocol with MOVE-IN-FIRST swap order and
  * generation-tagged file names, so a crash at ANY point loses no rows
  * and duplicates none, and a [[readStore]] reader is correct at every
  * intermediate state:
  *
  *  0. RECOVER: a pending marker from an interrupted run means its
  *     hidden tmp generation was fully written — finish that swap
  *     first (move the remaining tmp files in, delete the old files
  *     the marker lists, clear the marker);
  *  1. list the parquet data files; skip the leaf when
  *     `ceil(bytes / targetBytes)` already matches the file count
  *     (re-running is a no-op);
  *  2. rewrite the CAPTURED file list (footer schemas merged, so a
  *     leaf whose files carry evolved schemas keeps every column) as
  *     `ceil(bytes/targetBytes)` files into a hidden sibling dir
  *     (dot-prefixed, so a concurrent lister never sees it), renamed
  *     to carry the next generation tag (`cg<N>-part-*.parquet`;
  *     untagged files are generation 0) — names are DISJOINT from the
  *     old generation's by construction;
  *  3. COMMIT: atomically rename a marker file into place recording
  *     the new generation number and the old generation's names; only
  *     then move the new files in, delete the old ones, and finally
  *     clear the marker.
  *
  * Crash matrix: before 3's marker → old generation intact, stale tmp
  * ignored and rebuilt on rerun; after the marker → step 0 completes
  * the swap on the next run.
  *
  * Readers. A PLAIN `spark.read.parquet(store)` is only guaranteed
  * consistent outside the swap window (between marker-write and
  * marker-clear it can see rows of both generations). [[readStore]] is
  * the reader-concurrent entry point: it consults the marker and the
  * generation tags to resolve, at EVERY crash/interleave point,
  * exactly one complete generation per leaf — the old one before the
  * commit marker exists, the new one from the marker on (ingest files
  * not named by the marker are always included). Stores never touched
  * by compaction read identically through either path.
  *
  * Concurrency and durability guards:
  *  - one compactor per store: a create-exclusive `.compact_lock` at
  *    the store root makes a second concurrent `compactStore` fail
  *    fast instead of interleaving list/delete/move steps;
  *  - the commit marker's atomicity rests on an atomic `fs.rename`,
  *    which HDFS and local filesystems provide but S3A-style object
  *    stores emulate as copy+delete — on such a scheme the run
  *    REFUSES unless `allowNonAtomicRename = true` acknowledges the
  *    weakened guarantee (a crash mid-marker-copy can leave a
  *    truncated marker that recovery then trusts).
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

  private val GenName = "^cg(\\d+)-".r

  /** Generation of a data file by name: `cg<N>-...` → N, else 0
    * (every file a normal writer produces). */
  private def genOf(name: String): Int =
    GenName.findFirstMatchIn(name).map(_.group(1).toInt).getOrElse(0)

  /** Schemes whose `rename` is a metadata-atomic primitive. Object
    * stores (s3a, gs, wasb, abfs, oss, cos, swift) emulate rename as
    * copy+delete — not atomic, so the marker-commit guarantee weakens. */
  private val atomicRenameSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "o3fs", "ofs")

  /** The commit marker's crash-atomicity rests on `fs.rename`; refuse
    * schemes that emulate rename unless the caller acknowledges the
    * weakened guarantee. Package-visible so the refusal path is
    * unit-testable without mounting an object store. */
  private[graft] def checkRenameAtomicity(scheme: String,
      allowNonAtomicRename: Boolean): Unit =
    require(atomicRenameSchemes(scheme) || allowNonAtomicRename,
      s"filesystem scheme `$scheme' does not guarantee atomic rename " +
        "(object stores emulate it as copy+delete), so the commit " +
        "marker protocol loses its crash-atomicity. Pass " +
        "allowNonAtomicRename=true to proceed under the weakened " +
        "guarantee, or compact from an HDFS/local staging copy.")

  private def tmpOf(leaf: Path) = new Path(leaf, ".compact_tmp")
  private def markerOf(leaf: Path) = new Path(leaf, ".compact_commit")

  /** Marker payload: first line `gen=<N>`, then one old-generation
    * file name per line. `legacy` flags a pre-generation marker (older
    * layout with no `gen=` header): its tmp files are UNTAGGED
    * (generation 0), so a reader must include ALL tmp data files for
    * such a leaf instead of filtering by generation tag — the old
    * protocol deleted old files before moving tmp in, and a gen filter
    * would silently drop the whole new generation. */
  private final case class MarkerState(gen: Int, oldNames: Seq[String],
      legacy: Boolean)

  private def readMarker(fs: FileSystem, marker: Path): MarkerState = {
    val in = fs.open(marker)
    val lines =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').toSeq.filter(_.nonEmpty)
      finally in.close()
    lines.headOption match {
      case Some(h) if h.startsWith("gen=") =>
        MarkerState(h.drop(4).toInt, lines.tail, legacy = false)
      case _ => MarkerState(1, lines, legacy = true)
    }
  }

  /** Leaf dirs = directories that directly contain parquet data files.
    * The walk is driver-side but #files-sized — the same cost every
    * Spark read of the store already pays in its file index. `prune`
    * stops the walk BEFORE descending into (or listing) a directory —
    * the partition-pruning hook for windowed readers.
    *
    * The walk is listStatus-LATENCY-bound on remote filesystems (one
    * RPC per directory), so each BFS frontier's directories are listed
    * concurrently through a 16-thread pool — a store with thousands of
    * day partitions lists in depth·RTT instead of #dirs·RTT. Output is
    * path-sorted for determinism. */
  private def leafDirs(fs: FileSystem, root: Path,
      prune: Path => Boolean = _ => true): Seq[Path] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val exec = java.util.concurrent.Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(exec)
    try {
      val leaves = scala.collection.mutable.ArrayBuffer.empty[Path]
      var frontier: Seq[Path] = Seq(root)
      var isRoot = true
      while (frontier.nonEmpty) {
        val keep = if (isRoot) frontier else frontier.filter(prune)
        val listed = Await.result(
          Future.sequence(keep.map(d =>
            Future(d -> fs.listStatus(d).toSeq))), Duration.Inf)
        val next = scala.collection.mutable.ArrayBuffer.empty[Path]
        listed.foreach { case (dir, entries) =>
          // a pending commit marker counts as data: the crash it
          // records may have deleted every visible file, and recovery
          // must still find the leaf
          val hasData = entries.exists(e =>
            e.isFile && isDataFile(e.getPath)) ||
            entries.exists(e => e.getPath.getName == ".compact_commit")
          if (hasData) leaves += dir
          next ++= entries
            .filter(e => e.isDirectory && !isHidden(e.getPath))
            .map(_.getPath)
        }
        frontier = next.toSeq
        isRoot = false
      }
      leaves.sortBy(_.toString).toSeq
    } finally exec.shutdown()
  }

  /** Reader-concurrent store read: per leaf, resolve the LIVE file set
    * (exactly one complete generation, plus any ingest files a
    * concurrent writer added) and read it with the store root as
    * basePath so partition columns survive. Correct at every point of
    * the compaction protocol:
    *
    *  - no marker → the visible files ARE the live generation (the
    *    tmp is hidden and uncommitted);
    *  - marker present (gen N, old names) → live = visible files NOT
    *    named by the marker ∪ the tmp's gen-N files: the new
    *    generation was complete before the marker committed, each of
    *    its files is in exactly one of (tmp, leaf) mid-swap, and the
    *    old generation is excluded by name whether or not its deletes
    *    have started.
    *
    * The tmp is listed BEFORE the leaf, so a file moving tmp→leaf
    * between the two listings appears at least once (dedup by name);
    * the marker is re-read AFTER the listings and the resolve retries
    * when its state changed mid-read. Residual assumption: a reader's
    * metadata reads are not separated by an ENTIRE compaction cycle
    * (marker write → swap → clear spans a Spark rewrite job; the
    * listings span milliseconds).
    *
    * `leafFilter` prunes the driver-side walk BEFORE any file listing
    * — at 100 TB a windowed reader passes the partition-directory
    * predicate here so only the relevant day leaves are ever listed,
    * the same pruning a plain partition-filtered read gets from its
    * file index. */
  def readStore(spark: SparkSession, storePath: String,
      leafFilter: Path => Boolean = _ => true): DataFrame = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no store at $storePath")
    def markerState(leaf: Path): Option[MarkerState] = {
      val m = markerOf(leaf)
      if (fs.exists(m))
        try Some(readMarker(fs, m))
        catch { case _: java.io.FileNotFoundException => None }
      else None
    }
    def liveFiles(leaf: Path): Seq[Path] = {
      var attempt = 0
      while (attempt < 5) {
        val before = markerState(leaf)
        val tmpFiles = before match {
          case Some(ms) =>
            val t = tmpOf(leaf)
            if (fs.exists(t))
              // legacy (pre-generation) marker: the tmp generation is
              // untagged, so take EVERY tmp data file — filtering by
              // gen would exclude them all and silently serve
              // leaf-minus-oldNames (possibly nothing: the legacy
              // protocol deleted old files before moving tmp in)
              fs.listStatus(t).toSeq.map(_.getPath)
                .filter(p => isDataFile(p) &&
                  (ms.legacy || genOf(p.getName) == ms.gen))
            else Nil
          case None => Nil
        }
        val leafFiles = fs.listStatus(leaf).toSeq
          .filter(e => e.isFile && isDataFile(e.getPath)).map(_.getPath)
        val after = markerState(leaf)
        if (before == after) {
          return before match {
            case Some(ms) =>
              val dead = ms.oldNames.toSet
              val vis = leafFiles.filterNot(p => dead(p.getName))
              val visNames = vis.map(_.getName).toSet
              vis ++ tmpFiles.filterNot(p => visNames(p.getName))
            case None => leafFiles
          }
        }
        attempt += 1
      }
      throw new IllegalStateException(
        s"marker at $leaf kept changing across 5 read attempts — " +
          "a compactor is racing faster than metadata reads")
    }
    val files = leafDirs(fs, root, leafFilter)
      .flatMap(liveFiles).map(_.toString)
    if (files.isEmpty) spark.emptyDataFrame
    // ignoreMissingFiles is pinned OFF for this read: the file list is
    // resolved NOW but the parquet scan runs at action time, and a
    // compactor finishing a swap in between moves/deletes the resolved
    // paths — with the conf on, that would silently drop rows; off, it
    // fails loudly (FileNotFoundException) and the caller re-reads.
    // Contract: consume (or materialize) the returned DataFrame
    // promptly — its correctness window is one compaction cycle on the
    // busiest leaf, not the DataFrame's lifetime.
    else spark.read
      .option("ignoreMissingFiles", "false")
      .option("basePath", storePath).parquet(files: _*)
  }

  def compactStore(spark: SparkSession, storePath: String,
      targetBytes: Long = 128L << 20,
      retireStreamMetadata: Boolean = false,
      allowNonAtomicRename: Boolean = false): CompactReport = {
    require(targetBytes > 0, "targetBytes must be positive")
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no store at $storePath")
    val scheme = Option(root.toUri.getScheme)
      .getOrElse(fs.getUri.getScheme)
    checkRenameAtomicity(scheme, allowNonAtomicRename)
    val meta = new Path(root, "_spark_metadata")
    if (fs.exists(meta)) {
      require(retireStreamMetadata,
        s"$storePath carries _spark_metadata (a streaming sink log); " +
          "batch readers trust it and would miss compacted files. Pass " +
          "retireStreamMetadata=true to rename it aside — only do this " +
          "for a finished/archived stream.")
    }
    // one compactor per store: create-exclusive lock at the root. A
    // crashed run leaves the lock behind — deleting it is the explicit
    // operator acknowledgment that no compactor is alive. On HDFS,
    // create(overwrite=false) is an atomic namenode op; on the LOCAL
    // (checksum) filesystem it decomposes into exists-check-then-create
    // — two racing compactors could both pass — so the local scheme
    // drops to the raw OS primitive (O_CREAT|O_EXCL via
    // Files.createFile), which IS atomic.
    val lock = new Path(root, ".compact_lock")
    def lockHeld(e: Exception): Nothing =
      throw new IllegalStateException(
        s"compaction lock $lock already held — another compactStore " +
          "is running on this store (or a previous one crashed; " +
          "delete the lock file once certain it is dead)", e)
    val pidLine = s"pid=${ProcessHandle.current().pid()}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (scheme == "file") {
      val p = java.nio.file.Paths.get(lock.toUri.getPath)
      try java.nio.file.Files.write(java.nio.file.Files.createFile(p),
        pidLine)
      catch {
        case e: java.nio.file.FileAlreadyExistsException => lockHeld(e)
      }
    } else {
      val lockOut =
        try fs.create(lock, false)
        catch { case e: java.io.IOException => lockHeld(e) }
      try lockOut.write(pidLine) finally lockOut.close()
    }

    try {
      if (fs.exists(meta)) {
        var i = 0
        var dest = new Path(root, ".spark_metadata_retired")
        while (fs.exists(dest)) { i += 1
          dest = new Path(root, s".spark_metadata_retired$i") }
        require(fs.rename(meta, dest),
          s"could not retire $meta to $dest")
      }

      /** Move the tmp generation in FIRST, then delete the old
        * generation, then clear the marker — each half idempotent, so
        * this is both the normal step-3 swap and the step-0 crash
        * recovery. Move-in-first means a [[readStore]] reader (which
        * excludes the marker's old names once the marker exists) sees a
        * complete new generation at every intermediate point. */
      def completeSwap(leaf: Path, oldNames: Seq[String]): Unit = {
        val tmp = tmpOf(leaf); val marker = markerOf(leaf)
        if (fs.exists(tmp))
          fs.listStatus(tmp).toSeq
            .filter(e => e.isFile && isDataFile(e.getPath))
            .foreach { f =>
              require(fs.rename(f.getPath,
                new Path(leaf, f.getPath.getName)),
                s"could not move ${f.getPath} into $leaf")
            }
        oldNames.foreach(n => fs.delete(new Path(leaf, n), false))
        fs.delete(marker, false)
        fs.delete(tmp, true)
      }

      def writeMarker(leaf: Path, gen: Int, oldNames: Seq[String]): Unit = {
        // stage the content under a different hidden name, then RENAME
        // into place — rename is the atomic primitive (guarded above),
        // so a half-written marker can never be mistaken for a commit
        val marker = markerOf(leaf)
        val staging = new Path(leaf, ".compact_commit_staging")
        val out = fs.create(staging, true)
        try out.write((s"gen=$gen\n" + oldNames.mkString("\n"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        require(fs.rename(staging, marker), s"could not commit $marker")
      }

      def dataFilesIn(dir: Path) = fs.listStatus(dir).toSeq
        .filter(e => e.isFile && isDataFile(e.getPath))

      def compactLeaf(leaf: Path): LeafReport = {
        // step 0: a pending marker means a prior run crashed after its
        // commit point — its tmp generation is complete; finish the swap
        val marker = markerOf(leaf)
        if (fs.exists(marker)) {
          completeSwap(leaf, readMarker(fs, marker).oldNames)
        }
        // janitor: with no marker, a leftover tmp dir or staging file
        // is pre-commit crash garbage (the committed protocol clears
        // both) — reap it even on the no-op path below, or orphans
        // from crashed runs accumulate forever
        else {
          val tmp = tmpOf(leaf)
          if (fs.exists(tmp)) fs.delete(tmp, true)
          val staging = new Path(leaf, ".compact_commit_staging")
          if (fs.exists(staging)) fs.delete(staging, false)
        }
        val old = dataFilesIn(leaf)
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
          // swap would then duplicate their rows at this level. Merge
          // the footers: files written across ingest batches may carry
          // evolved schemas, and sampling one footer would silently
          // drop the other files' columns from the store.
          spark.read.option("mergeSchema", "true")
            .parquet(old.map(_.getPath.toString): _*)
            .repartition(want)
            .write.parquet(tmp.toString)
          // tag the new generation: names disjoint from every earlier
          // generation's, so a reader can tell them apart mid-swap
          val gen = (old.map(f => genOf(f.getPath.getName)) :+ 0).max + 1
          dataFilesIn(tmp).foreach { f =>
            require(fs.rename(f.getPath,
              new Path(tmp, s"cg$gen-${f.getPath.getName}")),
              s"could not tag ${f.getPath}")
          }
          writeMarker(leaf, gen, old.map(_.getPath.getName))
          completeSwap(leaf, old.map(_.getPath.getName))
          LeafReport(leaf.toString, old.size, dataFilesIn(leaf).size,
            bytes, compacted = true)
        }
      }
      // leaves are independent (distinct dirs) and each rewrite is a
      // small (often single-task) job, so run them through a fixed
      // thread pool — that many leaves stay in flight continuously (a
      // batched barrier would gate each batch on its slowest leaf).
      // Pool size: `graft.compact.threads` (default 8). Measured at
      // sf0.1/local[32] (r14): 4 threads 6.3 s, 8 → 3.35 s, 16 →
      // 3.30 s after warm-up — throughput saturates at 8 concurrent
      // leaf jobs locally, and a wider pool only adds scheduler/GC
      // contention when the host is already loaded (a 16-default trial
      // regressed q127 2.3× inside a full bench sweep). Deployments
      // with many more leaves than cores set the conf explicitly.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val threads = spark.conf.getOption("graft.compact.threads")
        .flatMap(_.toIntOption.filter(_ > 0)).getOrElse(8)
      val exec = java.util.concurrent.Executors.newFixedThreadPool(threads)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(exec)
      val reports =
        try Await.result(
          Future.sequence(leafDirs(fs, root).map(l =>
            Future(compactLeaf(l)))), Duration.Inf)
        finally exec.shutdown()
      CompactReport(reports)
    } finally fs.delete(lock, false)
  }
}
