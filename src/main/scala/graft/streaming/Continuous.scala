package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The continuous dataset re-expressed on Structured Streaming.
  *
  * Reference: `continuous` / `continuous.window` datasets
  * (`/root/reference/builtin/continuous_dataset.cc:435,580`): events
  * are recorded into a live window and rotated to immutable files
  * every `commitInterval` (rotate logic `:189-240`); a window re-opens
  * a committed time range as a queryable dataset. Semantics are event
  * time only (doc `datasets/ContinuousDataset.md:24-27`).
  *
  * Spark mapping: `writeStream` to time-partitioned parquet with a
  * processing trigger playing the role of commitInterval; the
  * partition column is derived from the EVENT time, preserving the
  * reference's event-time-only contract. `window()` is a batch read
  * whose partition filter prunes to the requested range — at 100 TB
  * the read touches only the partitions in range (verify with
  * .explain: PartitionFilters on p_hour).
  */
object Continuous {

  /** Event-time partition key. Day granularity by default: finer keys
    * (hour) looked attractive for pruning but produce a small-files
    * explosion — ~2,000 partitions for three months of events turned
    * streaming ingest into file-creation overhead (measured 2.5k
    * events/s; day granularity restores bulk write throughput while
    * pruning still touches only the days in range). */
  private def dayKey(tsCol: String) =
    // UTC calendar day regardless of the session timezone:
    // date_format renders in the SESSION zone, but the read side
    // (window) formats its partition bounds in UTC — both sides of
    // the p_date pruning contract must agree or boundary events
    // silently fall outside the pruned range. EXACT integer floor
    // (the Tables.events pmod trick): double division is only exact
    // while micros stay under 2^53, and a boundary event bucketed one
    // day off would be silently dropped by window()'s pruning even
    // though its ts passes the range filter.
    date_from_unix_date(expr(
      s"(unix_micros(`$tsCol`) - pmod(unix_micros(`$tsCol`), " +
        "86400000000)) div 86400000000").cast("int"))
      .cast("string").as("p_date")

  /** `continuous` dataset: record a stream into the store.
    * `commitInterval` ≈ the reference's commitInterval rotation. */
  def record(events: DataFrame, tsCol: String, path: String,
      checkpoint: String, commitInterval: String = "10 seconds",
      availableNowForTest: Boolean = false): StreamingQuery = {
    val trigger =
      if (availableNowForTest) Trigger.AvailableNow()
      else Trigger.ProcessingTime(commitInterval)
    // repartition on the partition key inside the stream: each day
    // writes ONE file per micro-batch instead of one per task —
    // at 32 tasks × 90 days that is 97% fewer files
    events.withColumn("p_date", dayKey(tsCol))
      .repartition(col("p_date"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("p_date")
      .trigger(trigger)
      .outputMode("append")
      .start()
  }

  /** Watermarked tumbling-window aggregation over the stream — the
    * standard event-time rollup (counts + sums per window × key).
    * Beyond the reference's surface (it has no windows/watermarks —
    * SURVEY §2.9) but core to a streaming engine at scale: state is
    * bounded by the watermark, partitioned by (window, key). */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), windowLen),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total"))

  final case class SessionEvent(key: Long, tsMicros: Long, value: Double)
  final case class SessionOut(key: Long, startMicros: Long, endMicros: Long,
      nEvents: Long, total: Double)
  // public: the streaming state encoder's generated code instantiates
  // it reflectively between micro-batches
  final case class SessionState(start: Long, last: Long, n: Long,
      total: Double)

  /** Gap-based sessionization: a session closes when no event arrives
    * within `gapMicros`.
    *
    * BATCH runs use a SECONDARY SORT — repartition by key, sort
    * (key, ts) within partitions, one streaming fold per partition —
    * so a hot key holds ONE open-session accumulator at a time, never
    * its whole history (the flatMapGroups formulation buffered a
    * key's full row set in one task: exactly the skewed-key funnel
    * that breaks at 100 TB).
    *
    * STREAMING runs keep the explicit-state formulation (a
    * micro-batch's per-key slice is watermark-bounded); sessions
    * close when a later event arrives — for watermark-driven eviction
    * of idle keys use `sessionizeStream`. */
  def sessionize(events: Dataset[SessionEvent], gapMicros: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      events.repartition(col("key"))
        .sortWithinPartitions(col("key"), col("tsMicros"))
        .mapPartitions { it =>
          var cur: SessionOut = null
          def step(e: SessionEvent): Option[SessionOut] =
            if (cur == null) {
              cur = SessionOut(e.key, e.tsMicros, e.tsMicros, 1, e.value)
              None
            } else if (e.key == cur.key &&
                e.tsMicros - cur.endMicros <= gapMicros) {
              cur = SessionOut(cur.key, cur.startMicros, e.tsMicros,
                cur.nEvents + 1, cur.total + e.value)
              None
            } else {
              val closed = cur
              cur = SessionOut(e.key, e.tsMicros, e.tsMicros, 1, e.value)
              Some(closed)
            }
          // the trailing iterator flushes the last open session AFTER
          // the fold exhausts the partition (Iterator ++ is by-name)
          it.flatMap(e => step(e).iterator) ++ new Iterator[SessionOut] {
            def hasNext: Boolean = cur != null
            def next(): SessionOut = { val c = cur; cur = null; c }
          }
        }
    } else events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.tsMicros)
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              // late-but-kept events (flatMapGroupsWithState does not
              // drop rows behind the watermark) may arrive with
              // ts < state.last: min/max keep start <= last
              case Some(s) if e.tsMicros - s.last <= gapMicros =>
                cur = Some(SessionState(math.min(s.start, e.tsMicros),
                  math.max(s.last, e.tsMicros), s.n + 1,
                  s.total + e.value))
              case Some(s) =>
                out += SessionOut(key, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
            }
          }
          cur.foreach(s => state.update(s))
          out.iterator
      }
  }

  final case class SessionEventTs(key: Long, ts: java.sql.Timestamp,
      value: Double)

  /** Streaming sessionization with EVENT-TIME timeouts: when the
    * watermark passes a key's last event + gap, the open session is
    * emitted and its state evicted — idle keys neither linger forever
    * nor wait for a next event that may never come. State per key is
    * O(1), partitioned by key; the watermark bounds total state. */
  def sessionizeStream(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gapMicros: Long,
      watermark: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // fail at PLAN time, not mid-stream: a non-numeric key/value would
    // cast to NULL (ANSI off) and kill the query's first micro-batch
    // on the non-nullable encoder fields
    import org.apache.spark.sql.types.NumericType
    for ((c, what) <- Seq(keyCol -> "key", valueCol -> "value"))
      require(events.schema(c).dataType.isInstanceOf[NumericType],
        s"sessionizeStream $what column '$c' must be numeric, got " +
          events.schema(c).dataType.simpleString)
    val ds = events
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("value"))
      .withWatermark("ts", watermark)
      .as[SessionEventTs]
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            sorted.foreach { e =>
              val ts = micros(e.ts)
              cur match {
                // late-but-kept events (not yet behind the watermark)
                // may carry ts < state.last from a previous batch:
                // min/max keep start <= last instead of regressing the
                // session end onto the straggler
                case Some(s) if ts - s.last <= gapMicros =>
                  cur = Some(SessionState(math.min(s.start, ts),
                    math.max(s.last, ts), s.n + 1, s.total + e.value))
                case Some(s) =>
                  out += SessionOut(key, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(ts, ts, 1, e.value))
                case None =>
                  cur = Some(SessionState(ts, ts, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the WATERMARK (not wall clock)
              // passes last + gap. flatMapGroupsWithState does NOT
              // auto-drop late rows, so a straggler whose last+gap is
              // already behind the watermark would make
              // setTimeoutTimestamp throw and kill the query — clamp to
              // watermark+1ms (the session then closes on the next
              // watermark advance, the correct event-time outcome).
              val wmMs = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max((s.last + gapMicros) / 1000L, wmMs + 1L))
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup for continuous ingest (LLM-pipeline
    * extension): drop events whose dedup key was already seen, with
    * state bounded by the watermark — the standard at-least-once →
    * exactly-once repair in front of a training-data store. Spark's
    * `dropDuplicates` keeps per-key state forever on an unbounded
    * stream; scoping it WITH the event-time column bounds state to the
    * watermark horizon (late re-sends beyond the horizon are already
    * quarantined by the watermark itself). Batch frames take the
    * plain dropDuplicates path (Spark rejects the watermark variant
    * outside streaming). */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming near-dup dedup against a kept corpus (LLM-pipeline
    * extension of `dedupStream`): each micro-batch runs the full
    * MinHash-LSH `dedupAgainstIndex` pipeline — band-collision
    * candidates, signature prefilter, exact Jaccard verify — against a
    * prebuilt persisted corpus index, and the surviving rows go to
    * `sink`. `foreachBatch` is the right mechanism, not a
    * stream-static join: candidate generation needs explode +
    * self-distinct + multi-join, which are batch plans; each
    * micro-batch IS a batch, and the static index is reused across
    * batches without re-shingling the corpus. The corpus index lives
    * until `index.release()` — at scale, keep it on MEMORY_AND_DISK
    * next to the kept corpus.
    *
    * Note the index is stationary WITHIN a run: novel stream docs are
    * checked against the corpus, not against each other across
    * batches (cross-batch stream self-dedup is `dedupStream` on a
    * fingerprint, or periodic index rebuilds — documented trade). */
  def nearDedupStream(stream: DataFrame,
      index: graft.operators.Dedup.MinHashIndex,
      textCol: String, idCol: String, threshold: Double = 0.7)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(graft.operators.Dedup.dedupAgainstIndex(
          batch.toDF(), index, textCol, idCol, threshold), batchId)
    }

  /** Streaming SEMANTIC dedup against a prebuilt
    * [[graft.operators.Dedup.SemanticIndex]]: each micro-batch's
    * embeddings are cluster-assigned map-side and checked against the
    * persisted corpus codes — the embedding-space sibling of
    * [[nearDedupStream]], same foreachBatch shape and the same
    * stationary-index contract (novel rows are checked against the
    * corpus, not each other). */
  def semanticDedupStream(stream: DataFrame,
      index: graft.operators.Dedup.SemanticIndex,
      vecCol: String, idCol: String, minCosine: Double = 0.95)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: java.lang.Long) =>
        sink(graft.operators.Dedup.semanticDedupAgainstIndex(
          batch.toDF(), index, vecCol, idCol, minCosine), batchId)
    }

  /** `continuous.window`: a committed time range as a batch dataset.
    * The p_date predicate is a pure partition filter (no file content
    * read outside the range); the ts predicate trims the boundary
    * days.
    *
    * While the store still carries the streaming sink's
    * `_spark_metadata`, that log is authoritative (it hides
    * uncommitted writer files) and the read goes through it. Once the
    * log is retired — the archived/compactable state — the read goes
    * through [[graft.procedures.Compact.readStore]] instead, so a
    * window stays correct even while `dataset.compact` is mid-swap on
    * some leaf; the day-range predicate is ALSO pushed into the
    * driver-side walk as a leaf filter, preserving the plain read's
    * partition pruning (out-of-range day directories are never
    * listed). */
  def window(spark: SparkSession, path: String, tsCol: String,
      from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val (lo, hi) = (fmt.format(from), fmt.format(to))
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasSinkLog =
      fs.exists(new org.apache.hadoop.fs.Path(root, "_spark_metadata"))
    val base =
      if (hasSinkLog) spark.read.parquet(path)
      else {
        val pruned = graft.procedures.Compact.readStore(spark, path, leaf => {
          val n = leaf.getName
          !n.startsWith("p_date=") || {
            val d = n.substring("p_date=".length)
            d >= lo && d <= hi
          }
        })
        // a fully-pruned range yields a schema-less empty frame; read
        // the store's schema unpruned so the filters still resolve
        if (pruned.schema.nonEmpty) pruned
        else graft.procedures.Compact.readStore(spark, path).limit(0)
      }
    // a retired store with ZERO data files has no schema at all (even
    // the unpruned fallback is column-less) — short-circuit to the
    // empty frame instead of letting the p_date/ts filters throw an
    // unresolved-column AnalysisException
    if (base.schema.isEmpty) base
    else base
      .filter(col("p_date") >= lo && col("p_date") <= hi)
      .filter(col(tsCol) >= lit(from) && col(tsCol) < lit(to))
      .drop("p_date")
  }
}
