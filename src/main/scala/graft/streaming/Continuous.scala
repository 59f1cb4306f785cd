package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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

  /** Hour-granularity partition key from the event-time column. */
  private def hourKey(tsCol: String) =
    date_format(col(tsCol), "yyyy-MM-dd-HH").as("p_hour")

  /** `continuous` dataset: record a stream into the store.
    * `commitInterval` ≈ the reference's commitInterval rotation. */
  def record(events: DataFrame, tsCol: String, path: String,
      checkpoint: String, commitInterval: String = "10 seconds",
      availableNowForTest: Boolean = false): StreamingQuery = {
    val trigger =
      if (availableNowForTest) Trigger.AvailableNow()
      else Trigger.ProcessingTime(commitInterval)
    events.withColumn("p_hour", hourKey(tsCol))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("p_hour")
      .trigger(trigger)
      .outputMode("append")
      .start()
  }

  /** `continuous.window`: a committed time range as a batch dataset.
    * The p_hour predicate is a pure partition filter (no file content
    * read outside the range); the ts predicate trims the boundary
    * hours. */
  def window(spark: SparkSession, path: String, tsCol: String,
      from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd-HH")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val (lo, hi) = (fmt.format(from), fmt.format(to))
    spark.read.parquet(path)
      .filter(col("p_hour") >= lo && col("p_hour") <= hi)
      .filter(col(tsCol) >= lit(from) && col(tsCol) < lit(to))
      .drop("p_hour")
  }
}
