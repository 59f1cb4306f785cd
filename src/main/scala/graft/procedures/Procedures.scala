package graft.procedures

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch procedures (SURVEY §2.7): each reference procedure becomes a
  * DataFrame pipeline. The `transform` workhorse is trivially
  * `df.write`; the interesting ones are the statistical/reshaping
  * procedures, mapped to window functions and built-in aggregates so
  * Catalyst plans them (partial aggregation, pushdown) with no custom
  * execution code.
  */
object Procedures {

  /** `transform` (`/root/reference/builtin/sql_functions.cc:662-899`):
    * run a query, persist the result. The INSERT-INTO-SELECT of the
    * engine. Parquet out = the "tabular dataset" at rest. */
  def transform(result: DataFrame, outPath: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = result.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(outPath)
  }

  /** `transform` into a BUCKETED table: pre-partitions the data by the
    * join/aggregation key so later equi-joins and groupBys between
    * co-bucketed tables run with NO shuffle at all — the core
    * at-100-TB layout decision for fact tables that join repeatedly on
    * the same key. Verified shuffle-free in ProceduresSpec. */
  def transformBucketed(result: DataFrame, tableName: String,
      bucketCols: Seq[String], buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    result.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  /** `split` (`builtin/datasetsplit_procedure.cc:302`): deterministic
    * train/test split. With `stratifyBy`, per-stratum hash split so
    * label distributions match across folds (the reference's
    * distribution-preserving mode). Hash-based (not randomSplit) so
    * the assignment is stable under repartitioning — at 100 TB you
    * cannot afford a nondeterministic split. */
  def split(df: DataFrame, keyCol: String, testFraction: Double = 0.2,
      seed: Int = 42): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000))
    val cut = (testFraction * 1000000).toLong
    (df.filter(bucket >= cut), df.filter(bucket < cut))
  }

  /** md5-based split variant: identical assignment in any engine with
    * a standard md5 (granularity 1/16 via the first hex digit) — used
    * where the split must be reproduced outside Spark, e.g. by an
    * external labeling system or a SQL-only consumer. */
  def splitMd5(df: DataFrame, keyCol: String,
      testHexDigits: Seq[String] = Seq("0", "1", "2")): (DataFrame, DataFrame) = {
    val digit = substring(md5(col(keyCol).cast("string")), 1, 1)
    (df.filter(!digit.isin(testHexDigits: _*)),
      df.filter(digit.isin(testHexDigits: _*)))
  }

  /** `summary.statistics` (`builtin/summary_statistics_proc.cc:516`):
    * per-numeric-column min/max/mean/stddev/count/nulls/approx
    * quantiles, computed in ONE pass over the data (single aggregate,
    * no per-column jobs). */
  def summaryStatistics(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"${c}__count"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        avg(col(c)).as(s"${c}__avg"),
        stddev_samp(col(c)).as(s"${c}__std"),
        percentile_approx(col(c), lit(0.5), lit(1000)).cast("double").as(s"${c}__p50"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // long format: one row per (column, stat)
    val stats = Seq("count", "min", "max", "avg", "std", "p50")
    val stack = cols.flatMap(c => stats.map(st => s"'$c', '$st', `${c}__${st}`"))
      .mkString(", ")
    row.select(expr(
      s"stack(${cols.size * stats.size}, $stack) as (column_name, stat, value)"))
  }

  /** `bucketize` (`plugins/feature_gen/bucketize_procedure.cc:255`):
    * percentile buckets by score order. Global ntile needs a total
    * order; for scale, percentile_approx-based cut points avoid the
    * single-partition window (used when `approx = true`). */
  def bucketize(df: DataFrame, scoreCol: String, tieCol: String, n: Int,
      approx: Boolean = false): DataFrame = {
    if (!approx) {
      val w = Window.orderBy(col(scoreCol), col(tieCol))
      df.withColumn("bucket", ntile(n).over(w))
    } else {
      val qs = (1 until n).map(_.toDouble / n)
      val cuts = df.stat.approxQuantile(scoreCol, qs.toArray, 0.001)
      // ascending when-chain: first matching (smallest) cut wins
      val first = when(col(scoreCol) <= cuts(0), 1)
      val chained = cuts.zipWithIndex.drop(1).foldLeft(first) {
        case (acc, (cut, i)) => acc.when(col(scoreCol) <= cut, i + 1)
      }
      df.withColumn("bucket", chained.otherwise(n))
    }
  }

  /** `ranking` (`builtin/ranking_procedure.cc:199`). */
  def ranking(df: DataFrame, orderBy: Seq[Column], partitionBy: Seq[Column] = Nil): DataFrame = {
    val w = (if (partitionBy.nonEmpty) Window.partitionBy(partitionBy: _*)
             else Window.partitionBy()).orderBy(orderBy: _*)
    df.withColumn("rank", rank().over(w))
      .withColumn("percentile", percent_rank().over(w))
  }

  /** `melt` procedure — delegates to the Reshape operator. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String]): DataFrame =
    graft.operators.Reshape.melt(df, idCols, valueCols)
}
