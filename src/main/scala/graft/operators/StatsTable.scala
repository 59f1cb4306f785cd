package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential "counts so far" feature generators.
  *
  * Reference: `statsTable.train` (CTR-style rolling co-occurrence
  * counts of feature value × boolean outcome,
  * `/root/reference/plugins/feature_gen/stats_table_procedure.cc:992-1007`)
  * and `experimental.distTable.train` (numeric-outcome rolling stats,
  * `plugins/feature_gen/dist_table_procedure.cc:842`).
  *
  * The sequential semantics ("counts over all *previous* rows") is a
  * window frame `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`
  * partitioned by the feature value and ordered by an explicit total
  * order. Partitioning by the feature key distributes the state: each
  * key's timeline sorts independently, so there is no global ordered
  * partition bottleneck — the scale path the reference (single
  * sequential pass) cannot take. Heavy-hitter keys are the skew risk;
  * AQE skew handling plus key salting (with a second merge pass) is
  * the 100 TB mitigation.
  */
object StatsTable {

  /** For each row: number of previous rows sharing this feature value,
    * and how many of those had a true outcome. Mirrors
    * statsTable.getCounts applied during training
    * (`stats_table_procedure.cc:986`). */
  def counts(df: DataFrame, featureCol: String, outcomeCol: Column,
      orderCol: String, prefix: String = "st"): DataFrame = {
    val w = Window.partitionBy(col(featureCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(s"${prefix}_trials",
        coalesce(count(lit(1)).over(w), lit(0L)))
      .withColumn(s"${prefix}_successes",
        coalesce(sum(outcomeCol.cast("long")).over(w), lit(0L)))
  }

  /** Numeric-outcome rolling stats over previous same-key rows:
    * count/avg/std/min/max — distTable.train's stats set
    * (`dist_table_procedure.cc:842`). */
  def distStats(df: DataFrame, featureCol: String, valueCol: Column,
      orderCol: String, prefix: String = "dt"): DataFrame = {
    val w = Window.partitionBy(col(featureCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(s"${prefix}_count", coalesce(count(valueCol).over(w), lit(0L)))
      .withColumn(s"${prefix}_sum", sum(valueCol).over(w))
      .withColumn(s"${prefix}_avg", avg(valueCol).over(w))
      .withColumn(s"${prefix}_std", stddev_samp(valueCol).over(w))
      .withColumn(s"${prefix}_min", min(valueCol).over(w))
      .withColumn(s"${prefix}_max", max(valueCol).over(w))
  }

  /** Final aggregated stats table (the persisted artifact of
    * statsTable.train): per feature value, total trials/successes. */
  def table(df: DataFrame, featureCol: String, outcomeCol: Column): DataFrame =
    df.groupBy(col(featureCol))
      .agg(count(lit(1)).as("trials"),
        sum(outcomeCol.cast("long")).as("successes"))

  /** `statsTable.getCounts` applied to NEW data
    * (`stats_table_procedure.cc:986`): broadcast-join the trained
    * table onto incoming rows; unseen feature values get 0/0 — the
    * reference's cold-start behavior. */
  def getCounts(df: DataFrame, statsTable: DataFrame, featureCol: String): DataFrame =
    df.join(broadcast(statsTable), Seq(featureCol), "left")
      .na.fill(0L, Seq("trials", "successes"))
}
