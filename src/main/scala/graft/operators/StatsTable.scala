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
  * sequential pass) cannot take. Heavy-hitter keys are the skew risk:
  * pass `skewSafe = true` to switch to the range-partitioned prefix
  * construction ([[graft.core.DfOps.groupedRunningSums]] /
  * [[graft.core.DfOps.groupedRunningStats]]) whose task sizes are
  * bounded by the range partitioner regardless of the key
  * distribution — identical results (bit-exact for the integer
  * trials/successes; `distStats`' float avg/std stay windowed even
  * under the flag, the same float-ordering contract as the engine
  * procedures). The engine-level statsTable.train / distTable.train
  * procedures flip the same switch automatically past their
  * `graft.*.skewThreshold` confs; the flag is the operator-level
  * equivalent for callers who know their key distribution.
  */
object StatsTable {

  /** For each row: number of previous rows sharing this feature value,
    * and how many of those had a true outcome. Mirrors
    * statsTable.getCounts applied during training
    * (`stats_table_procedure.cc:986`). */
  def counts(df: DataFrame, featureCol: String, outcomeCol: Column,
      orderCol: String, prefix: String = "st",
      skewSafe: Boolean = false): DataFrame =
    if (skewSafe) {
      // bit-identical (integer sums) to the window below, but task
      // sizes bounded by the range partitioner, not the hottest key
      val out = graft.core.DfOps.groupedRunningSums(df, col(featureCol),
        col(orderCol),
        Seq(s"${prefix}_successes" -> outcomeCol.cast("long")),
        s"${prefix}_trials")
      out.select(df.columns.map(c => col(s"`$c`")) ++ Seq(
        col(s"`${prefix}_trials`"), col(s"`${prefix}_successes`")): _*)
    } else {
      val w = Window.partitionBy(col(featureCol)).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(s"${prefix}_trials",
          coalesce(count(lit(1)).over(w), lit(0L)))
        .withColumn(s"${prefix}_successes",
          coalesce(sum(outcomeCol.cast("long")).over(w), lit(0L)))
    }

  /** Numeric-outcome rolling stats over previous same-key rows:
    * count/avg/std/min/max — distTable.train's stats set
    * (`dist_table_procedure.cc:842`).
    *
    * Under `skewSafe = true`, avg/std stay windowed by default — the
    * hot key's one remaining window task — because the prefix combine
    * regroups float accumulation and would break bit-exact oracles.
    * `skewSafeFloat = true` opts those two into the Chan pairwise
    * prefix merge ([[graft.core.DfOps.groupedRunningStats]] kinds
    * avg/std): NO window keyed by the feature value remains anywhere,
    * at the documented cost of rounding-level (not bit-exact)
    * agreement with the windowed formulation. */
  def distStats(df: DataFrame, featureCol: String, valueCol: Column,
      orderCol: String, prefix: String = "dt",
      skewSafe: Boolean = false,
      skewSafeFloat: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(featureCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    if (skewSafe) {
      // count (an indicator SUM — the windowed count is of non-null
      // values, not rows), sum, min, max ride the prefix combine;
      // avg/std stay windowed unless skewSafeFloat opts them into the
      // Chan merge (prefix-merging regroups float accumulation — the
      // engine procedures' bit-exactness contract)
      val floatSpecs =
        if (skewSafeFloat)
          Seq((s"${prefix}_avg", valueCol, "avg"),
            (s"${prefix}_std", valueCol, "std"))
        else Nil
      val pre = graft.core.DfOps.groupedRunningStats(df, col(featureCol),
        col(orderCol),
        Seq((s"${prefix}_cnt_nn",
            when(valueCol.isNotNull, 1L).otherwise(0L), "sum"),
          (s"${prefix}_sum", valueCol, "sum"),
          (s"${prefix}_min", valueCol, "min"),
          (s"${prefix}_max", valueCol, "max")) ++ floatSpecs, None)
      val withFloats =
        if (skewSafeFloat) pre
        else pre.withColumn(s"${prefix}_avg", avg(valueCol).over(w))
          .withColumn(s"${prefix}_std", stddev_samp(valueCol).over(w))
      withFloats.withColumn(s"${prefix}_count",
          coalesce(col(s"`${prefix}_cnt_nn`"), lit(0L)))
        .select(df.columns.map(c => col(s"`$c`")) ++ Seq(
          col(s"`${prefix}_count`"), col(s"`${prefix}_sum`"),
          col(s"`${prefix}_avg`"), col(s"`${prefix}_std`"),
          col(s"`${prefix}_min`"), col(s"`${prefix}_max`")): _*)
    } else {
      df.withColumn(s"${prefix}_count", coalesce(count(valueCol).over(w), lit(0L)))
        .withColumn(s"${prefix}_sum", sum(valueCol).over(w))
        .withColumn(s"${prefix}_avg", avg(valueCol).over(w))
        .withColumn(s"${prefix}_std", stddev_samp(valueCol).over(w))
        .withColumn(s"${prefix}_min", min(valueCol).over(w))
        .withColumn(s"${prefix}_max", max(valueCol).over(w))
    }
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
