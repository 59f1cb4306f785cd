package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation combinators for hot-key workloads.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime;
  * these helpers cover the two shapes AQE does not: aggregations with
  * heavy-hitter keys, and broadcast-ineligible joins against a skewed
  * build side. Both use deterministic salting (hash of a tie-break
  * column, not rand()) so results are reproducible run to run — a
  * correctness requirement for this engine's oracle gates, and a
  * debugging sanity requirement at 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → strip
    * salt → final merge. Use when one key holds ≫ 1/partitions of the
    * rows (e.g. counting tokens where "the" is 5% of the corpus).
    *
    * `partials` maps each value column to (partialAgg, finalAgg) —
    * e.g. count → (count, sum), sum → (sum, sum). */
  def saltedAgg(df: DataFrame, keyCol: String, saltFrom: Column, salts: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts)))
    val phase1 = salted.groupBy(col(keyCol), col("__salt"))
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(col(keyCol)).agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted count per key (the common case, prepackaged). */
  def saltedCount(df: DataFrame, keyCol: String, saltFrom: Column,
      salts: Int = 64): DataFrame =
    saltedAgg(df, keyCol, saltFrom, salts,
      Seq(count(lit(1)).as("__n")), Seq(sum("__n").as("n")))

  /** Skewed-left join: replicate the (small-ish, broadcast-ineligible)
    * right side `salts` times and salt the left's join key, so one hot
    * key spreads over `salts` reducers. Inner/left joins only (each
    * left row matches exactly one replica). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFrom: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner/left")
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
