package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed frame utilities shared across the engine.
  *
  * The headline member is [[globalRowNumber]]: a global 1-based rank
  * over a total order WITHOUT a `Window.orderBy(...)` (which Spark
  * plans as an Exchange SinglePartition — every row through one
  * task). The pattern is the same partition-offset numbering used by
  * `rowNumber()` in `sql/Lowering.scala`: range-partitioned sort →
  * `monotonically_increasing_id` (which encodes partition << 33 |
  * intra-partition index) → a #partitions-sized collect of per-
  * partition counts → prefix-sum offsets applied map-side.
  */
object DfOps {

  /** Adds `outCol` = global 1-based row number of `df` under the total
    * order given by `order`. Scale-safe: the sort is a range exchange
    * (parallel), the only collect is one long per partition, and the
    * numbering itself is a map-side expression. The frame is
    * localCheckpoint'ed so the count job and the output job see the
    * same physical rows.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      outCol: String): DataFrame = {
    val ordered = if (order.isEmpty) df else df.orderBy(order: _*)
    val withMid = ordered
      .withColumn("__gMid", monotonically_increasing_id())
      .localCheckpoint()
    val counts = withMid
      .groupBy(shiftrightunsigned(col("__gMid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = acc; acc += n; (pid, o)
    }
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (p, o) =>
          Seq(lit(p), lit(o))
        }.toSeq: _*),
        shiftrightunsigned(col("__gMid"), 33))
    withMid.withColumn(outCol,
      (col("__gMid").bitwiseAND(lit((1L << 33) - 1)) + offExpr + lit(1L))
        .cast("long"))
      .drop("__gMid")
  }
}
