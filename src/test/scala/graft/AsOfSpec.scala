package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("as-of join matches window-derived last-checkpoint-before") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // checkpoints: each user's purchase events
    val checkpoints = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("cp_user"), col("ts").as("cp_ts"),
        col("event_id").as("cp_id"))
    val got = AsOf.join(ev, checkpoints, "ts", "cp_ts",
      by = Seq(("user_id", "cp_user")))
      .select(col("event_id"), col("cp_id"))
    // oracle: window max_by over a union ordering
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tie"))
    val tagged = ev.withColumn("is_cp", lit(0)).withColumn("tie", lit(1))
      .select(col("event_id"), col("user_id"), col("ts"), col("is_cp"), col("tie"))
      .unionByName(checkpoints.select(col("cp_id").as("event_id"),
        col("cp_user").as("user_id"), col("cp_ts").as("ts"))
        .withColumn("is_cp", lit(1)).withColumn("tie", lit(0)))
    val expected = tagged
      .withColumn("cp_id", last(when(col("is_cp") === 1, col("event_id")), true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("is_cp") === 0)
      .select(col("event_id"), col("cp_id"))
    val mismatches = got.alias("g").join(expected.alias("e"), Seq("event_id"))
      .filter(!(col("g.cp_id") <=> col("e.cp_id"))).count()
    assert(mismatches === 0)
    assert(got.count() === ev.count()) // left-outer keeps all events
  }

  test("forward direction and tolerance") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val cps = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("cp_user"), col("ts").as("cp_ts"))
    val fwd = AsOf.join(ev, cps, "ts", "cp_ts",
      by = Seq(("user_id", "cp_user")), direction = "forward")
    // every matched next-checkpoint is at or after the event
    assert(fwd.filter(col("cp_ts") < col("ts")).count() === 0)
    val tol = AsOf.join(ev, cps, "ts", "cp_ts",
      by = Seq(("user_id", "cp_user")),
      tolerance = Some("INTERVAL 1 DAY"))
    // matches are within a day (backward)
    assert(tol.filter(col("cp_ts").isNotNull &&
      col("ts").cast("long") - col("cp_ts").cast("long") > 86400).count() === 0)
  }
}
