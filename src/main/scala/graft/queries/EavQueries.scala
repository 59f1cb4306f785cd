package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Eav, Tables}

/** EAV-mode queries: per-cell timestamps, superpositions, WHEN with
  * cell fidelity, temporal aggregates (SURVEY §1.1/§2.5 temporal
  * family). Events are melted with rowName = user_id so each
  * (rowName, column) genuinely holds many timestamped values — a real
  * superposition, not a degenerate one-cell case.
  */
object EavQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q66_eav_temporal",
      """SELECT CAST(user_id AS VARCHAR) AS "rowName", col AS "column",
        |  count(num) AS temporal_count,
        |  round(sum(num), 2) AS temporal_sum,
        |  min(num) AS temporal_min,
        |  max(num) AS temporal_max,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS earliest_us,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS latest_us
        |FROM (
        |  SELECT user_id, 'value' AS col, value AS num, ts FROM events
        |  UNION ALL
        |  SELECT user_id, 'event_type' AS col, CAST(NULL AS DOUBLE) AS num, ts
        |  FROM events) t
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val eav = Eav.toEav(Tables.events(s, d), col("user_id"), col("ts"),
        Seq("event_type", "value"))
      Eav.temporalAgg(eav)
        .select(col("rowName"), col("column"),
          col("temporal_count"),
          round(col("temporal_sum"), 2).as("temporal_sum"),
          col("temporal_min"), col("temporal_max"),
          unix_micros(col("earliest_ts")).as("earliest_us"),
          unix_micros(col("latest_ts")).as("latest_us"))
    },

    QueryDef("q68_asof_join",
      """SELECT ev.event_id, cp.cp_id
        |FROM (SELECT event_id, user_id, ts FROM events) ev
        |ASOF LEFT JOIN
        |  (SELECT user_id AS cp_user, ts AS cp_ts, event_id AS cp_id
        |   FROM events WHERE event_type = 'purchase') cp
        |ON ev.user_id = cp.cp_user AND ev.ts >= cp.cp_ts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val cp = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("cp_user"), col("ts").as("cp_ts"),
          col("event_id").as("cp_id"))
      graft.operators.AsOf.join(ev, cp, "ts", "cp_ts",
        by = Seq(("user_id", "cp_user")))
        .select(col("event_id"), col("cp_id"))
    },

    // --- the remaining VariableFilter variants as first-class reads
    // (sql/expression_value.h:61-100): BETWEEN windows the cell
    // timeline (inclusive bounds, a scan-pushed filter), EARLIEST
    // collapses each surviving superposition to its first value —
    // composed here exactly as a reference query would chain them. ---
    QueryDef("q108_eav_between",
      """SELECT CAST(user_id AS VARCHAR) AS "rowName",
        |  min_by(event_type, ts) AS earliest_type,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS earliest_us
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-20'
        |GROUP BY user_id""".stripMargin) { (s, d) =>
      val eav = Eav.toEav(Tables.events(s, d), col("user_id"), col("ts"),
        Seq("event_type", "value"))
      val windowed = Eav.between(eav,
        lit("2024-01-10").cast("timestamp"), lit("2024-01-20").cast("timestamp"))
      Eav.earliest(windowed)
        .filter(col("column") === "event_type")
        .select(col("rowName"), col("value.str").as("earliest_type"),
          unix_micros(col("ts")).as("earliest_us"))
    },

    QueryDef("q67_eav_when_latest",
      """SELECT CAST(user_id AS VARCHAR) AS "rowName",
        |  max_by(event_type, ts) AS latest_type
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-15'
        |GROUP BY user_id""".stripMargin) { (s, d) =>
      val eav = Eav.toEav(Tables.events(s, d), col("user_id"), col("ts"),
        Seq("event_type", "value"))
      val filtered = Eav.whenFilter(eav,
        ts => ts < lit("2024-01-15").cast("timestamp"))
      Eav.latest(filtered)
        .filter(col("column") === "event_type")
        .select(col("rowName"), col("value.str").as("latest_type"))
    })
}
