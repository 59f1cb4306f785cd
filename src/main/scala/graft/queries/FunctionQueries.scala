package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{MathFunctions => M}
import graft.operators.StatsTable
import graft.procedures.Procedures

/** Scalar/aggregate function surface (SURVEY §2.4–2.6): math, string,
  * timestamp/temporal, JSON, geo, Wilson bounds, window procedures
  * (ranking / bucketize), statsTable / distTable sequential features,
  * earliest/latest, pivot, likelihood_ratio.
  */
object FunctionQueries {

  val all: Seq[QueryDef] = Seq(

    // --- temporal filter = MLDB WHEN clause in wide mode ---
    QueryDef("q19_when_filter",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
          col("ts") < lit("2024-01-20").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    },

    // --- earliest/latest by timestamp (min_by/max_by) ---
    QueryDef("q20_earliest_latest",
      """SELECT user_id,
        |  min_by(event_type, ts) AS first_type,
        |  max_by(event_type, ts) AS last_type,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS first_us,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS last_us,
        |  count(*) AS n
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy(col("user_id"))
        .agg(min_by(col("event_type"), col("ts")).as("first_type"),
          max_by(col("event_type"), col("ts")).as("last_type"),
          unix_micros(min(col("ts"))).as("first_us"),
          unix_micros(max(col("ts"))).as("last_us"),
          count(lit(1)).as("n"))
    },

    // --- ranking procedure: rank / percent_rank window ---
    QueryDef("q21_ranking",
      """SELECT c_mktsegment, c_custkey, rnk,
        |  round(prnk, 6) AS prnk
        |FROM (SELECT c_mktsegment, c_custkey,
        |        rank() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY c_acctbal DESC, c_custkey) AS rnk,
        |        percent_rank() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY c_acctbal DESC, c_custkey) AS prnk
        |      FROM customer) t
        |WHERE rnk <= 10""".stripMargin) { (s, d) =>
      Procedures.ranking(Tables.customer(s, d),
        Seq(col("c_acctbal").desc, col("c_custkey")), Seq(col("c_mktsegment")))
        .filter(col("rank") <= 10)
        .select(col("c_mktsegment"), col("c_custkey"), col("rank").as("rnk"),
          round(col("percentile"), 6).as("prnk"))
    },

    // --- global (un-partitioned) ranking: exercises the range-
    // partitioned exact-rank path — no single-partition window. ---
    QueryDef("q72_global_rank",
      """SELECT o_orderkey, rnk, round(prnk, 6) AS prnk
        |FROM (SELECT o_orderkey,
        |        rank() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |        percent_rank() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS prnk
        |      FROM orders) t
        |WHERE rnk <= 100""".stripMargin) { (s, d) =>
      Procedures.ranking(Tables.orders(s, d),
        Seq(col("o_totalprice").desc, col("o_orderkey")))
        .filter(col("rank") <= 100)
        .select(col("o_orderkey"), col("rank").as("rnk"),
          round(col("percentile"), 6).as("prnk"))
    },

    // --- bucketize procedure: ntile percentile buckets ---
    QueryDef("q22_bucketize",
      """SELECT bucket, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
        |FROM (SELECT o_totalprice,
        |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |      FROM orders) t
        |GROUP BY bucket""".stripMargin) { (s, d) =>
      Procedures.bucketize(Tables.orders(s, d), "o_totalprice", "o_orderkey", 10)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
    },

    // --- statsTable.train: sequential trials/successes-so-far ---
    QueryDef("q23_stats_table",
      """SELECT event_id, event_type,
        |  count(*) OVER w AS st_trials,
        |  CAST(coalesce(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) OVER w, 0)
        |       AS BIGINT) AS st_successes
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin) { (s, d) =>
      StatsTable.counts(Tables.events(s, d), "event_type",
        col("value") > 100, "event_id")
        .select(col("event_id"), col("event_type"),
          col("st_trials"), col("st_successes"))
    },

    // --- distTable.train: sequential numeric rolling stats ---
    QueryDef("q29_dist_table",
      """SELECT event_id, user_id, dt_count,
        |  dt_sum / dt_count AS dt_avg, dt_sum, dt_min, dt_max
        |FROM (
        |  SELECT event_id, user_id,
        |    count(value) OVER w AS dt_count,
        |    round(sum(value) OVER w, 2) AS dt_sum,
        |    min(value) OVER w AS dt_min,
        |    max(value) OVER w AS dt_max
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) t""".stripMargin) { (s, d) =>
      val base = StatsTable.distStats(Tables.events(s, d), "user_id",
        col("value"), "event_id")
      // dt_avg: the SAME two values divided in the same operand order
      // are bit-identical cross-engine (IEEE division is correctly
      // rounded); an extra round(..., 6) would re-introduce the .5
      // boundary that flipped one row at sf0.1 — the q89 lesson
      base.withColumn("dt_sum2", round(col("dt_sum"), 2))
        .select(col("event_id"), col("user_id"), col("dt_count"),
          (col("dt_sum2") / col("dt_count")).as("dt_avg"),
          col("dt_sum2").as("dt_sum"), col("dt_min"), col("dt_max"))
    },

    // --- distTable.train r10 stats (std + last + the NULL-empty
    // conventions the getStats entity reads) ---
    QueryDef("q122_dist_table_std_last",
      """SELECT event_id, user_id,
        |  round(coalesce(stddev_samp(value) OVER w, 0), 4) AS dt_std,
        |  round(coalesce(last_value(value) OVER w, 0), 2) AS dt_last
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // single-sample stddev is NaN in Spark but NULL in DuckDB — both
      // normalize to 0 (nanvl then coalesce)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        round(coalesce(nanvl(stddev_samp(col("value")).over(w),
          lit(0.0)), lit(0.0)), 4).as("dt_std"),
        round(coalesce(last(col("value")).over(w), lit(0.0)), 2)
          .as("dt_last"))
    },

    // --- JSON extraction (parse_json surface) ---
    QueryDef("q30_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k_mod",
          get_json_object(col("props"), "$.k").cast("long") % 10)
        .groupBy(col("k_mod"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
    },

    // --- date_part / date_trunc family ---
    QueryDef("q31_date_funcs",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    },

    // --- unary/binary math battery ---
    QueryDef("q32_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_quantity - 25), 6) AS v_abs,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS v_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS v_floor,
        |  round(sqrt(l_quantity), 6) AS v_sqrt,
        |  round(exp(l_discount), 6) AS v_exp,
        |  round(ln(l_quantity + 1), 6) AS v_ln,
        |  round(pow(l_quantity, 1.5), 4) AS v_pow,
        |  CAST(l_orderkey % 7 AS BIGINT) AS v_mod,
        |  round(sign(l_quantity - 25), 1) AS v_sign,
        |  round(greatest(l_quantity, l_discount * 100), 6) AS v_greatest,
        |  round(least(l_tax, l_discount), 6) AS v_least
        |FROM lineitem WHERE l_orderkey < 300""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_quantity") - 25), 6).as("v_abs"),
          ceil(col("l_discount") * 100).as("v_ceil"),
          floor(col("l_tax") * 100).as("v_floor"),
          round(sqrt(col("l_quantity")), 6).as("v_sqrt"),
          round(exp(col("l_discount")), 6).as("v_exp"),
          round(log(col("l_quantity") + 1), 6).as("v_ln"),
          round(pow(col("l_quantity"), 1.5), 4).as("v_pow"),
          (col("l_orderkey") % 7).cast("long").as("v_mod"),
          round(signum(col("l_quantity") - 25), 1).as("v_sign"),
          round(greatest(col("l_quantity"), col("l_discount") * 100), 6).as("v_greatest"),
          round(least(col("l_tax"), col("l_discount")), 6).as("v_least"))
    },

    // --- string function battery ---
    QueryDef("q33_string_funcs",
      """SELECT p_partkey,
        |  lower(p_name) AS v_lower,
        |  upper(p_brand) AS v_upper,
        |  CAST(length(p_name) AS BIGINT) AS v_len,
        |  substr(p_name, 1, 5) AS v_substr,
        |  replace(p_type, ' ', '_') AS v_replace,
        |  split_part(p_type, ' ', 1) AS v_split,
        |  CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS v_lev,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS v_novowel
        |FROM part WHERE p_partkey < 500""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          lower(col("p_name")).as("v_lower"),
          upper(col("p_brand")).as("v_upper"),
          length(col("p_name")).cast("long").as("v_len"),
          substring(col("p_name"), 1, 5).as("v_substr"),
          regexp_replace(col("p_type"), " ", "_").as("v_replace"),
          split_part(col("p_type"), lit(" "), lit(1)).as("v_split"),
          levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("v_lev"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("v_novowel"))
    },

    // --- Wilson binomial bounds (binomial_ub_80 / binomial_lb_80) ---
    QueryDef("q34_wilson",
      """SELECT p_brand, trials, CAST(successes AS BIGINT) AS successes,
        |  round((p + zz/(2*n) + z * sqrt(p*(1-p)/n + zz/(4*n*n))) / (1 + zz/n), 6) AS ub80,
        |  round((p + zz/(2*n) - z * sqrt(p*(1-p)/n + zz/(4*n*n))) / (1 + zz/n), 6) AS lb80
        |FROM (
        |  SELECT p_brand, count(*) AS trials,
            |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS successes,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) / count(*) AS p,
        |    1.281551565545 AS z, 1.281551565545 * 1.281551565545 AS zz
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand) t""".stripMargin) { (s, d) =>
      val agg = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("trials"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("successes"))
      agg.select(col("p_brand"), col("trials"), col("successes"),
        round(M.binomialUb80(col("trials"), col("successes")), 6).as("ub80"),
        round(M.binomialLb80(col("trials"), col("successes")), 6).as("lb80"))
    },

    // --- haversine geo_distance ---
    QueryDef("q35_geo",
      """SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b,
        |  round(2 * 6371.0088 * asin(sqrt(
        |    pow(sin(radians((b.n_nationkey * 6.0 - 60) - (a.n_nationkey * 6.0 - 60)) / 2), 2) +
        |    cos(radians(a.n_nationkey * 6.0 - 60)) * cos(radians(b.n_nationkey * 6.0 - 60)) *
        |    pow(sin(radians((b.n_nationkey * 13.0 - 160) - (a.n_nationkey * 13.0 - 160)) / 2), 2)
        |  )), 3) AS dist_km
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d)
      val a = n.select(col("n_nationkey").as("nk_a"),
        (col("n_nationkey") * 6.0 - 60).as("lat_a"),
        (col("n_nationkey") * 13.0 - 160).as("lon_a"))
      val b = n.select(col("n_nationkey").as("nk_b"),
        (col("n_nationkey") * 6.0 - 60).as("lat_b"),
        (col("n_nationkey") * 13.0 - 160).as("lon_b"))
      a.join(b, col("nk_a") < col("nk_b"))
        .select(col("nk_a"), col("nk_b"),
          round(M.geoDistanceKm(col("lat_a"), col("lon_a"),
            col("lat_b"), col("lon_b")), 3).as("dist_km"))
    },

    // --- pivot aggregate (reference pivot() / groupBy().pivot()) ---
    QueryDef("q36_pivot",
      """SELECT user_id % 10 AS ubucket,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("ubucket", col("user_id") % 10)
        .groupBy(col("ubucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("click", "error", "purchase", "signup", "view"))
    },

    // --- likelihood_ratio aggregate ---
    QueryDef("q37_likelihood_ratio",
      """SELECT p_brand,
        |  round(ln(((a + 1.0) / (n1 + 2.0)) / ((b + 1.0) / (n0 + 2.0))), 6) AS lr
        |FROM (
        |  SELECT p_brand,
        |    sum(CASE WHEN l_quantity > 25 AND l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS a,
        |    sum(CASE WHEN l_quantity > 25 AND l_returnflag <> 'R' THEN 1.0 ELSE 0.0 END) AS b,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS n1,
        |    sum(CASE WHEN l_returnflag <> 'R' THEN 1.0 ELSE 0.0 END) AS n0
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand) t""".stripMargin) { (s, d) =>
      val agg = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("l_quantity") > 25 && col("l_returnflag") === "R", 1.0)
            .otherwise(0.0)).as("a"),
          sum(when(col("l_quantity") > 25 && col("l_returnflag") =!= "R", 1.0)
            .otherwise(0.0)).as("b"),
          sum(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)).as("n1"),
          sum(when(col("l_returnflag") =!= "R", 1.0).otherwise(0.0)).as("n0"))
      agg.select(col("p_brand"),
        round(log(((col("a") + 1.0) / (col("n1") + 2.0)) /
          ((col("b") + 1.0) / (col("n0") + 2.0))), 6).as("lr"))
    },

    // --- horizontal_* (across-columns) family ---
    QueryDef("q38_horizontal",
      """SELECT l_orderkey, l_linenumber,
        |  greatest(l_quantity, l_discount * 100, l_tax * 100) AS h_max,
        |  least(l_quantity, l_discount * 100, l_tax * 100) AS h_min,
        |  round(l_quantity + l_discount * 100 + l_tax * 100, 4) AS h_sum,
        |  round((l_quantity + l_discount * 100 + l_tax * 100) / 3, 4) AS h_avg
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin) { (s, d) =>
      val (q, disc, tax) = (col("l_quantity"), col("l_discount") * 100, col("l_tax") * 100)
      Tables.lineitem(s, d).filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          greatest(q, disc, tax).as("h_max"),
          least(q, disc, tax).as("h_min"),
          round(q + disc + tax, 4).as("h_sum"),
          round((q + disc + tax) / 3, 4).as("h_avg"))
    },

    // --- sessionization over event time (lag + cumulative sum) ---
    QueryDef("q39_sessionize",
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS session_value
        |FROM (
        |  SELECT user_id, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        |  FROM (
        |    SELECT user_id, value, ts, event_id,
        |      CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           > 86400000000 OR lag(epoch_us(ts))
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS is_new
        |    FROM events) t1) t2
        |GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 86400000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
    })
}
