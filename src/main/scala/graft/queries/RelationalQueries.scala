package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Reshape

/** The relational core (SURVEY §2.1–2.3): scan/filter, projection,
  * group-by/having, order/limit/offset, DISTINCT ON, all join
  * qualifications, set ops, subqueries, melt/transpose/merge/sample.
  *
  * Every query here lowers to plain Catalyst plans — predicate
  * pushdown, partial aggregation, broadcast-vs-shuffle join choice and
  * AQE all apply untouched. Aggregate outputs are rounded in BOTH
  * engines: double addition order is partition-dependent, so unrounded
  * sums are not comparable across engines (or even across Spark runs).
  */
object RelationalQueries {

  private val z = "" // keep imports tidy

  val all: Seq[QueryDef] = Seq(

    // --- TPC-H Q1 style aggregation (the flagship) ---
    QueryDef("q01_agg_groupby",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // --- scan + WHERE pushdown + projection with computed column ---
    QueryDef("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    },

    // --- ORDER BY + LIMIT + OFFSET ---
    QueryDef("q03_orderby_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(10).limit(50)
    },

    // --- DISTINCT ON (keep first row per key by sort order) ---
    QueryDef("q04_distinct_on",
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    },

    // --- inner join + aggregate ---
    QueryDef("q05_join_inner",
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
    },

    // --- left outer join (kept rows with no match) ---
    QueryDef("q06_join_left",
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("total"))
    },

    // --- right outer join ---
    QueryDef("q07_join_right",
      """SELECT o_orderstatus,
        |  count(l_orderkey) AS n_items,
        |  count(*) AS n_rows
        |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "right")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("l_orderkey")).as("n_items"), count(lit(1)).as("n_rows"))
    },

    // --- full outer join with nulls on both sides ---
    QueryDef("q08_join_full",
      """SELECT coalesce(a.nk, b.nk) AS nationkey, a.n_rich, b.n_poor
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_rich
        |      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) a
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_poor
        |      FROM supplier WHERE s_acctbal < 1000 GROUP BY s_nationkey) b
        |ON a.nk = b.nk""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_rich"))
      val b = Tables.supplier(s, d).filter(col("s_acctbal") < 1000)
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_poor"))
      a.alias("a").join(b.alias("b"), col("a.nk") === col("b.nk"), "full_outer")
        .select(coalesce(col("a.nk"), col("b.nk")).as("nationkey"),
          col("a.n_rich"), col("b.n_poor"))
    },

    // --- semi join (EXISTS) ---
    QueryDef("q09_join_semi",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // --- anti join (NOT EXISTS) ---
    QueryDef("q10_join_anti",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
    },

    // --- cross join with theta residual (reference CROSS_JOIN style) ---
    QueryDef("q11_join_cross_theta",
      """SELECT r_name, count(*) AS n_other
        |FROM region, nation
        |WHERE r_regionkey <> n_regionkey
        |GROUP BY r_name""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .filter(col("r_regionkey") =!= col("n_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_other"))
    },

    // --- IN value-list and IN (SELECT ...) ---
    QueryDef("q12_in_subquery",
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O"))
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    },

    // --- CASE / CAST / BETWEEN / LIKE ---
    QueryDef("q13_case_cast_between_like",
      """SELECT
        |  CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 'low'
        |       WHEN l_quantity BETWEEN 11 AND 30 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty_int
        |FROM lineitem
        |WHERE l_returnflag LIKE '_' AND l_linestatus LIKE 'F%'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").like("_") && col("l_linestatus").like("F%"))
        .withColumn("bucket",
          when(col("l_quantity").between(1, 10), "low")
            .when(col("l_quantity").between(11, 30), "mid")
            .otherwise("high"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty_int"))
    },

    // --- set op: UNION ALL (reference merge()/union table functions) ---
    QueryDef("q14_union",
      """SELECT 'customer' AS side, count(*) AS n, round(sum(c_acctbal), 2) AS total
        |FROM customer
        |UNION ALL
        |SELECT 'supplier' AS side, count(*) AS n, round(sum(s_acctbal), 2) AS total
        |FROM supplier""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).agg(count(lit(1)).as("n"),
        round(sum("c_acctbal"), 2).as("total"))
        .select(lit("customer").as("side"), col("n"), col("total"))
      val b = Tables.supplier(s, d).agg(count(lit(1)).as("n"),
        round(sum("s_acctbal"), 2).as("total"))
        .select(lit("supplier").as("side"), col("n"), col("total"))
      a.unionByName(b)
    },

    // --- GROUP BY + HAVING ---
    QueryDef("q15_having",
      """SELECT o_custkey, count(*) AS n
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 8""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 8)
    },

    // --- aggregate function battery ---
    QueryDef("q16_agg_stats",
      """SELECT count(*) AS n,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(stddev_samp(l_quantity), 6) AS std_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(stddev_samp("l_quantity"), 6).as("std_qty"),
        round(var_samp("l_quantity"), 6).as("var_qty"),
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))
    },

    // --- string_agg with explicit sort (reference string_agg+sortField) ---
    QueryDef("q17_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin) { (s, d) =>
      Tables.region(s, d)
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
    },

    // --- melt (wide → long) ---
    QueryDef("q24_melt",
      """SELECT p_partkey, 'p_retailprice' AS "column",
        |       CAST(p_retailprice AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS "column",
        |       CAST(p_size AS DOUBLE) AS value FROM part""".stripMargin) { (s, d) =>
      Reshape.melt(Tables.part(s, d).select("p_partkey", "p_retailprice", "p_size"),
        Seq("p_partkey"), Seq("p_retailprice", "p_size"), castTo = "double")
    },

    // --- transpose (rows ↔ columns) ---
    QueryDef("q25_transpose",
      """SELECT 'sum_qty' AS "column",
        |  round(sum(CASE WHEN l_returnflag='A' THEN l_quantity ELSE 0 END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag='N' THEN l_quantity ELSE 0 END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag='R' THEN l_quantity ELSE 0 END), 2) AS "R"
        |FROM lineitem
        |UNION ALL
        |SELECT 'sum_price' AS "column",
        |  round(sum(CASE WHEN l_returnflag='A' THEN l_extendedprice ELSE 0 END), 2),
        |  round(sum(CASE WHEN l_returnflag='N' THEN l_extendedprice ELSE 0 END), 2),
        |  round(sum(CASE WHEN l_returnflag='R' THEN l_extendedprice ELSE 0 END), 2)
        |FROM lineitem""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
      Reshape.transpose(base, "l_returnflag", Seq("A", "N", "R"))
    },

    // --- MLDB merge(): cell-wise overlay, right side wins ---
    QueryDef("q26_merge",
      """SELECT coalesce(a.nationkey, b.nationkey) AS nationkey,
        |  coalesce(b.avg_acctbal, a.avg_acctbal) AS avg_acctbal,
        |  a.n_customers, b.n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers,
        |        round(avg(c_acctbal), 4) AS avg_acctbal
        |      FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers,
        |        round(avg(s_acctbal), 4) AS avg_acctbal
        |      FROM supplier WHERE s_nationkey < 10 GROUP BY 1) b
        |ON a.nationkey = b.nationkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 4).as("avg_acctbal"))
      val b = Tables.supplier(s, d).filter(col("s_nationkey") < 10)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          round(avg("s_acctbal"), 4).as("avg_acctbal"))
      Reshape.merge(a, b, "nationkey")
        .select(col("nationkey"), col("avg_acctbal"),
          col("n_customers"), col("n_suppliers"))
    },

    // --- deterministic modulo sampling (rowHash()%k pattern) ---
    QueryDef("q27_modulo_sample",
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_orderkey % 97 < 5
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Reshape.moduloSample(Tables.lineitem(s, d), "l_orderkey", 97, 5)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
    },

    // --- NAMED / rowName semantics incl. join row naming [l]-[r] ---
    QueryDef("q28_rowname",
      """SELECT '[' || c_custkey || ']-[' || o_orderkey || ']' AS rowName,
        |  o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(concat(lit("["), col("c_custkey"), lit("]-["),
          col("o_orderkey"), lit("]")).as("rowName"), col("o_totalprice"))
        .limit(20)
    })
}
