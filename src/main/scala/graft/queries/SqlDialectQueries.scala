package graft.queries

import graft.sql.GraftSql

/** Queries written in the MLDB SQL dialect and executed through the
  * parser + lowering front-end (graft.sql). Hash-matching these
  * against DuckDB oracles proves the full text → AST → Catalyst
  * pipeline end-to-end, not just the DataFrame layer.
  */
object SqlDialectQueries {

  val all: Seq[QueryDef] = Seq(

    // --- no-FROM single-row SELECT (previously spec-tier only): the
    // dialect seeds a one-row relation; every expression is constant-
    // foldable and IEEE-exact cross-engine (sqrt is correctly
    // rounded). ---
    QueryDef("q109_sql_nofrom",
      """SELECT 3 AS a, 'GRAFT' AS b, 3.0 AS c, CAST(NULL AS DOUBLE) AS d""") {
      (s, d) =>
        GraftSql.query(s, d,
          "SELECT 1 + 2 AS a, upper('graft') AS b, sqrt(9.0) AS c, " +
            "CAST(NULL AS double) AS d")
    },

    // --- row_dataset table function (previously spec-tier only): a
    // row literal becomes one row per atom, numeric atoms unify to
    // double. ---
    QueryDef("q110_sql_row_dataset",
      """SELECT * FROM (VALUES ('0', 'a', CAST(1.0 AS DOUBLE)),
        |  ('1', 'b', CAST(2.5 AS DOUBLE)), ('2', 'c', CAST(7.0 AS DOUBLE)))
        |  t("rowName", "column", "value")
        |ORDER BY "column"""".stripMargin) { (s, d) =>
      // row names are part of the reference's row_dataset contract
      // (rows named 0..n-1) — selected explicitly so the oracle pins
      // them too
      GraftSql.query(s, d,
        """SELECT rowName() AS rowName, "column", value
          |FROM row_dataset({a: 1, b: 2.5, c: 7})
          |ORDER BY "column"""".stripMargin)
    },

    // --- atom_dataset over a real table (previously spec-tier only):
    // the dialect's bridge into EAV — one output row per cell with
    // the typed value surfaced by the same coalesce slot rules the
    // oracle mirrors. ---
    QueryDef("q111_sql_atom_dataset",
      """SELECT CAST(n_nationkey AS VARCHAR) AS "rowName", col AS "column",
        |  val AS value, num AS value_num
        |FROM (
        |  SELECT n_nationkey, 'n_name' AS col, n_name AS val,
        |    CAST(NULL AS DOUBLE) AS num FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'n_regionkey',
        |    CAST(CAST(n_regionkey AS DOUBLE) AS VARCHAR),
        |    CAST(n_regionkey AS DOUBLE) FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'n_nationkey',
        |    CAST(CAST(n_nationkey AS DOUBLE) AS VARCHAR),
        |    CAST(n_nationkey AS DOUBLE) FROM nation) t""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT "rowName", "column", value, value_num
          |FROM atom_dataset(nation)""".stripMargin)
    },

    QueryDef("q60_sql_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(avg(l_discount), 6) AS avg_disc,
          |  count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate <= CAST('1998-09-01' AS timestamp)
          |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    },

    QueryDef("q61_sql_join",
      """SELECT r_name, count(*) AS n_nations,
        |  round(CAST(sum(n_nationkey) AS DOUBLE), 2) AS key_sum
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |HAVING count(*) > 3
        |ORDER BY r_name""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT r_name, count(*) AS n_nations,
          |  round(CAST(sum(n_nationkey) AS double), 2) AS key_sum
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name
          |HAVING count(*) > 3
          |ORDER BY r_name""".stripMargin)
    },

    QueryDef("q62_sql_named_when",
      """SELECT 'u-' || user_id AS "rowName", user_id,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-17'
        |GROUP BY user_id""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT 'u-' || user_id AS rowName, user_id,
          |  count(*) AS n, round(sum(value), 2) AS total
          |FROM events
          |WHEN value_timestamp() >= CAST('2024-01-03' AS timestamp)
          |  AND value_timestamp() < CAST('2024-01-17' AS timestamp)
          |GROUP BY user_id""".stripMargin)
    },

    QueryDef("q63_sql_distinct_on",
      """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t WHERE rn = 1""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT DISTINCT ON (c_mktsegment) c_mktsegment, c_custkey, c_acctbal
          |FROM customer
          |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin)
    },

    QueryDef("q64_sql_case_scan",
      """SELECT o_orderpriority,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O') AND o_orderpriority LIKE '_-%'
        |GROUP BY o_orderpriority,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT o_orderpriority,
          |  CASE WHEN o_totalprice > 200000 THEN 'big'
          |       WHEN o_totalprice > 100000 THEN 'mid'
          |       ELSE 'small' END AS bucket,
          |  count(*) AS n
          |FROM orders
          |WHERE o_orderstatus IN ('F', 'O') AND o_orderpriority LIKE '_-%'
          |GROUP BY o_orderpriority,
          |  CASE WHEN o_totalprice > 200000 THEN 'big'
          |       WHEN o_totalprice > 100000 THEN 'mid'
          |       ELSE 'small' END""".stripMargin)
    },

    // --- new-registry battery: horizontal_*, paths, remove_prefix,
    // IS-type predicates, isodow — all through the dialect front-end,
    // hash-matched against hand-written ANSI equivalents. ---
    QueryDef("q69_sql_fn_battery",
      """SELECT n_nationkey,
        |  CAST(n_nationkey + n_regionkey AS DOUBLE) AS hsum,
        |  greatest(n_nationkey, n_regionkey) AS hmax,
        |  CAST(2 AS BIGINT) AS hcount,
        |  'b' AS pelem,
        |  CAST(3 AS BIGINT) AS plen,
        |  CASE WHEN starts_with(n_name, 'NATION_')
        |       THEN substr(n_name, 8) ELSE n_name END AS stripped,
        |  CAST(1 AS BOOLEAN) AS isnum,
        |  CAST(0 AS BOOLEAN) AS ists,
        |  CAST(isodow(TIMESTAMP '2024-01-01') AS BIGINT) AS idow
        |FROM nation""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT n_nationkey,
          |  horizontal_sum({a: n_nationkey, b: n_regionkey}) AS hsum,
          |  horizontal_max({a: n_nationkey, b: n_regionkey}) AS hmax,
          |  horizontal_count({a: n_nationkey, b: n_regionkey}) AS hcount,
          |  path_element(parse_path('a.b.c'), 1) AS pelem,
          |  CAST(path_length(parse_path('a.b.c')) AS integer) AS plen,
          |  remove_prefix(n_name, 'NATION_') AS stripped,
          |  n_nationkey IS NUMBER AS isnum,
          |  n_name IS TIMESTAMP AS ists,
          |  date_part('isodow', CAST('2024-01-01' AS timestamp)) AS idow
          |FROM nation""".stripMargin)
    },

    // --- COLUMN EXPR through the driver gate: the column-set
    // meta-projection resolves driver-side; the oracle spells out the
    // surviving renamed columns. ---
    QueryDef("q73_sql_column_expr",
      """SELECT n_nationkey AS n_nationkey_x, n_regionkey AS n_regionkey_x
        |FROM nation""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT COLUMN EXPR (AS columnName() || '_x'
          |  WHERE columnName() LIKE '%key' ORDER BY columnName())
          |FROM nation""".stripMargin)
    },

    // --- pivot aggregate + horizontal over the pivoted row ---
    QueryDef("q74_sql_pivot_agg",
      """SELECT par, CAST(n_asia AS BIGINT) AS n_asia,
        |  CAST(n_europe AS BIGINT) AS n_europe
        |FROM (
        |  SELECT r_regionkey % 2 AS par,
        |    sum(CASE WHEN r_name = 'ASIA' THEN r_regionkey ELSE NULL END) AS n_asia,
        |    sum(CASE WHEN r_name = 'EUROPE' THEN r_regionkey ELSE NULL END) AS n_europe
        |  FROM region GROUP BY r_regionkey % 2) t""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT r_regionkey % 2 AS par,
          |  CAST(sum(CASE WHEN r_name = 'ASIA' THEN r_regionkey ELSE NULL END) AS integer) AS n_asia,
          |  CAST(sum(CASE WHEN r_name = 'EUROPE' THEN r_regionkey ELSE NULL END) AS integer) AS n_europe
          |FROM region GROUP BY par""".stripMargin)
    },

    // --- IN (SELECT …) outside WHERE: as a projected value AND as the
    // leading ORDER BY key (reference allows a sub-select anywhere an
    // expression goes, `sql_expression_operations.h:285-330`). The
    // LIMIT makes the ordering itself observable: exactly the 10
    // ASIA/EUROPE nations must surface. ---
    QueryDef("q79_sql_orderby_inselect",
      """SELECT n_name,
        |  n_regionkey IN (SELECT r_regionkey FROM region
        |    WHERE r_name IN ('ASIA', 'EUROPE')) AS in_ae
        |FROM nation
        |ORDER BY in_ae DESC, n_name
        |LIMIT 10""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT n_name,
          |  n_regionkey IN (SELECT r_regionkey FROM region
          |    WHERE r_name IN ('ASIA', 'EUROPE')) AS in_ae
          |FROM nation
          |ORDER BY n_regionkey IN (SELECT r_regionkey FROM region
          |  WHERE r_name IN ('ASIA', 'EUROPE')) DESC, n_name
          |LIMIT 10""".stripMargin)
    },

    // --- multi-key DISTINCT ON (MLDB-1841 test_distincton_multiple):
    // first customer per (nation, segment) in custkey order — DuckDB
    // speaks the same Postgres-style DISTINCT ON natively. ---
    QueryDef("q118_sql_distinct_on_multi",
      """SELECT DISTINCT ON (c_nationkey, c_mktsegment)
        |  c_nationkey, c_mktsegment, c_custkey
        |FROM customer ORDER BY c_nationkey, c_mktsegment, c_custkey"""
        .stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT DISTINCT ON (c_nationkey, c_mktsegment)
          |  c_nationkey, c_mktsegment, c_custkey
          |FROM customer ORDER BY c_nationkey, c_mktsegment, c_custkey"""
          .stripMargin)
    },

    // --- GROUP BY an arbitrary expression with the composed group row
    // name surfaced (MLDB-2111): rowName() after grouping is `[key]`.
    // No aggregate in the projection — the reference allows keys-only
    // grouped selects. ---
    QueryDef("q119_sql_group_expr",
      """SELECT '[' || CAST(n_regionkey * 2 AS VARCHAR) || ']' AS grp,
        |  n_regionkey * 2 AS dbl, CAST(count(*) AS BIGINT) AS n
        |FROM nation GROUP BY n_regionkey * 2""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT rowName() AS grp, n_regionkey * 2 AS dbl, count(*) AS n
          |FROM nation GROUP BY n_regionkey * 2""".stripMargin)
    },

    // --- ordered string_agg (MLDB-1554 third argument) — the sort key
    // keeps its native type, so numeric keys order numerically in both
    // engines. ---
    QueryDef("q120_sql_string_agg_ordered",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_nationkey) AS names
        |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT n_regionkey, string_agg(n_name, ',', n_nationkey) AS names
          |FROM nation GROUP BY n_regionkey""".stripMargin)
    },

    // --- sum({*}) AS * — the reference's whole-row per-column
    // aggregate auto-application (MLDB-1594/1198), over integer
    // columns so the cross-engine sums hash exactly. ---
    QueryDef("q121_sql_sum_row_star",
      """SELECT CAST(sum(CAST(l_quantity AS INTEGER)) AS BIGINT) AS q,
        |  CAST(sum(l_linenumber) AS BIGINT) AS l_linenumber
        |FROM lineitem""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT sum({*}) AS * FROM (
          |  SELECT CAST(l_quantity AS INTEGER) AS q, l_linenumber
          |  FROM lineitem)""".stripMargin)
    },

    // --- jseval: per-row JavaScript (reference builtin/js/js_function
    // .cc via the JsInterp ES5 subset). The script exercises loops,
    // regex split/match, and object results; every emitted value is
    // integer-derived so the cross-engine hash contract stays exact
    // (JSON.stringify prints integral doubles in integer form, matching
    // DuckDB's BIGINT formatting). ---
    QueryDef("q112_jseval",
      """SELECT doc_id,
        |  CAST(2 * length(text)
        |    + 7 * len(list_filter(regexp_split_to_array(
        |        regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'),
        |        w -> length(w) > 4))
        |    - ((length(text)
        |        - length(regexp_replace(text, '[aeiou]', '', 'g'))) % 5)
        |    AS DOUBLE) AS js_score,
        |  '{"len":' || length(text) || ',"long":'
        |    || len(list_filter(regexp_split_to_array(
        |        regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'),
        |        w -> length(w) > 4)) || '}' AS js_doc
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val count =
        """var t = text.replace(/^\s+|\s+$/g, "");
          |var words = t.split(/\s+/);
          |var lw = 0;
          |for (var i = 0; i < words.length; i++)
          |  if (words[i].length > 4) lw++;""".stripMargin
      GraftSql.query(s, d,
        s"""SELECT doc_id,
           |  jseval_num('$count
           |var vowels = (text.match(/[aeiou]/g) || []).length;
           |return 2 * text.length + 7 * lw - (vowels % 5);',
           |    'text', text) AS js_score,
           |  jseval('$count
           |return {len: text.length, long: lw};', 'text', text) AS js_doc
           |FROM documents
           |ORDER BY doc_id""".stripMargin)
    },

    // --- jseval over timestamps: the TimestampType arg arrives as JS
    // epoch milliseconds, reconstructed with the deterministic Date
    // subset. getUTCDay matches DuckDB's dayofweek (0 = Sunday). ---
    QueryDef("q113_jseval_temporal",
      """SELECT event_id,
        |  CAST(hour(ts) * 100 + dayofweek(ts) AS DOUBLE) AS hod_dow
        |FROM events
        |ORDER BY event_id
        |LIMIT 1000""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT event_id,
          |  jseval_num('var dt = new Date(t);
          |return dt.getUTCHours() * 100 + dt.getUTCDay();', 't', ts)
          |    AS hod_dow
          |FROM events
          |ORDER BY event_id
          |LIMIT 1000""".stripMargin)
    },

    QueryDef("q65_sql_subselect",
      """SELECT status, round(max(total), 2) AS max_total,
        |  round(min(total), 2) AS min_total
        |FROM (SELECT o_orderstatus AS status, o_custkey,
        |        sum(o_totalprice) AS total
        |      FROM orders GROUP BY o_orderstatus, o_custkey) t
        |GROUP BY status""".stripMargin) { (s, d) =>
      GraftSql.query(s, d,
        """SELECT status, round(max(total), 2) AS max_total,
          |  round(min(total), 2) AS min_total
          |FROM (SELECT o_orderstatus AS status, o_custkey,
          |        sum(o_totalprice) AS total
          |      FROM orders GROUP BY o_orderstatus, o_custkey) AS t
          |GROUP BY status""".stripMargin)
    })
}
