package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The inherited relational surface (SURVEY.md §2.2): RecDB ships stock
  * PostgreSQL 9.2 executor operators — scans, joins (all types), hash/sort
  * aggregation, window functions, set ops, subqueries, top-k, LIKE/ILIKE/IN —
  * which this engine gets from Spark SQL/Catalyst. Each query here exercises
  * one operator family end-to-end through spark.sql (full parser → Catalyst →
  * Tungsten path) and carries a DuckDB oracle that is textually identical
  * except where dialects genuinely diverge (noted inline).
  *
  * Scale notes: dimension tables (region/nation/customer/supplier/part) are
  * broadcast by Spark automatically under the 10MB threshold; the fact table
  * (lineitem/orders/events) is only shuffled for aggregations on its own keys.
  * AQE re-plans joins at runtime; no hints needed at these shapes.
  */
object RelQueries {

  /** (spark SQL, duckdb SQL) — usually the same text. */
  private final case class Q(spark: String, duck: String)
  private def q(sql: String): Q = Q(sql, sql)

  private val defs: Map[String, Q] = Map(
    // Scan + filter + hash aggregation (nodeAgg.c) — TPC-H Q1 shape; the
    // shipdate filter reaches the parquet scan as a pushed predicate.
    "q1_agg" -> q(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    // 3-way join + agg + deterministic top-k (TakeOrderedAndProject).
    "q3_join" -> q(
      """SELECT o.o_orderkey, c.c_mktsegment,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o.o_orderkey, c.c_mktsegment
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin),
    // 6-way snowflake join with a scalar subquery (TPC-H Q5 shape).
    "q5_multijoin" -> q(
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        |WHERE r.r_name = (SELECT min(r_name) FROM region)
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin),
    // Window functions (nodeWindowAgg.c): rank within partition, deterministic.
    "q_window" -> q(
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3""".stripMargin),
    // Set ops (nodeSetOp.c): EXCEPT = customers that never ordered.
    "q_except" -> q(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin),
    "q_intersect" -> q(
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin),
    // DISTINCT aggregation (Unique/HashAgg) — Expand-based in Spark.
    "q_distinct_agg" -> q(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    // ILIKE + IN list + CASE — the regression script's composition surface
    // (recdb_regression_test.sql:38-39).
    "q_like_in_case" -> q(
      """SELECT p_brand, p_type, count(*) AS cnt,
        |  round(sum(CASE WHEN p_size IN (1, 5, 9) THEN p_retailprice ELSE 0 END), 4)
        |    AS sel_price
        |FROM part
        |WHERE p_type ILIKE 'promo%' OR p_brand IN ('Brand#1', 'Brand#2')
        |GROUP BY p_brand, p_type""".stripMargin),
    // Correlated EXISTS (semi join) + uncorrelated scalar subquery.
    "q_exists" -> q(
      """SELECT c.c_custkey FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders))""".stripMargin),
    // LEFT JOIN + count semantics over null rows.
    "q_left_join" -> q(
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey""".stripMargin),
    // ROLLUP grouping sets.
    "q_rollup" -> q(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
    // Pure top-k over raw columns (TakeOrderedAndProject, nodeSort/nodeLimit).
    "q_topk" -> q(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 15""".stripMargin),
    // FULL OUTER JOIN with null-side grouping.
    "q_full_join" -> q(
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS k,
        |  count(o.o_orderkey) AS n_orders, count(c.c_name) AS n_cust
        |FROM customer c FULL JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY coalesce(c.c_custkey, o.o_custkey)""".stripMargin),
    // HAVING over grouped aggregates.
    "q_having" -> q(
      """SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 4) AS qty
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 600""".stripMargin),
    // GROUP BY ALL (modern SQL sugar, Spark 4 + DuckDB): every
    // non-aggregate select item becomes a grouping key.
    "q_group_by_all" -> q(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY ALL""".stripMargin),
    // EXCEPT ALL (multiset semantics).
    "q_except_all" -> q(
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey AS k FROM supplier""".stripMargin),
    // CTE (WorkTable/CteScan analog).
    "q_cte" -> q(
      """WITH big_orders AS (
        |  SELECT o_custkey, o_totalprice FROM orders
        |  WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |)
        |SELECT c.c_mktsegment, count(*) AS n,
        |  round(sum(b.o_totalprice), 4) AS total
        |FROM big_orders b JOIN customer c ON c.c_custkey = b.o_custkey
        |GROUP BY c.c_mktsegment""".stripMargin),
    // UNION ALL (Append) + dedup UNION via DISTINCT.
    "q_union_all" -> q(
      """SELECT n_nationkey AS k, n_name AS name FROM nation
        |UNION ALL
        |SELECT r_regionkey AS k, r_name AS name FROM region""".stripMargin),
    // NOT EXISTS → anti join.
    "q_anti" -> q(
      """SELECT s.s_suppkey FROM supplier s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
        |    AND l.l_quantity > 45)""".stripMargin),
    // VALUES inline relation (ValuesScan).
    "q_values" -> q(
      """SELECT t.grp, count(*) AS n
        |FROM part p
        |JOIN (VALUES ('SMALL', 'light'), ('LARGE', 'heavy'),
        |             ('ECONOMY', 'light')) AS t(ptype, grp)
        |  ON p.p_type = t.ptype
        |GROUP BY t.grp""".stripMargin),
    // String scalar functions (PG adt/ analog).
    "q_string_funcs" -> q(
      """SELECT upper(substr(c_name, 1, 4)) AS pre,
        |  count(*) AS n, max(length(c_name)) AS maxlen
        |FROM customer GROUP BY upper(substr(c_name, 1, 4))""".stripMargin),
    // Date-part extraction + grouping.
    "q_date_funcs" -> q(
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  count(*) AS n, round(sum(o_totalprice), 4) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY year(o_orderdate), month(o_orderdate)""".stripMargin),
    // Ordered-set aggregates (percentiles). Dialect split: Spark `percentile`
    // and DuckDB `quantile_cont` are both linear-interpolation on the sorted
    // multiset.
    "q_percentile" -> Q(
      spark = """SELECT l_returnflag,
                |  round(percentile(l_extendedprice, 0.5), 4) AS med,
                |  round(percentile(l_extendedprice, 0.9), 4) AS p90
                |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      duck = """SELECT l_returnflag,
               |  round(quantile_cont(l_extendedprice, 0.5), 4) AS med,
               |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
               |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    // Tumbling-window aggregation over the events stream table. Dialect split:
    // Spark reads ts as LONG ns (nanosAsLong); DuckDB sees TIMESTAMP_NS.
    "q_events_hourly" -> Q(
      spark = """SELECT (ts DIV 3600000000000) * 3600 AS hour_epoch, event_type,
                |  count(*) AS n, round(sum(value), 4) AS sum_value
                |FROM events GROUP BY hour_epoch, event_type""".stripMargin,
      duck = """SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) * 3600 AS hour_epoch,
               |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
               |FROM events GROUP BY hour_epoch, event_type""".stripMargin),
    // CUBE grouping sets (all four combinations).
    "q_cube" -> q(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),
    // Window navigation functions: lag/lead/first_value/ntile over a fully
    // deterministic per-customer order (date + key tie-break).
    "q_winnav" -> q(
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),
    // Statistical aggregates (two-pass-free streaming moments).
    "q_stats" -> q(
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qe,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_e,
        |  round(var_samp(l_quantity), 6) AS var_q
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    // Regex scalar functions. Dialect split: Spark regexp_replace is global
    // by default; DuckDB needs the 'g' flag.
    "q_regexp" -> Q(
      spark = """SELECT p_partkey,
                |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                |  regexp_replace(p_name, '[aeiou]', '') AS devoweled
                |FROM part WHERE p_partkey % 7 = 0""".stripMargin,
      duck = """SELECT p_partkey,
               |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
               |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
               |FROM part WHERE p_partkey % 7 = 0""".stripMargin),
    // Semi-structured JSON extraction from the events props column.
    "q_json" -> Q(
      spark = """SELECT event_type,
                |  sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
                |  count(*) AS n
                |FROM events GROUP BY event_type""".stripMargin,
      duck = """SELECT event_type,
               |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               |  count(*) AS n
               |FROM events GROUP BY event_type""".stripMargin),
    // The modern semi-structured path: Spark 4 VARIANT (parse_json +
    // variant_get typed extraction) over the same props column — the
    // engine-native encoding that replaces per-row string re-parsing; the
    // oracle is the identical json extraction.
    "q_variant" -> Q(
      spark = """SELECT event_type,
                |  sum(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
                |  CAST(max(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS max_k,
                |  count(*) AS n
                |FROM events GROUP BY event_type""".stripMargin,
      duck = """SELECT event_type,
               |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               |  count(*) AS n
               |FROM events GROUP BY event_type""".stripMargin),
    // Explicit GROUPING SETS (the general form behind ROLLUP/CUBE; PG 9.2
    // predates it but SetOp-composed reports are the same shape).
    "q_grouping_sets" -> q(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin),
    // Set-returning function in FROM (PG 9.2 FunctionScan / LATERAL shape,
    // nodeFunctionscan.c) — Spark's generator path (Generate/explode).
    "q_explode" -> Q(
      spark = """SELECT word, count(*) AS n
                |FROM documents
                |LATERAL VIEW explode(split(text, ' ')) t AS word
                |WHERE length(word) >= 3
                |GROUP BY word
                |ORDER BY n DESC, word
                |LIMIT 20""".stripMargin,
      duck = """SELECT word, count(*) AS n
               |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
               |WHERE length(word) >= 3
               |GROUP BY word
               |ORDER BY n DESC, word
               |LIMIT 20""".stripMargin),
    // Pivot as conditional aggregation (the portable PIVOT form).
    "q_pivot_case" -> q(
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 4) AS f_total,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 4) AS o_total,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 4) AS p_total
        |FROM orders GROUP BY o_orderpriority""".stripMargin),
    // Correlated scalar subquery (Catalyst decorrelates to a left outer
    // aggregate join; PG 9.2 runs it as a per-row SubPlan).
    "q_scalar_corr" -> q(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT round(coalesce(max(o_totalprice), 0), 4) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c WHERE c_custkey % 10 = 0""".stripMargin),
    // Fixed-width histogram over document lengths.
    "q_len_hist" -> q(
      """SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket, count(*) AS n
        |FROM documents GROUP BY CAST(floor(n_chars / 50) AS BIGINT)""".stripMargin),
    // Per-group top-k (row_number window + rank filter — the partitioned
    // twin of TakeOrderedAndProject): top-3 customers by balance per nation.
    "q_group_topk" -> q(
      """SELECT n_name, c_custkey, c_acctbal FROM (
        |  SELECT n.n_name, c.c_custkey, c.c_acctbal,
        |    row_number() OVER (PARTITION BY n.n_name
        |      ORDER BY c.c_acctbal DESC, c.c_custkey) AS rk
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |) WHERE rk <= 3""".stripMargin),
    // LATERAL correlated subquery (PG 9.3 LATERAL arrived just after the
    // fork's 9.2, but the SubPlan machinery is the same; Spark 3.2+ supports
    // lateral subqueries natively): each nation's two highest-balance
    // customers via a correlated inner LIMIT.
    "q_lateral" -> q(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin),
    // SQL higher-order functions over arrays (the list-processing surface;
    // dialect split: Spark transform/filter/aggregate vs DuckDB list_*).
    "q_array_funcs" -> Q(
      spark = """SELECT doc_id,
                |  size(filter(split(text, ' '), w -> length(w) > 4)) AS n_long,
                |  round(aggregate(transform(split(text, ' '),
                |    w -> CAST(length(w) AS DOUBLE)), CAST(0.0 AS DOUBLE),
                |    (a, x) -> a + x), 4) AS total_len,
                |  array_max(transform(split(text, ' '), w -> length(w))) AS max_len
                |FROM documents WHERE doc_id % 10 = 0""".stripMargin,
      duck = """SELECT doc_id,
               |  len(list_filter(string_split(text, ' '),
               |    w -> length(w) > 4)) AS n_long,
               |  round(list_aggregate(list_transform(string_split(text, ' '),
               |    w -> CAST(length(w) AS DOUBLE)), 'sum'), 4) AS total_len,
               |  list_max(list_transform(string_split(text, ' '),
               |    w -> length(w))) AS max_len
               |FROM documents WHERE doc_id % 10 = 0""".stripMargin),
    // Ordered string aggregation (listagg/string_agg): deterministic via an
    // explicit element sort on both engines.
    "q_string_agg" -> Q(
      spark = """SELECT c_nationkey,
                |  array_join(array_sort(collect_list(CAST(c_custkey AS STRING))), ',')
                |    AS custkeys
                |FROM customer WHERE c_custkey % 100 = 0
                |GROUP BY c_nationkey""".stripMargin,
      duck = """SELECT c_nationkey,
               |  string_agg(CAST(c_custkey AS VARCHAR), ','
               |    ORDER BY CAST(c_custkey AS VARCHAR)) AS custkeys
               |FROM customer WHERE c_custkey % 100 = 0
               |GROUP BY c_nationkey""".stripMargin),
    // Window FRAMES beyond rank/navigation (nodeWindowAgg.c frame options):
    // numeric RANGE frame (peers by value distance), percent_rank/cume_dist
    // distribution functions, nth_value over the full-partition frame.
    "q_win_frames" -> q(
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 4) AS range_sum,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_key
        |FROM orders
        |WHERE o_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin),
    // UNPIVOT (wide → long): Spark's generator form via stack(); the oracle
    // spells it as the equivalent UNION ALL (both engines' portable core).
    "q_unpivot" -> Q(
      spark = """SELECT c_custkey, metric, round(value, 4) AS value FROM (
                |  SELECT c_custkey,
                |    stack(2, 'acctbal', c_acctbal,
                |             'nationkey', CAST(c_nationkey AS DOUBLE))
                |      AS (metric, value)
                |  FROM customer) WHERE c_custkey % 25 = 0""".stripMargin,
      duck = """SELECT c_custkey, metric, round(value, 4) AS value FROM (
               |  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value
               |  FROM customer
               |  UNION ALL
               |  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
               |  FROM customer)
               |WHERE c_custkey % 25 = 0""".stripMargin),
    // Three-valued-logic corners: null-safe equality (Spark <=>, SQL
    // standard IS NOT DISTINCT FROM), NULLS FIRST ordering, NULLIF/COALESCE.
    "q_null_semantics" -> Q(
      spark = """SELECT o_orderkey,
                |  nullif(o_custkey % 7, 0) AS k7,
                |  CASE WHEN (o_custkey % 5) <=> nullif(o_custkey % 7, 0)
                |       THEN 1 ELSE 0 END AS nullsafe_eq,
                |  coalesce(nullif(o_custkey % 7, 0), -1) AS k7_filled
                |FROM orders
                |ORDER BY k7 ASC NULLS FIRST, o_orderkey
                |LIMIT 200""".stripMargin,
      duck = """SELECT o_orderkey,
               |  nullif(o_custkey % 7, 0) AS k7,
               |  CASE WHEN (o_custkey % 5) IS NOT DISTINCT FROM nullif(o_custkey % 7, 0)
               |       THEN 1 ELSE 0 END AS nullsafe_eq,
               |  coalesce(nullif(o_custkey % 7, 0), -1) AS k7_filled
               |FROM orders
               |ORDER BY k7 ASC NULLS FIRST, o_orderkey
               |LIMIT 200""".stripMargin),
    // Recursive CTE (PG's RecursiveUnion / WorkTableScan, nodeRecursiveunion.c
    // — Spark 4's UnionLoop): walk each nation key up its floor-halving
    // ancestor chain to 0. Dialect split only in the integer-division
    // operator (DIV vs //).
    "q_recursive_cte" -> Q(
      spark = """WITH RECURSIVE anc(node, ancestor) AS (
                |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT)
                |  FROM nation
                |  UNION ALL
                |  SELECT node, ancestor DIV 2 FROM anc WHERE ancestor > 0
                |)
                |SELECT node, ancestor, count(*) AS n
                |FROM anc GROUP BY node, ancestor""".stripMargin,
      duck = """WITH RECURSIVE anc(node, ancestor) AS (
               |  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT)
               |  FROM nation
               |  UNION ALL
               |  SELECT node, ancestor // 2 FROM anc WHERE ancestor > 0
               |)
               |SELECT node, ancestor, count(*) AS n
               |FROM anc GROUP BY node, ancestor""".stripMargin),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (name, qq) =>
      name -> ((spark: SparkSession, dir: String) => {
        Tables.registerAll(spark, dir)
        spark.sql(qq.spark)
      })
    }

  def oracleSql: Map[String, String] = defs.map { case (n, qq) => n -> qq.duck }
}
