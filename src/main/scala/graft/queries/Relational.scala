package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Relational query inventory Q01-Q25 (SURVEY.md §2.9).
  *
  * Each entry pairs an idiomatic DataFrame builder with the exact ANSI SQL
  * the DuckDB oracle runs over the same parquet tables. Conventions:
  *  - total ORDER BY with unique tiebreakers, no nullable sort keys;
  *  - doubles wrapped in round(_, 2|4) on BOTH sides;
  *  - timestamps rendered as UTC strings (`date_format` / `strftime`);
  *  - DuckDB results CAST to the Spark output types (year() is BIGINT in
  *    DuckDB but INT in Spark, sum(int) is HUGEINT vs LONG, …).
  *
  * Scale notes are inline per query: what Catalyst picks at sf0.01 and
  * what the same plan does on a 1000-executor 100 TB cluster.
  */
object Relational {

  private def li(s: SparkSession, d: String)  = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cst(s: SparkSession, d: String) = Tables.customer(s, d)

  /** Q01 — scan + project + filter. Predicate and projection both reach the
    * parquet scan (PushedFilters / ReadSchema); at 100 TB this is a pure
    * narrow map stage, no shuffle except the final sort. */
  val q01 = QueryDef(
    "q01_scan_filter",
    (s, d) =>
      li(s, d)
        .filter(col("l_quantity") > 30)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
            round(l_extendedprice, 2) AS price
            FROM lineitem WHERE l_quantity > 30
            ORDER BY l_orderkey, l_linenumber"""))

  /** Q02 — TPC-H Q1-style hash aggregate. Partial (map-side) aggregation
    * then a 6-group shuffle: the classic scale-friendly agg shape. */
  val q02 = QueryDef(
    "q02_agg",
    // EXACT integer sums, floats only at the end: the round-11 sf1.0
    // probe caught round(sum(DOUBLE), d) within 1e-9 of a rounding
    // boundary — double sums are accumulation-order-dependent, so a
    // boundary hit flips the last digit between engines. Quantities
    // are integral, prices 2-dp, price·(1−disc) exactly 4-dp, so every
    // aggregate is an order-free BIGINT sum (the st07 cents discipline;
    // the per-row product caps at ~10⁹, so the sum holds to ~10⁹ rows
    // per group — DECIMAL(38,0) widening beyond).
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr("CAST(l_quantity AS BIGINT)")).as("sq"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sp"),
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
            "CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("sdp"),
          count(lit(1)).as("count_order"))
        .selectExpr("l_returnflag", "l_linestatus",
          "CAST(sq AS DOUBLE) AS sum_qty",
          "CAST(sp AS DOUBLE) / 100.0 AS sum_base_price",
          "CAST(sdp AS DOUBLE) / 10000.0 AS sum_disc_price",
          // Averages as exact 1e-4 fixed point (r12 sweep): a rounded
          // int/int quotient can sit EXACTLY on a dyadic boundary
          // (15/128 = 0.1171875) where the engines' tie rules differ.
          "CAST((10000 * sq) DIV count_order AS DOUBLE) / 10000.0 AS avg_qty",
          "CAST((100 * sp) DIV count_order AS DOUBLE) / 10000.0 AS avg_price",
          "count_order")
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""WITH g AS (
              SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                  CAST(round((1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS sdp,
                count(*) AS count_order
              FROM lineitem GROUP BY 1, 2)
            SELECT l_returnflag, l_linestatus,
              CAST(sq AS DOUBLE) AS sum_qty,
              CAST(sp AS DOUBLE) / 100.0 AS sum_base_price,
              CAST(sdp AS DOUBLE) / 10000.0 AS sum_disc_price,
              CAST((10000 * sq) // count_order AS DOUBLE) / 10000.0
                AS avg_qty,
              CAST((100 * sp) // count_order AS DOUBLE) / 10000.0
                AS avg_price,
              count_order
            FROM g ORDER BY l_returnflag, l_linestatus"""))

  /** Q03 — inner equi-join orders ⋈ customer. Both sides large at scale →
    * shuffle hash / sort-merge on the key; AQE re-plans from runtime stats. */
  val q03 = QueryDef(
    "q03_join_inner",
    (s, d) => {
      val o = ord(s, d); val c = cst(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(
          // r12 sweep: sum(DOUBLE) is accumulation-order-dependent —
          // integer cents before the aggregate (the q02 discipline).
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("revenue_cents"),
          count(lit(1)).as("n_orders"))
        .withColumn("revenue",
          expr("CAST(revenue_cents AS DOUBLE) / 100.0"))
        .select("c_mktsegment", "revenue_cents", "revenue", "n_orders")
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS revenue_cents,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS revenue,
            count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Q04 — broadcast join fact ⋈ dim. Explicit broadcast(part): the dim is
    * bounded (2k rows at sf0.01, still tiny at 100 TB) so the join is
    * shuffle-free on the fact side. */
  val q04 = QueryDef(
    "q04_join_broadcast",
    (s, d) => {
      val l = li(s, d); val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(
          // Quantities are integral-valued: sum as BIGINT, exact and
          // order-free (r12 sweep — no float aggregate survives).
          sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
            count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** Q05 — multi-way join over the dimension chain; both dims broadcast so
    * the fact table is never shuffled. */
  val q05 = QueryDef(
    "q05_join_multiway",
    (s, d) => {
      val c = cst(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          // r12 sweep: avg(DOUBLE) = order-dependent float sum, then a
          // roundable quotient. Exact cents sum → sign-split 1e-4
          // fixed-point divide (balances go negative) → derived double.
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("sc"))
        .withColumn("avg_bal_e4",
          expr("CASE WHEN sc >= 0 THEN (100 * sc) DIV n_customers " +
            "ELSE -((100 * (-sc)) DIV n_customers) END"))
        .withColumn("avg_bal", expr("CAST(avg_bal_e4 AS DOUBLE) / 10000.0"))
        .select("r_name", "n_customers", "avg_bal_e4", "avg_bal")
        .orderBy("r_name")
    },
    Some("""WITH g AS (
              SELECT r_name, count(*) AS n_customers,
                CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS sc
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name)
            SELECT r_name, n_customers,
              CAST(CASE WHEN sc >= 0 THEN (100 * sc) // n_customers
                ELSE -((100 * (-sc)) // n_customers) END AS BIGINT)
                AS avg_bal_e4,
              CAST(CAST(CASE WHEN sc >= 0 THEN (100 * sc) // n_customers
                ELSE -((100 * (-sc)) // n_customers) END AS BIGINT)
                AS DOUBLE) / 10000.0 AS avg_bal
            FROM g ORDER BY r_name"""))

  /** Q06 — left outer join keeping zero-order customers; count(o_orderkey)
    * counts only matched rows, mirroring SQL COUNT(col). */
  val q06 = QueryDef(
    "q06_join_left_outer",
    (s, d) => {
      val c = cst(s, d); val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  /** Q07 — left semi join (EXISTS). Semi joins ship no payload columns from
    * the right side — cheapest existence check at scale. */
  val q07 = QueryDef(
    "q07_join_semi",
    (s, d) => {
      val c = cst(s, d); val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** Q08 — left anti join (NOT EXISTS): parts never ordered. */
  val q08 = QueryDef(
    "q08_join_anti",
    (s, d) => {
      val p = Tables.part(s, d); val l = li(s, d)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
            ORDER BY p_partkey"""))

  /** Q09 — full outer join of two pre-aggregated sides. Aggregating BEFORE
    * the join shrinks both inputs to |nations| rows — the decorrelated
    * shape that survives any scale. */
  val q09 = QueryDef(
    "q09_join_full_outer",
    (s, d) => {
      val sa = Tables.supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      val ca = cst(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      sa.join(ca, sa("s_nationkey") === ca("c_nationkey"), "full_outer")
        .select(
          coalesce(sa("s_nationkey"), ca("c_nationkey")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nationkey")
    },
    Some("""SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
            coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
            FROM (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
            FULL OUTER JOIN
                 (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
            ON s_nationkey = c_nationkey
            ORDER BY nationkey"""))

  /** Q10 — bounded range (theta) self-join on events: same user, successor
    * events within 1 hour. The equi conjunct (user_id) keys the shuffle, so
    * this stays a sort-merge join with a range residual — not a cartesian.
    * At 100 TB: partition by user_id, optionally bucket by time to tighten. */
  val q10 = QueryDef(
    "q10_join_range",
    (s, d) => {
      val e = Tables.events(s, d).select("user_id", "ts")
      val a = e.select(col("user_id").as("a_uid"), col("ts").as("a_ts"))
      val b = e.select(col("user_id").as("b_uid"), col("ts").as("b_ts"))
      a.join(b,
          col("a_uid") === col("b_uid") &&
          col("a_ts") < col("b_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("a_uid").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""SELECT a.user_id, count(*) AS n_pairs
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.ts < b.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR
            GROUP BY a.user_id ORDER BY a.user_id"""))

  /** Q11 — distinct counts. Exact here (oracle parity); the Profile utility
    * offers approx_count_distinct for the 100 TB path. */
  val q11 = QueryDef(
    "q11_count_distinct",
    (s, d) =>
      ord(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT count(DISTINCT o_custkey) AS n_cust,
            count(DISTINCT o_orderpriority) AS n_prio,
            count(*) AS n_rows FROM orders"""))

  /** Q12 — cube (superset of rollup/grouping sets) over nation × segment
    * with grouping_id. NULL group cells coalesced to 'ALL' so sort keys
    * stay non-null. */
  val q12 = QueryDef(
    "q12_cube",
    (s, d) => {
      // Via the spark.sql entry point (EP-SQL, SURVEY §3): the Dataset API's
      // ambiguous-self-join heuristic misfires on cube() output columns.
      cst(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      s.sql("""SELECT coalesce(n_name, 'ALL') AS nation,
                      coalesce(c_mktsegment, 'ALL') AS segment,
                      CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
                      count(*) AS n,
                      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS sum_bal_cents,
                      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS sum_bal
               FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
               GROUP BY CUBE (n_name, c_mktsegment)
               ORDER BY gid, nation, segment""")
    },
    Some("""SELECT coalesce(n_name, 'ALL') AS nation,
            coalesce(c_mktsegment, 'ALL') AS segment,
            CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid,
            count(*) AS n,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
              AS sum_bal_cents,
            CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS sum_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY CUBE (n_name, c_mktsegment)
            ORDER BY gid, nation, segment"""))

  /** Q12b — rollup and explicit GROUPING SETS (the other two §2.9-Q12
    * grouping forms; cube is q12), via the SQL entry point. */
  val q12b = QueryDef(
    "q12b_rollup_gsets",
    (s, d) => {
      cst(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      s.sql("""SELECT 'rollup' AS form, coalesce(n_name, 'ALL') AS nation,
                      coalesce(c_mktsegment, 'ALL') AS segment,
                      CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
                      count(*) AS n
               FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
               GROUP BY ROLLUP (n_name, c_mktsegment)
               UNION ALL
               SELECT 'gsets', coalesce(n_name, 'ALL'),
                      coalesce(c_mktsegment, 'ALL'),
                      CAST(grouping_id(n_name, c_mktsegment) AS BIGINT),
                      count(*)
               FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
               GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
               ORDER BY form, gid, nation, segment""")
    },
    Some("""SELECT 'rollup' AS form, coalesce(n_name, 'ALL') AS nation,
                   coalesce(c_mktsegment, 'ALL') AS segment,
                   CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid,
                   count(*) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP (n_name, c_mktsegment)
            UNION ALL
            SELECT 'gsets', coalesce(n_name, 'ALL'),
                   coalesce(c_mktsegment, 'ALL'),
                   CAST(GROUPING(n_name, c_mktsegment) AS BIGINT),
                   count(*)
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
            ORDER BY form, gid, nation, segment"""))

  /** Q13 — window ranking: top-3 orders per customer. row_number gets the
    * unique tiebreaker; rank/dense_rank rank by price alone (both
    * deterministic). Per-key windows partition cleanly at scale. */
  val q13 = QueryDef(
    "q13_window_rank",
    (s, d) => {
      val byPriceTb = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      ord(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          row_number().over(byPriceTb).as("rn"),
          rank().over(byPrice).as("rnk"),
          dense_rank().over(byPrice).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT * FROM (
              SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
                CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
                CAST(rank() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
                CAST(dense_rank() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
              FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Q14 — window analytics: lag/lead + running sum per user over event
    * time. The running sum accumulates integer CENTS (r12 sweep): a
    * windowed double sum is NOT guaranteed sequential — DuckDB may
    * evaluate cumulative frames through a segment tree, a different
    * association order than Spark's streaming accumulation. */
  val q14 = QueryDef(
    "q14_window_analytic",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"),
          round(col("value"), 2).as("v"),
          round(lag(col("value"), 1).over(w), 2).as("prev_v"),
          round(lead(col("value"), 1).over(w), 2).as("next_v"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("run_sum_cents"))
        .withColumn("run_sum",
          expr("CAST(run_sum_cents AS DOUBLE) / 100.0"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, round(value, 2) AS v,
            round(lag(value, 1) OVER w, 2) AS prev_v,
            round(lead(value, 1) OVER w, 2) AS next_v,
            CAST(sum(CAST(round(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS run_sum_cents,
            CAST(sum(CAST(round(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) / 100.0 AS run_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id"""))

  /** Q15 — global top-k: Catalyst plans TakeOrderedAndProject (per-partition
    * top-k + driver merge of k·P rows), never a full global sort. */
  val q15 = QueryDef(
    "q15_topk",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price,
            strftime(o_orderdate, '%Y-%m-%d') AS odate
            FROM orders
            ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 10"""))

  /** Q16 — set operators over key projections, folded into one lazy plan
    * (4 aggregate branches unioned; no driver-side counts). */
  val q16 = QueryDef(
    "q16_setops",
    (s, d) => {
      val c = cst(s, d).select(col("c_nationkey").as("k"))
      val sp = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      def n(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      n(c.unionAll(sp), "union_all")
        .unionAll(n(c.union(sp).distinct(), "union_distinct"))
        .unionAll(n(c.intersect(sp), "intersect"))
        .unionAll(n(c.except(sp), "except"))
        .orderBy("op")
    },
    Some("""SELECT 'union_all' AS op, count(*) AS n FROM
              (SELECT c_nationkey AS k FROM customer
               UNION ALL SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'union_distinct', count(*) FROM
              (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'intersect', count(*) FROM
              (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'except', count(*) FROM
              (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
            ORDER BY op"""))

  /** Q17 — string function battery; all codegen'd built-ins, no UDFs. */
  val q17 = QueryDef(
    "q17_string_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("sub5"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          col("p_name").like("%al%").as("has_al"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          length(col("p_name")).as("name_len"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          split(col("p_type"), " ").getItem(0).as("type_head"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 5) AS sub5,
            concat_ws('-', p_brand, p_type) AS brand_type,
            p_name LIKE '%al%' AS has_al,
            regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
            CAST(length(p_name) AS INTEGER) AS name_len,
            lpad(p_brand, 12, '*') AS brand_pad,
            string_split(p_type, ' ')[1] AS type_head
            FROM part ORDER BY p_partkey"""))

  /** Q18 — date/time function battery; timestamps exported as UTC strings. */
  val q18 = QueryDef(
    "q18_datetime_funcs",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS y,
            CAST(month(o_orderdate) AS INTEGER) AS m,
            strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
            CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                 AS INTEGER) AS days_since,
            CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
            strftime(o_orderdate, '%Y-%m-%d') AS odate
            FROM orders ORDER BY o_orderkey"""))

  /** Q19 — math + conditional battery (CASE WHEN, round/abs/ceil/floor/pow,
    * modulo, greatest/least). */
  val q19 = QueryDef(
    "q19_math_conditional",
    (s, d) =>
      li(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, "high").otherwise("low").as("disc_band"),
          // round at 4 dp: the product of two 2-dp decimals is exactly 4-dp,
          // so rounding it at 2 dp lands on the .xx5 boundary where Spark
          // (HALF_UP on shortest-repr) and DuckDB (scaled nearbyint) differ.
          round(col("l_extendedprice") * (lit(1) + col("l_tax")), 4).as("gross"),
          round(abs(col("l_discount") - lit(0.05)), 4).as("disc_dev"),
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity")).as("qty_floor"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          (col("l_linenumber") % 3).as("ln_mod"),
          round(greatest(col("l_quantity"), col("l_extendedprice") / lit(100)), 4)
            .as("gmax"),
          round(least(col("l_quantity"), col("l_extendedprice") / lit(100)), 4)
            .as("lmin"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            CASE WHEN l_discount > 0.05 THEN 'high' ELSE 'low' END AS disc_band,
            round(l_extendedprice * (1 + l_tax), 4) AS gross,
            round(abs(l_discount - 0.05), 4) AS disc_dev,
            CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
            CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
            round(pow(l_quantity, 2), 4) AS qty_sq,
            l_linenumber % 3 AS ln_mod,
            round(greatest(l_quantity, l_extendedprice / 100), 4) AS gmax,
            round(least(l_quantity, l_extendedprice / 100), 4) AS lmin
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Q20 — HAVING against a scalar subquery (global avg), decorrelated in
    * the DataFrame API as a broadcast cross-join of the 1-row aggregate.
    * r12 sweep: BOTH the emitted average and the HAVING comparison are
    * exact — avg(group) > avg(global) is cross-multiplied into the
    * integer inequality sum_g·n_total > sum_total·n_g (128-bit: the
    * products pass 2⁶³ around 10⁹ customers), so a near-tie can never
    * flip on float noise. */
  val q20 = QueryDef(
    "q20_having_scalar_subquery",
    (s, d) => {
      val c = cst(s, d).select(
        col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val global = c.agg(count(lit(1)).as("n_total"),
        sum(col("cents")).as("sum_total"))
      c.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
        .crossJoin(broadcast(global))
        .filter(expr(
          "CAST(sc AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0)) > " +
            "CAST(sum_total AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"))
        .withColumn("avg_bal_e4",
          expr("CASE WHEN sc >= 0 THEN (100 * sc) DIV n " +
            "ELSE -((100 * (-sc)) DIV n) END"))
        .withColumn("avg_bal", expr("CAST(avg_bal_e4 AS DOUBLE) / 10000.0"))
        .select("c_mktsegment", "n", "avg_bal_e4", "avg_bal")
        .orderBy("c_mktsegment")
    },
    Some("""WITH c AS (
              SELECT c_mktsegment,
                CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer),
            t AS (
              SELECT CAST(count(*) AS BIGINT) AS n_total,
                CAST(sum(cents) AS BIGINT) AS sum_total FROM c),
            g AS (
              SELECT c_mktsegment, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS sc
              FROM c GROUP BY c_mktsegment)
            SELECT c_mktsegment, n,
              CAST(CASE WHEN sc >= 0 THEN (100 * sc) // n
                ELSE -((100 * (-sc)) // n) END AS BIGINT) AS avg_bal_e4,
              CAST(CAST(CASE WHEN sc >= 0 THEN (100 * sc) // n
                ELSE -((100 * (-sc)) // n) END AS BIGINT) AS DOUBLE)
                / 10000.0 AS avg_bal
            FROM g, t
            WHERE CAST(sc AS HUGEINT) * CAST(n_total AS HUGEINT)
                > CAST(sum_total AS HUGEINT) * CAST(n AS HUGEINT)
            ORDER BY c_mktsegment"""))

  /** Q21 — IN-subquery: orders from top-decile-balance customers. The
    * oracle states the decile as a global ntile(10) window; a global
    * window means ONE ordered partition holding every customer — a
    * scale-killer — so the registered plan computes the IDENTICAL
    * decile-1 set by exact distributed selection of the k-th
    * (balance desc, custkey asc) order statistic:
    *
    *  1. per-dollar histogram — bucket count is bounded by the balance
    *     DOMAIN (~11k dollar values), not the row count, so the collect
    *     stays O(domain) at any scale;
    *  2. exact value counts inside the single boundary bucket (≤ a few
    *     hundred distinct doubles per dollar);
    *  3. decile-1 = everyone strictly above the boundary value, plus the
    *     first (k − above) boundary-value customers by custkey — ntile's
    *     tie order.
    *
    * Three bounded driver actions; every distributed step is a narrow
    * partial-aggregate or pushed-filter scan. */
  val q21 = QueryDef(
    "q21_in_subquery",
    (s, d) => {
      val c = cst(s, d).select("c_custkey", "c_acctbal")
      val n = c.count()
      val k = n / 10 + (if (n % 10 > 0) 1L else 0L) // ntile bucket-1 size
      val top =
        if (k == 0L) c.filter(lit(false)).select("c_custkey")
        else {
          val hist = c
            .groupBy(floor(col("c_acctbal")).cast("long").as("b"))
            .agg(count(lit(1)).as("cnt"))
            .orderBy(col("b").desc)
            .collect()
          var above = 0L
          var i = 0
          while (above + hist(i).getLong(1) < k) {
            above += hist(i).getLong(1); i += 1
          }
          val bstar = hist(i).getLong(0)
          val inBucket = c
            .filter(floor(col("c_acctbal")).cast("long") === bstar)
            .groupBy("c_acctbal").agg(count(lit(1)).as("cnt"))
            .orderBy(col("c_acctbal").desc)
            .collect()
          var j = 0
          while (above + inBucket(j).getLong(1) < k) {
            above += inBucket(j).getLong(1); j += 1
          }
          val t = inBucket(j).getDouble(0) // k-th row's balance
          val need = (k - above).toInt     // boundary ties taken by custkey
          c.filter(col("c_acctbal") > t).select("c_custkey")
            .union(
              c.filter(col("c_acctbal") === t)
                .orderBy("c_custkey").limit(need).select("c_custkey"))
        }
      val o = ord(s, d)
      o.join(top, o("o_custkey") === top("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          // r12 sweep: cents before the sum (order-free), double derived
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("revenue_cents"))
        .withColumn("revenue", expr("CAST(revenue_cents AS DOUBLE) / 100.0"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS revenue_cents,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS revenue
            FROM orders WHERE o_custkey IN (
              SELECT c_custkey FROM (
                SELECT c_custkey, ntile(10) OVER
                  (ORDER BY c_acctbal DESC, c_custkey) AS decile
                FROM customer)
              WHERE decile = 1)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Q22 — correlated scalar subquery (each customer's max-price orders),
    * decorrelated to a per-key window max — one shuffle instead of a
    * subquery per row. */
  val q22 = QueryDef(
    "q22_correlated_subquery",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
      ord(s, d)
        .withColumn("max_price", max(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") === col("max_price"))
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
            FROM orders o
            WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
            ORDER BY o_custkey, o_orderkey"""))

  /** Q23 — JSON extraction over events.props, via both the path extractor
    * and a parsed MapType (`from_json`) — the two must agree. */
  val q23 = QueryDef(
    "q23_json",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          element_at(
            from_json(col("props"),
              org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")),
            "k").as("k_map"))
        .orderBy("event_id"),
    Some("""SELECT event_id, event_type,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_map
            FROM events ORDER BY event_id"""))

  /** Q23b — array ops over embeddings via higher-order functions. The fold
    * (`aggregate`) runs left-to-right on both engines (0.0 seed), so the
    * double sums match exactly. */
  val q23b = QueryDef(
    "q23b_array_funcs",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("emb", col("embedding").cast("array<double>"))
      e.select(
          col("vec_id"),
          size(col("emb")).as("dim"),
          round(element_at(col("emb"), 1), 4).as("e0"),
          round(array_max(col("emb")), 4).as("emax"),
          round(
            aggregate(col("emb"), lit(0.0), (acc, x) => acc + x), 4).as("esum"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
            CAST(len(embedding) AS INTEGER) AS dim,
            round(CAST(embedding AS DOUBLE[])[1], 4) AS e0,
            round(list_max(CAST(embedding AS DOUBLE[])), 4) AS emax,
            round(list_reduce(list_prepend(0.0, CAST(embedding AS DOUBLE[])),
                              (a, b) -> a + b), 4) AS esum
            FROM embeddings ORDER BY vec_id"""))

  private val liCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate")

  /** Q24 — single-pass profile: per-column null + exact distinct counts in
    * ONE aggregate over lineitem (the A2 idiom done right: the reference ran
    * 2 shuffles × N columns). At 100 TB swap countDistinct for
    * approx_count_distinct (see graft.ops.Profile). */
  val q24 = QueryDef(
    "q24_profile",
    (s, d) => graft.ops.Profile.exact(li(s, d)),
    Some {
      val per = liCols.map(c =>
        s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c,
            count(DISTINCT $c) AS distinct_$c""").mkString(",\n")
      s"SELECT count(*) AS n_rows,\n$per\nFROM lineitem"
    })

  /** Q25 — Pearson correlations in one aggregate pass (A3/A4 parity: the
    * reference ran O(n²) separate full-scan corr jobs). r12 sweep:
    * built-in corr() is a float-moment aggregate — order-dependent
    * partials, so the two engines disagree in the last ulps. Instead
    * the moments are EXACT integers (quantity integral, price in
    * cents, discount in e-2 units — corr is scale-invariant), the
    * n·Σxy − ΣxΣy numerators/denominators are exact 128-bit values,
    * and the only float step is the final fixed-shape
    * num/sqrt(d₁·d₂) over [[graft.core.Fixed.dec2d]]-converted doubles
    * (every cast ≤ 2⁵³ → bit-identical both engines). Still ONE
    * partial-aggregable scan — the 100 TB shape is unchanged. */
  val q25: QueryDef = {
    import graft.core.Fixed._
    def full(mSrc: String, div: String, w128: String): String = {
      def c2(num: String, da: String, db: String) =
        s"(${sdec2d(num, div)} / sqrt(${dec2d(da, div)} * ${dec2d(db, div)}))"
      (s"""WITH m AS (
             SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(round(l_discount * 100) AS BIGINT) AS dd
             FROM $mSrc),
           mom AS (
             -- only p*p (<= 1.1e14/row: cents^2) overflows a BIGINT sum
             -- below ~10^10 rows; every other product is <= 5e8/row, so
             -- those sums stay in fast codegen'd longs and only s_pp
             -- pays the 128-bit aggregate
             SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS s_q,
               CAST(sum(p) AS BIGINT) AS s_p,
               CAST(sum(dd) AS BIGINT) AS s_d,
               CAST(sum(q * q) AS BIGINT) AS s_qq,
               CAST(sum(CAST(p * p AS W128)) AS W128) AS s_pp,
               CAST(sum(dd * dd) AS BIGINT) AS s_dd,
               CAST(sum(q * p) AS BIGINT) AS s_qp,
               CAST(sum(p * dd) AS BIGINT) AS s_pd,
               CAST(sum(q * dd) AS BIGINT) AS s_qd
             FROM m),
           nums AS (
             SELECT
               CAST(n AS W128) * s_qp - CAST(s_q AS W128) * CAST(s_p AS W128) AS num_qp,
               CAST(n AS W128) * s_pd - CAST(s_p AS W128) * CAST(s_d AS W128) AS num_pd,
               CAST(n AS W128) * s_qd - CAST(s_q AS W128) * CAST(s_d AS W128) AS num_qd,
               CAST(n AS W128) * s_qq - CAST(s_q AS W128) * CAST(s_q AS W128) AS den_q,
               CAST(n AS W128) * s_pp - CAST(s_p AS W128) * CAST(s_p AS W128) AS den_p,
               CAST(n AS W128) * s_dd - CAST(s_d AS W128) * CAST(s_d AS W128) AS den_d
             FROM mom)
           SELECT
             ${c2("num_qp", "den_q", "den_p")} AS corr_qty_price,
             ${c2("num_pd", "den_p", "den_d")} AS corr_price_disc,
             ${c2("num_qd", "den_q", "den_d")} AS corr_qty_disc
           FROM nums""").replace("W128", w128)
    }
    QueryDef(
      "q25_corr",
      (s, d) => {
        li(s, d).createOrReplaceTempView("g25_lineitem")
        s.sql(full("g25_lineitem", SDIV, "DECIMAL(38,0)"))
      },
      Some(full("lineitem", DDIV, "HUGEINT")))
  }

  /** Q26 — pivot (cross-tab): order counts per segment × status. Spark's
    * pivot leaves missing cells null → na.fill(0) to match the FILTER'd
    * counts in the oracle. Explicit pivot values keep the schema static
    * (required for determinism and at-scale planning). */
  val q26 = QueryDef(
    "q26_pivot",
    (s, d) => {
      val o = ord(s, d); val c = cst(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
            count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
            count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
            count(*) FILTER (WHERE o_orderstatus = 'P') AS P
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Q27 — generator surface (UDTF-shaped, SURVEY §2.8): posexplode of
    * tokenized part names; DuckDB mirrors with UNNEST WITH ORDINALITY
    * (1-based → pos+1). */
  val q27 = QueryDef(
    "q27_explode",
    (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .select(col("p_partkey"), (col("pos") + 1).as("pos"), col("word"))
        .orderBy("p_partkey", "pos"),
    Some("""WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
            SELECT p_partkey, CAST(i AS INTEGER) AS pos, w[i] AS word
            FROM t, unnest(range(1, len(w) + 1)) AS u(i)
            ORDER BY p_partkey, pos"""))

  /** Q28 — exact interpolated percentiles + dispersion stats per segment
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear
    * interpolation over a full sort). */
  val q28 = QueryDef(
    "q28_percentile_stats",
    // r12 sweep: interpolated percentiles run over integer CENTS (the
    // two engines interpolate with differently-associated formulas —
    // a+f·(b−a) vs (1−f)·a+f·b — which agree only when the inputs are
    // exact ints and the result is snapped: ·10 then round lands on
    // the exact milli-dollar integer because the true value is exactly
    // 1-dp in cents). Variance is the exact 128-bit moment form
    // M = n·Σc² − (Σc)²; var(dollars²)·10⁴ = M DIV (n(n−1)) exactly.
    (s, d) =>
      cst(s, d)
        .select(col("c_mktsegment"),
          col("c_acctbal"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        .groupBy("c_mktsegment")
        .agg(
          expr("CAST(round(percentile(cents, 0.5) * 10) AS BIGINT)")
            .as("median_bal_m"),
          expr("CAST(round(percentile(cents, 0.9) * 10) AS BIGINT)")
            .as("p90_bal_m"),
          count(lit(1)).as("n"),
          sum(col("cents")).as("sc"),
          sum(expr("CAST(cents * cents AS DECIMAL(38,0))")).as("scc"),
          round(min(col("c_acctbal")), 2).as("min_bal"),
          round(max(col("c_acctbal")), 2).as("max_bal"))
        .withColumn("var_bal_e4", expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * scc - " +
            "CAST(sc AS DECIMAL(38,0)) * CAST(sc AS DECIMAL(38,0))) DIV " +
            "(CAST(n AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0))) " +
            "AS BIGINT)"))
        .selectExpr("c_mktsegment",
          "CAST(median_bal_m AS DOUBLE) / 1000.0 AS median_bal",
          "CAST(p90_bal_m AS DOUBLE) / 1000.0 AS p90_bal",
          "sqrt(CAST(var_bal_e4 AS DOUBLE) / 10000.0) AS sd_bal",
          "CAST(var_bal_e4 AS DOUBLE) / 10000.0 AS var_bal",
          "var_bal_e4", "min_bal", "max_bal")
        .orderBy("c_mktsegment"),
    Some("""WITH c AS (
              SELECT c_mktsegment, c_acctbal,
                CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer),
            g AS (
              SELECT c_mktsegment,
                CAST(round(quantile_cont(cents, 0.5) * 10) AS BIGINT)
                  AS median_bal_m,
                CAST(round(quantile_cont(cents, 0.9) * 10) AS BIGINT)
                  AS p90_bal_m,
                count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS sc,
                CAST(sum(CAST(cents * cents AS HUGEINT)) AS HUGEINT) AS scc,
                round(min(c_acctbal), 2) AS min_bal,
                round(max(c_acctbal), 2) AS max_bal
              FROM c GROUP BY c_mktsegment),
            v AS (
              SELECT *,
                CAST((CAST(n AS HUGEINT) * scc -
                  CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT)) //
                  (CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT))
                  AS BIGINT) AS var_bal_e4
              FROM g)
            SELECT c_mktsegment,
              CAST(median_bal_m AS DOUBLE) / 1000.0 AS median_bal,
              CAST(p90_bal_m AS DOUBLE) / 1000.0 AS p90_bal,
              sqrt(CAST(var_bal_e4 AS DOUBLE) / 10000.0) AS sd_bal,
              CAST(var_bal_e4 AS DOUBLE) / 10000.0 AS var_bal,
              var_bal_e4, min_bal, max_bal
            FROM v ORDER BY c_mktsegment"""))

  /** Q29 — as-of (point-in-time) join, composed from built-ins (option
    * (a) of the custom-operator ladder — no custom SparkPlan needed):
    * for each `error` event, the most recent `click` by the same user at
    * or before it, via a conditional last-value window with IGNORE NULLS.
    * One shuffle on user_id; at 100 TB this beats any non-equi join
    * formulation (which would range-explode). */
  val q29 = QueryDef(
    "q29_asof_join",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(
          col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_click_ts"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts")))
            .as("gap_s"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
            strftime(ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
            strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS asof_click_ts,
            CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(click_ts)) AS BIGINT) AS gap_s
            FROM (
              SELECT user_id, event_id, ts, event_type,
                last_value(CASE WHEN event_type = 'click' THEN ts END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS click_ts
              FROM events)
            WHERE event_type = 'error'
            ORDER BY user_id, event_id"""))

  /** Q30 — null-handling battery: coalesce / nullif / ifnull / null-safe
    * equality over the plane-shaped sentinel patterns (CancellationCode
    * analog: empty strings vs nulls). */
  val q30 = QueryDef(
    "q30_null_funcs",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          // nullif: P status → null, then coalesce back
          expr("nullif(o_orderstatus, 'P')").as("status_np"),
          expr("coalesce(nullif(o_orderstatus, 'P'), 'PENDING')").as("status_filled"),
          expr("ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT!')").as("prio_sub"),
          // null-safe equality: <=> never returns null
          (col("o_orderstatus") <=> lit("O")).as("is_open"),
          isnull(expr("nullif(o_orderstatus, 'F')")).as("was_f"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            nullif(o_orderstatus, 'P') AS status_np,
            coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
            ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_sub,
            o_orderstatus IS NOT DISTINCT FROM 'O' AS is_open,
            nullif(o_orderstatus, 'F') IS NULL AS was_f
            FROM orders ORDER BY o_orderkey"""))

  /** Q31 — collection aggregation: per-region sorted distinct segment
    * list (collect_set → array_sort → array_join: deterministic, unlike
    * raw collect order) and per-region segment count. */
  val q31 = QueryDef(
    "q31_collect_agg",
    (s, d) => {
      val c = cst(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
            .as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name,
            array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
            count(DISTINCT c_mktsegment) AS n_segments
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** Q32 — time-range rolling window: per-user 1-hour trailing event sum
    * via RANGE frame over epoch seconds (value-based frames are the
    * event-time analog of rowsBetween; both engines use the same frame
    * semantics over the same integer key). */
  val q32 = QueryDef(
    "q32_rolling_range_window",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .select(
          col("user_id"), col("event_id"),
          // r12 sweep: cents before the frame sum (sliding-window
          // double sums associate differently per engine).
          sum(expr("CAST(round(value * 100) AS BIGINT)")).over(
            Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
              .rangeBetween(-3600L, 0L)).as("rolling_1h_cents"))
        .withColumn("rolling_1h",
          expr("CAST(rolling_1h_cents AS DOUBLE) / 100.0"))
        .orderBy("user_id", "event_id"),
    Some("""SELECT user_id, event_id,
            CAST(sum(CAST(round(value * 100) AS BIGINT))
                 OVER w AS BIGINT) AS rolling_1h_cents,
            CAST(sum(CAST(round(value * 100) AS BIGINT))
                 OVER w AS DOUBLE) / 100.0 AS rolling_1h
            FROM (SELECT user_id, event_id, value,
                    CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            ORDER BY user_id, event_id"""))

  /** Q33 — multiset (ALL) set operators: unlike q16's distinct forms,
    * EXCEPT ALL / INTERSECT ALL preserve multiplicities. */
  val q33 = QueryDef(
    "q33_setops_all",
    (s, d) => {
      val c = cst(s, d).select(col("c_nationkey").as("k"))
      val sp = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      def n(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      n(c.exceptAll(sp), "except_all")
        .unionAll(n(c.intersectAll(sp), "intersect_all"))
        .orderBy("op")
    },
    Some("""SELECT 'except_all' AS op, count(*) AS n FROM
              (SELECT c_nationkey AS k FROM customer
               EXCEPT ALL SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'intersect_all', count(*) FROM
              (SELECT c_nationkey FROM customer
               INTERSECT ALL SELECT s_nationkey FROM supplier)
            ORDER BY op"""))

  /** Q34 — histogram binning: fixed-width value buckets with counts and
    * bounds — the profiling distribution op (floor-based binning is
    * identical integer math on both engines). */
  val q34 = QueryDef(
    "q34_histogram",
    (s, d) =>
      ord(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("int"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bucket"),
    Some("""SELECT CAST(floor(o_totalprice / 50000) AS INTEGER) AS bucket,
            count(*) AS n, round(min(o_totalprice), 2) AS lo,
            round(max(o_totalprice), 2) AS hi
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** Q35 — edit-distance fuzzy matching: near-identical part names within
    * a brand (the record-linkage shape; unit-cost levenshtein is identical
    * on both engines).
    *
    * Scale plan: the lev predicate depends only on the NAME VALUES, whose
    * distinct count is vocabulary-bounded — so levenshtein runs over
    * distinct ordered name pairs (a length-difference ≤ 3 prefilter ahead
    * of it), CONSTANT work as the table grows, and the row-level expansion
    * back is a broadcast of the tiny qualifying name-pair list plus an
    * equi join on (brand, name). Brand-only row blocking — the naive plan
    * — is quadratic per brand in ROWS; per-row levenshtein cost here is
    * zero. The only nested-loop join left runs on the deduped name domain,
    * never on rows. (With an unbounded name domain you'd re-block the
    * name-pair stage itself — e.g. by length band — but its input is the
    * distinct values either way.) */
  val q35 = QueryDef(
    "q35_fuzzy_levenshtein",
    (s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_name")
      val names = p.select(col("p_name").as("n1")).distinct()
      val namePairs = names.crossJoin(broadcast(names.select(col("n1").as("n2"))))
        .filter(col("n1") =!= col("n2"))
        .filter(abs(length(col("n1")) - length(col("n2"))) <= 3)
        .withColumn("lev", levenshtein(col("n1"), col("n2")))
        .filter(col("lev") <= 3)
      val a = p.select(col("p_brand"), col("p_partkey").as("a_id"),
        col("p_name").as("n1"))
      val b = p.select(col("p_brand"), col("p_partkey").as("b_id"),
        col("p_name").as("n2"))
      a.join(broadcast(namePairs), Seq("n1"))
        .join(b, Seq("p_brand", "n2"))
        .filter(col("a_id") < col("b_id"))
        .select(col("p_brand"), col("a_id"), col("b_id"), col("lev"))
        .orderBy("p_brand", "a_id", "b_id")
    },
    Some("""SELECT a.p_brand, a.p_partkey AS a_id, b.p_partkey AS b_id,
            CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 3
              AND a.p_name != b.p_name
            ORDER BY a.p_brand, a_id, b_id"""))

  /** Q36 — extended datetime arithmetic: month addition with end-of-month
    * clamping, last_day, quarter, ISO week, day-of-week (Spark's Sunday=1
    * convention mapped to DuckDB's Sunday=0 by subtracting 1). */
  val q36 = QueryDef(
    "q36_datetime_extra",
    (s, d) =>
      ord(s, d)
        .select(
          col("o_orderkey"),
          date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd")
            .as("plus_month"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          quarter(col("o_orderdate")).as("q"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
            strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
            CAST(quarter(o_orderdate) AS INTEGER) AS q,
            CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
            CAST(dayofweek(o_orderdate) AS INTEGER) AS dow
            FROM orders ORDER BY o_orderkey"""))

  /** Q37 — error-safe casting + FILTER-clause conditional aggregation
    * (ANSI-mode-safe data cleaning: try_cast nulls instead of throwing;
    * same syntax both engines via the SQL entry point). */
  val q37 = QueryDef(
    "q37_trycast_filter_agg",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT
                 count(*) AS n,
                 count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
                 count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                 count(try_cast(o_orderpriority AS INT)) AS n_prio_numeric,
                 count(try_cast(substring(o_orderpriority, 1, 1) AS INT))
                   AS n_prio_digit
               FROM g_orders""")
    },
    Some("""SELECT count(*) AS n,
            count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
            count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
            count(try_cast(o_orderpriority AS INTEGER)) AS n_prio_numeric,
            count(try_cast(substring(o_orderpriority, 1, 1) AS INTEGER))
              AS n_prio_digit
            FROM orders"""))

  /** Q38 — LATERAL correlated table subquery (top-2 customers per
    * nation): the SQL form of a dependent per-row subplan with its own
    * ORDER BY/LIMIT. Catalyst decorrelates it (DecorrelateInnerQuery)
    * into a ranked join rather than executing per-nation loops — the
    * same shape q13 reaches through the Window API. */
  val q38 = QueryDef(
    "q38_lateral_topn",
    (s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      cst(s, d).createOrReplaceTempView("g_customer")
      s.sql("""SELECT n_name, c_name, round(c_acctbal, 2) AS bal
               FROM g_nation,
               LATERAL (SELECT c_name, c_acctbal FROM g_customer
                        WHERE c_nationkey = n_nationkey
                        ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
               ORDER BY n_name, bal DESC, c_name""")
    },
    Some("""SELECT n_name, c_name, round(c_acctbal, 2) AS bal
            FROM nation,
            LATERAL (SELECT c_name, c_acctbal FROM customer
                     WHERE c_nationkey = n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
            ORDER BY n_name, bal DESC, c_name"""))

  /** Q39 — IGNORE NULLS window (last-observation-carried-forward): per
    * user, each event carries the value of the most recent preceding
    * 'purchase' — the canonical time-series gap fill. Partitioned by
    * user (parallel), unique (ts, event_id) tiebreak; value doubles
    * pass through from the same parquet on both engines. Syntax note:
    * Spark puts IGNORE NULLS after the call, DuckDB inside it. */
  val q39 = QueryDef(
    "q39_window_ignore_nulls",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("g_events")
      s.sql("""SELECT event_id,
                 last_value(pv) IGNORE NULLS OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_value
               FROM (SELECT event_id, user_id, ts,
                       CASE WHEN event_type = 'purchase' THEN value END AS pv
                     FROM g_events)
               ORDER BY event_id""")
    },
    Some("""SELECT event_id,
              last_value(pv IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS last_purchase_value
            FROM (SELECT event_id, user_id, ts,
                    CASE WHEN event_type = 'purchase' THEN value END AS pv
                  FROM events)
            ORDER BY event_id"""))

  /** Q40 — UNPIVOT (q26 pivot's inverse): melt a wide per-flag
    * aggregate into (key, metric, value) long form — the reshape every
    * metrics table needs before generic downstream processing. Metric
    * columns are unified to DOUBLE on both engines. */
  val q40 = QueryDef(
    "q40_unpivot",
    (s, d) => {
      li(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""WITH wide AS (
                 SELECT l_returnflag,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DOUBLE) / 100.0 AS sum_price,
                   CAST(count(*) AS DOUBLE) AS n_rows
                 FROM g_lineitem GROUP BY 1)
               SELECT l_returnflag, metric, v
               FROM wide UNPIVOT (v FOR metric IN (sum_qty, sum_price, n_rows))
               ORDER BY l_returnflag, metric""")
    },
    Some("""WITH wide AS (
              SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS sum_price,
                CAST(count(*) AS DOUBLE) AS n_rows
              FROM lineitem GROUP BY 1)
            SELECT l_returnflag, metric, v
            FROM wide UNPIVOT (v FOR metric IN (sum_qty, sum_price, n_rows))
            ORDER BY l_returnflag, metric"""))

  /** Q41 — recursive CTE (new in Spark 4): a month date-spine from the
    * data's own min/max (bounds carried THROUGH the recursion — no
    * subquery in the recursive member) left-joined back so empty months
    * appear as zero — the warehouse calendar-fill pattern a bare
    * GROUP BY month cannot produce. ~80 iterations here, under Spark's
    * default recursion limit; the per-step state is one row. */
  val q41 = QueryDef(
    "q41_recursive_cte",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("g_orders")
      s.sql("""WITH RECURSIVE b AS (
                 SELECT date_trunc('month', min(o_orderdate)) AS mn,
                        date_trunc('month', max(o_orderdate)) AS mx
                 FROM g_orders),
               spine(m, mx) AS (
                 SELECT mn, mx FROM b
                 UNION ALL
                 SELECT m + INTERVAL 1 MONTH, mx FROM spine WHERE m < mx)
               SELECT date_format(m, 'yyyy-MM') AS month,
                      count(o_orderkey) AS n_orders
               FROM spine LEFT JOIN g_orders
                 ON date_trunc('month', o_orderdate) = m
               GROUP BY 1 ORDER BY 1""")
    },
    Some("""WITH RECURSIVE b AS (
              SELECT date_trunc('month', min(o_orderdate)) AS mn,
                     date_trunc('month', max(o_orderdate)) AS mx
              FROM orders),
            spine(m, mx) AS (
              SELECT mn, mx FROM b
              UNION ALL
              SELECT m + INTERVAL 1 MONTH, mx FROM spine WHERE m < mx)
            SELECT strftime(m, '%Y-%m') AS month,
                   count(o_orderkey) AS n_orders
            FROM spine LEFT JOIN orders
              ON date_trunc('month', o_orderdate) = m
            GROUP BY 1 ORDER BY 1"""))

  /** Q42 — the SQL front-end as a first-class surface: TPC-H Q3
    * (shipping-priority revenue) submitted as ONE ANSI text that runs
    * verbatim on both engines — same joins, same fixed-point revenue —
    * over registered temp views. Catalyst plans it exactly like the
    * DataFrame forms (broadcast customer dim, partial aggs); the revenue
    * sum is 4-dp fixed-point (extendedprice and discount are 2-dp, so
    * the product is exactly 4-decimal — scaled-long addition is
    * order-independent where double summation is not). */
  val q42 = {
    val text = """SELECT l_orderkey,
                    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                      * 10000) AS BIGINT)) AS BIGINT)
                      / CAST(10000 AS DOUBLE) AS revenue,
                    %s AS odate
                  FROM customer
                  JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  WHERE c_mktsegment = 'BUILDING'
                    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
                  GROUP BY l_orderkey, o_orderdate
                  ORDER BY revenue DESC, l_orderkey
                  LIMIT 10"""
    QueryDef(
      "q42_sql_tpch_q3",
      (s, d) => {
        cst(s, d).createOrReplaceTempView("g42_customer")
        ord(s, d).createOrReplaceTempView("g42_orders")
        li(s, d).createOrReplaceTempView("g42_lineitem")
        s.sql(text
          .replace(" customer", " g42_customer")
          .replace(" orders ", " g42_orders ")
          .replace(" lineitem ", " g42_lineitem ")
          .format("date_format(o_orderdate, 'yyyy-MM-dd')"))
      },
      Some(text.format("strftime(o_orderdate, '%Y-%m-%d')")))
  }

  /** Q43 — TPC-H Q5 (local-supplier volume) through the same SQL
    * front-end as q42: the full 6-table snowflake (region → nation →
    * supplier ⋈ customer ⋈ orders ⋈ lineitem) with the co-nation
    * residual `c_nationkey = s_nationkey` on the lineitem⋈supplier
    * join. Scale shape: region/nation/supplier are bounded dims →
    * Catalyst broadcasts them, so the only big shuffle is
    * orders⋈lineitem on orderkey; revenue is the same 4-dp fixed-point
    * scaled-long sum as q42 (order-independent addition). */
  val q43 = {
    val text = """SELECT n_name,
                    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                      * 10000) AS BIGINT)) AS BIGINT)
                      / CAST(10000 AS DOUBLE) AS revenue,
                    count(*) AS n_items
                  FROM customer
                  JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                    AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                  WHERE r_name IN ('ASIA', 'EUROPE')
                    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
                  GROUP BY n_name
                  ORDER BY revenue DESC, n_name"""
    QueryDef(
      "q43_sql_tpch_q5",
      (s, d) => {
        cst(s, d).createOrReplaceTempView("g43_customer")
        ord(s, d).createOrReplaceTempView("g43_orders")
        li(s, d).createOrReplaceTempView("g43_lineitem")
        Tables.supplier(s, d).createOrReplaceTempView("g43_supplier")
        Tables.nation(s, d).createOrReplaceTempView("g43_nation")
        Tables.region(s, d).createOrReplaceTempView("g43_region")
        s.sql(text
          .replace(" customer", " g43_customer")
          .replace(" orders ", " g43_orders ")
          .replace(" lineitem ", " g43_lineitem ")
          .replace(" supplier ", " g43_supplier ")
          .replace(" nation ", " g43_nation ")
          .replace(" region ", " g43_region "))
      },
      Some(text))
  }

  /** Q44 — the distribution-rank battery (percent_rank, cume_dist,
    * partitioned ntile, nth_value): the remaining ANSI window functions
    * q13/q14 don't cover. All windows PARTITION BY the bounded priority
    * key — per-partition sorts, never the q21 single-partition
    * anti-pattern — and order by a UNIQUE (totalprice, orderkey) pair,
    * which makes percent_rank/cume_dist exact integer ratios (one IEEE
    * division, engine-identical) and pins ntile/nth_value bucket edges
    * deterministically. */
  val q44 = QueryDef(
    "q44_window_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ord(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).as("quartile"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey,
              round(o_totalprice, 2) AS price,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cume,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile,
              nth_value(o_orderkey, 2) OVER w AS second_key
            FROM orders
            WHERE o_orderstatus = 'F'
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderpriority, o_orderkey"""))

  /** Q45 — NOT IN under ANSI three-valued logic (the classic silent-
    * wrong-answer trap, and Spark's null-aware anti join): the same
    * NOT IN predicate evaluated against a null-free subquery (normal
    * anti-join count) and a null-TAINTED one (one NULL makes `x NOT IN
    * (…)` never true → count 0), plus the NOT EXISTS form that ignores
    * the null and keeps the anti semantics. Both engines implement the
    * same ANSI rule; Spark plans the tainted form as a null-aware anti
    * join (single-column NAAJ broadcast). Three bounded scalar counts
    * cross-joined into one row — each side is one aggregate over an
    * anti/semi join, no unbounded output. */
  val q45 = {
    val text = """WITH urgent AS (
                    SELECT o_orderkey, o_orderstatus FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
                  tainted AS (
                    SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                           ELSE o_orderkey END AS k
                    FROM urgent),
                  a AS (SELECT count(*) AS n_not_in_clean FROM lineitem
                        WHERE l_orderkey NOT IN
                          (SELECT o_orderkey FROM urgent)),
                  b AS (SELECT count(*) AS n_not_in_tainted FROM lineitem
                        WHERE l_orderkey NOT IN (SELECT k FROM tainted)),
                  c AS (SELECT count(*) AS n_not_exists FROM lineitem
                        WHERE NOT EXISTS (SELECT 1 FROM tainted
                                          WHERE k = l_orderkey))
                  SELECT n_not_in_clean, n_not_in_tainted, n_not_exists
                  FROM a, b, c"""
    QueryDef(
      "q45_not_in_null_semantics",
      (s, d) => {
        ord(s, d).createOrReplaceTempView("g45_orders")
        li(s, d).createOrReplaceTempView("g45_lineitem")
        s.sql(text
          .replace(" orders\n", " g45_orders\n")
          .replace(" lineitem\n", " g45_lineitem\n")
          .replace(" lineitem ", " g45_lineitem "))
      },
      Some(text))
  }

  /** Q46 — modern ANSI sugar through the SQL front-end: GROUP BY ALL /
    * ORDER BY ALL (every non-aggregate select item groups; every output
    * column orders) — one text, both engines, same resolution rules.
    * The TPC-H Q1 pricing-summary shape with the engine's fixed-point
    * revenue discipline. */
  val q46 = {
    val text = """SELECT l_returnflag, l_linestatus,
                    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                      AS sum_qty_c,
                    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                      * 10000) AS BIGINT)) AS BIGINT) AS revenue_4dp,
                    count(*) AS n
                  FROM lineitem
                  WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
                  GROUP BY ALL
                  ORDER BY ALL"""
    QueryDef(
      "q46_sql_group_by_all",
      (s, d) => {
        li(s, d).createOrReplaceTempView("g46_lineitem")
        s.sql(text.replace(" lineitem\n", " g46_lineitem\n"))
      },
      Some(text))
  }

  /** Q47 — error-safe `try_*` function battery (q37 covers try_cast;
    * this adds the arithmetic/collection/datetime family a pipeline
    * leans on instead of job-killing exceptions at 100 TB): try_divide
    * NULLs exactly on the zero divisor, try_add NULLs exactly on
    * BIGINT overflow, try_element_at NULLs exactly out of bounds,
    * try_to_timestamp NULLs on malformed input. Each count has a
    * pure-predicate DuckDB mirror (DuckDB errors on overflow instead
    * of NULLing, so the mirror states the EXACT null condition — which
    * is the point: the battery pins down precisely when each try_*
    * form degrades to NULL). Counts only, no float sums — a division's
    * double sum would be accumulation-order-dependent across engines. */
  val q47 = QueryDef(
    "q47_try_funcs",
    (s, d) => {
      li(s, d).createOrReplaceTempView("g47_lineitem")
      s.sql("""SELECT l_returnflag,
                 count(*) AS n_rows,
                 count(try_divide(l_extendedprice, l_quantity - 25))
                   AS n_div_ok,
                 count(try_add(l_orderkey, 9223372036854775800))
                   AS n_add_ok,
                 count(try_element_at(
                   split(l_linestatus || ',' || l_returnflag, ','),
                   l_linenumber)) AS n_elem_ok,
                 count(try_to_timestamp(l_returnflag)) AS n_ts_ok
               FROM g47_lineitem GROUP BY 1 ORDER BY 1""")
    },
    Some("""SELECT l_returnflag,
            count(*) AS n_rows,
            count(*) FILTER (WHERE l_quantity <> 25) AS n_div_ok,
            count(*) FILTER (WHERE l_orderkey <= 7) AS n_add_ok,
            count(list_extract(
              string_split(l_linestatus || ',' || l_returnflag, ','),
              l_linenumber)) AS n_elem_ok,
            count(try_strptime(l_returnflag, '%Y-%m-%d')) AS n_ts_ok
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Q48 — the VARIANT type (Spark 4.x): `parse_json` → open-schema
    * semi-structured value, `variant_get` typed path extraction — the
    * engine-native way to keep JSON columns queryable WITHOUT declaring
    * a schema up front (q23's `from_json` needs the DDL; VARIANT defers
    * typing to the access site, and its binary encoding pushes down
    * better than string re-parsing at every touch). Same events.props
    * source as q23, aggregated by the typed extraction so the whole
    * parse→extract→agg chain is exercised; the DuckDB mirror reads the
    * identical path through its JSON extraction. */
  val q48 = QueryDef(
    "q48_variant",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_val"))
        .groupBy((col("k_val") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum("k_val").as("sum_k"))
        .orderBy("k_bucket"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
              AS k_bucket,
            count(*) AS n,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
              AS BIGINT) AS sum_k
            FROM events GROUP BY 1 ORDER BY k_bucket"""))

  /** Q49 — SQL-defined scalar function (Spark 4.x `CREATE FUNCTION …
    * RETURN <expr>`): user logic declared IN SQL, inlined by the
    * analyzer into the calling plan (SQLFunctionNode → plain
    * expressions), so it codegens like any built-in — the right tool
    * where teams would otherwise reach for a JVM UDF for a pure
    * expression. The function body is a price banding CASE; the oracle
    * inlines the identical CASE, which is exactly what Spark's analyzer
    * does too — asserting the inlining semantics end to end. */
  val q49 = QueryDef(
    "q49_sql_udf",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_q49")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
               RETURNS STRING RETURN
               CASE WHEN p < 100000 THEN 'low'
                    WHEN p < 250000 THEN 'mid' ELSE 'high' END""")
      s.sql("""SELECT price_band(o_totalprice) AS band, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total
               FROM orders_q49 GROUP BY band ORDER BY band""")
    },
    Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                   WHEN o_totalprice < 250000 THEN 'mid' ELSE 'high' END
              AS band,
            count(*) AS n,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS total_cents,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS total
            FROM orders GROUP BY 1 ORDER BY band"""))

  /** Q10b — the BINNED rewrite of q10's range join, the 100 TB scale
    * path: q10 equi-joins on user_id alone and refines the 1-hour range
    * as a join filter, which is quadratic in events-per-user when the
    * key space is small and the history long (the pathological shape of
    * real event logs). Binning event time into interval-sized (1 h)
    * buckets and adding the bucket to the EQUI key caps each join
    * group at two adjacent hours of one user: the probe side explodes
    * into its own and the next bucket (any b with
    * a_ts < b_ts ≤ a_ts+1h lands in one of the two), the join runs on
    * (user, bucket) — a normal shuffled equi-join — and the exact range
    * predicate refines. This is the rewrite range-join hints perform;
    * output (and oracle) are bit-identical to q10's. The epoch DIV is
    * on whole seconds; the bucket cover stays exact for sub-second
    * timestamps because truncation only ever moves b into the covered
    * pair. */
  val q10b = QueryDef(
    "q10b_range_join_binned",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          expr("unix_timestamp(ts) DIV 3600").as("bucket"))
      val a = e.select(col("user_id").as("a_uid"), col("ts").as("a_ts"),
        explode(array(col("bucket"), col("bucket") + 1)).as("pb"))
      val b = e.select(col("user_id").as("b_uid"), col("ts").as("b_ts"),
        col("bucket").as("bb"))
      a.join(b,
          col("a_uid") === col("b_uid") && col("pb") === col("bb") &&
          col("a_ts") < col("b_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("a_uid").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    // bit-identical semantics to q10 → the same oracle text
    q10.sql)

  /** Q50 — batch sessionization (gaps-and-islands): per user, a new
    * session starts when the gap since the previous event exceeds 30
    * minutes; emit per-session stats. This is the BATCH twin of st03's
    * streaming `session_window` — same 30-min gap rule, expressed as
    * the classic lag → boundary flag → running-sum-of-flags pattern so
    * DuckDB can mirror it verbatim (the `session_window` builtin is
    * engine-specific).
    *
    * Determinism: the gap test runs on integer epoch MICROseconds
    * (`unix_micros` / `epoch_us`) — no float time arithmetic anywhere —
    * and both windows order by the unique (ts, event_id) pair.
    *
    * Scale shape: both windows AND the final group-by share ONE
    * hash-partitioning on user_id, so the whole query is a single
    * shuffle followed by per-partition sorts; session count per user is
    * bounded by that user's history, never by the corpus. At 100 TB
    * this is the canonical one-shuffle sessionization every event
    * pipeline runs. */
  val q50 = QueryDef(
    "q50_sessionize_islands",
    (s, d) => {
      val gapUs = 30L * 60 * 1000000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_no", sum(col("new_s")).over(wc))
        .groupBy(col("user_id"), col("session_no"))
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
          (max(col("us")) - min(col("us"))).as("duration_us"),
          sum(expr("CAST(round(value * 100) AS BIGINT)"))
            .as("total_value_cents"))
        .withColumn("total_value",
          expr("CAST(total_value_cents AS DOUBLE) / 100.0"))
        .orderBy("user_id", "session_no")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
              FROM events),
            f AS (
              SELECT *, CASE WHEN lag(us, 1) OVER w IS NULL
                          OR us - lag(us, 1) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            g AS (
              SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_no
              FROM f)
            SELECT user_id, session_no, count(*) AS n_events,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
              max(us) - min(us) AS duration_us,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS total_value_cents,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS total_value
            FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Q51 — SQL pipe syntax (Spark 4.0 `|>` operators, the linear
    * query-flow front end standardized from ZetaSQL's pipes — Shute et
    * al., "SQL Has Problems. We Can Fix Them: Pipe Syntax in SQL",
    * VLDB 2024): FROM |> WHERE |> EXTEND |> AGGREGATE … GROUP BY
    * |> ORDER BY, compiled by Catalyst to the identical plan as the
    * nested form (the oracle runs the classic formulation — parity IS
    * the test). Revenue uses q42's 4-dp scaled-long discipline so the
    * sum is order-independent. */
  val q51 = QueryDef(
    "q51_sql_pipe_syntax",
    (s, d) => {
      li(s, d).createOrReplaceTempView("g51_lineitem")
      s.sql("""FROM g51_lineitem
               |> WHERE l_quantity > 10
               |> EXTEND CAST(round(l_extendedprice * (1 - l_discount)
                    * 10000) AS BIGINT) AS rev4
               |> AGGREGATE count(*) AS n,
                    CAST(sum(rev4) AS BIGINT) / CAST(10000 AS DOUBLE)
                      AS revenue
                  GROUP BY l_returnflag, l_linestatus
               |> ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                * 10000) AS BIGINT)) AS BIGINT)
                / CAST(10000 AS DOUBLE) AS revenue
            FROM lineitem WHERE l_quantity > 10
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Q52 — parameterized SQL (the `spark.sql(text, args)` API, Spark
    * 3.4+ named-marker form): the query text carries `:threshold` /
    * `:seg` markers and the values bind server-side — the injection-safe
    * front door a service puts in front of the engine (no string
    * splicing, plan cache friendly: one text, many bindings). The
    * oracle inlines the same literals. */
  val q52 = QueryDef(
    "q52_parameterized_sql",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("g52_orders")
      cst(s, d).createOrReplaceTempView("g52_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total
           FROM g52_orders JOIN g52_customer ON o_custkey = c_custkey
           WHERE o_totalprice > :threshold AND c_mktsegment != :seg
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        Map("threshold" -> 200000, "seg" -> "MACHINERY"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_cents,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 200000 AND c_mktsegment != 'MACHINERY'
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Q53 — SQL scripting (Spark 4 `BEGIN … END` compound blocks, ANSI
    * SQL/PSM shape): DECLARE session variables, SET them from scalar
    * queries over the data, branch with IF/ELSE on a data-dependent
    * condition, and return the final SELECT — multi-statement
    * procedural control flow through the SQL front door, where the
    * oracle expresses the same logic as one declarative CTE + CASE
    * (equivalence of the two formulations IS the test). */
  val q53 = QueryDef(
    "q53_sql_scripting",
    (s, d) => {
      ord(s, d).createOrReplaceTempView("g53_orders")
      // scripting is only needed while s.sql PARSES the compound block;
      // save/restore so the flag doesn't leak into the shared session
      val key = "spark.sql.scripting.enabled"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      // r12 sweep: the median runs over integer CENTS with the q28
      // x10 snap (true value exactly 1-dp in cents -> both engines
      // land on the same integer), and the threshold comparison is
      // pure integer arithmetic -- no float can flip the branch.
      try s.sql("""BEGIN
                 DECLARE med BIGINT;
                 DECLARE band STRING;
                 SET med = (SELECT CAST(round(percentile(
                              CAST(round(o_totalprice * 100) AS BIGINT),
                              0.5) * 10) AS BIGINT)
                            FROM g53_orders);
                 IF med > 150000000 THEN
                   SET band = 'high';
                 ELSE
                   SET band = 'low';
                 END IF;
                 SELECT band AS corpus_band,
                   CAST(med AS DOUBLE) / 1000.0 AS median_price,
                   count(*) AS n_above
                 FROM g53_orders
                 WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 10 > med;
               END""")
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    },
    Some("""WITH m AS (
              SELECT CAST(round(quantile_cont(
                  CAST(round(o_totalprice * 100) AS BIGINT), 0.5) * 10)
                AS BIGINT) AS med
              FROM orders)
            SELECT CASE WHEN med > 150000000 THEN 'high' ELSE 'low' END
              AS corpus_band,
              CAST(med AS DOUBLE) / 1000.0 AS median_price,
              (SELECT count(*) FROM orders
               WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 10 > m.med)
                AS n_above
            FROM m"""))

  /** Q54 — forward-fill gap imputation (LOCF — last observation carried
    * forward, the standard telemetry/time-series repair for missing
    * sensor readings): values deterministically "lost" (event_id % 5 ==
    * 3 simulates the dropout) are filled from the user's most recent
    * surviving reading via `last(..., ignoreNulls)` over a running
    * event-time frame; rows before any observation stay NULL (both
    * engines agree).
    *
    * Determinism: no arithmetic at all — values are copied, never
    * recomputed; the frame order (ts, event_id) is total.
    *
    * Scale plan: ONE window shuffle partitioned by user_id — the same
    * key a telemetry table is naturally bucketed on, so at 100 TB the
    * exchange disappears under bucketing; the frame is running (no
    * re-scan per row) and whole-stage codegen'd. */
  val q54 = QueryDef(
    "q54_locf_gapfill",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.core.Tables.events(s, d)
        .withColumn("v_raw",
          when(col("event_id") % 5 === 3, lit(null).cast("double"))
            .otherwise(col("value")))
        .withColumn("v_filled", last(col("v_raw"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("v_raw"), col("v_filled"))
        .orderBy("event_id")
    },
    Some("""WITH g AS (
              SELECT event_id, user_id, ts,
                CASE WHEN event_id % 5 = 3 THEN NULL ELSE value END AS v_raw
              FROM events)
            SELECT event_id, user_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, v_raw,
              last_value(v_raw IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
            FROM g ORDER BY event_id"""))

  /** Q55 — NEAREST-direction as-of join (pandas merge_asof
    * direction='nearest', q29's sibling): each error attaches the
    * same-user click with the smallest absolute time gap, backward OR
    * forward, ties to backward. Same window decomposition as q29 —
    * last-backward + first-forward conditional windows in ONE pass
    * over the user-partitioned ordered stream (no self-join, no range
    * join) — then a per-row argmin. Emits the chosen direction and gap;
    * 'none' when the user never clicked.
    *
    * Scale shape: q29's — two frames over one (user-keyed) sort, all
    * shuffle keys contain user_id. */
  val q55 = QueryDef(
    "q55_asof_nearest",
    (s, d) => {
      val base = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("back_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(wb))
        .withColumn("fwd_ts",
          first(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(wf))
        .filter(col("event_type") === "error")
        .withColumn("gb",
          unix_timestamp(col("ts")) - unix_timestamp(col("back_ts")))
        .withColumn("gf",
          unix_timestamp(col("fwd_ts")) - unix_timestamp(col("ts")))
        .select(
          col("user_id"), col("event_id"),
          expr("""CASE
                    WHEN back_ts IS NULL AND fwd_ts IS NULL THEN 'none'
                    WHEN fwd_ts IS NULL THEN 'backward'
                    WHEN back_ts IS NULL THEN 'forward'
                    WHEN gb <= gf THEN 'backward'
                    ELSE 'forward' END""").as("direction"),
          expr("""CASE
                    WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                    WHEN fwd_ts IS NULL THEN gb
                    WHEN back_ts IS NULL THEN gf
                    WHEN gb <= gf THEN gb
                    ELSE gf END""").as("nearest_gap_s"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH w AS (
              SELECT user_id, event_id, event_type,
                last_value(CASE WHEN event_type = 'click' THEN ts END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS back_ts,
                first_value(CASE WHEN event_type = 'click' THEN ts END
                            IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS fwd_ts,
                ts
              FROM events),
            g AS (
              SELECT *,
                CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(back_ts)) AS BIGINT) AS gb,
                CAST(floor(epoch(fwd_ts)) AS BIGINT)
                  - CAST(floor(epoch(ts)) AS BIGINT) AS gf
              FROM w WHERE event_type = 'error')
            SELECT user_id, event_id,
              CASE
                WHEN back_ts IS NULL AND fwd_ts IS NULL THEN 'none'
                WHEN fwd_ts IS NULL THEN 'backward'
                WHEN back_ts IS NULL THEN 'forward'
                WHEN gb <= gf THEN 'backward'
                ELSE 'forward' END AS direction,
              CASE
                WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL THEN gb
                WHEN back_ts IS NULL THEN gf
                WHEN gb <= gf THEN gb
                ELSE gf END AS nearest_gap_s
            FROM g
            ORDER BY user_id, event_id"""))

  /** Q56 — MapType construction + higher-order map functions:
    * `map_from_entries` over a sorted entry list, `map_filter`,
    * `transform_values`, `cardinality`, and `explode(map)` back to
    * rows. The per-order flag→quantity map is the Spark-side shape
    * (maps are Spark's native nested-kv column; the oracle mirrors the
    * SEMANTICS relationally — filter + arithmetic on the grouped
    * frame — since DuckDB's MAP is not the comparison surface).
    *
    * Determinism: entries are sort_array'd before map construction (so
    * the map's internal order never depends on collect_list's arrival
    * order), quantities are integral by data contract (CAST truncation
    * == DuckDB rounding on integral doubles), and the explode output
    * gets a total (l_orderkey, flag) ORDER BY.
    *
    * Scale shape: two hash aggs keyed by order (the second rides the
    * first's partitioning — AQE coalesces, no extra shuffle since
    * (orderkey, flag) hash-partitions refine orderkey only in key
    * count, Spark re-shuffles once); per-order maps are ≤3 entries
    * (flag domain), so the nested column is bounded — the map ops are
    * in-row, codegen'd, and never touch a shuffle. */
  val q56 = QueryDef(
    "q56_map_functions",
    (s, d) => {
      val per = li(s, d)
        .groupBy("l_orderkey", "l_returnflag")
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      per.groupBy("l_orderkey")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("l_returnflag"), col("q"))))).as("m"))
        .withColumn("n_flags", expr("cardinality(m)"))
        .withColumn("m2", expr(
          "transform_values(map_filter(m, (k, v) -> v >= 50), (k, v) -> v * 2)"))
        .select(col("l_orderkey"), col("n_flags"),
          explode(col("m2")).as(Seq("flag", "dbl_qty")))
        .orderBy("l_orderkey", "flag")
    },
    Some("""WITH per AS (
              SELECT l_orderkey, l_returnflag AS flag,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
              FROM lineitem GROUP BY 1, 2),
            nf AS (
              SELECT l_orderkey, CAST(count(*) AS INTEGER) AS n_flags
              FROM per GROUP BY 1)
            SELECT p.l_orderkey, nf.n_flags, p.flag, 2 * p.q AS dbl_qty
            FROM per p JOIN nf USING (l_orderkey)
            WHERE p.q >= 50
            ORDER BY l_orderkey, flag"""))

  /** Q57 — SCD2 point-in-time (AS OF) lookup: x31 builds the
    * slowly-changing-dimension history (per customer, versioned
    * priority with [valid_from, valid_to) ranges); this op answers the
    * question that history exists for — "what did the dimension look
    * like AT date D?" — for a panel of probe dates, producing the
    * per-date priority census. The temporal-table `FOR SYSTEM_TIME AS
    * OF` semantics expressed as a range predicate.
    *
    * Determinism: version ranges come from the same total
    * (o_orderdate, o_orderkey) order as x31 — same-date re-versions
    * collapse to zero-length ranges that can never match, so AT MOST
    * ONE version matches per (customer, probe date) and the census is
    * exact.
    *
    * Scale shape: the probe panel is a bounded (3-row) broadcast; the
    * range predicate evaluates inside the SCD2 scan (no self-join, no
    * range-join explosion — q10b's binning is the path if the probe
    * panel ever grows corpus-shaped); one (date, priority) hash agg. */
  val q57 = {
    val dates = Seq("1994-01-01", "1996-01-01", "1998-01-01")
    QueryDef(
      "q57_scd2_asof_lookup",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val scd = ord(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            col("o_orderpriority"))
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        val probes = s.range(1).select(explode(expr(
          s"array(${dates.map(x => s"TIMESTAMP'$x'").mkString(", ")})"))
          .as("asof_ts"))
        scd.join(broadcast(probes),
          col("o_orderdate") <= col("asof_ts") &&
            (col("valid_to").isNull || col("asof_ts") < col("valid_to")))
          .groupBy(date_format(col("asof_ts"), "yyyy-MM-dd").as("asof_date"),
            col("o_orderpriority"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("asof_date", "o_orderpriority")
      },
      Some(s"""WITH scd AS (
                 SELECT o_custkey, o_orderdate, o_orderpriority,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS valid_to
                 FROM orders),
               probes AS (
                 SELECT CAST(dt AS TIMESTAMP) AS asof_ts
                 FROM unnest([${dates.map(x => s"'$x'").mkString(", ")}])
                   AS t(dt))
               SELECT strftime(asof_ts, '%Y-%m-%d') AS asof_date,
                 o_orderpriority, count(*) AS n_customers
               FROM scd JOIN probes
                 ON o_orderdate <= asof_ts
                AND (valid_to IS NULL OR asof_ts < valid_to)
               GROUP BY 1, 2 ORDER BY 1, 2"""))
  }

  /** Q58 — sliding-window rate-limit audit (the admission rule API
    * gateways enforce — Cloudflare/Kong-style sliding window: admit an
    * event iff the SAME user produced fewer than K events in the
    * preceding W seconds, current instant excluded): replayed exactly
    * over the event log with a RANGE-frame window, then a per-type
    * admission census. The offline form of what st22 does in-flight
    * (st22 gates on identity, q58 on velocity).
    *
    * Determinism: the frame is RANGE BETWEEN 600 PRECEDING AND 1
    * PRECEDING over epoch SECONDS — peer rows at the same second are
    * excluded by the frame bound itself, so the count is independent
    * of intra-second row order (a ROWS frame would not be); all
    * counts exact.
    *
    * Scale shape: one user-keyed window shuffle (bucketing absorbs it
    * at 100 TB), one type-domain agg. */
  val q58 = {
    val windowSec = 600L
    val maxK = 3L
    QueryDef(
      "q58_rate_limit_window",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("epoch_s")
          .rangeBetween(-windowSec, -1)
        Tables.events(s, d)
          .select(col("event_type"),
            col("user_id"),
            expr("unix_timestamp(ts)").as("epoch_s"))
          .withColumn("prior", count(lit(1)).over(w))
          .withColumn("admitted",
            when(col("prior") < maxK, 1L).otherwise(0L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(col("admitted")).as("n_admitted"),
            max(col("prior")).as("peak_prior"))
          .withColumn("admit_ppm",
            expr("(1000000 * n_admitted) DIV n_events"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (
                 SELECT event_type, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
                 FROM events),
               p AS (
                 SELECT event_type,
                   CAST(count(*) OVER (PARTITION BY user_id
                     ORDER BY epoch_s RANGE BETWEEN $windowSec PRECEDING
                     AND 1 PRECEDING) AS BIGINT) AS prior
                 FROM e)
               SELECT event_type, count(*) AS n_events,
                 CAST(sum(CASE WHEN prior < $maxK THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_admitted,
                 CAST(max(prior) AS BIGINT) AS peak_prior,
                 (1000000 * CAST(sum(CASE WHEN prior < $maxK THEN 1
                   ELSE 0 END) AS BIGINT)) // count(*) AS admit_ppm
               FROM p GROUP BY 1 ORDER BY 1"""))
  }

  /** Q59 — inter-event gap distribution per user (the arrival-process
    * profile telemetry teams read before choosing session gaps,
    * rate limits, and watermark delays — the empirical input to q50's
    * 30-minute threshold and st03's session windows): consecutive-event
    * gaps in exact microseconds via lag over (ts, event_id), then
    * per-user count, min/max, exact integer mean, and the exact median
    * through the q28 ×2 snap (an int-midpoint median is exactly .5 —
    * both engines land on the same doubled integer).
    *
    * Determinism: gaps are exact BIGINT microsecond differences
    * (epoch_us / unix_micros — never second-truncated, the q50
    * discipline); every readout is integer arithmetic. Scale shape:
    * one shuffle on user_id for the lag window, then a per-user hash
    * agg — corpus-linear, no global state. */
  val q59 = QueryDef(
    "q59_interevent_gaps",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          sum(col("gap_us")).as("sum_gap_us"),
          expr("CAST(round(percentile(gap_us, 0.5) * 2) AS BIGINT)")
            .as("median_gap_us_x2"))
        .withColumn("mean_gap_us", expr("sum_gap_us DIV n_gaps"))
        .select("user_id", "n_gaps", "min_gap_us", "max_gap_us",
          "mean_gap_us", "median_gap_us_x2")
        .orderBy("user_id")
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
            g AS (
              SELECT user_id,
                us - lag(us, 1) OVER (PARTITION BY user_id
                  ORDER BY us, event_id) AS gap_us
              FROM e)
            SELECT user_id, count(*) AS n_gaps,
              min(gap_us) AS min_gap_us,
              max(gap_us) AS max_gap_us,
              (CAST(sum(gap_us) AS BIGINT)) // count(*) AS mean_gap_us,
              CAST(round(quantile_cont(gap_us, 0.5) * 2) AS BIGINT)
                AS median_gap_us_x2
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY user_id ORDER BY user_id"""))

  /** Q60 — ordered-step funnel conversion (the product-analytics
    * staple — Amplitude/Mixpanel "funnel" semantics: a user converts a
    * step only with an event AT OR AFTER their entry into the previous
    * step; unordered "did both" counts overstate conversion): per user,
    * first 'view', then first 'click' ≥ that view, then first
    * 'purchase' ≥ that click; one census row with per-step user counts,
    * step-over-step and end-to-end ppm, and the exact integer mean
    * full-funnel latency.
    *
    * Determinism: timestamps as exact BIGINT microseconds (the q59
    * discipline); min() over integers is bit-stable; every ratio is an
    * integer DIV. Scale shape: ONE scan of events — the three step
    * resolutions are CHAINED unordered min-windows over the same
    * user_id partitioning (step k's condition reads step k−1's window
    * output), so Catalyst plans a single user-keyed exchange feeding
    * three Window operators plus the per-user collapse; the final
    * census is a 1-row global agg. Single-ref CTE chain — linear plan
    * expansion, no multi-ref re-execution (the g19 class). */
  val q60 = {
    def sql(epochUs: String, div: String): String =
      s"""WITH e AS (
            SELECT user_id, event_type, $epochUs(ts) AS us FROM events),
          s1 AS (
            SELECT user_id, event_type, us,
              min(CASE WHEN event_type = 'view' THEN us END)
                OVER (PARTITION BY user_id) AS v_us
            FROM e),
          s2 AS (
            SELECT user_id, event_type, us, v_us,
              min(CASE WHEN event_type = 'click' AND us >= v_us
                THEN us END) OVER (PARTITION BY user_id) AS c_us
            FROM s1),
          s3 AS (
            SELECT user_id, v_us, c_us,
              min(CASE WHEN event_type = 'purchase' AND us >= c_us
                THEN us END) OVER (PARTITION BY user_id) AS p_us
            FROM s2),
          u AS (
            SELECT user_id, max(v_us) AS v_us, max(c_us) AS c_us,
              max(p_us) AS p_us
            FROM s3 GROUP BY 1)
          SELECT count(*) AS n_users,
            count(v_us) AS n_view,
            count(c_us) AS n_view_click,
            count(p_us) AS n_full,
            CASE WHEN count(v_us) = 0 THEN CAST(0 AS BIGINT)
              ELSE (1000000 * count(c_us)) $div count(v_us) END
              AS click_ppm,
            CASE WHEN count(c_us) = 0 THEN CAST(0 AS BIGINT)
              ELSE (1000000 * count(p_us)) $div count(c_us) END
              AS purchase_ppm,
            CASE WHEN count(v_us) = 0 THEN CAST(0 AS BIGINT)
              ELSE (1000000 * count(p_us)) $div count(v_us) END
              AS funnel_ppm,
            CASE WHEN count(p_us) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(COALESCE(sum(p_us - v_us), 0) AS BIGINT)
                $div count(p_us) END AS mean_funnel_us
          FROM u"""
    QueryDef(
      "q60_funnel_steps",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q60_events")
        s.sql(sql("unix_micros", "DIV")
          .replace("FROM events", "FROM g_q60_events"))
      },
      Some(sql("epoch_us", "//")))
  }

  /** Q61 — retention cohort matrix (the growth-analytics table every
    * events warehouse serves: cohort users by their FIRST-ever active
    * week, then count how many are active k weeks later): weeks are
    * epoch-µs DIV 7-days — pure integer bucketing, immune to the
    * engines' calendar week-start conventions (Spark date_trunc('week')
    * is ISO-Monday, DuckDB likewise, but localized session differences
    * and DST have bitten real pipelines; epoch math cannot drift).
    *
    * Determinism: all integers; retention ppm vs the cohort's week-0
    * size (by construction every cohort has week-0 activity). Scale
    * shape: one user-keyed agg for first weeks, one distinct over
    * (user, week), one user-keyed join, one (cohort, offset) agg —
    * user-co-partitioned until the final bounded-cardinality census
    * (weeks² rows). */
  val q61 = QueryDef(
    "q61_retention_cohorts",
    (s, d) => {
      val weekUs = 7L * 86400L * 1000000L
      val uw = Tables.events(s, d)
        .select(col("user_id"),
          (unix_micros(col("ts")) / weekUs).cast("long").as("week"))
        .distinct()
      val first = uw.groupBy("user_id").agg(min(col("week")).as("cohort"))
      val cells = uw.join(first, "user_id")
        .groupBy(col("cohort"),
          (col("week") - col("cohort")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = first.groupBy("cohort")
        .agg(count(lit(1)).as("cohort_size"))
      cells.join(sizes, "cohort")
        .withColumn("retention_ppm",
          expr("(1000000 * n_active) DIV cohort_size"))
        .select("cohort", "week_offset", "cohort_size", "n_active",
          "retention_ppm")
        .orderBy("cohort", "week_offset")
    },
    Some("""WITH uw AS MATERIALIZED (
              SELECT DISTINCT user_id,
                epoch_us(ts) // 604800000000 AS week
              FROM events),
            fw AS MATERIALIZED (
              SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1),
            cells AS (
              SELECT cohort, week - cohort AS week_offset,
                count(DISTINCT uw.user_id) AS n_active
              FROM uw JOIN fw ON uw.user_id = fw.user_id
              GROUP BY 1, 2),
            sizes AS (
              SELECT cohort, count(*) AS cohort_size FROM fw GROUP BY 1)
            SELECT cells.cohort, week_offset, cohort_size, n_active,
              (1000000 * n_active) // cohort_size AS retention_ppm
            FROM cells JOIN sizes ON cells.cohort = sizes.cohort
            ORDER BY cells.cohort, week_offset"""))

  /** Q62 — user-growth accounting (the DAU / new-vs-returning /
    * cumulative-reach table every events warehouse serves daily; the
    * t33 min-bucket trick applied to TIME: cumulative distinct users
    * by day = count of users whose FIRST-EVER day ≤ that day, so the
    * running distinct needs no distinct-over-window): per day, active
    * users, new users (first-day cohort), returning = active − new,
    * and the cumulative user count from one window over the bounded
    * day frame.
    *
    * Determinism: days are epoch-µs DIV 86400·10⁶ (the q61
    * discipline); all counts exact integers. Scale shape: one
    * user-keyed first-day agg + one (user, day) distinct — both
    * corpus-linear map-side-combinable — then censuses and a window
    * on the ≤|days| frame. */
  val q62 = {
    def sql(epochUs: String, div: String): String =
      s"""WITH f AS (
            SELECT user_id,
              min($epochUs(ts) $div 86400000000) AS first_day
            FROM events GROUP BY 1),
          ud AS (
            SELECT DISTINCT user_id,
              $epochUs(ts) $div 86400000000 AS day
            FROM events),
          act AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau
            FROM ud GROUP BY 1),
          nu AS (
            SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1)
          SELECT act.day, dau,
            CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
            dau - CAST(coalesce(new_users, 0) AS BIGINT) AS returning,
            CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY act.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_users
          FROM act LEFT JOIN nu ON act.day = nu.day
          ORDER BY act.day"""
    QueryDef(
      "q62_growth_accounting",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q62_events")
        s.sql(sql("unix_micros", "DIV")
          .replace("FROM events", "FROM g_q62_events"))
      },
      Some(sql("epoch_us", "//")))
  }

  /** Q63 — time-weighted average value per user (TWAP — the
    * financial/IoT aggregation where a reading counts for HOW LONG it
    * persisted, not how often it was sampled: the kdb/QuestDB/
    * InfluxDB staple that a plain avg silently gets wrong under
    * irregular sampling): each event's value holds until the user's
    * next event; TWAP = Σ cᵢ·durᵢ / Σ durᵢ over exact integer cents ×
    * microsecond durations, emitted as truncated integer cents, with
    * the naive per-event mean alongside (the two diverge exactly when
    * sampling is irregular — the point of the operator).
    *
    * Determinism: durations from lead() over the total (us, event_id)
    * order; the weighted numerator is 128-bit (cents·µs·rows passes
    * 2⁶³ at corpus scale — the x50 overflow lesson); both quotients
    * truncating integer divides. Scale shape: one user-keyed window +
    * one user-keyed agg — the q59 single-shuffle lineage. Users with a
    * single event have no holding interval and drop out (domain note:
    * the oracle mirrors the same NULL-duration filter). */
  val q63 = {
    def sql(epochUs: String, div: String, w128: String): String =
      s"""WITH e AS (
            SELECT user_id, event_id, $epochUs(ts) AS us,
              CAST(round(value * 100) AS BIGINT) AS c
            FROM events),
          w AS (
            SELECT user_id, c, us,
              lead(us, 1) OVER (PARTITION BY user_id
                ORDER BY us, event_id) - us AS dur
            FROM e)
          SELECT user_id,
            CAST(count(*) AS BIGINT) AS n_intervals,
            CAST(sum(dur) AS BIGINT) AS span_us,
            CAST(${graft.core.Fixed.sdiv(
               s"CAST(sum(CAST(c AS $w128) * dur) AS $w128)",
               s"CAST(sum(dur) AS $w128)", div)} AS BIGINT) AS twap_cents,
            CAST(${graft.core.Fixed.sdiv(
               "CAST(sum(c) AS BIGINT)", "count(*)", div)}
              AS BIGINT) AS mean_cents
          FROM w WHERE dur IS NOT NULL
          GROUP BY user_id ORDER BY user_id"""
    QueryDef(
      "q63_twap",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q63_events")
        s.sql(sql("unix_micros", "DIV", "DECIMAL(38,0)")
          .replace("FROM events", "FROM g_q63_events"))
      },
      Some(sql("epoch_us", "//", "HUGEINT")))
  }

  /** Q64 — user-journey Markov transition census (the behavioral
    * "what happens next" matrix product/journey analytics reads — and
    * the empirical transition kernel behind Markov-chain attribution,
    * cf. Anderl et al. 2016): consecutive event-type pairs per user
    * over the total (us, event_id) order, with exact per-row counts
    * and the conditional next-step probability as integer ppm of the
    * current state's outgoing total.
    *
    * Determinism: one lead() window over the q59 total order; the
    * matrix is the bounded 5×5 type domain; ppm by integer DIV.
    * Scale shape: one user-keyed window shuffle, then a census on
    * the type² frame — q59's lineage exactly. */
  val q64 = {
    def sql(epochUs: String, div: String): String =
      s"""WITH e AS (
            SELECT user_id, event_id, event_type,
              $epochUs(ts) AS us
            FROM events),
          t AS (
            SELECT event_type AS cur,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS nxt
            FROM e),
          c AS (
            SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
            FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2),
          tot AS (
            SELECT cur, CAST(sum(n) AS BIGINT) AS n_out FROM c GROUP BY 1)
          SELECT c.cur, c.nxt, c.n, n_out,
            (1000000 * c.n) $div n_out AS p_ppm
          FROM c JOIN tot ON c.cur = tot.cur
          ORDER BY c.cur, c.nxt"""
    QueryDef(
      "q64_markov_transitions",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q64_events")
        s.sql(sql("unix_micros", "DIV")
          .replace("FROM events", "FROM g_q64_events"))
      },
      Some(sql("epoch_us", "//")))
  }

  /** Q65 — BAG-semantics set operations (SQL's INTERSECT ALL / EXCEPT
    * ALL — multiset min/difference of multiplicities, ISO 9075 §7.13;
    * q16 covers only the DISTINCT forms, and the two families differ
    * exactly when duplicates carry meaning, e.g. per-order nation
    * memberships): nation-key multisets of customers vs suppliers,
    * with both bag ops' cardinalities AND the multiplicity-law check
    * column |A ∩all B| + |A \\all B| = |A| built into the output.
    *
    * Determinism: pure counts. Scale shape: Spark plans intersectAll/
    * exceptAll as per-key multiplicity aggregation + a join on the
    * key — one shuffle each, never row-pairing. */
  val q65 = QueryDef(
    "q65_bag_setops",
    (s, d) => {
      val c = cst(s, d).select(col("c_nationkey").as("k"))
      val sp = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      def n(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      n(c.intersectAll(sp), "intersect_all")
        .unionAll(n(c.exceptAll(sp), "except_all"))
        .unionAll(n(c, "left_bag"))
        .orderBy("op")
    },
    Some("""SELECT 'except_all' AS op, count(*) AS n FROM
              (SELECT c_nationkey AS k FROM customer
               EXCEPT ALL SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'intersect_all', count(*) FROM
              (SELECT c_nationkey FROM customer
               INTERSECT ALL SELECT s_nationkey FROM supplier)
            UNION ALL SELECT 'left_bag', count(*) FROM customer
            ORDER BY op"""))

  /** Q66 — CDC MERGE / upsert apply (the Delta MERGE INTO / Iceberg
    * upsert / Hudi CoW write resolved as a query: given a base
    * snapshot and a change feed with insert/update/delete ops, the
    * post-merge state is "latest change per key wins" — the operator
    * every incremental lakehouse pipeline runs on every commit): base
    * = customer balances in exact cents; the change feed derives
    * deterministically from events (key = user_id folded into the
    * customer domain, 'error' events are deletes, everything else an
    * upsert to the event's cent value, ordered by the total (us,
    * event_id) sequence). Output is the bounded per-action census —
    * kept/updated/deleted(/inserted/noop_delete) with post-merge key
    * counts and cent sums — the commit-audit frame, not the full table.
    *
    * Determinism: cents exact, the change sequence totally ordered,
    * modulo/row_number/CASE all integer. Scale shape: one change-feed
    * window shuffle (key-partitioned), one full-outer EQUI join on the
    * key, one bounded census agg — exactly a MERGE's shuffle plan. */
  val q66 = {
    def sql(epochUs: String): String =
      s"""WITH base AS (
            SELECT c_custkey AS k,
              CAST(round(c_acctbal * 100) AS BIGINT) AS val
            FROM customer),
          nc AS (
            SELECT CAST(max(c_custkey) AS BIGINT) AS n_cust FROM customer),
          ch AS (
            SELECT user_id % n_cust + 1 AS k,
              CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
              CAST(round(value * 100) AS BIGINT) AS newval,
              $epochUs(ts) AS us, event_id
            FROM events CROSS JOIN nc),
          last AS (
            SELECT k, op, newval FROM (
              SELECT k, op, newval,
                row_number() OVER (PARTITION BY k
                  ORDER BY us DESC, event_id DESC) AS rn
              FROM ch) q WHERE rn = 1),
          merged AS (
            SELECT
              CASE
                WHEN l.k IS NULL THEN 'kept'
                WHEN l.op = 'D' AND b.k IS NOT NULL THEN 'deleted'
                WHEN l.op = 'D' THEN 'noop_delete'
                WHEN b.k IS NULL THEN 'inserted'
                ELSE 'updated' END AS action,
              CASE WHEN l.op = 'U' THEN l.newval ELSE b.val END AS val
            FROM base b FULL JOIN last l ON b.k = l.k)
          SELECT action, CAST(count(*) AS BIGINT) AS n_keys,
            CAST(sum(CASE WHEN action IN ('deleted', 'noop_delete')
              THEN 0 ELSE val END) AS BIGINT) AS post_sum_cents
          FROM merged GROUP BY 1 ORDER BY action"""
    QueryDef(
      "q66_cdc_merge",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q66_events")
        cst(s, d).createOrReplaceTempView("g_q66_customer")
        s.sql(sql("unix_micros")
          .replace("FROM events", "FROM g_q66_events")
          .replace("FROM customer", "FROM g_q66_customer"))
      },
      Some(sql("epoch_us")))
  }

  /** Q67 — first/last-touch conversion attribution (the two
    * bookend models of marketing attribution, cf. Anderl et al. 2016
    * §2 — q64's Markov kernel is the data-driven middle; these are the
    * rule-based baselines every attribution comparison starts from):
    * per purchase, the user's EARLIEST and LATEST preceding
    * non-purchase touches over the total (us, event_id) order, then a
    * bounded (model × touch-type) census with conversion counts and
    * exact integer mean time-to-convert.
    *
    * Determinism: both touches are IGNORE-NULLS window picks over a
    * totally ordered frame (q39's idiom — the same row supplies type
    * and timestamp because the frame order is total); gaps are exact
    * non-negative µs; the mean is a truncating integer divide. Scale
    * shape: ONE user-keyed window shuffle feeding both models, then a
    * census on the 2×|types| frame — q59's single-shuffle lineage. */
  val q67 = {
    def sql(epochUs: String, lv: String => String,
        fv: String => String): String =
      s"""WITH e AS (
            SELECT user_id, event_type, $epochUs(ts) AS us, event_id,
              CASE WHEN event_type <> 'purchase' THEN event_type END AS tt,
              CASE WHEN event_type <> 'purchase' THEN $epochUs(ts) END
                AS tus
            FROM events),
          w AS (
            SELECT event_type, us,
              ${lv("tt")} OVER wf AS lt_type,
              ${lv("tus")} OVER wf AS lt_us,
              ${fv("tt")} OVER wf AS ft_type,
              ${fv("tus")} OVER wf AS ft_us
            FROM e
            WINDOW wf AS (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
          conv AS (
            SELECT * FROM w
            WHERE event_type = 'purchase' AND lt_type IS NOT NULL),
          m AS (
            SELECT 'last_touch' AS model, lt_type AS touch_type,
              us - lt_us AS gap_us
            FROM conv
            UNION ALL
            SELECT 'first_touch', ft_type, us - ft_us FROM conv)
          SELECT model, touch_type,
            CAST(count(*) AS BIGINT) AS n_conversions,
            CAST(sum(gap_us) AS BIGINT) AS total_gap_us,
            CAST(CAST(sum(gap_us) AS BIGINT) $$DIV$$ count(*) AS BIGINT)
              AS mean_gap_us
          FROM m GROUP BY 1, 2 ORDER BY model, touch_type"""
    QueryDef(
      "q67_touch_attribution",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_q67_events")
        s.sql(sql("unix_micros",
            a => s"last_value($a) IGNORE NULLS",
            a => s"first_value($a) IGNORE NULLS")
          .replace("$DIV$", "DIV")
          .replace("FROM events", "FROM g_q67_events"))
      },
      Some(sql("epoch_us",
          a => s"last_value($a IGNORE NULLS)",
          a => s"first_value($a IGNORE NULLS)")
        .replace("$DIV$", "//")))
  }

  /** Q68 — QUALIFY-clause emulation (top-3 orders per customer by
    * totalprice): Teradata coined QUALIFY and DuckDB/Snowflake/BigQuery
    * ship it, but Spark SQL does not — a user migrating such a query
    * needs the standard rewrite, window function → named column →
    * post-window filter, which is exactly what QUALIFY desugars to in
    * every engine that has it. The ENGINE side is the rewrite
    * (row_number window + filter ≤ 3); the DuckDB mirror deliberately
    * uses NATIVE `QUALIFY`, so the oracle hash-check proves the
    * rewrite is semantics-identical to the native clause on every run.
    * Ties broken by o_orderkey — deterministic top-3.
    *
    * Scale shape: one shuffle on o_custkey, per-key window never sees
    * more than one customer's orders; the filter prunes to ≤3 rows per
    * key before the output sort. */
  val q68 = QueryDef(
    "q68_qualify_emulation",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
            FROM orders
            QUALIFY rn <= 3
            ORDER BY o_custkey, rn"""))

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q10b, q11, q12, q12b,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q23b, q24, q25,
    q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39,
    q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53,
    q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67,
    q68)
}
