package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator battery — one query per operator family in
  * SURVEY.md §2.1 (select / for / let / where / group by / order by /
  * count / joins incl. outer-semi-anti / distinct / containers),
  * expressed Spark-first over the driver's TPC-H-ish tables.
  *
  * Numeric determinism: money/measure sums are computed over exact
  * DECIMAL(18,4) casts and only converted to DOUBLE at the end, so
  * Spark's parallel (order-free) aggregation and DuckDB's serial one
  * produce bit-identical results. Every query ends in a total ORDER BY
  * on a unique key so row order matches the oracle.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private def dec(name: String): Column = dec(col(name))
  /** exact revenue term: extprice * (1 - discount), all decimal */
  private def discPrice: Column =
    dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec("l_discount"))

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: full-scan grouped aggregation (TPC-H Q1 shape) ----
    // SURVEY §2.1 #7 GroupBy: native partial+final aggregates instead of
    // the reference's collect-lists-then-python-sum (Executor.py:403-450).
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec("l_quantity")).cast("double").as("sum_qty"),
            sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: filter + projection (predicate/column pushdown to scan) ----
    // SURVEY §2.1 #1/#5: Select+Where; Catalyst pushes both into parquet.
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: join + group + having + top-k (TPC-H Q3 shape) ----
    // SURVEY §2.1 #11 Join synthesis + #5 where-as-HAVING + limit.
    QueryDef(
      "q03_top_revenue_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
          .groupBy(col("o_orderkey"))
          .agg(sum(discPrice).cast("double").as("revenue"))
          .filter(col("revenue") > 100000)
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey
        HAVING revenue > 100000
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    // ---- q04: multi-way dimension join (broadcast-able dims) ----
    // customer ⋈ nation ⋈ region; nation/region are tiny → Catalyst
    // broadcasts them (no shuffle of the fact side at 100 TB).
    QueryDef(
      "q04_cust_by_region",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            sum(dec("c_acctbal")).cast("double").as("total_acctbal"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- q05: left outer join + re-nest (SURVEY §2.1 #12, the operator
    // the reference declares but never finished locally) ----
    QueryDef(
      "q05_left_join_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(dec("o_totalprice")), lit(0)).cast("double").as("total_spent"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey""")),

    // ---- q06: semi join (EXISTS) ----
    QueryDef(
      "q06_semi_join",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders.filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ---- q07: anti join (NOT EXISTS) ----
    QueryDef(
      "q07_anti_join",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders.filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        ORDER BY c_custkey""")),

    // ---- q08: positional count clause (SURVEY §2.1 #6) ----
    // Reference `count` = 0-based stream position; well-defined only
    // under an explicit order in a distributed engine → row_number.
    QueryDef(
      "q08_count_clause",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .withColumn("pos", (row_number().over(w) - lit(1)).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"), col("pos"))
          .orderBy(col("o_custkey"), col("pos"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS pos
        FROM orders
        ORDER BY o_custkey, pos""")),

    // ---- q09: distinct (set result container, Executor.py:136-137) ----
    QueryDef(
      "q09_distinct_set",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_nationkey"))
          .distinct()
          .orderBy(col("c_mktsegment"), col("c_nationkey"))
      },
      Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // ---- q10: cross join (independent `for` clauses, Executor.py:165-194) ----
    QueryDef(
      "q10_cross_for",
      (s, dir) => {
        val t = Tables(s, dir)
        val statuses = t.orders.select(col("o_orderstatus")).distinct()
        t.region.select(col("r_name")).crossJoin(statuses)
          .orderBy(col("r_name"), col("o_orderstatus"))
      },
      Some("""
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        ORDER BY r_name, o_orderstatus""")),

    // ---- q11: let clause — computed columns (SURVEY §2.1 #4) ----
    QueryDef(
      "q11_let_extend",
      (s, dir) => {
        Tables.load(s, dir, "part")
          .withColumn("tier",
            when(col("p_retailprice") < 500, "low")
              .when(col("p_retailprice") < 1500, "mid")
              .otherwise("high"))
          .withColumn("list_price",
            (dec("p_retailprice") * lit(1.1).cast(DecimalType(4, 2))).cast("double"))
          .select(col("p_partkey"), col("tier"), col("list_price"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               CASE WHEN p_retailprice < 500 THEN 'low'
                    WHEN p_retailprice < 1500 THEN 'mid'
                    ELSE 'high' END AS tier,
               CAST(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(4,2)) AS DOUBLE) AS list_price
        FROM part
        ORDER BY p_partkey""")),

    // ---- q12: analytic window functions (rank within partition) ----
    // Frame-based windows the reference lacks (SURVEY §2.3) — free in Spark.
    QueryDef(
      "q12_rank_window",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        Tables.load(s, dir, "supplier")
          .withColumn("rnk", rank().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"), col("rnk"))
          .orderBy(col("s_nationkey"), col("rnk"), col("s_suppkey"))
      },
      Some("""
        SELECT s_nationkey, s_suppkey, s_acctbal, rnk FROM (
          SELECT s_nationkey, s_suppkey, s_acctbal,
                 RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
          FROM supplier)
        WHERE rnk <= 3
        ORDER BY s_nationkey, rnk, s_suppkey""")),

    // ---- q13: group-by auto-nesting (SURVEY §2.1 #7 list semantics) ----
    // The reference turns non-key vars into per-group lists; here
    // collect_list + array_sort, serialized for a stable oracle compare.
    QueryDef(
      "q13_group_nest",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(concat_ws("|", array_sort(collect_list(col("c_name")))).as("names_concat"),
            count(lit(1)).as("n"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, COALESCE(STRING_AGG(c_name, '|' ORDER BY c_name), '') AS names_concat,
               COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // ---- q14: map result container ({select k:v}, Executor.py:153-161) ----
    QueryDef(
      "q14_map_container",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .groupBy(col("c_mktsegment").as("key"))
          .agg(count(lit(1)).as("value"))
          .orderBy(col("key"))
      },
      Some("""
        SELECT c_mktsegment AS key, COUNT(*) AS value FROM customer
        GROUP BY c_mktsegment ORDER BY key""")),

    // ---- q15: union / intersect / except (set ops, SURVEY §2.3) ----
    QueryDef(
      "q15_set_ops",
      (s, dir) => {
        val t = Tables(s, dir)
        val buyers = t.orders.select(col("o_custkey").as("custkey")).distinct()
        val rich = t.customer.filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey"))
        rich.intersect(buyers)
          .union(t.customer.filter(col("c_acctbal") < 0)
            .select(col("c_custkey").as("custkey")).except(buyers))
          .orderBy(col("custkey"))
      },
      Some("""
        (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT SELECT DISTINCT o_custkey FROM orders)
        UNION ALL
        (SELECT c_custkey FROM customer WHERE c_acctbal < 0
         EXCEPT SELECT DISTINCT o_custkey FROM orders)
        ORDER BY custkey"""))
  )
}
