package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.dsl.Query

/** Core relational operator battery — one query per operator family in
  * SURVEY.md §2.1, expressed through the engine's FLWOR builder
  * (graft.dsl.Query): the same clause algebra as the reference
  * (select / for / let / where / group by / order by / count / joins /
  * containers), compiling to DataFrame plans that Catalyst optimizes
  * (join synthesis from where-conjuncts, pushdown through the struct
  * bindings — see Query's scaladoc).
  *
  * Numeric determinism: money/measure sums are computed over exact
  * DECIMAL(18,4) casts and only converted to DOUBLE at the end, so
  * Spark's parallel (order-free) aggregation and DuckDB's serial one
  * produce bit-identical results. Every query ends in a total ORDER BY
  * on a unique key so row order matches the oracle.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** exact revenue term: extprice * (1 - discount), all decimal */
  private def discPrice(l: String): Column =
    dec(col(s"$l.l_extendedprice")) *
      (lit(1).cast(DecimalType(18, 4)) - dec(col(s"$l.l_discount")))

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: full-scan grouped aggregation (TPC-H Q1 shape) ----
    // for l in lineitem / where / group by / order by — groupByAgg is
    // the native partial+final path (vs the reference's
    // collect-lists-then-python-sum, Executor.py:403-450).
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .where(col("l.l_shipdate") <= lit("2000-09-02").cast("timestamp"))
          .groupByAgg(
            Seq("l_returnflag" -> col("l.l_returnflag"),
              "l_linestatus" -> col("l.l_linestatus")),
            Seq(
              // money sums aggregate as exact DECIMAL internally but
              // project as DOUBLE (r11): the driver's rendered-value
              // hash renders a decimal "1511964.0000" vs a double
              // "1511964.0" — schema-equal but hash-different — so the
              // driver-visible type must be DOUBLE. DuckDB's
              // DECIMAL→DOUBLE cast can double-round one ulp off
              // Spark's once the scaled sum passes 2^53 (seen at
              // sf0.1); that is handled in the builder-side mirror
              // (tools/check.py --ulp for DOUBLE columns), never in
              // this driver-visible schema.
              "sum_qty" -> sum(dec(col("l.l_quantity"))).cast("double"),
              "sum_base_price" -> sum(dec(col("l.l_extendedprice"))).cast("double"),
              "sum_disc_price" -> sum(discPrice("l")).cast("double"),
              "avg_qty" -> (sum(dec(col("l.l_quantity"))).cast("double") / count(lit(1))),
              "avg_disc" -> (sum(dec(col("l.l_discount"))).cast("double") / count(lit(1))),
              "count_order" -> count(lit(1))))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
          .toDF
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

    // ---- q02: filter + projection (predicate/column pushdown) ----
    // Select+Where; the struct binding collapses so Catalyst pushes
    // both into the parquet scan (PushedFilters in explain).
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .where(col("l.l_quantity") > 45 && col("l.l_returnflag") === "R")
          .orderBy(col("l.l_orderkey"), col("l.l_linenumber"))
          .select(
            "l_orderkey" -> col("l.l_orderkey"),
            "l_linenumber" -> col("l.l_linenumber"),
            "l_quantity" -> col("l.l_quantity"),
            "l_extendedprice" -> col("l.l_extendedprice"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: join synthesis + HAVING + top-k (TPC-H Q3 shape) ----
    // Two independent for-clauses + an equi-where conjunct: the
    // reference's join-synthesis rewrite (Rewriter.py:376-459) is
    // Catalyst's ExtractEquiJoinKeys here — no crossJoin survives.
    QueryDef(
      "q03_top_revenue_orders",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .forIn("o", Tables.load(s, dir, "orders"))
          .where(col("l.l_orderkey") === col("o.o_orderkey") &&
            col("o.o_orderdate") < lit("1998-03-15").cast("timestamp"))
          .groupByAgg(
            Seq("o_orderkey" -> col("o.o_orderkey")),
            Seq("revenue" -> sum(discPrice("l")).cast("double")))
          .where(col("revenue") > 100000) // where-after-group = HAVING
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          .toDF
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

    // ---- q04: multi-way dimension join (broadcast hints) ----
    // nation/region are tiny → forIn(hint="broadcast") keeps the fact
    // side shuffle-free at 100 TB (the reference's join hints,
    // Rewriter.py:447-459, mapped to Spark strategy hints).
    QueryDef(
      "q04_cust_by_region",
      (s, dir) => {
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .forIn("n", Tables.load(s, dir, "nation"), hint = "broadcast")
          .forIn("r", Tables.load(s, dir, "region"), hint = "broadcast")
          .where(col("c.c_nationkey") === col("n.n_nationkey") &&
            col("n.n_regionkey") === col("r.r_regionkey"))
          .groupByAgg(
            Seq("r_name" -> col("r.r_name"), "n_name" -> col("n.n_name")),
            Seq("n_customers" -> count(lit(1)),
              "total_acctbal" -> sum(dec(col("c.c_acctbal"))).cast("double")))
          .orderBy(col("r_name"), col("n_name"))
          .toDF
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- q05: for x in outer(...) → left outer join + re-aggregate
    // (SURVEY §2.1 #12, the operator the reference declares but never
    // finished locally; forInOuter binds NULL when no match) ----
    QueryDef(
      "q05_left_join_orders",
      (s, dir) => {
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .forInOuter("o", Tables.load(s, dir, "orders"))(
            col("c.c_custkey") === col("o.o_custkey"))
          .groupByAgg(
            Seq("c_custkey" -> col("c.c_custkey")),
            Seq("n_orders" -> count(col("o.o_orderkey")),
              "total_spent" ->
                coalesce(sum(dec(col("o.o_totalprice"))), lit(0)).cast("double")))
          .orderBy(col("c_custkey"))
          .toDF
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
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .existsIn("o",
            Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000))(
            col("c.c_custkey") === col("o.o_custkey"))
          .orderBy(col("c.c_custkey"))
          .select("c_custkey" -> col("c.c_custkey"), "c_name" -> col("c.c_name"))
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
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .notExistsIn("o",
            Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000))(
            col("c.c_custkey") === col("o.o_custkey"))
          .orderBy(col("c.c_custkey"))
          .select("c_custkey" -> col("c.c_custkey"), "c_name" -> col("c.c_name"),
            "c_mktsegment" -> col("c.c_mktsegment"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        ORDER BY c_custkey""")),

    // ---- q08: positional count clause (SURVEY §2.1 #6) ----
    // Reference `count` = 0-based stream position (Executor.py:391-400);
    // well-defined only under an explicit order in a distributed
    // engine — the DSL's count clause requires one.
    QueryDef(
      "q08_count_clause",
      (s, dir) => {
        Query.forIn("o", Tables.load(s, dir, "orders"))
          .count("pos",
            order = Seq(col("o.o_orderdate"), col("o.o_orderkey")),
            partitionBy = Seq(col("o.o_custkey")))
          .orderBy(col("o.o_custkey"), col("pos"))
          .select("o_custkey" -> col("o.o_custkey"),
            "o_orderkey" -> col("o.o_orderkey"), "pos" -> col("pos"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS pos
        FROM orders
        ORDER BY o_custkey, pos""")),

    // ---- q09: set container (selectDistinct, Executor.py:136-137) ----
    QueryDef(
      "q09_distinct_set",
      (s, dir) => {
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .selectDistinct("c_mktsegment" -> col("c.c_mktsegment"),
            "c_nationkey" -> col("c.c_nationkey"))
          .orderBy(col("c_mktsegment"), col("c_nationkey"))
      },
      Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // ---- q10: independent for-clauses with no join condition →
    // genuine cartesian product (Executor.py:165-194) ----
    QueryDef(
      "q10_cross_for",
      (s, dir) => {
        val statuses =
          Tables.load(s, dir, "orders").select(col("o_orderstatus")).distinct()
        Query.forIn("r", Tables.load(s, dir, "region"))
          .forIn("st", statuses)
          .orderBy(col("r.r_name"), col("st.o_orderstatus"))
          .select("r_name" -> col("r.r_name"),
            "o_orderstatus" -> col("st.o_orderstatus"))
      },
      Some("""
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        ORDER BY r_name, o_orderstatus""")),

    // ---- q11: let clause — computed columns (SURVEY §2.1 #4) ----
    QueryDef(
      "q11_let_extend",
      (s, dir) => {
        Query.forIn("p", Tables.load(s, dir, "part"))
          .let("tier",
            when(col("p.p_retailprice") < 500, "low")
              .when(col("p.p_retailprice") < 1500, "mid")
              .otherwise("high"))
          .let("list_price",
            (dec(col("p.p_retailprice")) * lit(1.1).cast(DecimalType(4, 2)))
              .cast("double"))
          .orderBy(col("p.p_partkey"))
          .select("p_partkey" -> col("p.p_partkey"), "tier" -> col("tier"),
            "list_price" -> col("list_price"))
      },
      Some("""
        SELECT p_partkey,
               CASE WHEN p_retailprice < 500 THEN 'low'
                    WHEN p_retailprice < 1500 THEN 'mid'
                    ELSE 'high' END AS tier,
               CAST(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(4,2)) AS DOUBLE) AS list_price
        FROM part
        ORDER BY p_partkey""")),

    // ---- q12: analytic window functions via let (rank in partition;
    // frame-based windows the reference lacks, SURVEY §2.3) ----
    QueryDef(
      "q12_rank_window",
      (s, dir) => {
        val w = Window.partitionBy(col("s.s_nationkey"))
          .orderBy(col("s.s_acctbal").desc, col("s.s_suppkey"))
        Query.forIn("s", Tables.load(s, dir, "supplier"))
          .let("rnk", rank().over(w).cast("long"))
          .where(col("rnk") <= 3)
          .orderBy(col("s.s_nationkey"), col("rnk"), col("s.s_suppkey"))
          .select("s_nationkey" -> col("s.s_nationkey"),
            "s_suppkey" -> col("s.s_suppkey"),
            "s_acctbal" -> col("s.s_acctbal"), "rnk" -> col("rnk"))
      },
      Some("""
        SELECT s_nationkey, s_suppkey, s_acctbal, rnk FROM (
          SELECT s_nationkey, s_suppkey, s_acctbal,
                 RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
          FROM supplier)
        WHERE rnk <= 3
        ORDER BY s_nationkey, rnk, s_suppkey""")),

    // ---- q13: group-by auto-nesting (SURVEY §2.1 #7 list semantics) ----
    // The REAL reference semantics: every non-key variable becomes the
    // per-group list (Executor.py:440-448); aggregates are then plain
    // functions over those lists — here array functions on the
    // collected struct list.
    QueryDef(
      "q13_group_nest",
      (s, dir) => {
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .forIn("nat", Tables.load(s, dir, "nation"), hint = "broadcast")
          .where(col("c.c_nationkey") === col("nat.n_nationkey"))
          .groupBy("n_name" -> col("nat.n_name"))
          .let("names_concat",
            concat_ws("|", array_sort(transform(col("c"), _.getField("c_name")))))
          .let("n_cnt", size(col("c")).cast("long"))
          .orderBy(col("n_name"))
          .select("n_name" -> col("n_name"),
            "names_concat" -> col("names_concat"), "n" -> col("n_cnt"))
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
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .groupByAgg(Seq("seg" -> col("c.c_mktsegment")),
            Seq("cnt" -> count(lit(1))))
          .orderBy(col("seg"))
          .selectKV(col("seg"), col("cnt"))
      },
      Some("""
        SELECT c_mktsegment AS key, COUNT(*) AS value FROM customer
        GROUP BY c_mktsegment ORDER BY key""")),

    // ---- q15: union / intersect / except over query results (set-
    // typed results + set ops, SURVEY §2.3) ----
    QueryDef(
      "q15_set_ops",
      (s, dir) => {
        val buyers = Query.forIn("o", Tables.load(s, dir, "orders"))
          .selectDistinct("custkey" -> col("o.o_custkey"))
        val rich = Query.forIn("c", Tables.load(s, dir, "customer"))
          .where(col("c.c_acctbal") > 5000)
          .select("custkey" -> col("c.c_custkey"))
        val broke = Query.forIn("c", Tables.load(s, dir, "customer"))
          .where(col("c.c_acctbal") < 0)
          .select("custkey" -> col("c.c_custkey"))
        rich.intersect(buyers)
          .union(broke.except(buyers))
          .orderBy(col("custkey"))
      },
      Some("""
        (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT SELECT DISTINCT o_custkey FROM orders)
        UNION ALL
        (SELECT c_custkey FROM customer WHERE c_acctbal < 0
         EXCEPT SELECT DISTINCT o_custkey FROM orders)
        ORDER BY custkey""")),

    // ---- q43: rollup (hierarchical subtotals; NULL keys surfaced as
    // a sentinel so both engines sort and hash identically) ----
    QueryDef(
      "q43_rollup",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .groupByRollup(
            Seq("rf0" -> col("l.l_returnflag"), "ls0" -> col("l.l_linestatus")),
            Seq("sum_qty" -> sum(dec(col("l.l_quantity"))).cast("double"),
              "n" -> count(lit(1))))
          .let("rf", coalesce(col("rf0"), lit("@ALL")))
          .let("ls", coalesce(col("ls0"), lit("@ALL")))
          .orderBy(col("rf"), col("ls"))
          .select("rf" -> col("rf"), "ls" -> col("ls"),
            "sum_qty" -> col("sum_qty"), "n" -> col("n"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, '@ALL') AS rf,
               COALESCE(l_linestatus, '@ALL') AS ls,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ---- q44: HLL sketch sanity — approx_count_distinct within
    // tolerance of the exact count (the sketch VALUE is
    // engine-specific; the verifiable contract is its error bound) ----
    QueryDef(
      "q44_approx_distinct",
      (s, dir) => {
        Query.forIn("o", Tables.load(s, dir, "orders"))
          .groupByAgg(Nil, Seq(
            "n_exact" -> countDistinct(col("o.o_custkey")),
            "approx_ok" ->
              ((abs(approx_count_distinct(col("o.o_custkey")).cast("double") -
                countDistinct(col("o.o_custkey")).cast("double")) /
                countDistinct(col("o.o_custkey")).cast("double")) <= 0.15)))
          .toDF
      },
      Some("""
        SELECT COUNT(DISTINCT o_custkey) AS n_exact, true AS approx_ok
        FROM orders""")),

    // ---- q49: exact interpolated percentiles per group (§2.3
    // analytics freebie; Spark `percentile` and DuckDB `quantile_cont`
    // both linearly interpolate, so the values are oracle-comparable
    // — rounded to 6 decimals to wash interpolation-arithmetic ulps) ----
    QueryDef(
      "q49_percentile",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .groupByAgg(
            Seq("rf" -> col("l.l_returnflag")),
            Seq(
              "median_qty" -> round(expr("percentile(l.l_quantity, 0.5)"), 6),
              "p90_qty" -> round(expr("percentile(l.l_quantity, 0.9)"), 6),
              "n" -> count(lit(1))))
          .orderBy(col("rf"))
          .select("rf" -> col("rf"), "median_qty" -> col("median_qty"),
            "p90_qty" -> col("p90_qty"), "n" -> col("n"))
      },
      Some("""
        SELECT l_returnflag AS rf,
               round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
               round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY rf ORDER BY rf""")),

    // ---- q50: full cube — all 2^k grouping sets (§2.3 freebie) ----
    QueryDef(
      "q50_cube",
      (s, dir) => {
        Query.forIn("o", Tables.load(s, dir, "orders"))
          .groupByCube(
            Seq("st0" -> col("o.o_orderstatus"),
              "pr0" -> col("o.o_orderpriority")),
            Seq("total" -> sum(dec(col("o.o_totalprice"))).cast("double"),
              "n" -> count(lit(1))))
          .let("st", coalesce(col("st0"), lit("@ALL")))
          .let("pr", coalesce(col("pr0"), lit("@ALL")))
          .orderBy(col("st"), col("pr"))
          .select("st" -> col("st"), "pr" -> col("pr"),
            "total" -> col("total"), "n" -> col("n"))
      },
      Some("""
        SELECT COALESCE(o_orderstatus, '@ALL') AS st,
               COALESCE(o_orderpriority, '@ALL') AS pr,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY st, pr""")),

    // ---- q152: frame-based moving aggregate (7-day revenue) ----
    // The RANGE-frame window the reference lacks entirely (SURVEY
    // §2.3): daily revenue in exact DECIMAL, then a 7-day trailing
    // sum over the integer day index — RANGE handles calendar gaps
    // (a missing day still bounds the frame by value, not by rows).
    // The global ordered window runs over the DAYS domain (one row
    // per date), never the orders corpus — the same bounded-window
    // argument as the AUC score-vocabulary table.
    QueryDef(
      "q152_moving_revenue",
      (s, dir) => {
        val daily = Tables.load(s, dir, "orders")
          .select(to_date(col("o_orderdate")).as("day_date"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
          .groupBy(col("day_date")).agg(sum(col("p")).as("rev"))
          .withColumn("day",
            datediff(col("day_date"), lit("1992-01-01")))
        daily
          .withColumn("rev_7d", sum(col("rev")).over(
            Window.orderBy(col("day")).rangeBetween(-6, 0)))
          .select(col("day_date"), col("rev").cast("double").as("rev"),
            col("rev_7d").cast("double").as("rev_7d"))
          .orderBy(col("day_date"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day_date,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1)
        SELECT day_date, CAST(rev AS DOUBLE) AS rev,
               CAST(sum(rev) OVER (
                 ORDER BY date_diff('day', DATE '1992-01-01', day_date)
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS rev_7d
        FROM daily ORDER BY day_date"""))
  )
}
