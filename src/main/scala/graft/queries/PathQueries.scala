package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dsl.Query
import graft.functions.PathFunctions._

/** Child (`./`) and descendant (`.//`) path-step battery
  * (SURVEY §2.2; reference `Executor.py:47-104`,
  * `tutorial_tests.py:77-85`). Nested docs are constructed from the
  * relational tables inside the query; the oracle computes the same
  * values relationally, verifying construction → traversal → flatten.
  */
object PathQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q34: child path with 1→N flatten over a list of maps ----
    // doc = {"key": okey, "lines": [{"ln":…, "qty":…}, …]}
    // doc ./ lines ./ qty — the second step flattens the lines array
    // and yields one qty per line (the reference's list-of-maps case).
    // Variant route: ONE parse_json per doc, both steps navigate the
    // Variant encoding, strings materialize only at pathText.
    QueryDef(
      "q34_child_path",
      (s, dir) => {
        Query.forIn("l", Tables.load(s, dir, "lineitem"))
          .groupByAgg(
            Seq("okey" -> col("l.l_orderkey")),
            Seq("lines" -> collect_list(struct(
              col("l.l_linenumber").as("ln"), col("l.l_quantity").as("qty")))))
          .let("doc", to_json(struct(col("okey").as("key"),
            col("lines").as("lines"))))
          .let("qtys", pathText(
            childPathV(childPathV(pathSeqV(col("doc")), "lines"), "qty")))
          .forIn("q", col("qtys"))
          .orderBy(col("okey"), col("q").cast("double"))
          .select("o_orderkey" -> col("okey"), "qty" -> col("q").cast("double"))
      },
      Some("""
        SELECT l_orderkey AS o_orderkey, l_quantity AS qty
        FROM lineitem
        ORDER BY o_orderkey, qty""")),

    // ---- q35: descendant path at mixed depths ----
    // doc = {"key":…, "profile": {"price": acctbal},
    //        "orders": [{"key":…, "detail": {"price": total}}, …]}
    // doc .// price finds the profile price (depth 2) AND every order
    // price (depth 3) in one traversal.
    QueryDef(
      "q35_desc_path",
      (s, dir) => {
        val ordersPerCust = Query.forIn("o", Tables.load(s, dir, "orders"))
          .groupByAgg(
            Seq("ckey" -> col("o.o_custkey")),
            Seq("olist" -> collect_list(struct(
              col("o.o_orderkey").as("key"),
              struct(col("o.o_totalprice").as("price")).as("detail")))))
          .toDF
        Query.forIn("c", Tables.load(s, dir, "customer"))
          .forIn("oc", ordersPerCust)
          .where(col("c.c_custkey") === col("oc.ckey"))
          .let("doc", to_json(struct(
            col("c.c_custkey").as("key"),
            struct(col("c.c_acctbal").as("price")).as("profile"),
            col("oc.olist").as("orders"))))
          .let("prices", pathText(descPathV(pathSeqV(col("doc")), "price")))
          .forIn("pv", col("prices"))
          .orderBy(col("c.c_custkey"), col("pv").cast("double"))
          .select("c_custkey" -> col("c.c_custkey"),
            "price" -> col("pv").cast("double"))
      },
      Some("""
        SELECT c_custkey, price FROM (
          SELECT c_custkey, c_acctbal AS price FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders)
          UNION ALL
          SELECT o_custkey AS c_custkey, o_totalprice AS price FROM orders)
        ORDER BY c_custkey, price"""))
  )
}
