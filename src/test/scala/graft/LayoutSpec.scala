package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting
import graft.sources.Layout

/** Physical layout: bucketed co-located joins (no exchange, no sort)
  * and salted skew joins (same result, spread hot keys).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no exchange and no sort") {
    val customer = Tables.load(spark, sf0001, "customer")
    val orders = Tables.load(spark, sf0001, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    Layout.writeBucketed(customer, "cust_b", Seq("c_custkey"), 8)
    Layout.writeBucketed(orders, "ord_b", Seq("c_custkey"), 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.table(spark, "cust_b")
        .join(Layout.table(spark, "ord_b"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() ==
        customer.join(orders, "c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join: identical result, salt in the join keys") {
    // skewed big side: one hot key
    val big = (Seq.fill(500)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name")

    val salted = Salting.saltedJoin(big, small, "k", saltFactor = 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt not in join plan:\n$plan")

    // left_outer keeps unmatched big rows exactly once
    val lo = Salting.saltedJoin(big, small, "k", 8, "left_outer")
    assert(lo.count() == big.count())
  }
}
