package graft

import org.apache.spark.sql.functions._
import graft.dsl.Query

/** NestAggRewrite: the collect-then-reduce patterns produced by the
  * DSL's reference-style group-by must compile to native aggregates
  * (no CollectList left in the plan) with unchanged results.
  */
class RuleSpec extends SparkSpec {
  import spark.implicits._

  private def grouped = Query
    .forIn("t", Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 7L), ("b", 4L))
      .toDF("k", "v"))
    .groupBy("k" -> col("t.k"))

  test("size(collect_list) → count; list gone from the plan") {
    val q = grouped.let("n", size(col("t")))
      .orderBy(col("k")).select("k" -> col("k"), "n" -> col("n"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("collect_list"), opt)
    assert(opt.contains("count"), opt)
    assert(q.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 2), ("b", 3)))
  }

  test("aggregate(transform(collect_list), 0, +) → sum; max/min likewise") {
    val q = grouped
      .let("vs", transform(col("t"), _.getField("v")))
      .let("total", aggregate(col("vs"), lit(0L), (a, b) => a + b))
      .let("hi", array_max(col("vs")))
      .let("lo", array_min(col("vs")))
      .orderBy(col("k"))
      .select("k" -> col("k"), "total" -> col("total"),
        "hi" -> col("hi"), "lo" -> col("lo"))
    val res = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(res == Seq(("a", 6L, 5L, 1L), ("b", 13L, 7L, 2L)))
    // tuple-derived schema is non-nullable → the mapped rewrite fires
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("collect_list"), opt)
    assert(opt.contains("sum") && opt.contains("max") && opt.contains("min"),
      opt)
  }

  test("rewrite preserves results when the list is ALSO used as a list") {
    val q = grouped
      .let("n", size(col("t")))
      .let("names", concat_ws(",", array_sort(transform(col("t"), _.getField("v")))))
      .orderBy(col("k"))
      .select("k" -> col("k"), "n" -> col("n"), "names" -> col("names"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("collect_list"), opt) // still needed for names
    assert(q.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSeq == Seq(("a", 2, "1,5"), ("b", 3, "2,4,7")))
  }

  test("all-null groups: sum coalesces back to aggregate's zero") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", None))
      .toDF("k", "v")
    val q = Query.forIn("t", df)
      .groupBy("k" -> col("t.k"))
      .let("vs", transform(filter(col("t"), _.getField("v").isNotNull),
        _.getField("v")))
      .let("total", aggregate(col("vs"), lit(0.0), (a, b) => a + b))
      .orderBy(col("k"))
      .select("k" -> col("k"), "total" -> col("total"))
    assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 3.0), ("b", 0.0)))
  }
}
