package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

/** JDBC source: round-trip integrity and the pushdown assertion the
  * reference's RDBMS layer was built for (filters must reach the
  * database, not run in Spark).
  */
class JdbcSpec extends SparkSpec {

  test("round-trip preserves nation rows; filter is pushed to the DB") {
    val nation = Tables.load(spark, sf0001, "nation")
    val back = JdbcSource.roundTrip(spark, nation, "NATION_TEST")
    assert(back.count() == nation.count())

    val filtered = back.filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(n_regionkey,1)"),
      s"filter not pushed to JDBC scan:\n$plan")
    // column pruning reaches the generated SQL too
    assert(filtered.columns.toSeq == Seq("n_nationkey", "n_name"))

    val expected = nation.filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
      .collect().map(_.toString).sorted.toSeq
    val got = filtered.collect().map(_.toString).sorted.toSeq
    assert(got == expected)
  }
}
