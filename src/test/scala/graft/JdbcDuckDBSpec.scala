package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

/** The LIVE second JDBC engine (r4 verdict #6, r5 verdict #8): DuckDB
  * executes the same logical requests Derby does in JdbcSpec —
  * round-trip, filter/column pushdown, DSv2 aggregate + limit
  * pushdown, whole-subquery pushdown — through the SAME JdbcSource
  * entry points with only (url, driver) swapped, which is exactly the
  * claim the dialect seam made. The driver is a test-scope dependency
  * from the offline cache; main source never references it.
  */
class JdbcDuckDBSpec extends SparkSpec {

  private val url = JdbcSource.duckdbUrl("graftduck")
  private val drv = JdbcSource.DuckDBDriver

  test("round-trip preserves nation rows on DuckDB; filter and " +
      "column pruning push into the database") {
    val nation = Tables.load(spark, sf0001, "nation")
    // single writer connection: DuckDB serializes writers per file
    JdbcSource.write(nation.coalesce(1), url, "nation_rt", drv)
    val back = JdbcSource.read(spark, url, "nation_rt", drv)
    assert(back.count() == nation.count())
    val filtered = back.filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(n_regionkey,1)"),
      s"filter not pushed to DuckDB scan:\n$plan")
    val expected = nation.filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
      .collect().map(_.toString).sorted.toSeq
    assert(filtered.collect().map(_.toString).sorted.toSeq == expected)
  }

  test("DSv2 catalog route on DuckDB: aggregates, group-by and LIMIT " +
      "push into the database") {
    val nation = Tables.load(spark, sf0001, "nation")
    JdbcSource.write(nation.coalesce(1), url, "nation_agg", drv)
    val agg = JdbcSource
      .readCatalogFor(spark, "graftduck", url, drv, "nation_agg")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("key_sum"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*), SUM(n_nationkey)]"),
      s"aggregate not pushed:\n$plan")
    assert(plan.contains("PushedGroupByExpressions: [n_regionkey]"),
      s"group-by not pushed:\n$plan")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue)
    val got = agg.collect().map(norm).sortBy(_._1).toSeq
    val expected = nation.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("key_sum"))
      .collect().map(norm).sortBy(_._1).toSeq
    assert(got == expected)

    val lim = JdbcSource
      .readCatalogFor(spark, "graftduck", url, drv, "nation_agg")
      .filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
      .limit(3)
    val lplan = lim.queryExecution.executedPlan.toString
    assert(lplan.contains("PushedLimit: LIMIT 3"),
      s"limit not pushed:\n$lplan")
    assert(lim.collect().length == 3)
  }

  test("whole-subquery pushdown: a LEFT JOIN runs inside DuckDB") {
    val nation = Tables.load(spark, sf0001, "nation")
    val region = Tables.load(spark, sf0001, "region")
    JdbcSource.write(nation.coalesce(1), url, "nation_q", drv)
    JdbcSource.write(region.filter(col("r_regionkey") < 3).coalesce(1),
      url, "region_q", drv)
    val got = JdbcSource.readQuery(spark, url,
      """SELECT n."n_nationkey", n."n_name", r."r_name"
         FROM nation_q n LEFT JOIN region_q r
           ON n."n_regionkey" = r."r_regionkey"""", drv)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1),
        Option(r.getString(2)).getOrElse("-"))).sortBy(_._1).toSeq
    val expected = nation.join(region.filter(col("r_regionkey") < 3),
        col("n_regionkey") === col("r_regionkey"), "left_outer")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1),
        Option(r.getString(2)).getOrElse("-"))).sortBy(_._1).toSeq
    assert(got == expected && got.exists(_._3 == "-"))
  }

  test("URL routing engages the DuckDB dialect with LIMIT rendering") {
    assert(JdbcSource.dialectFor(url).getClass.getName
      .contains("GraftDuckDBDialect"), JdbcSource.dialectFor(url).toString)
    assert(JdbcSource.dialectFor(url).getLimitClause(5) == "LIMIT 5")
  }
}
