package graft

import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions
import org.apache.spark.sql.jdbc.GraftDerbyDialect
import org.apache.spark.sql.types.StringType
import graft.sources.JdbcSource

/** The JDBC dialect SEAM, exercised per engine without the engines:
  * URL routing and the dialect-specific SQL that Spark's pushdown
  * machinery generates from the SAME logical request, for the engines
  * whose jars are NOT available (H2/MySQL/Postgres — zero-egress
  * container). Since r6 a second engine also runs LIVE beside Derby:
  * DuckDB (JdbcDuckDBSpec), via the same seam these tests pin.
  *
  * The reference hand-writes one source module per engine
  * (`pythonql/sources/postgresql.py:414-420`, `mysql.py`); on Spark
  * the equivalent capability is `JdbcDialects` registration + the
  * per-dialect `JdbcSQLQueryBuilder`, which these tests drive
  * directly.
  */
class JdbcDialectSpec extends SparkSpec {

  // JDBCOptions eagerly resolves a driver class; the Derby driver (the
  // one on this classpath) satisfies that — dialect choice is routed
  // by URL above it, which is exactly what these tests pin.
  private def opts(url: String) = new JDBCOptions(Map(
    "url" -> url, "dbtable" -> "t",
    "driver" -> JdbcSource.DefaultDriver))

  private def limitSql(url: String, limit: Int): String =
    JdbcSource.dialectFor(url)
      .getJdbcSQLQueryBuilder(opts(url))
      .withColumns(Array("a", "b"))
      .withLimit(limit)
      .build()
      .trim.replaceAll("\\s+", " ")

  test("URL routing picks a different dialect per engine, and the " +
      "graft Derby dialect wins over the built-in for jdbc:derby") {
    assert(JdbcSource.dialectFor("jdbc:derby:target/x") eq
      GraftDerbyDialect.instance)
    val byUrl = Map(
      "jdbc:h2:mem:x" -> "H2Dialect",
      "jdbc:mysql://db/x" -> "MySQLDialect",
      "jdbc:postgresql://db/x" -> "PostgresDialect")
    for ((url, want) <- byUrl)
      assert(JdbcSource.dialectFor(url).getClass.getName.contains(want),
        s"$url routed to ${JdbcSource.dialectFor(url).getClass.getName}")
  }

  test("the same pushed-down scan renders engine-specific LIMIT " +
      "syntax through the dialect's SQL builder") {
    // Derby has no LIMIT keyword — the graft dialect emits the
    // FETCH FIRST form (the round-3 pushdown fix); H2/MySQL/Postgres
    // emit plain LIMIT. Same logical request, four dialects.
    val derby = limitSql("jdbc:derby:target/x", 5)
    assert(derby.endsWith("FETCH FIRST 5 ROWS ONLY"), derby)
    for (url <- Seq("jdbc:h2:mem:x", "jdbc:mysql://db/x",
        "jdbc:postgresql://db/x")) {
      val sql = limitSql(url, 5)
      assert(sql.endsWith("LIMIT 5"), s"$url → $sql")
    }
  }

  test("string columns map to a GROUP-BY-able type per engine") {
    // The Derby fix that unlocked aggregate pushdown: StringType must
    // not map to CLOB (Derby cannot GROUP BY/compare CLOB). Other
    // engines keep their own native text types through the same API.
    assert(GraftDerbyDialect.instance.getJDBCType(StringType)
      .map(_.databaseTypeDefinition).contains("VARCHAR(32672)"))
    val pg = JdbcSource.dialectFor("jdbc:postgresql://db/x")
      .getJDBCType(StringType).map(_.databaseTypeDefinition)
    assert(pg.contains("TEXT"), pg.toString)
    val my = JdbcSource.dialectFor("jdbc:mysql://db/x")
      .getJDBCType(StringType).map(_.databaseTypeDefinition)
    assert(my.contains("LONGTEXT"), my.toString)
  }

  test("identifier quoting follows the engine") {
    assert(JdbcSource.dialectFor("jdbc:mysql://db/x")
      .quoteIdentifier("k") == "`k`")
    assert(JdbcSource.dialectFor("jdbc:postgresql://db/x")
      .quoteIdentifier("k") == "\"k\"")
    assert(JdbcSource.dialectFor("jdbc:derby:target/x")
      .quoteIdentifier("k") == "\"k\"")
  }
}
