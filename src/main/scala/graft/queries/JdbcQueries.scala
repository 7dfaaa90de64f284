package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.JdbcSource

/** q37: the RDBMS-source operator (SURVEY §2.1 #14) — nation is
  * round-tripped through embedded Derby and read back with a filter
  * that the JDBC source pushes into the database's SQL. The oracle
  * runs the same query on the parquet table, verifying the source
  * preserves values end-to-end.
  */
object JdbcQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q37_jdbc_source",
      (s, dir) => {
        JdbcSource.roundTrip(s, Tables.load(s, dir, "nation"), "NATION")
          .filter(col("n_regionkey") === 1)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        WHERE n_regionkey = 1
        ORDER BY n_nationkey"""))
  )
}
