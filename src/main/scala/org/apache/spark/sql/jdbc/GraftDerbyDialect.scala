package org.apache.spark.sql.jdbc

import org.apache.spark.sql.types.{DataType, StringType}

/** Derby dialect with the pushdown depth Spark's built-in one lacks
  * (lives in the spark `jdbc` package because `DerbyDialect` is
  * `private[sql]` — same bridge idiom as GraftSqlBridge; the public
  * surface is `instance`, typed as the public JdbcDialect API):
  *
  *   - StringType maps to VARCHAR instead of CLOB: Derby cannot GROUP
  *     BY / compare CLOB, which silently disabled DSv2 aggregate
  *     pushdown on any query grouping or filtering by a written string
  *     column;
  *   - LIMIT pushdown via Derby's `FETCH FIRST n ROWS ONLY` (the
  *     built-in dialect reports supportsLimit = false).
  *
  * Registered by graft.sources.JdbcSource ahead of the built-in
  * (JdbcDialects.get prefers the most recently registered match).
  */
object GraftDerbyDialect {
  private[jdbc] final class Impl extends DerbyDialect {
    override def supportsLimit: Boolean = true
    override def getLimitClause(limit: Integer): String =
      if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType =>
        Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
      case _ => super.getJDBCType(dt)
    }
  }

  val instance: JdbcDialect = new Impl
}
