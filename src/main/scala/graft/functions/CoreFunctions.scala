package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.functions.expr.TryExcept

/** Expression-level operators from SURVEY §2.2 that aren't direct
  * Spark built-ins.
  */
object CoreFunctions {

  /** `try e except fallback` — general per-row error fallback
    * (reference `Executor.py:106-112`); see TryExcept. Both sides must
    * share a type.
    */
  def tryExcept(e: Column, fallback: Column): Column =
    GraftSqlBridge.column(TryExcept(
      GraftSqlBridge.expression(e), GraftSqlBridge.expression(fallback)))

  /** Recursive flatten (reference `helpers.py:18-27`): Spark's
    * `flatten` removes ONE nesting level; this removes all of them.
    * Nesting depth is static in the column's type, so the recursion
    * happens at plan-build time — pass the owning DataFrame for
    * schema resolution.
    */
  def flattenAll(df: DataFrame, c: Column): Column = {
    var cur = c
    var ty = df.select(c).schema.head.dataType
    while (ty match {
        case ArrayType(ArrayType(_, _), _) => true
        case _ => false
      }) {
      cur = flatten(cur)
      ty = ty.asInstanceOf[ArrayType].elementType
    }
    cur
  }
}
