package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.functions.expr.{JsonChildStep, JsonDescStep}

/** Column API for the path-step expressions (SURVEY §2.2):
  *
  *   doc ./ a ./ b   →  childPath(childPath(pathSeq(doc), "a"), "b")
  *   doc .// k       →  descPath(pathSeq(doc), "k")
  *
  * A path value is an array<string> of JSON texts; explode the final
  * sequence to continue relationally (`forIn` in the DSL).
  */
object PathFunctions {

  /** Lift a single JSON document column into a path sequence. */
  def pathSeq(json: Column): Column = array(json)

  /** `seq ./ key` (key "_" = wildcard over all map keys). */
  def childPath(seq: Column, key: String): Column =
    GraftSqlBridge.column(JsonChildStep(
      GraftSqlBridge.expression(seq), Literal.create(key)))

  /** `seq .// key` (all matches at any depth, document order). */
  def descPath(seq: Column, key: String): Column =
    GraftSqlBridge.column(JsonDescStep(
      GraftSqlBridge.expression(seq), Literal.create(key)))
}
