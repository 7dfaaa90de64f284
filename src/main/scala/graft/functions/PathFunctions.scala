package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.functions.expr.{JsonChildStep, JsonDescStep, VariantChildStep, VariantDescStep, VariantRenderSeq}

/** Column API for the path-step expressions (SURVEY §2.2):
  *
  *   doc ./ a ./ b   →  childPath(childPath(pathSeq(doc), "a"), "b")
  *   doc .// k       →  descPath(pathSeq(doc), "k")
  *
  * Two representations of a path value:
  *   - string route: array<string> of JSON texts (every step
  *     re-parses and re-renders — kept for small chains and
  *     cross-checking);
  *   - variant route (`pathSeqV`/`childPathV`/`descPathV` +
  *     `pathText`): array<variant> — the document is parsed ONCE and
  *     steps navigate the Variant encoding directly; render to
  *     strings only at the end of the chain. Prefer this at scale.
  *
  * Explode the final sequence to continue relationally (`forIn` in
  * the DSL).
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

  // ---- variant route (single-parse) --------------------------------

  /** Lift a JSON document column into a VARIANT path sequence: one
    * parse for the whole step chain (unparseable docs become null
    * elements, which steps skip — same "no children" semantics as the
    * string route's per-step parse failure).
    */
  def pathSeqV(json: Column): Column = array(try_parse_json(json))

  /** `seq ./ key` over variants (key "_" = wildcard; object fields in
    * key-sorted order — see VariantPathSteps' order contract).
    */
  def childPathV(seq: Column, key: String): Column =
    GraftSqlBridge.column(VariantChildStep(
      GraftSqlBridge.expression(seq), Literal.create(key)))

  /** `seq .// key` over variants (all matches at any depth). */
  def descPathV(seq: Column, key: String): Column =
    GraftSqlBridge.column(VariantDescStep(
      GraftSqlBridge.expression(seq), Literal.create(key)))

  /** Render a variant path sequence to the engine's string form
    * (get_json_object convention) — the chain's terminal step.
    */
  def pathText(seq: Column): Column =
    GraftSqlBridge.column(VariantRenderSeq(GraftSqlBridge.expression(seq)))
}
