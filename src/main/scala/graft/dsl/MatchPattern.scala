package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `match` clause (pythonql `Executor.py:316-388`,
  * grammar `PythonQLParser.py:769-801`): for each element of a
  * sequence, recursively match a nested object pattern —
  *
  *   - every pattern key must EXIST in the object (missing key →
  *     no match; a JSON null value still counts as present);
  *   - optional string-constant equality (`"first" : "daniela"`);
  *   - optional variable binding (`"age" : as y`);
  *   - optional predicate over the variables bound so far
  *     (`as y where y > 40`);
  *   - nested patterns descend (`"zip" : { "number" : as w }`);
  *   - `{...} as z` binds the whole object at that level;
  *   - `exact` mode rejects objects with keys outside the pattern —
  *     at EVERY level (the reference threads isExact through the
  *     recursion).
  *
  * Compilation target: ONE Generator expression (MatchGenerate) that
  * parses the document a single time per row and emits zero rows (no
  * match) or one row of binding values — predicate and extraction
  * collapse into one Generate node, no UDF, no shuffle, so at 100 TB
  * the matcher is a free rider on the scan. (The previous compilation
  * to per-conjunct get_json_object/json_object_keys built-ins
  * re-parsed the document O(pattern fields) times per row.)
  *
  * Scalars bind as their JSON-unquoted text (get_json_object
  * semantics); objects bind as JSON text — cast numerics at use sites.
  */
object MatchPattern {

  /** One `"key" : …` entry of an object pattern. */
  final case class Field(
      key: String,
      const: Option[String] = None,
      bindTo: Option[String] = None,
      where: Option[Column] = None,
      nested: Option[Pat] = None) {
    require(key.matches("[A-Za-z0-9_]+"),
      s"pattern key '$key' must be a simple identifier (JSON-path safe)")
  }

  /** An object pattern: fields + optional whole-object binding. */
  final case class Pat(fields: Seq[Field], bindParentTo: Option[String] = None)

  // Builder sugar: Pat(Seq(field("age").as("y").where(col("y") > 40)))
  def field(key: String): Field = Field(key)
  implicit final class FieldOps(private val f: Field) extends AnyVal {
    def is(const: String): Field = f.copy(const = Some(const))
    def as(name: String): Field = f.copy(bindTo = Some(name))
    def where(p: Column): Field = f.copy(where = Some(p))
    def obj(nested: Pat): Field = f.copy(nested = Some(nested))
  }

  /** Compile `pat` over JSON-string column `json` into
    * (generator column, binding names in pattern order, where preds).
    * The generator emits 0 rows (no match) or 1 row
    * (`_match_ok` + one string column per binding) — alias it with
    * `.as("_match_ok" +: names)`. `wherePreds` are returned
    * separately: they reference binding NAMES, so callers let the
    * generator materialize the bindings first, then filter (same
    * conjunction semantics as the reference's short-circuit order).
    */
  def compile(pat: Pat, json: Column, exact: Boolean)
      : (Column, Seq[String], Seq[Column]) = {
    import graft.functions.expr.{MatchGen, MatchGenerate}

    // binding order mirrors the reference's scope-extension order:
    // per field its own binding then its nested pattern's, parent
    // binding last at each level
    def names(p: Pat): Seq[String] =
      p.fields.flatMap(f =>
        f.bindTo.toSeq ++ f.nested.toSeq.flatMap(names)) ++
        p.bindParentTo.toSeq
    def wheres(p: Pat): Seq[Column] =
      p.fields.flatMap(f => f.where.toSeq ++ f.nested.toSeq.flatMap(wheres))
    def toSpec(p: Pat): MatchGen.Pat =
      MatchGen.Pat(
        p.fields.map(f =>
          MatchGen.Field(f.key, f.const, f.bindTo, f.nested.map(toSpec))),
        p.bindParentTo)

    val bindNames = names(pat)
    // a repeated name would emit two identically-named columns from
    // the generator (ambiguous downstream); the reference's dict
    // overwrite semantics are better served by renaming in the pattern
    require(bindNames.distinct.size == bindNames.size,
      s"duplicate binding names in match pattern: " +
        bindNames.diff(bindNames.distinct).distinct.mkString(", "))
    val gen = org.apache.spark.sql.GraftSqlBridge.column(
      MatchGenerate(org.apache.spark.sql.GraftSqlBridge.expression(json),
        toSpec(pat), exact, bindNames))
    (gen, bindNames, wheres(pat))
  }
}
