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
  * Compilation target: ONE boolean predicate + N extraction columns
  * over a JSON-string column, all codegen'd built-ins
  * (json_object_keys / get_json_object) — the matcher runs inside the
  * scan projection with no UDF and no shuffle, so at 100 TB it is a
  * free rider on the scan.
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

  /** Structural conjuncts + extraction columns for `pat` applied to
    * JSON-string column `json`. `wherePreds` are returned separately:
    * they reference binding NAMES, so callers materialize bindings as
    * columns first, then filter (same conjunction semantics as the
    * reference's short-circuit order).
    */
  def compile(pat: Pat, json: Column, exact: Boolean)
      : (Column, Seq[(String, Column)], Seq[Column]) = {
    def objAt(path: String): Column =
      if (path == "$") json else get_json_object(json, path)

    def rec(p: Pat, path: String)
        : (Seq[Column], Seq[(String, Column)], Seq[Column]) = {
      val keysHere = json_object_keys(objAt(path))
      // every pattern key exists (json_object_keys is null for
      // non-objects → conjunct null → row dropped, like the
      // reference's failed `in` on a non-dict)
      val existence = p.fields.map(f => array_contains(keysHere, f.key))
      val exactness =
        if (exact)
          Seq(array_sort(keysHere) ===
            array(p.fields.map(_.key).sorted.map(lit): _*))
        else Nil
      val perField = p.fields.map { f =>
        val fPath = s"$path.${f.key}"
        val value = get_json_object(json, fPath)
        val constC = f.const.map(c => value === lit(c)).toSeq
        val bind = f.bindTo.map(_ -> value).toSeq
        val whereP = f.where.toSeq
        val (nc, nb, nw) = f.nested.map(rec(_, fPath))
          .getOrElse((Nil, Nil, Nil))
        (constC ++ nc, bind ++ nb, whereP ++ nw)
      }
      val parentBind = p.bindParentTo.map(_ -> objAt(path)).toSeq
      (existence ++ exactness ++ perField.flatMap(_._1),
        perField.flatMap(_._2) ++ parentBind,
        perField.flatMap(_._3))
    }

    val (conjuncts, bindings, wheres) = rec(pat, "$")
    (conjuncts.reduceOption(_ && _).getOrElse(lit(true)), bindings, wheres)
  }
}
