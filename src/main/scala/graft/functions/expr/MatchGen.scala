package graft.functions.expr

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable mirror of `MatchPattern.Pat` (no Column fields —
  * `where` predicates are applied by the caller over the emitted
  * binding columns, preserving the reference's conjunction order).
  */
object MatchGen {
  final case class Field(
      key: String,
      const: Option[String],
      bindTo: Option[String],
      nested: Option[Pat])
  final case class Pat(fields: Seq[Field], bindParentTo: Option[String])
}

/** Single-parse compilation of the reference's `match` clause
  * (pythonql `Executor.py:316-388`): a Generator that parses the JSON
  * document ONCE per row and emits either zero rows (no match) or one
  * row of binding values. Filtering and extraction collapse into one
  * `Generate` node — versus the previous per-conjunct
  * `get_json_object`/`json_object_keys` compilation, which re-parsed
  * the document O(pattern fields) times per row.
  *
  * Semantics (differential-fuzzed in MatchFuzzSpec):
  *   - a level matches only an OBJECT node; every pattern key must
  *     exist (a JSON null value still counts as present);
  *   - string-const equality compares the rendered value;
  *   - `exact` rejects objects with keys outside the pattern, at the
  *     level where it applies (threaded through the recursion);
  *   - values render get_json_object-style: scalars as unquoted text,
  *     containers as compact JSON, JSON null as SQL NULL.
  *
  * Output row layout: `_match_ok: boolean` (always true on emitted
  * rows — gives zero-binding patterns a non-empty schema) followed by
  * one string column per binding in pattern order.
  */
case class MatchGenerate(child: Expression, pat: MatchGen.Pat,
    exact: Boolean, bindNames: Seq[String])
    extends UnaryExpression with Generator with CodegenFallback {
  override def prettyName: String = "match_pattern"

  override def elementSchema: StructType = StructType(
    StructField("_match_ok", BooleanType, nullable = false) +:
      bindNames.map(StructField(_, StringType, nullable = true)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"match_pattern expects a JSON string column, got ${t.sql}")
    }

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val bindIdx: Map[String, Int] =
    bindNames.zipWithIndex.toMap

  /** get_json_object-style rendering (mirrors JsonPathStep.render). */
  private def render(n: JsonNode): String =
    if (n.isNull) null
    else if (n.isTextual) n.textValue()
    else n.toString

  private def matches(p: MatchGen.Pat, v: JsonNode,
      binds: Array[Any]): Boolean = {
    if (v == null || !v.isObject) return false
    for (f <- p.fields) {
      if (!v.has(f.key)) return false
      val value = v.get(f.key)
      f.const match {
        case Some(c) =>
          val r = render(value)
          if (r == null || r != c) return false
        case None =>
      }
      f.bindTo.foreach { n =>
        val r = render(value)
        binds(bindIdx(n)) = if (r == null) null else UTF8String.fromString(r)
      }
      f.nested match {
        case Some(np) => if (!matches(np, value, binds)) return false
        case None =>
      }
    }
    if (exact) {
      val heads = p.fields.map(_.key).toSet
      val it = v.fieldNames()
      while (it.hasNext) if (!heads.contains(it.next())) return false
    }
    p.bindParentTo.foreach { n =>
      binds(bindIdx(n)) = UTF8String.fromString(render(v))
    }
    true
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val j = child.eval(input)
    if (j == null) return Nil
    val root =
      try mapper.readTree(j.toString)
      catch { case NonFatal(_) => return Nil } // invalid JSON: no match
    val binds = new Array[Any](bindNames.length)
    if (!matches(pat, root, binds)) Nil
    else {
      // root-level `as z` binds the ORIGINAL document text verbatim
      // (matches the reference, which binds the input value at $ —
      // nested parent binds are Jackson-canonicalized, documented)
      pat.bindParentTo.foreach { n =>
        binds(bindIdx(n)) = UTF8String.fromString(j.toString)
      }
      val row = new Array[Any](1 + bindNames.length)
      row(0) = true
      System.arraycopy(binds, 0, row, 1, binds.length)
      Seq(new GenericInternalRow(row))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
