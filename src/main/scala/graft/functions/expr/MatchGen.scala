package graft.functions.expr

import java.time.ZoneOffset

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

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
  * Input is a JSON STRING column (Jackson single-parse) or a VARIANT
  * column (Spark 4's binary dynamic type): a corpus stored as Variant
  * is matched by navigating the encoding directly — `getFieldByKey`
  * is a binary search over the sorted field directory, no JSON text
  * is rendered or re-parsed (same route as VariantPathSteps).
  *
  * Semantics (differential-fuzzed in MatchFuzzSpec, both routes):
  *   - a level matches only an OBJECT node; every pattern key must
  *     exist (a JSON null value still counts as present);
  *   - string-const equality compares the rendered value;
  *   - `exact` rejects objects with keys outside the pattern, at the
  *     level where it applies (threaded through the recursion);
  *   - values render get_json_object-style: scalars as unquoted text,
  *     containers as compact JSON, JSON null as SQL NULL. Container
  *     renders differ between routes ONLY in object key order: the
  *     string route preserves document order, the Variant route emits
  *     key-sorted order (the Variant format stores fields sorted —
  *     document order no longer exists after parse_json).
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
      case StringType | VariantType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"match_pattern expects a JSON string or variant column, got ${t.sql}")
    }

  @transient private lazy val variantInput: Boolean =
    child.dataType == VariantType

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

  /** Variant-route rendering (mirrors VariantRenderSeq). */
  private def renderV(v: Variant): String = v.getType match {
    case VariantUtil.Type.NULL => null
    case VariantUtil.Type.STRING => v.getString
    case _ => v.toJson(ZoneOffset.UTC)
  }

  private def matchesV(p: MatchGen.Pat, v: Variant,
      binds: Array[Any]): Boolean = {
    if (v == null || v.getType != VariantUtil.Type.OBJECT) return false
    for (f <- p.fields) {
      val value = v.getFieldByKey(f.key) // binary search, no render
      if (value == null) return false
      f.const match {
        case Some(c) =>
          val r = renderV(value)
          if (r == null || r != c) return false
        case None =>
      }
      f.bindTo.foreach { n =>
        val r = renderV(value)
        binds(bindIdx(n)) = if (r == null) null else UTF8String.fromString(r)
      }
      f.nested match {
        case Some(np) => if (!matchesV(np, value, binds)) return false
        case None =>
      }
    }
    if (exact) {
      val heads = p.fields.map(_.key).toSet
      var i = 0
      while (i < v.objectSize()) {
        if (!heads.contains(v.getFieldAtIndex(i).key)) return false
        i += 1
      }
    }
    p.bindParentTo.foreach { n =>
      binds(bindIdx(n)) = UTF8String.fromString(renderV(v))
    }
    true
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val j = child.eval(input)
    if (j == null) return Nil
    val binds = new Array[Any](bindNames.length)
    val ok =
      if (variantInput) {
        val vv = j.asInstanceOf[VariantVal]
        matchesV(pat, new Variant(vv.getValue, vv.getMetadata), binds)
      } else {
        val root =
          try mapper.readTree(j.toString)
          catch { case NonFatal(_) => return Nil } // invalid JSON: no match
        val m = matches(pat, root, binds)
        // root-level `as z` binds the ORIGINAL document text verbatim
        // (matches the reference, which binds the input value at $ —
        // nested parent binds are Jackson-canonicalized, documented).
        // The variant route has no original text: root binds render
        // key-sorted like every other variant container.
        if (m) pat.bindParentTo.foreach { n =>
          binds(bindIdx(n)) = UTF8String.fromString(j.toString)
        }
        m
      }
    if (!ok) Nil
    else {
      val row = new Array[Any](1 + bindNames.length)
      row(0) = true
      System.arraycopy(binds, 0, row, 1, binds.length)
      Seq(new GenericInternalRow(row))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
