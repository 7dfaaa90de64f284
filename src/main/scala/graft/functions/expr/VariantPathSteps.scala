package graft.functions.expr

import java.time.ZoneOffset

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Variant-backed path steps (SURVEY §1.2's dynamic-data endgame):
  * the same child/descendant semantics as JsonPathSteps, but the path
  * SEQUENCE is an `array<variant>` — the document is parsed ONCE
  * (`try_parse_json` at pathSeqV) and every step navigates the Variant
  * binary encoding directly, slicing sub-values that share the
  * document's metadata dictionary. No JSON text is produced or
  * re-parsed between steps (JsonPathSteps re-rendered containers to
  * text per step, `JsonPathSteps.scala` round 2); rendering happens
  * once at the end of the chain (`VariantRenderSeq`), and only for
  * values the query actually outputs.
  *
  * Declared order contract (refines the reference's unspecified
  * order, like the string route): array elements keep document order;
  * OBJECT fields iterate in key-sorted order — the Variant binary
  * format stores object fields sorted by key, which is what makes
  * `getFieldByKey` a binary search. The string route iterates objects
  * in document order; both are deterministic, and the difference is
  * observable only through the `_` wildcard / descendant traversal
  * sequence (PathFuzzSpec pins both contracts).
  */
abstract class VariantPathStep extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(VariantType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(VariantType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${prettyName} expects (array<variant>, string), got " +
            s"${l.sql}, ${r.sql}")
    }

  protected def slice(sub: Variant): VariantVal =
    new VariantVal(sub.getValue, sub.getMetadata)

  protected def step(v: Variant, key: String, out: ArrayBuffer[Any]): Unit

  override protected def nullSafeEval(seqVal: Any, keyVal: Any): Any = {
    val seq = seqVal.asInstanceOf[ArrayData]
    val key = keyVal.toString
    val out = new ArrayBuffer[Any]()
    var i = 0
    while (i < seq.numElements()) {
      if (!seq.isNullAt(i)) { // null = unparseable doc: no children
        val vv = seq.getVariant(i)
        step(new Variant(vv.getValue, vv.getMetadata), key, out)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `e ./ f` over variants — child step: flatten (recursively) array
  * elements, then yield each object's value under key `f`; `_` = all
  * keys (reference `Executor.py:47-63`).
  */
case class VariantChildStep(left: Expression, right: Expression)
    extends VariantPathStep {
  override def prettyName: String = "variant_child_path"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def step(v: Variant, key: String,
      out: ArrayBuffer[Any]): Unit =
    v.getType match {
      case VariantUtil.Type.ARRAY =>
        var i = 0
        while (i < v.arraySize()) { step(v.getElementAtIndex(i), key, out); i += 1 }
      case VariantUtil.Type.OBJECT =>
        if (key == "_") {
          var i = 0
          while (i < v.objectSize()) {
            out += slice(v.getFieldAtIndex(i).value); i += 1
          }
        } else {
          val f = v.getFieldByKey(key)
          if (f != null) out += slice(f)
        }
      case _ => () // scalars have no children
    }
}

/** `e .// f` over variants — descendant step: every value under key
  * `f` at ANY depth, including inside matched values
  * (reference `Executor.py:74-104`).
  */
case class VariantDescStep(left: Expression, right: Expression)
    extends VariantPathStep {
  override def prettyName: String = "variant_desc_path"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def step(v: Variant, key: String,
      out: ArrayBuffer[Any]): Unit =
    v.getType match {
      case VariantUtil.Type.ARRAY =>
        var i = 0
        while (i < v.arraySize()) { step(v.getElementAtIndex(i), key, out); i += 1 }
      case VariantUtil.Type.OBJECT =>
        var i = 0
        while (i < v.objectSize()) {
          val f = v.getFieldAtIndex(i)
          if (key == "_" || f.key == key) out += slice(f.value)
          step(f.value, key, out) // keep descending through matches
          i += 1
        }
      case _ => ()
    }
}

/** Terminal rendering of a variant path sequence to the string form
  * the rest of the engine speaks (get_json_object convention, same as
  * JsonPathStep.render): JSON strings unquoted, variant null → SQL
  * NULL element, containers/other scalars → compact JSON.
  */
case class VariantRenderSeq(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "variant_render_seq"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(VariantType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"variant_render_seq expects array<variant>, got ${t.sql}")
    }

  override protected def nullSafeEval(seqVal: Any): Any = {
    val seq = seqVal.asInstanceOf[ArrayData]
    val out = new Array[Any](seq.numElements())
    var i = 0
    while (i < seq.numElements()) {
      if (!seq.isNullAt(i)) {
        val vv = seq.getVariant(i)
        val v = new Variant(vv.getValue, vv.getMetadata)
        out(i) = v.getType match {
          case VariantUtil.Type.NULL => null
          case VariantUtil.Type.STRING => UTF8String.fromString(v.getString)
          case _ => UTF8String.fromString(v.toJson(ZoneOffset.UTC))
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
