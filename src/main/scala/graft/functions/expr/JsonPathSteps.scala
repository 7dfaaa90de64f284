package graft.functions.expr

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the reference's XPath-like path
  * steps over dynamic JSON (pythonql `Executor.py:47-104`,
  * `Grammar.md:4-18`; exercised by `tests/tutorial_tests.py:77-85`).
  *
  * Representation: a path SEQUENCE is an `array<string>` of JSON
  * values (strings unquoted, like get_json_object). Each step maps a
  * sequence to a sequence, so steps chain:
  * `childPath(childPath(pathSeq(doc), "a"), "b")` ≙ `doc ./ a ./ b`.
  *
  * These are per-row scalar expressions (no shuffle); CodegenFallback
  * keeps them inside the generated pipeline with a single virtual call
  * — the standard pattern for Jackson-backed JSON expressions.
  */
abstract class JsonPathStep extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient protected lazy val mapper = new ObjectMapper()

  /** JSON scalar → unquoted text (get_json_object convention);
    * containers → compact JSON; null → SQL NULL element.
    */
  protected def render(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isTextual) UTF8String.fromString(n.textValue())
    else UTF8String.fromString(n.toString)

  protected def step(node: JsonNode, key: String, out: ArrayBuffer[Any]): Unit

  override protected def nullSafeEval(seqVal: Any, keyVal: Any): Any = {
    val seq = seqVal.asInstanceOf[ArrayData]
    val key = keyVal.toString
    val out = new ArrayBuffer[Any]()
    var i = 0
    while (i < seq.numElements()) {
      val s = seq.getUTF8String(i)
      if (s != null) {
        try step(mapper.readTree(s.toString), key, out)
        catch { case NonFatal(_) => () } // non-JSON scalar: no children
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `e ./ f` — child step: flatten (recursively) list elements, then
  * yield each map element's value under key `f`; `_` = all keys
  * (`Executor.py:47-63`). 1 input value → 0..N outputs.
  */
case class JsonChildStep(left: Expression, right: Expression)
    extends JsonPathStep {
  override def prettyName: String = "json_child_path"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def step(node: JsonNode, key: String,
      out: ArrayBuffer[Any]): Unit =
    if (node.isArray) { // reference: isList → flatten, then maps only
      node.forEach(el => step(el, key, out))
    } else if (node.isObject) {
      if (key == "_") node.properties().forEach(e => out += render(e.getValue))
      else if (node.has(key)) out += render(node.get(key))
    }
}

/** `e .// f` — descendant step: every value under key `f` at ANY
  * depth, including inside matched values (`Executor.py:74-104`).
  * The reference's stack traversal makes its order unspecified; ours
  * is deterministic document order (a declared refinement —
  * SURVEY §7.3).
  */
case class JsonDescStep(left: Expression, right: Expression)
    extends JsonPathStep {
  override def prettyName: String = "json_desc_path"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def step(node: JsonNode, key: String,
      out: ArrayBuffer[Any]): Unit =
    if (node.isArray) {
      node.forEach(el => step(el, key, out))
    } else if (node.isObject) {
      node.properties().forEach { e =>
        if (key == "_" || e.getKey == key) out += render(e.getValue)
        step(e.getValue, key, out) // keep descending through matches
      }
    }
}
