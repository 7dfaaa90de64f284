package graft.functions.expr

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** The reference's general try-except EXPRESSION
  * (`try e1 except e2`, pythonql `Executor.py:106-112`,
  * `Grammar.md:20-29`): evaluate `left`; on ANY runtime error return
  * `right` instead. Spark's `try_*` family covers the common shapes
  * (cast, divide, element_at); this closes the general case — any
  * expression that can raise under ANSI mode (overflow, malformed
  * input, invalid argument) gets a per-row fallback.
  *
  * Both children must resolve to the same type (like the reference,
  * where both branches are ordinary Python expressions).
  */
case class TryExcept(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "try_except"
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == right.dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"try_except branches must have the same type, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def eval(input: InternalRow): Any =
    try left.eval(input)
    catch { case NonFatal(_) => right.eval(input) }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
