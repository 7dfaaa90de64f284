package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Fully-codegen'd dense dot product over array<float>/array<double>/
  * array<tinyint> columns (double accumulation, left-to-right — same
  * value as the higher-order-function formulation it replaces).
  * Tinyint support serves the int8-quantized ANN path (VecQuantize):
  * cosine is scale-invariant, so quantized candidate scoring runs
  * entirely on byte arrays.
  *
  * Why a custom Expression: `aggregate(zip_with(...))` evaluates its
  * lambdas interpretively and allocates an intermediate array per call
  * — fine on a scan, ruinous inside an all-pairs similarity join where
  * it runs millions of times. `doGenCode` emits a primitive loop that
  * whole-stage codegen inlines (q41 at sf0.1: 162s → see PERF.md).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  // Mismatched vector lengths are a data error, not a truncation: the
  // result is NULL (matching the null-propagating zip_with formulation
  // this expression replaced) rather than a plausible partial sum.
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemIsByte(e: Expression): Boolean = e.dataType match {
    case ArrayType(ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double>/array<tinyint>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val lb = elemIsByte(left)
    val rb = elemIsByte(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lb) x.getByte(i).toDouble
               else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rb) y.getByte(i).toDouble
               else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression): String =
      if (elemIsByte(e)) "getByte" else if (elemIsFloat(e)) "getFloat"
      else "getDouble"
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 scalar quantization of an array<float>/array<double>
  * vector: q_i = round(x_i · 127 / max|x|), all zeros when max|x| = 0.
  * One codegen'd two-pass loop per vector (max pass + quantize pass).
  *
  * Why a custom Expression: the HOF formulation
  * `transform(v, x -> round(x / scale))` with `scale` derived from the
  * same vector re-evaluates the array-max inside the interpreted
  * lambda per ELEMENT once CollapseProject inlines the scale alias —
  * the O(L²) re-inlining trap (q63/q80). The scale is deliberately NOT
  * returned: cosine is scale-invariant, so the quantized ANN candidate
  * path (VecDot over byte arrays) never needs it, and exact rescoring
  * uses the original float vectors.
  */
case class VecQuantize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_quantize_int8"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quantize_int8 expects array<float>/array<double>, got " +
            s"${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = elemIsFloat
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (f) x.getFloat(i).toDouble else x.getDouble(i))
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0.0) {
      val s = 127.0 / mx
      i = 0
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = math.rint(v * s).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = Math.abs((double) $a.$get($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |byte[] $out = new byte[$n];
         |if ($mx > 0.0) {
         |  double $s = 127.0 / $mx;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) Math.rint((double) $a.$get($i) * $s);
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
