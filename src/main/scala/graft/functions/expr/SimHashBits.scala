package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** SimHash sign bits from per-token hash chunks: input is one
  * `array<array<bigint>>` row — per token, `width/16` 16-bit chunks of
  * its hash (chunk 0 = most significant). Output: array<int>[width]
  * of 0/1 — bit j is the sign of Σ_tokens (±1 by bit j of the token
  * hash), bit j = bit (15 - j%16) of chunk j/16, identical to the
  * md5-hex definition mirrored by the DuckDB oracle.
  *
  * `width` is 64 (first half of md5) or 128 (all of md5): wider
  * fingerprints trade 8 extra bytes/doc for 2× the band width at a
  * given Hamming radius — the fix for radius-8 band-bucket saturation
  * measured in PERF.md (64-bit at radius 8 has only ~128 buckets/band;
  * 128-bit has ~16k).
  *
  * Why a custom Expression: the lambda formulation ran a width-element
  * zip_with allocation per TOKEN; this is one codegen'd two-level
  * loop per row.
  */
case class SimHashBits(child: Expression, width: Int = 64)
    extends UnaryExpression {
  require(width > 0 && width <= 128 && width % 16 == 0,
    s"simhash width must be a multiple of 16 in (0, 128], got $width")

  override def prettyName: String = "simhash_bits"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(LongType, false), false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(ArrayType(LongType, _), _) =>
        // getArray/getLong would NPE or read null as 0 — reject null
        // elements at analysis (the producing md5-chunk transform
        // emits containsNull=false at both levels).
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "simhash_bits requires array<array<bigint>> with non-null elements")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits expects array<array<bigint>>, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sums = new Array[Long](width)
    var t = 0
    while (t < toks.numElements()) {
      val chunks = toks.getArray(t)
      var j = 0
      while (j < width) {
        val bit = (chunks.getLong(j >> 4) >> (15 - (j & 15))) & 1L
        sums(j) += (if (bit == 1L) 1L else -1L)
        j += 1
      }
      t += 1
    }
    new GenericArrayData(sums.map(s => if (s > 0) 1 else 0))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val sums = ctx.freshName("sums")
      val bits = ctx.freshName("bits")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val chunks = ctx.freshName("chunks")
      val bit = ctx.freshName("bit")
      s"""
         |long[] $sums = new long[$width];
         |for (int $t = 0; $t < $toks.numElements(); $t++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $chunks =
         |    $toks.getArray($t);
         |  for (int $j = 0; $j < $width; $j++) {
         |    long $bit = ($chunks.getLong($j >> 4) >> (15 - ($j & 15))) & 1L;
         |    $sums[$j] += ($bit == 1L) ? 1L : -1L;
         |  }
         |}
         |int[] $bits = new int[$width];
         |for (int $j = 0; $j < $width; $j++) $bits[$j] = ($sums[$j] > 0) ? 1 : 0;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
