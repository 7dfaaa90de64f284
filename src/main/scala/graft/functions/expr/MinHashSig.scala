package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over pre-hashed shingles: sig[i] = min over
  * shingle hashes h of xxh64(h, seed = i), for i in [0, numHashes).
  *
  * Why a custom Expression: the equivalent
  * `array(min(transform(hs, rehash_0)), …, min(transform(hs, rehash_127)))`
  * runs 128 interpreted lambda passes per row, each allocating an
  * intermediate array. `doGenCode` emits one tight two-level loop
  * (shingles × permutations of XXH64.hashLong) into whole-stage
  * codegen, writing an UnsafeArrayData directly.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) =>
        // eval/codegen read elements with getLong and would silently
        // treat a null element as 0, corrupting the signature — reject
        // at analysis (the producing transform/xxhash64 chain emits
        // containsNull=false arrays).
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "minhash_sig requires array<bigint> with non-null elements")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $hs.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $xxh.hashLong($h, (long) $i);
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
