package graft.functions.expr

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact fixed-point (6-decimal) vector kernels for the DECIMAL-replay
  * operators (PCA, all-but-the-top, exact k-means).
  *
  * Motivation (r15 optimization round, guide §1.2 step 2): the
  * DECIMAL(18,6) formulations multiply through Spark's `Decimal` with
  * result precision > 18, which leaves the compact-long representation
  * and pays a `java.math.BigDecimal` multiply PER ELEMENT PAIR — the
  * measured hot path of q140/q142/q143. A DECIMAL(18,6) is an integer
  * number of MICROS, so the identical arithmetic runs on unscaled
  * longs: products are exact integers at scale 12, per-vector
  * reductions fit a long (d ≤ 128 by the operator contracts), and
  * cross-row sums accumulate in 128-bit integers — bit-identical to
  * the DECIMAL sums at ANY corpus size, with `Math.multiplyExact` /
  * `addExact` making the (unreachable by construction) overflow loud
  * instead of silent.
  *
  * Every kernel reproduces the engine's existing semantics EXACTLY:
  * [[FixedPoint.toUnscaled6]] is Spark's `Round(_, 6)` followed by
  * `Cast(DoubleType → DecimalType(18,6))` (same two HALF_UP
  * BigDecimal steps), and the aggregates' 128-bit totals convert to
  * the same `java.math.BigDecimal` values the DECIMAL sums produce.
  */
object FixedPoint {

  /** Spark's `round(x, 6).cast(DecimalType(18,6))` on DoubleType,
    * returned as the unscaled long (micros): Round is
    * `BigDecimal.valueOf(x).setScale(6, HALF_UP).toDouble`, the Cast
    * re-parses that double via `BigDecimal.valueOf` and re-rounds —
    * replicated verbatim so the value is bit-identical, including the
    * double round-trip in the middle.
    */
  def toUnscaled6(x: Double): Long = {
    val y = JBigDecimal.valueOf(x)
      .setScale(6, RoundingMode.HALF_UP).doubleValue()
    val d = JBigDecimal.valueOf(y).setScale(6, RoundingMode.HALF_UP)
    val u = d.unscaledValue().longValueExact() // loud past decimal(18,6)
    require(d.precision <= 18,
      s"fixed-point overflow: $x exceeds DECIMAL(18,6)")
    u
  }

  /** array<float|double> → unscaled-micros long array. Null elements
    * are REJECTED loudly (advisor r15 #1): the DECIMAL pipeline this
    * replaced skipped a null coordinate in its sums, while getDouble
    * on a null slot would silently read 0.0 — neither silently-zero
    * nor silently-skip is acceptable in an exactness-gated kernel, so
    * a corpus with null coordinates must fail the job, not drift.
    */
  def vecToUnscaled(a: ArrayData, isFloat: Boolean): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i),
        "fixed-point: null element inside an embedding vector — the " +
          "exactness contract requires dense non-null vectors")
      out(i) = toUnscaled6(
        if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    out
  }

  /** 128-bit two's-complement accumulate: buf(i), buf(i+1) = (lo, hi);
    * adds the SIGN-EXTENDED 64-bit v.
    */
  @inline def add128(buf: Array[Long], i: Int, v: Long): Unit = {
    val lo = buf(i)
    val nlo = lo + v
    val carry = ((lo & v) | ((lo | v) & ~nlo)) >>> 63
    buf(i) = nlo
    buf(i + 1) += (v >> 63) + carry
  }

  /** [[AbttCorrectArr]]'s kernel (shared by eval and codegen): null on
    * dim mismatch.
    */
  def abttCorrect(cxu: ArrayData, p6u: Long,
      vU: Array[Long]): GenericArrayData = {
    val n = cxu.numElements()
    if (n != vU.length) return null
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      val v = Math.subtractExact(
        Math.multiplyExact(cxu.getLong(j), 1000000L),
        Math.multiplyExact(p6u, vU(j)))
      out(j) = Decimal.createUnsafe(v, 38, 12).toDouble
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[NearestCentroidFixed]]'s kernel (shared by eval and codegen). */
  def nearestCentroid(xu: ArrayData,
      centroids: Array[Array[Long]]): InternalRow = {
    val n = xu.numElements()
    var best = -1
    var bestD = 0L
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n,
        s"nearest_centroid_fixed: vector dim $n != centroid dim ${cent.length}")
      var d = 0L
      var j = 0
      while (j < n) {
        val diff = Math.subtractExact(xu.getLong(j), cent(j))
        d = Math.addExact(d, Math.multiplyExact(diff, diff))
        j += 1
      }
      if (best < 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    InternalRow(best, Decimal.createUnsafe(bestD, 38, 12))
  }

  private val MASK64 = BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)

  /** (lo, hi) 128-bit two's complement → exact BigDecimal at `scale`. */
  def dec128(lo: Long, hi: Long, scale: Int): JBigDecimal = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(BigInteger.valueOf(lo).and(MASK64))
    new JBigDecimal(bi, scale)
  }
}

/** array<float|double> → array<long> of 6-decimal unscaled micros —
  * the fixed-point ingestion step ([[Pca.explodeFixed]]'s per-element
  * Round+Cast, kept in array form so downstream kernels stay
  * scan-local).
  */
case class FixedPointVec(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fixed_point_vec"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
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
          s"fixed_point_vec expects array<float>/array<double>, got ${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      FixedPoint.vecToUnscaled(a.asInstanceOf[ArrayData], isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fp = FixedPoint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = new $gad($fp.vecToUnscaled($a, $isFloat));"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Element-wise `left - right` over array<long> (exact, loud on
  * overflow). Null when lengths differ (a data error surfaced the
  * null-propagating way, matching VecDot's contract).
  */
case class FixedSubVec(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "fixed_sub_vec"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fixed_sub_vec expects two array<long>, got " +
            s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Math.subtractExact(x.getLong(i), y.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = java.lang.Math.subtractExact($a.getLong($i), $b.getLong($i));
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product of two unscaled-micros arrays as
  * DECIMAL(38,12) — the same value as `sum(a_dec * b_dec)` over the
  * exploded DECIMAL(18,6) coordinates (products are exact integers at
  * scale 12; the per-vector reduction fits a long for d ≤ 128 by the
  * operator contracts, and overflow past that is loud). Null when
  * lengths differ.
  */
case class FixedDotDec(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "fixed_dot_dec"
  override def dataType: DataType = DecimalType(38, 12)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fixed_dot_dec expects two array<long>, got " +
            s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    Decimal.createUnsafe(s, 38, 12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = Decimal.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s = java.lang.Math.addExact($s,
         |      java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |  ${ev.value} = $dec.createUnsafe($s, 38, 12);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All-but-the-top correction in fixed point: given the centered
  * unscaled vector cxu (scale 6), the re-rounded projection p6u
  * (scale 6) and the component vU (scale 6, a literal-backed constant
  * array), emits array<double> of
  * `cast(cx_j − p6·v_j as double)` — each element the correctly
  * rounded double of the exact scale-12 integer
  * `cxu_j·10⁶ − p6u·vU_j`, identical to the DECIMAL formulation.
  */
case class AbttCorrectArr(left: Expression, right: Expression,
    vU: Array[Long]) extends BinaryExpression {
  override def prettyName: String = "abtt_correct_arr"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"abtt_correct_arr expects (array<long>, long), got " +
            s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FixedPoint.abttCorrect(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Long], vU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fp = FixedPoint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val vuRef = ctx.addReferenceObj("vU", vU, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("out")
      s"""
         |$gad $tmp = $fp.abttCorrect($a, $b, $vuRef);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest centroid under exact fixed-point squared L2 — the k-means
  * assignment step as ONE scan-local expression: for each cluster (in
  * ascending id order, reproducing the old `(d2, cluster)` window
  * tie-break via strict-less), d2 = Σ_j (xu_j − c_j)² as an exact
  * scale-12 integer. Output: struct<cluster:int, d2:decimal(38,12)>.
  * `centroids(c)(j)` are unscaled micros; rows are cluster ids 0..k-1.
  */
case class NearestCentroidFixed(child: Expression,
    centroids: Array[Array[Long]]) extends UnaryExpression {
  override def prettyName: String = "nearest_centroid_fixed"
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("d2", DecimalType(38, 12), nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_fixed expects array<long>, got ${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    FixedPoint.nearestCentroid(a.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fp = FixedPoint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val centRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val row = classOf[InternalRow].getName
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = ($row) $fp.nearestCentroid($a, $centRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Upper-triangle Gram sums over unscaled-micros vectors: for every
  * j ≤ k, Σ_rows cxu_j·cxu_k as an exact 128-bit integer at scale 12 —
  * the per-partition "Gram aggregator" [[Pca]]'s scaladoc promises at
  * scale: one pass, no explode, no self-join, partial-aggregated per
  * partition, and the merged totals equal the DECIMAL(38,12) sums of
  * the old covariance self-join bit-for-bit at ANY row count.
  * Output: array<decimal(38,12)> of length d(d+1)/2, enumerated
  * j-major (j=0: k=0..d−1; j=1: k=1..d−1; ...).
  */
case class GramUpperAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "gram_upper_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) return buf // null vector ≡ posexplode(null): no rows
    val xu = a.asInstanceOf[ArrayData]
    val d = xu.numElements()
    val b =
      if (buf.length == 0) new Array[Long](d * (d + 1)) // (lo, hi) per cell
      else {
        require(buf.length == d * (d + 1),
          s"gram_upper_agg: inconsistent vector dims (buffer ${buf.length}, d $d)")
        buf
      }
    var j = 0
    var cell = 0
    while (j < d) {
      val xj = xu.getLong(j)
      var k = j
      while (k < d) {
        FixedPoint.add128(b, cell * 2,
          Math.multiplyExact(xj, xu.getLong(k)))
        cell += 1
        k += 1
      }
      j += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length, "gram_upper_agg: dim mismatch in merge")
    var i = 0
    while (i < b1.length) {
      // 128-bit += 128-bit
      val lo = b1(i)
      val nlo = lo + b2(i)
      val carry = ((lo & b2(i)) | ((lo | b2(i)) & ~nlo)) >>> 63
      b1(i) = nlo
      b1(i + 1) += b2(i + 1) + carry
      i += 2
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val cells = buf.length / 2
    val out = new Array[Any](cells)
    var i = 0
    while (i < cells) {
      out(i) = Decimal(FixedPoint.dec128(buf(i * 2), buf(i * 2 + 1), 12),
        38, 12)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramUpperAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Per-dimension 128-bit sums of unscaled-micros vectors — the
  * k-means mean-update reduction (Σ x_j per cluster) in one pass.
  * Output: array<decimal(38,6)> (same values as `sum(x_dec)` per
  * dimension).
  */
case class LongVecSumAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "long_vec_sum_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 6), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) return buf
    val xu = a.asInstanceOf[ArrayData]
    val d = xu.numElements()
    val b =
      if (buf.length == 0) new Array[Long](d * 2)
      else {
        require(buf.length == d * 2, "long_vec_sum_agg: dim mismatch")
        buf
      }
    var j = 0
    while (j < d) {
      FixedPoint.add128(b, j * 2, xu.getLong(j))
      j += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length, "long_vec_sum_agg: dim mismatch in merge")
    var i = 0
    while (i < b1.length) {
      val lo = b1(i)
      val nlo = lo + b2(i)
      val carry = ((lo & b2(i)) | ((lo | b2(i)) & ~nlo)) >>> 63
      b1(i) = nlo
      b1(i + 1) += b2(i + 1) + carry
      i += 2
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val d = buf.length / 2
    val out = new Array[Any](d)
    var j = 0
    while (j < d) {
      out(j) = Decimal(FixedPoint.dec128(buf(j * 2), buf(j * 2 + 1), 6),
        38, 6)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
