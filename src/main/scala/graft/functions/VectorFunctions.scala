package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.expr.{VecDot, VecQuantize}

/** Dense-vector column functions over `array<float>` embeddings.
  * The hot inner product is a custom codegen'd expression (VecDot);
  * everything composes from it. Accumulation is in DOUBLE,
  * left-to-right — deterministic for a given array.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — inner product, double accumulation (codegen'd loop). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖). For pairwise joins prefer
    * precomputing each side's norm once (`cosineWithNorms`) — norms
    * recomputed per PAIR dominate all-pairs similarity cost.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** cos from precomputed norms: dot(a,b) / (na·nb). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Symmetric int8 quantization: round(x·127/max|x|) per element as
    * array<tinyint> (codegen'd two-pass loop; all zeros for a zero
    * vector). 4× smaller than float on the scan — the storage/IO
    * trade behind the quantized ANN candidate path. No scale is
    * emitted: cosine over quantized vectors is scale-invariant.
    */
  def quantizeInt8(a: Column): Column =
    GraftSqlBridge.column(VecQuantize(GraftSqlBridge.expression(a)))

  /** Sign bucket of `a` against a fixed hyperplane (literal vector):
    * 1 if a·h ≥ 0 else 0. Building block for random-hyperplane LSH.
    */
  def hyperplaneBit(a: Column, plane: Seq[Double]): Column =
    when(dot(a, typedlit(plane)) >= 0, lit(1L)).otherwise(lit(0L))

  /** Pack sign bits against `planes` into one long bucket id. */
  def hyperplaneBucket(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      hyperplaneBit(a, p) * lit(1L << i)
    }.reduce(_ + _)
}
