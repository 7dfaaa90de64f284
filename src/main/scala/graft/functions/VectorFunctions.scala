package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embeddings,
  * expressed with higher-order functions (`zip_with`/`aggregate`) so
  * they run inside the row pipeline with no UDF/serialization cost.
  * Accumulation is in DOUBLE, left-to-right — deterministic for a
  * given array.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — inner product, double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

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
