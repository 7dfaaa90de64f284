package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF escape hatch (SURVEY §2.3): when an aggregation has no
  * built-in/rewritable form, an `Aggregator[IN, BUF, OUT]` still gets
  * partial (map-side) combine + merge semantics — the buffer rides
  * the shuffle, never the rows. Register with
  * `org.apache.spark.sql.functions.udaf` for the untyped DataFrame
  * surface, or use `.toColumn` on typed Datasets.
  *
  * These are deliberately small, real examples of the pattern; most
  * aggregation in this engine should stay on native functions (or be
  * rewritten to them by NestAggRewrite), which codegen and vectorize.
  */
object Aggregators {

  final case class WBuf(sum: Double, wsum: Double)

  /** Weighted mean Σwv/Σw (null when all weights are 0). */
  val weightedMean: Aggregator[(Double, Double), WBuf, Option[Double]] =
    new Aggregator[(Double, Double), WBuf, Option[Double]] {
      override def zero: WBuf = WBuf(0.0, 0.0)
      override def reduce(b: WBuf, in: (Double, Double)): WBuf =
        WBuf(b.sum + in._1 * in._2, b.wsum + in._2)
      override def merge(a: WBuf, b: WBuf): WBuf =
        WBuf(a.sum + b.sum, a.wsum + b.wsum)
      override def finish(b: WBuf): Option[Double] =
        if (b.wsum == 0.0) None else Some(b.sum / b.wsum)
      override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
      override def outputEncoder: Encoder[Option[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  final case class TopKBuf(items: Seq[(Double, Long)])

  /** Bounded per-group top-k by (priority desc, id asc): the
    * scale-shaped alternative to a row_number window for per-group
    * caps — a window sorts EVERY row of a group in one task (a hot
    * domain becomes a straggler), while this buffer keeps at most k
    * pairs map-side, so the exchange carries ≤ k·partitions rows per
    * group no matter how skewed the group is. Output ids are in
    * priority order, so `posexplode` recovers the rank.
    */
  def topKByPriority(k: Int): Aggregator[(Double, Long), TopKBuf, Seq[Long]] =
    new Aggregator[(Double, Long), TopKBuf, Seq[Long]] {
      private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
        xs.sortBy(p => (-p._1, p._2)).take(k)
      override def zero: TopKBuf = TopKBuf(Nil)
      override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf =
        TopKBuf(trim(b.items :+ in))
      override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(trim(a.items ++ b.items))
      override def finish(b: TopKBuf): Seq[Long] = b.items.map(_._2)
      override def bufferEncoder: Encoder[TopKBuf] =
        Encoders.product[TopKBuf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  final case class SampleBuf(items: Seq[(Long, Long)])

  /** Deterministic k-sample per group: keep the k ids with the
    * smallest hash (consistent sampling — re-runs and re-partitions
    * pick the SAME sample, unlike a true reservoir). Buffer is
    * bounded at k pairs regardless of group size.
    */
  def consistentSample(k: Int): Aggregator[(Long, Long), SampleBuf, Seq[Long]] =
    new Aggregator[(Long, Long), SampleBuf, Seq[Long]] {
      private def trim(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
        xs.sortBy(p => (p._1, p._2)).take(k)
      override def zero: SampleBuf = SampleBuf(Nil)
      override def reduce(b: SampleBuf, in: (Long, Long)): SampleBuf =
        SampleBuf(trim(b.items :+ in))
      override def merge(a: SampleBuf, b: SampleBuf): SampleBuf =
        SampleBuf(trim(a.items ++ b.items))
      override def finish(b: SampleBuf): Seq[Long] = b.items.map(_._2)
      override def bufferEncoder: Encoder[SampleBuf] =
        Encoders.product[SampleBuf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
