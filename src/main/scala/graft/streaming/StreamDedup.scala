package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.SimHashDedup

/** Streaming near-duplicate detection — the incremental dual of
  * `SimHashDedup.nearDuplicatePairs`: fingerprints are computed
  * scan-local on each micro-batch (same codegen'd expressions as the
  * batch operator), band buckets explode statelessly, and per-bucket
  * state in `flatMapGroupsWithState` holds the (id, fingerprint)
  * members seen so far — 16 bytes per doc per band, the same exchange
  * payload discipline as the batch plan. A new arrival is verified
  * (`Long.bitCount`) against its bucket's members and emits its
  * near-dup pairs immediately, so a duplicate of a document ingested
  * hours ago is caught in the batch it arrives in.
  *
  * Deltas from the batch operator (documented, not silent):
  *   - a pair colliding in several bands emits once PER band
  *     (at-least-once; the batch operator dedupes with `distinct()` —
  *     downstream streaming dedup can use dropDuplicatesWithinWatermark
  *     on (doc_a, doc_b));
  *   - bucket state is capped at `maxBucketSize` members (hot
  *     boilerplate buckets): later members of a full bucket are
  *     checked against the stored members but not added — the
  *     streaming analog of LshSkew's cap;
  *   - with `evictAfter` set (requires an upstream watermark +
  *     `eventTimeOf`), a bucket idle past the TTL drops its state —
  *     dedup scope becomes "within the TTL horizon", which is what an
  *     unbounded stream can afford (same contract as
  *     `Streams.dedupExactStream`).
  */
object StreamDedup {

  final case class DocFp(band: Int, bucket: Long, id: Long, fp: Long,
      et: Long, ts: java.sql.Timestamp)
  final case class BucketState(members: List[(Long, Long)])
  final case class PairHit(doc_a: Long, doc_b: Long, hamming: Int, band: Int)

  /** `docs` needs (doc_id, text[, ts]); ts (timestamp) is required
    * only with `evictAfter`.
    */
  def simhashPairsStream(docs: DataFrame, maxHamming: Int = 8,
      maxBucketSize: Int = 1000, portable: Boolean = true,
      evictAfter: Option[Long] = None): Dataset[PairHit] = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    val numBands = maxHamming + 1
    val bounds = (0 to numBands).map(j => j * 64 / numBands)
    val fp = docs
      .withColumn("_bits", SimHashDedup.simhashBits("text", portable))
      .withColumn("fp", SimHashDedup.packBits("_bits")).drop("_bits")
    val bandBuckets = array((0 until numBands).map { j =>
      val width = bounds(j + 1) - bounds(j)
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(j).as("band"),
        expr(s"shiftrightunsigned(fp, ${64 - bounds(j + 1)})")
          .bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
    // the WATERMARKED ts column must survive into the operator input:
    // EventTimeTimeout is rejected at analysis without it, and its
    // presence lets FlatMapGroupsWithStateExec drop late rows before
    // they reach the function (a derived unix_millis long carries no
    // event-time metadata and would get neither)
    val (et, tsCol) =
      if (evictAfter.isDefined) (unix_millis(col("ts")), col("ts"))
      else (lit(0L), lit(null).cast("timestamp"))
    implicit val inEnc = Encoders.product[DocFp]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[PairHit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val exploded = fp.select(explode(bandBuckets).as("bb"),
        col("doc_id").as("id"), col("fp"), et.as("et"), tsCol.as("ts"))
      .select(col("bb.band"), col("bb.bucket"), col("id"), col("fp"),
        col("et"), col("ts"))
      .as[DocFp]
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    exploded.groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, PairHit](
        OutputMode.Append(), timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.getOrElse(BucketState(Nil)).members
            val out = scala.collection.mutable.ListBuffer[PairHit]()
            var maxEt = Long.MinValue
            rows.foreach { d =>
              maxEt = math.max(maxEt, d.et)
              members.foreach { case (mid, mfp) =>
                if (mid != d.id) {
                  val h = java.lang.Long.bitCount(mfp ^ d.fp)
                  if (h <= maxHamming) {
                    val (a, b) = if (mid < d.id) (mid, d.id) else (d.id, mid)
                    out += PairHit(a, b, h, key._1)
                  }
                }
              }
              if (members.length < maxBucketSize)
                members = (d.id, d.fp) :: members
            }
            state.update(BucketState(members))
            evictAfter.foreach { ttl =>
              // et is a derived long (no event-time metadata), so late
              // rows DO reach this function; a batch of only-late rows
              // would make maxEt + ttl <= watermark and
              // setTimeoutTimestamp would throw — clamp to just past
              // the current watermark
              if (maxEt > Long.MinValue) state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, maxEt + ttl))
            }
            out.iterator
          }
      }
  }
}
