package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH bucket machinery: one shuffle from (band, bucket, m)
  * rows to capped per-bucket member lists.
  *
  * Plan shape (graded for 100 TB): a single groupBy exchange keyed on
  * (band, bucket); each upstream row is computed ONCE (the expensive
  * scan-local signatures are never duplicated across self-join sides —
  * in-bucket pairs are generated AFTER the shuffle by exploding the
  * member list). Oversized buckets (boilerplate-driven) are dropped by
  * a post-aggregation size filter: a pathological bucket spills
  * through sort-based aggregation fallback rather than OOMing, then
  * is discarded.
  *
  * Dropped mass is observed (`Dataset.observe`) as
  * `<metricName>: {dropped_buckets, dropped_rows}` — collected during
  * the normal action with no extra job, surfaced by the
  * QueryExecutionListener registered in graft.Metrics ("no silent
  * caps").
  */
object LshSkew {

  /** `buckets` must have (band, bucket, m) columns; m is the member
    * payload (id, or a small struct). Output: (band, bucket, members).
    */
  def groupCapped(buckets: DataFrame, maxBucketSize: Int,
      metricName: String): DataFrame =
    buckets.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("m")).as("members"))
      .observe(metricName,
        sum(when(size(col("members")) > maxBucketSize, 1L).otherwise(0L))
          .as("dropped_buckets"),
        sum(when(size(col("members")) > maxBucketSize,
          size(col("members")).cast("long")).otherwise(0L))
          .as("dropped_rows"))
      .filter(size(col("members")) <= maxBucketSize)

  /** All unordered in-bucket pairs (m1, m2) with m1.id < m2.id, via
    * double explode of the capped member lists. Callers dedupe after
    * their verification filter (a pair can share several buckets).
    */
  def bucketPairs(capped: DataFrame): DataFrame =
    capped
      .select(explode(col("members")).as("m1"), col("members"))
      .select(col("m1"), explode(col("members")).as("m2"))
      .filter(col("m1.id") < col("m2.id"))
}
