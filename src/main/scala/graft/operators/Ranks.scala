package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking primitives. A bare
  * `Window.orderBy(...)` with no partition key funnels the whole
  * frame through ONE task — fine over a config-bounded side table,
  * a 100 TB incident over corpus rows (the class PlanAuditSpec's
  * global-window audit polices). These helpers give the same global
  * rank as the one-window formulation, decomposed two-level so no
  * task ever sees more than one bucket:
  * reference `Rewriter.py` has no counterpart (the interpreter sorts
  * whole materialized lists in memory); the decomposition is the
  * standard distributed prefix-sum (e.g. Blelloch 1990).
  */
object Ranks {

  /** Global 1-based `row_number` of `df`'s rows over `orderKeys`,
    * two-level via the ORDER-COMPATIBLE `bucket` column (every key in
    * bucket b sorts before every key in bucket b+1): rank = bucket
    * prefix-count offset + in-bucket row_number. The only
    * unpartitioned window rides the bucket-count table, so `bucket`'s
    * cardinality must be bounded by construction (a value-domain
    * decomposition like floor(p*64) over a sigmoid, or the
    * SuffixArray sizing rule) — the caller owns that contract.
    * Ties within `orderKeys` get arbitrary but deterministic-per-plan
    * numbers, exactly as `row_number` over one global window would;
    * pass a tiebreaker key for engine-replayable output.
    */
  def bucketedRowNumber(df: DataFrame, bucket: Column,
      orderKeys: Seq[Column], out: String): DataFrame = {
    val b = df.withColumn("_bk", bucket)
    val local = b.withColumn("_lr",
      row_number().over(
        Window.partitionBy(col("_bk")).orderBy(orderKeys: _*)))
    val counts = b.groupBy(col("_bk")).agg(count(lit(1)).as("_bn"))
    val offs = counts.withColumn("_boff",
        coalesce(sum(col("_bn")).over(
          Window.orderBy(col("_bk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bk"), col("_boff"))
    local.join(broadcast(offs), Seq("_bk"))
      .withColumn(out, col("_boff") + col("_lr"))
      .drop("_bk", "_lr", "_boff")
  }

  /** SQL-standard NTILE(k) bucket of global row number `rn` in a
    * frame of `n` rows (both 1-based long columns): the first
    * n % k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — bit-identical to
    * `ntile(k) OVER (ORDER BY ...)` on Spark and DuckDB, without the
    * single-task global window. Compose with [[bucketedRowNumber]]
    * for rn and a one-row broadcast count frame for n.
    */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong)) // ⌊n/k⌋
    val r = n % lit(k.toLong) // first r tiles get q+1 rows
    val qp1 = q + lit(1L)
    when(rn <= r * qp1, idiv(rn + q, qp1)) // ⌈rn/(q+1)⌉ …
      .otherwise(r + idiv(rn - r * qp1 + q - lit(1L), q)) // … + ⌈rest/q⌉
  }

  /** Exact ⌊a/b⌋ for long columns: the numerator a − a%b is a
    * multiple of b, so the IEEE double division is exact for
    * |values| < 2⁵³ — far beyond any row count this engine sees.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")
}
