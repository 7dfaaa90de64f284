package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov statistic, per group vs the
  * rest of the corpus — the distribution-shape complement of the PSI
  * monitor (q155): PSI needs binning and a reference quantile frame;
  * KS is binning-free, sensitive anywhere the CDFs separate, and the
  * standard "did this source's length/quality distribution drift"
  * gate (Massey 1951; the per-feature drift check in evidently-style
  * monitors).
  *
  * Exactness: D = sup_v |F_s(v) − F_rest(v)| is computed WITHOUT any
  * per-row division — the numerator
  * |cum_s·n_rest − cum_rest·n_s| is integer, carried in
  * DECIMAL(38,0) (cum ≤ N, so the product is ≤ N², within 38 digits
  * up to N = 10¹⁹ rows), and only the final per-group maximum pays
  * one pinned double division by n_s·n_rest, rounded to 6. Both
  * engines agree bit-exactly on every intermediate.
  *
  * Scale shape: one (group, value) count exchange over the scan; the
  * distinct-VALUE table is domain-bounded (every later frame is
  * value-domain × groups, never corpus rows). The only unpartitioned
  * window (`cumtot`) runs over that domain-bounded value table — the
  * same bounded-frame discipline as the suffix-array offset table;
  * the per-group cumulative sums are windows partitioned by group.
  * The grid is a broadcast cross of the value table with the
  * group-cardinality frame (config/domain-bounded both sides).
  */
object KsDrift {

  /** Per-group two-sample KS of `valueCol` (integral) against the
    * rest of the corpus. Output: (groupCol, n_grp, ks, at_value) —
    * `at_value` the smallest value attaining the supremum.
    */
  def perGroupKs(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val d38 = "decimal(38,0)"
    val c = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    // domain-bounded distinct-value table with the global CDF counts
    val pv = c.groupBy(col("v")).agg(sum(col("c")).as("ctot"))
      .withColumn("cumtot",
        sum(col("ctot")).over(Window.orderBy(col("v"))))
    // group-cardinality frame: n_grp and the complement n_rest
    val s = c.groupBy(col(groupCol)).agg(sum(col("c")).as("n_grp"))
      .withColumn("n_rest",
        sum(col("n_grp")).over(Window.partitionBy()) - col("n_grp"))
    val grid = pv.crossJoin(broadcast(s))
      .join(c, Seq(groupCol, "v"), "left")
      .withColumn("cum_grp",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy(groupCol).orderBy(col("v"))))
      .withColumn("d_num",
        abs(col("cum_grp").cast(d38) * col("n_rest").cast(d38) -
          (col("cumtot") - col("cum_grp")).cast(d38) *
            col("n_grp").cast(d38)))
    val dmax = grid.groupBy(col(groupCol), col("n_grp"), col("n_rest"))
      .agg(max(col("d_num")).as("d_max"))
    dmax.join(grid.select(col(groupCol), col("v"),
          col("d_num").as("d_max")),
        Seq(groupCol, "d_max"))
      .groupBy(col(groupCol), col("n_grp"), col("n_rest"), col("d_max"))
      .agg(min(col("v")).as("at_value"))
      .select(col(groupCol), col("n_grp"),
        round(col("d_max").cast("double") /
          (col("n_grp").cast(d38) * col("n_rest").cast(d38))
            .cast("double"), 6).as("ks"),
        col("at_value"))
  }
}
