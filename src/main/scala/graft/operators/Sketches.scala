package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-friendly frequency/cardinality sketches — Count-Min and
  * HyperLogLog — built from plain aggregations so the ENTIRE sketch
  * content is ANSI-SQL-replayable and therefore hash-gateable, the
  * same exactness bar as the rest of the registry. Spark ships opaque
  * versions of both (`count_min_sketch`, `approx_count_distinct`);
  * the point of these is that at 100 TB a pipeline wants sketch
  * CONTENT it can persist, merge across corpora, and audit — counters
  * and registers as rows — not a binary blob pinned to one engine's
  * serialization. Both collapse to a fixed-size frame (d·w counters /
  * m registers) via map-side partial aggregation: the exchange is the
  * sketch, not the data.
  *
  * Hash discipline: sketches need the actual hash VALUES to agree
  * across engines (bucket indices are `h mod w`, not just grouping
  * keys), so `xxhash64` is out — the shared hash is the first 15 hex
  * chars of `md5` read as a 60-bit integer, identical in Spark
  * (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  * (`CAST('0x'||substr(md5(x),1,15) AS UBIGINT)`). md5 is bytewise
  * identical everywhere; the derivation costs one extra hash pass
  * over DISTINCT items only.
  */
object Sketches {

  /** The cross-engine 60-bit item hash, optionally salted (Count-Min
    * row index). Non-negative, so `% w` needs no pmod dance.
    */
  def h60(item: Column, salt: Option[Column] = None): Column = {
    val keyed = salt match {
      case Some(s) => concat(s.cast("string"), lit(":"), item)
      case None    => item
    }
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("long")
  }

  /** Count-Min counters for weighted items: `(r, b, c)` for every
    * depth row r ∈ [0,d) and bucket b ∈ [0,w) that received weight —
    * `c = Σ weight over items with h60(r:item) ≡ b (mod w)`. The
    * frame is at most d·w rows regardless of input size; partial
    * aggregation collapses each input partition to ≤ d·w cells before
    * the one tiny exchange.
    */
  def countMin(items: DataFrame, itemCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width")
    val rows = items.select(
      col(itemCol).as("_i"), col(weightCol).as("_k"),
      explode(sequence(lit(0), lit(depth - 1))).as("r"))
    rows
      .select(col("r"), (h60(col("_i"), Some(col("r"))) % width).as("b"),
        col("_k"))
      .groupBy("r", "b").agg(sum(col("_k")).as("c"))
  }

  /** Point-estimate the weight of each item in `candidates` from the
    * `counters` frame: `est = min over r of counters(r, h60(r:item) % w)`
    * — the classic CMS upper bound (never underestimates; over-counts
    * only via collisions). `counters` is sketch-sized, so the probe is
    * a broadcast join keyed on (r, b): candidates never shuffle.
    */
  def cmsEstimate(candidates: DataFrame, itemCol: String,
      counters: DataFrame, depth: Int, width: Int): DataFrame = {
    // the counter frame's (r, b, c) and the output's est are reserved
    require(!candidates.columns.exists(Set("r", "b", "c", "est")),
      s"candidate columns clash with the sketch schema: " +
        candidates.columns.mkString(", "))
    val probes = candidates.select(
        col("*"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b", h60(col(itemCol), Some(col("r"))) % width)
    probes
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** HyperLogLog register frame over the distinct values of `itemCol`:
    * `(reg, rmax)` with `reg = h % m` and `rmax` = max over the
    * register's items of the leading-zero rank of the remaining
    * 60−log2(m) hash bits. ≤ m rows; map-side combine collapses each
    * partition to its register maxima before the exchange. Rank uses
    * `length(bin(v))` — exact integer bit-length on both engines — so
    * no float log2 edge cases.
    */
  def hllRegisters(items: DataFrame, itemCol: String, m: Int): DataFrame =
    hllRegistersBy(items, Nil, itemCol, m)

  /** Per-group HLL register frames — the production form (distinct
    * users per page, distinct tokens per source): ≤ m rows PER GROUP,
    * same map-side collapse, mergeable by per-register max within a
    * group.
    */
  def hllRegistersBy(items: DataFrame, groupCols: Seq[String],
      itemCol: String, m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    require(!groupCols.exists(Set("reg", "rho", "rmax")),
      s"group columns clash with the sketch schema: $groupCols")
    val log2m = 63 - java.lang.Long.numberOfLeadingZeros(m.toLong)
    val valBits = 60 - log2m
    val h = h60(col(itemCol))
    items
      .select(groupCols.map(col) ++ Seq(
        h.bitwiseAND(lit((m - 1).toLong)).as("reg"),
        shiftright(h, log2m).as("v")): _*)
      .select(groupCols.map(col) ++ Seq(col("reg"),
        when(col("v") === 0, lit(valBits + 1))
          .otherwise(lit(valBits + 1) - length(bin(col("v")))).as("rho")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rmax"))
  }

  /** Log₂-binned histogram sketch over a positive-integer column —
    * the deterministic, mergeable quantile summary completing the
    * sketch trio (CMS = frequency, HLL = cardinality, this =
    * quantiles). Each value lands in bin `floor(log2(v))` (bit-length
    * − 1, exact integer — no float log edge cases); the per-group
    * frame is ≤ 64 rows, merges by adding counts, and runs unchanged
    * as a streaming aggregation. Quantile estimates from the sketch
    * carry a guaranteed 2× value-error bound (the bin width) — the
    * trade a 100 TB profile pass makes to avoid a global sort.
    * Non-positive values are clamped to bin 0 with the value-1 floor.
    */
  def logBins(items: DataFrame, groupCols: Seq[String], valueCol: String)
      : DataFrame = {
    require(!groupCols.exists(Set("bin", "c")),
      s"group columns clash with the sketch schema: $groupCols")
    items
      .select((groupCols.map(col) :+
        (length(bin(greatest(col(valueCol).cast("long"), lit(1L)))) - 1)
          .cast("long").as("bin")): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Per-group quantile estimates from a `logBins` frame: for each
    * requested quantile q, the SMALLEST bin whose cumulative count
    * reaches `ceil(q·n/1000)` (the rank semantics of
    * `percentile_disc`), reported as the bin's lower bound `2^bin` —
    * a deterministic rule both engines replay exactly. `quantiles`
    * are permilles (500 = median); the rank test is the pure-integer
    * equivalence `cum·1000 ≥ q·n`, so no division ever happens.
    * Output is wide — one `p<q>_lower` column per quantile — from a
    * single conditional-min aggregation over the ≤64-row-per-group
    * frame: no join, no explode.
    */
  def logBinQuantiles(bins: DataFrame, groupCols: Seq[String],
      quantiles: Seq[Int]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1000),
      s"permille quantiles in (0, 1000]: $quantiles")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bin"))
    val cum = bins
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val aggs = quantiles.map { q =>
      min(when(col("cum") * lit(1000L) >= col("n") * lit(q.toLong),
        col("bin"))).as(s"_qb$q")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((groupCols.map(col) ++ quantiles.map(q =>
        pow(lit(2.0), col(s"_qb$q")).cast("long").as(s"p${q}_lower"))): _*)
  }

  /** The HLL cardinality estimate from a register frame: one row
    * `(registers_used, v0, est)`. Exact-integer inner sum
    * `S = Σ 2^(valBits+1−rmax)` (empty registers contribute
    * 2^(valBits+1)), then the standard bias-corrected estimate with
    * linear-counting small-range correction; the two double steps
    * (division, ln) are rounded to 4 decimals — the q71 cross-engine
    * discipline.
    */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame =
    hllEstimateBy(registers, Nil, m)

  /** Grouped form of `hllEstimate`: one `(groupCols…, registers_used,
    * v0, est)` row per group from a `hllRegistersBy` frame. Same
    * arithmetic, grouped.
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String], m: Int)
      : DataFrame = {
    val valBits = 60 - (63 - java.lang.Long.numberOfLeadingZeros(m.toLong))
    val top = valBits + 1
    val g = groupCols.map(col)
    registers
      .groupBy(g: _*)
      .agg(count(lit(1)).as("registers_used"),
        sum(pow(lit(2.0), lit(top) - col("rmax")).cast("long")).as("s_used"))
      .select(g ++ Seq(col("registers_used"),
        (lit(m) - col("registers_used")).as("v0"),
        (col("s_used") +
          (lit(m) - col("registers_used")) *
            pow(lit(2.0), lit(top)).cast("long")).as("s")): _*)
      .select(g ++ Seq(col("registers_used"), col("v0"),
        round((lit(0.7213 / (1.0 + 1.079 / m)) * m * m) *
          pow(lit(2.0), lit(top)) / col("s"), 4).as("raw")): _*)
      .select(g ++ Seq(col("registers_used"), col("v0"),
        when(col("raw") <= lit(2.5 * m) && col("v0") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("v0")), 4))
          .otherwise(col("raw")).as("est")): _*)
  }
}
