package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Drift monitoring (q155's PSI) split into its production faces:
  * a reference model FIT once offline (decile edges over the
  * reference slice's score distribution) and a counting face that
  * runs over a static frame OR an ingest stream — per-bin counts are
  * an ordinary keyed aggregation, which in Structured Streaming is a
  * stateful agg whose state is the 10-row bin frame (the CMS/HLL
  * argument: monitoring state must be sketch-sized, never
  * corpus-sized). StreamingSpec proves the streamed counts equal the
  * batch monitor's bin counts exactly.
  */
object Drift {

  /** Reference decile edges (9 values, 6-decimal rounded — the q79
    * percentile discipline) of `scoreCol` over `ref`.
    */
  def fitEdges(ref: DataFrame, scoreCol: String): Seq[Double] = {
    val row = ref.agg(
      round(expr(s"percentile($scoreCol, 0.1)"), 6).as("e1"),
      (2 to 9).map(i =>
        round(expr(s"percentile($scoreCol, 0.$i)"), 6).as(s"e$i")): _*)
      .head
    require(!row.isNullAt(0),
      s"empty reference slice: percentile($scoreCol) is null — " +
        "fit the drift edges on a non-empty reference frame")
    (0 until 9).map(row.getDouble)
  }

  /** Bin 1..10 of a score under fitted `edges` — the same
    * (score >= edge) fold the batch monitor uses, as literals.
    */
  def binCol(edges: Seq[Double], score: Column): Column = {
    require(edges.length == 9, s"need 9 decile edges, got ${edges.length}")
    edges.map(e => when(score >= e, 1).otherwise(0)).reduce(_ + _) + 1
  }

  /** Per-bin arriving counts of `scoreCol` under the fitted edges —
    * runs unchanged on a static frame and on a stream (complete-mode
    * stateful aggregation, state = 10 rows).
    */
  def binCounts(docs: DataFrame, scoreCol: String,
      edges: Seq[Double]): DataFrame =
    docs.groupBy(binCol(edges, col(scoreCol)).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** The alerting face: total PSI of arriving bin counts against the
    * fitted reference counts — the q155 Laplace-smoothed per-term
    * arithmetic (round-6 shares, round-4 ln) folded to one scalar.
    * Inputs are the two 10-row count maps (exactly the streaming
    * monitor's state), so the drift decision is O(bins) driver-side
    * work on the complete-mode output table; the conventional
    * fire threshold is 0.25 ("significant shift"), 0.1 "watch".
    */
  def psiValue(nRef: Map[Int, Long], nNew: Map[Int, Long]): Double = {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tRef = nRef.values.sum
    val tNew = nNew.values.sum
    require(tRef > 0, "empty reference counts")
    require(tNew > 0, "empty arriving counts")
    (1 to 10).map { b =>
      val pr = r((nRef.getOrElse(b, 0L) + 1).toDouble / (tRef + 10), 6)
      val pn = r((nNew.getOrElse(b, 0L) + 1).toDouble / (tNew + 10), 6)
      r((pn - pr) * r(math.log(pn / pr), 4), 6)
    }.sum
  }

  /** Rolling PSI across consecutive tumbling windows from a
    * (win, bin, c) count table — the shared tail of q185 and its
    * streaming face ([[graft.streaming.Streams.windowedBinCountsStream]]
    * emits exactly this table shape as windows close). Each window's
    * Laplace-smoothed bin shares are scored against the PREVIOUS
    * window's over the fixed `nBins` bin frame; the first window has
    * no predecessor and is dropped. All frames here are
    * domain-bounded: the spine is |windows| × nBins rows, the lag
    * window partitions by bin (nBins partitions over |windows| rows
    * each), and the per-term product goes DECIMAL before the
    * per-window sum so the result is exact and order-free.
    */
  def rollingPsi(counts: DataFrame, nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = counts.sparkSession
    // fresh aliases on every rejoined side: the spine is derived FROM
    // `counts`, so joining the original attributes back would ship
    // conflicting expression ids (fatal when the input is a sink
    // table whose lineage Spark can't auto-dedup)
    val byBin = counts.select(col("win").as("_cw"), col("bin").as("_cb"),
      col("c"))
    val tot = counts.groupBy(col("win")).agg(sum(col("c")).as("t"))
      .select(col("win").as("_tw"), col("t"))
    val wb = Window.partitionBy(col("bin")).orderBy(col("win"))
    val spine = counts.select(col("win")).distinct()
      .crossJoin(broadcast(
        s.range(1, nBins + 1).select(col("id").cast("int").as("bin"))))
    spine
      .join(byBin, col("win") === col("_cw") && col("bin") === col("_cb"),
        "left")
      .join(tot, col("win") === col("_tw"))
      .select(col("win"), col("bin"),
        round((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("t") + nBins).cast("double"), 6).as("p"))
      .withColumn("p_prev", lag(col("p"), 1).over(wb))
      .filter(col("p_prev").isNotNull)
      .select(col("win"), col("bin"),
        round((col("p") - col("p_prev")) *
          round(log(col("p") / col("p_prev")), 4), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy(col("win"))
      .agg(sum(col("term")).as("psi0"), count(lit(1)).as("n_bins"))
      .select(col("win").as("win_ms"), col("n_bins"),
        col("psi0").cast("double").as("psi"))
  }
}
