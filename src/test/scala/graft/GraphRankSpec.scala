package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphRank

/** PageRank (q126) invariants beyond the hash gate: mass
  * conservation up to the documented floor losses, exact
  * repartition-invariance of the integer steps, and the structural
  * sanity that hubs outrank leaves.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetrized star: hub h connected to n leaves. */
  private def star(n: Int) = {
    val fwd = (1 to n).map(i => ("h", s"l$i"))
    (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
  }

  test("star graph: hub outranks every leaf, leaves tie exactly") {
    val ranks = GraphRank.pageRank(star(5), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hub = ranks("h")
    val leaves = (1 to 5).map(i => ranks(s"l$i"))
    assert(leaves.distinct.size == 1, "symmetric leaves must tie")
    assert(hub > leaves.head * 2,
      s"hub $hub should dominate leaf ${leaves.head}")
  }

  test("rank mass is conserved up to floor losses (< 1 micro per edge " +
      "per step)") {
    val edges = star(8)
    val n = 9L
    val total = GraphRank.pageRank(edges, iters = 5)
      .agg(sum("rank_m")).as[Long].head()
    // exact mass would be n*1e6; each of 5 steps loses < outdeg micros
    // per node to floor division plus < 1 to the damping division
    assert(total <= n * 1000000L)
    assert(total > n * 1000000L - 5 * (16 + n), s"total=$total")
  }

  test("integer steps are exactly repartition-invariant") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
    val fwd = ev.select(concat(lit("u"), col("user_id")).as("src"),
      concat(lit("i"), col("k")).as("dst")).distinct()
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val a = GraphRank.pageRank(edges, iters = 3)
    val b = GraphRank.pageRank(edges.repartition(7, col("dst")), iters = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
