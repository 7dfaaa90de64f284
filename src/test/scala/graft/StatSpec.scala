package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Diversity, KsDrift, Triangles}
import graft.queries.StatQueries

/** Semantic invariants for the round-10 statistics battery: the KS
  * drift monitor FIRES on a planted shift (the q155 planted-drift
  * discipline) and matches a hand-computed small case; the triangle
  * counter tells a clique from a star; the centroid-identity
  * diversity hits the three analytic anchors (identical / orthogonal
  * / antipodal vectors); a planted 1/r corpus fits a Zipf slope
  * of −1.
  */
class StatSpec extends SparkSpec {

  import spark.implicits._

  test("KS matches the hand-computed two-sample case") {
    // A = {1,1,2}, B = {2,3}: sup|F_A − F_B| = |2/3 − 0| at v=1
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("grp", "v")
    val out = KsDrift.perGroupKs(df, "grp", "v")
      .orderBy("grp").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getLong(3))).toSeq ==
      Seq(("A", 3L, 0.666667, 1L), ("B", 2L, 0.666667, 1L)))
  }

  test("KS fires at 1.0 on disjoint supports and stays low on " +
      "identical distributions") {
    // two identically-distributed groups + a SMALL fully-shifted one:
    // the shifted group's KS vs rest is exactly 1.0 (disjoint
    // supports); an undrifted group sees only the shifted mass inside
    // its complement — 10/110 ≈ 0.09
    val base = (1 to 100).map(i => ("same1", (i % 10).toLong)) ++
      (1 to 100).map(i => ("same2", (i % 10).toLong)) ++
      (1 to 10).map(i => ("shifted", 100L + (i % 10)))
    val out = KsDrift.perGroupKs(base.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("shifted") == 1.0, s"planted drift must fire: $out")
    assert(out("same1") < 0.1 && out("same2") < 0.1,
      s"undrifted groups must stay low: $out")
  }

  test("triangles tell a clique from a star of equal edge count") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), // clique on {1,2,3}
      (10L, 11L), (10L, 12L), (10L, 13L)) // star at 10
      .toDF("a", "b")
    val rows = Triangles.perNode(edges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for (n <- Seq(1L, 2L, 3L))
      assert(rows(n) == ((2L, 1L, 1.0)), s"clique node $n: ${rows(n)}")
    assert(rows(10L) == ((3L, 0L, 0.0)), s"star hub: ${rows(10L)}")
    for (n <- Seq(11L, 12L, 13L))
      assert(rows(n) == ((1L, 0L, 0.0)), s"star leaf $n: ${rows(n)}")
  }

  test("diversity hits the analytic anchors") {
    def v(xs: Float*): Array[Float] = xs.toArray
    val emb = Seq(
      (0, v(1f, 0f)), (0, v(1f, 0f)),   // identical → 1.0
      (1, v(1f, 0f)), (1, v(0f, 1f)),   // orthogonal → 0.0
      (2, v(1f, 0f)), (2, v(-1f, 0f)),  // antipodal → −1.0
      (3, v(1f, 1f))                    // singleton → NULL
    ).toDF("label", "embedding")
    val out = Diversity.meanPairwiseCosine(emb, "label", "embedding")
      .orderBy("label").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 2L), (1, 2L), (2, 2L), (3, 1L)))
    assert(out(0).getDouble(2) == 1.0 && out(1).getDouble(2) == 0.0 &&
      out(2).getDouble(2) == -1.0)
    assert(out(3).isNullAt(2), "singleton group has no pairs")
  }

  test("a planted 1/r corpus fits Zipf slope ≈ −1") {
    // token w_r appears max(1, 1000/r) times, r = 1..100
    val docs = (1 to 100).map { r =>
      val k = math.max(1, 1000 / r)
      (r.toLong, Seq.fill(k)(f"w$r%03d").mkString(" "))
    }.toDF("doc_id", "text")
    val top = graft.operators.CorpusOps.topNgrams(docs, "text",
      n = 1, k = 100)
    val Row(n: Long, slope: Double, intercept: Double) =
      StatQueries.zipfFit(top).head()
    assert(n == 100L)
    assert(math.abs(slope + 1.0) < 0.05,
      s"planted 1/r corpus must fit slope ≈ −1, got $slope")
    assert(math.abs(intercept - math.log(1000.0)) < 0.2,
      s"intercept ≈ ln 1000, got $intercept")
  }
}
