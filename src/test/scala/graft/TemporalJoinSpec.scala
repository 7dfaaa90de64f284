package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TemporalJoins

/** Temporal joins vs brute-force semantics on random data, edge cases
  * (ties, tolerance boundaries, empty right), and the plan guarantee
  * that motivates them: no nested-loop/cartesian node.
  */
class TemporalJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // deterministic random instances
  private def rows(seed: Long, n: Int, keys: Int, tsMax: Long): Seq[(Long, Long, Double)] = {
    val g = Gen.listOfN(n, for {
      k <- Gen.choose(0L, keys - 1L)
      t <- Gen.choose(0L, tsMax)
      v <- Gen.choose(0, 1000000)
    } yield (k, t, v / 100.0))
    g.apply(Gen.Parameters.default, Seed(seed)).get
  }

  private def bruteAsof(
      left: Seq[(Long, Long, Double)],
      right: Seq[(Long, Long, Double)],
      tol: Option[Long]): Seq[(Long, Long, Option[Double])] =
    left.map { case (k, t, _) =>
      val best = right.filter(r => r._1 == k && r._2 <= t &&
          tol.forall(w => t - r._2 <= w))
        .sortBy(_._2).lastOption
      (k, t, best.map(_._3))
    }

  test("as-of join matches brute force on random data (with and without tolerance)") {
    for (seed <- 1L to 3L; tol <- Seq(None, Some(40L))) {
      // de-dup right per (key, ts): operator requirement
      val l = rows(seed, 300, 12, 200L)
      val r = rows(seed + 100, 200, 12, 200L)
        .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val lDf = l.toDF("k", "ms", "x")
      val rDf = r.toDF("k", "ms", "v")
      val got = TemporalJoins.asofBackward(lDf, rDf, Seq("k"), "ms", tol)
        .select("k", "ms", "v").as[(Long, Long, Option[Double])]
        .collect().sorted
      val want = bruteAsof(l, r, tol)
        .map { case (k, t, v) => (k, t, v) }.sorted
      assert(got.toSeq == want, s"seed=$seed tol=$tol")
    }
  }

  test("as-of join: equal timestamps match inclusively, tolerance boundary is inclusive") {
    val l = Seq((1L, 100L, 0.0), (1L, 99L, 0.0)).toDF("k", "ms", "x")
    val r = Seq((1L, 100L, 7.0)).toDF("k", "ms", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "ms", None)
      .select("ms", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(7.0) && got(99L).isEmpty)
    val tolGot = TemporalJoins.asofBackward(
        Seq((1L, 150L, 0.0), (1L, 151L, 0.0)).toDF("k", "ms", "x"),
        r, Seq("k"), "ms", Some(50L))
      .select("ms", "v").as[(Long, Option[Double])].collect().toMap
    assert(tolGot(150L).contains(7.0) && tolGot(151L).isEmpty)
  }

  private def bruteAsofFwd(
      left: Seq[(Long, Long, Double)],
      right: Seq[(Long, Long, Double)],
      tol: Option[Long]): Seq[(Long, Long, Option[Double])] =
    left.map { case (k, t, _) =>
      val best = right.filter(r => r._1 == k && r._2 >= t &&
          tol.forall(w => r._2 - t <= w))
        .sortBy(_._2).headOption
      (k, t, best.map(_._3))
    }

  test("forward as-of join matches brute force on random data") {
    for (seed <- 4L to 6L; tol <- Seq(None, Some(40L))) {
      val l = rows(seed, 300, 12, 200L)
      val r = rows(seed + 100, 200, 12, 200L)
        .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val got = TemporalJoins.asofForward(
          l.toDF("k", "ms", "x"), r.toDF("k", "ms", "v"), Seq("k"), "ms", tol)
        .select("k", "ms", "v").as[(Long, Long, Option[Double])]
        .collect().sorted
      assert(got.toSeq == bruteAsofFwd(l, r, tol).sorted, s"seed=$seed tol=$tol")
    }
  }

  test("forward as-of join: equal ts matches inclusively, earlier rows don't") {
    val l = Seq((1L, 100L, 0.0), (1L, 101L, 0.0)).toDF("k", "ms", "x")
    val r = Seq((1L, 100L, 7.0)).toDF("k", "ms", "v")
    val got = TemporalJoins.asofForward(l, r, Seq("k"), "ms", None)
      .select("ms", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(7.0) && got(101L).isEmpty)
  }

  test("as-of join: composite keys partition independently; duplicate " +
      "left rows each carry") {
    val l = Seq(
      (1L, "a", 10L, 1.0), (1L, "a", 10L, 2.0), // duplicate (key, ts)
      (1L, "b", 10L, 3.0), (2L, "a", 10L, 4.0))
      .toDF("k1", "k2", "ms", "x")
    val r = Seq(
      (1L, "a", 5L, 100.0), (1L, "b", 7L, 200.0), (2L, "a", 9L, 300.0))
      .toDF("k1", "k2", "ms", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k1", "k2"), "ms", None)
      .select("k1", "k2", "x", "v")
      .as[(Long, String, Double, Option[Double])].collect().sorted.toSeq
    assert(got == Seq(
      (1L, "a", 1.0, Some(100.0)), (1L, "a", 2.0, Some(100.0)),
      (1L, "b", 3.0, Some(200.0)), (2L, "a", 4.0, Some(300.0))))
  }

  test("as-of join: empty right side yields all-null carries") {
    val l = Seq((1L, 10L, 1.0)).toDF("k", "ms", "x")
    val r = Seq.empty[(Long, Long, Double)].toDF("k", "ms", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "ms", None)
    assert(got.count() == 1 && got.filter(col("v").isNull).count() == 1)
  }

  test("banded range join matches the naive predicate join") {
    for (seed <- 10L to 12L) {
      val l = rows(seed, 250, 8, 500L).zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
      val r = rows(seed + 7, 250, 8, 500L).zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
      val lDf = l.toDF("lid", "k", "lms")
      val rDf = r.toDF("rid", "k", "rms")
      val w = 35L
      val got = TemporalJoins.bandedTimeJoin(lDf, rDf, Seq("k"), "lms", "rms", w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted
      val want = (for {
        (li, lk, lt) <- l; (ri, rk, rt) <- r
        if lk == rk && math.abs(lt - rt) <= w
      } yield (li, ri)).sorted
      assert(got.toSeq == want, s"seed=$seed")
    }
  }

  test("neither temporal join plans a nested loop or cartesian product") {
    val l = rows(1L, 100, 5, 100L).toDF("k", "ms", "x")
    val r = rows(2L, 100, 5, 100L)
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq.toDF("k", "ms", "v")
    val r2 = r.withColumnRenamed("ms", "rms").withColumnRenamed("v", "rv")
    def badNodes(p: SparkPlan): Seq[String] =
      collect(p) {
        case n if n.nodeName.contains("NestedLoop") ||
          n.nodeName.contains("Cartesian") => n.nodeName
      }
    val asof = TemporalJoins.asofBackward(l, r, Seq("k"), "ms", None)
    val banded = TemporalJoins.bandedTimeJoin(l, r2, Seq("k"), "ms", "rms", 10L)
    asof.collect(); banded.collect()
    assert(badNodes(asof.queryExecution.executedPlan).isEmpty)
    assert(badNodes(banded.queryExecution.executedPlan).isEmpty)
  }
}
