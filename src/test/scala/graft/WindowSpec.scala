package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.windows.XQueryWindows
import graft.windows.XQueryWindows.Item

/** XQuery-window clause: ports of the reference tutorial q11–q13
  * (`tests/tutorial_tests.py:104-138`) + ScalaCheck-generated
  * invariants (tumbling no-overlap, window contiguity, `only end`
  * drops exactly the open tails).
  */
object WindowSpecFns {
  def v(it: Item): Int = it.row.getAs[Int]("v")
}

class WindowSpec extends SparkSpec {
  import spark.implicits._
  import WindowSpecFns.v

  private def run(xs: Seq[Int],
      start: Item => Boolean, end: (Item, Item) => Boolean,
      tumbling: Boolean = false, onlyEnd: Boolean = false): Seq[Row] =
    XQueryWindows.windows(xs.toDF("v"), Nil, Seq("v" /* unused order */),
      start, end, tumbling, onlyEnd, allowSinglePartition = true)
      .collect().toSeq.sortBy(_.getAs[Long]("s_idx"))

  // NB: orderCols only sorts within the single partition; for these
  // ports we pass the list pre-ordered and sort by a constant-safe col.
  private def runOrdered(xs: Seq[Int],
      start: Item => Boolean, end: (Item, Item) => Boolean,
      tumbling: Boolean = false, onlyEnd: Boolean = false): Seq[(Long, Long, Seq[Int])] = {
    val df = xs.zipWithIndex.toDF("v", "pos")
    XQueryWindows.windows(df, Nil, Seq("pos"), start, end, tumbling, onlyEnd,
      allowSinglePartition = true)
      .collect().toSeq
      .map(r => (r.getAs[Long]("s_idx"), r.getAs[Long]("e_idx"),
        r.getSeq[Row](r.fieldIndex("window")).toList.map(_.getAs[Int]("v"))))
      .sortBy(_._1)
  }

  test("tutorial q11: sliding, start always, end at index span 2") {
    val res = runOrdered(Seq(1, 2, 3, 4, 5, 6, 7),
      start = _ => true, end = (s, e) => e.index - s.index == 2)
    // closed: [1,2,3],[2,3,4],[3,4,5],[4,5,6],[5,6,7]; tails [6,7],[7]
    assert(res.length == 7)
    assert(res(0)._3.head == 1 && res(0)._3.sum == 6)
    assert(res(1)._3.head == 2 && res(1)._3.sum == 9)
    assert(res(2)._3.head == 3 && res(2)._3.sum == 12)
  }

  test("tutorial q12: value-based start (even) and end (diff > 2)") {
    val res = runOrdered(Seq(1, 2, 3, 4, 5, 6, 7),
      start = it => v(it) % 2 == 0,
      end = (s, e) => v(e) - v(s) > 2)
    assert(res.map(_._3.sum) == Seq(14, 22, 13))
    assert(res.map(_._3.head) == Seq(2, 4, 6))
  }

  test("tutorial q13: only end drops windows open at stream end") {
    val res = runOrdered(Seq(1, 2, 3, 4, 5, 6),
      start = it => v(it) % 2 == 1,
      end = (s, e) => v(e) - v(s) >= 2,
      onlyEnd = true)
    assert(res.length == 2)
    assert(res.map(_._3.head) == Seq(1, 3))
  }

  private def samples(n: Int): Seq[List[Int]] = {
    val g = Gen.chooseNum(1, 25).flatMap(len =>
      Gen.listOfN(len, Gen.chooseNum(-9, 9)))
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("property: tumbling windows never overlap and cover in order") {
    for (xs <- samples(10)) {
      val res = runOrdered(xs, start = it => v(it) % 2 == 0,
        end = (s, e) => e.index - s.index >= 2, tumbling = true)
      val spans = res.map(r => (r._1, r._2))
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 < s2, s"overlap in $xs: $spans")
        case _ =>
      }
      // each window is the contiguous slice [s_idx..e_idx]
      res.foreach { case (s, e, w) =>
        assert(w == xs.slice(s.toInt, e.toInt + 1), s"slice mismatch in $xs")
      }
    }
  }

  test("property: sliding windows are contiguous slices; every start opens") {
    for (xs <- samples(10)) {
      val res = runOrdered(xs, start = it => v(it) > 0,
        end = (s, e) => e.index - s.index >= 1)
      val expectedStarts = xs.zipWithIndex.filter(_._1 > 0).map(_._2.toLong)
      assert(res.map(_._1) == expectedStarts, s"starts mismatch in $xs")
      res.foreach { case (s, e, w) =>
        assert(w == xs.slice(s.toInt, e.toInt + 1))
      }
    }
  }

  test("property: onlyEnd drops exactly the windows still open at end") {
    for (xs <- samples(10)) {
      val all = runOrdered(xs, start = it => v(it) % 3 == 0,
        end = (s, e) => e.index - s.index >= 2)
      val closedOnly = runOrdered(xs, start = it => v(it) % 3 == 0,
        end = (s, e) => e.index - s.index >= 2, onlyEnd = true)
      val last = xs.length - 1L
      // dropped = emitted-at-flush = span that never satisfied end
      val dropped = all.toSet -- closedOnly.toSet
      assert(dropped.forall { case (s, e, _) => e == last && last - s < 2 },
        s"bad drops in $xs: $dropped")
      assert(closedOnly.forall { case (s, e, _) => e - s >= 2 })
    }
  }
}
