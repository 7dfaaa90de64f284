package graft

import org.apache.spark.sql.functions._

import graft.operators.{SpanDedup, Winnowing}

/** Substring-granularity dedup (q103–q105): duplicated-span merging
  * against hand-computed expectations, and the winnowing selection
  * differentially tested against an INDEPENDENT driver-side
  * implementation (MatchFuzzSpec pattern) plus the winnowing
  * guarantee (any shared run of >= w+k-1 tokens yields a shared
  * fingerprint).
  */
class SpanSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  // ---- independent reference winnowing (plain Scala, no Spark) ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Naive O(n·w) robust winnowing over a token list: k-gram md5s,
    * per-window min, rightmost tie-break, dedup. Returns (pos, fp)
    * with 1-based gram positions.
    */
  private def refWinnow(tokens: Seq[String], k: Int, w: Int): Set[(Long, String)] = {
    val hs = tokens.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
    if (hs.length < w) Set.empty
    else (w to hs.length).map { j =>
      val win = (j - w until j).map(p => (hs(p), p + 1))
      // rightmost argmin: minBy keeps the FIRST minimum, so scan
      // reversed — an intentionally different route than the fold
      // under test
      val m = win.reverse.minBy(_._1)
      (m._2.toLong, m._1)
    }.toSet
  }

  test("q103: shared runs merge into maximal spans with exact bounds") {
    // doc 1 and 2 share tokens 3..12 (1-based, 10 tokens = 3 windows
    // of 8); doc 3 is disjoint filler with no duplicated window
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared a13 a14"),
      (2L, s"b1 b2 $shared b13 b14"),
      (3L, (0 until 20).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(docs, "doc_id", "text", 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // windows fully inside the shared run start at token 3,4,5 →
    // span tokens 3..12, n_windows 3, for both docs
    assert(got.toSeq == Seq((1L, 3L, 12L, 3L), (2L, 3L, 12L, 3L)))
  }

  test("q103: an intra-doc repeat alone counts as duplicated") {
    val run = (0 until 8).map(i => s"r$i").mkString(" ")
    val docs = Seq((7L, s"$run x1 x2 x3 $run")).toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 1L, 8L, 1L), (7L, 12L, 19L, 1L)))
  }

  test("winnowing selection matches the independent reference on a seeded corpus") {
    val rnd = new scala.util.Random(20260813L)
    // small alphabet forces hash ties, exercising the tie-break
    val docs = (1L to 40L).map { id =>
      val n = K + W - 1 + rnd.nextInt(60)
      (id, Seq.fill(n)("t" + rnd.nextInt(6)).mkString(" "))
    }
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text", K, W)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      val want = refWinnow(text.split(" ").toSeq, K, W)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(42L)
    val run = Seq.fill(K + W - 1)("g" + rnd.nextInt(1000)).mkString(" ")
    def filler(p: String, n: Int) = Seq.fill(n)(p + rnd.nextInt(1000)).mkString(" ")
    val docs = Seq(
      (1L, s"${filler("x", 30)} $run ${filler("y", 30)}"),
      (2L, s"${filler("u", 25)} $run ${filler("v", 35)}")
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text", K, W)
      .select(col("doc_id"), col("fp")).as[(Long, String)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
    // and the pairing operator surfaces the pair at minShared=1
    val pairs = Winnowing.nearDupPairs(docs, "doc_id", "text", K, W, 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }

  test("near-dup pairs drop boilerplate fingerprints at the cap") {
    // 5 docs all share one identical text → every fingerprint sits in
    // a 5-doc bucket; cap 4 must drop them all, cap 8 must pair them
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = (1L to 5L).map(id => (id, text)).toDF("doc_id", "text")
    val dropped = Winnowing.nearDupPairs(docs, "doc_id", "text", K, W,
      1, maxDocsPerFp = 4).count()
    assert(dropped == 0L)
    val kept = Winnowing.nearDupPairs(docs, "doc_id", "text", K, W,
      1, maxDocsPerFp = 8).count()
    assert(kept == 10L) // C(5,2)
  }
}
