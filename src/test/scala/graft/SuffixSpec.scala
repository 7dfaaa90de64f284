package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Semantic invariants for the suffix-array family (q165/q166) on top
  * of the hash gates: rank classes ARE prefix classes, and the
  * repeated-span curve behaves like one.
  */
class SuffixSpec extends SparkSpec {

  test("q165: equal level-16 ranks mean equal 16-token prefixes, " +
      "distinct ranks mean distinct prefixes (full class check)") {
    val d = Tables.load(spark, sf0001, "documents")
    val ranks = SparkEntry.queries("q165_suffix_ranks")(spark, sf0001)
    val pref = d.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(col("tk")).as(Seq("pos", "_t")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ",
          slice(col("tk"), col("pos") + 1, lit(16))).as("pref"))
    val joined = ranks.join(pref, Seq("doc_id", "pos"))
    // every rank class maps to exactly one prefix string and back
    assert(joined.groupBy(col("rank"))
      .agg(countDistinct(col("pref")).as("n"))
      .filter(col("n") =!= 1).count() == 0, "rank class with 2 prefixes")
    assert(joined.groupBy(col("pref"))
      .agg(countDistinct(col("rank")).as("n"))
      .filter(col("n") =!= 1).count() == 0, "prefix with 2 ranks")
    // and rank ORDER is prefix order (sampled pairwise via min/max)
    val cls = joined.groupBy(col("rank"))
      .agg(first(col("pref")).as("pref")).orderBy(col("rank"))
      .limit(500).collect()
    cls.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getString(1) < w(1).getString(1),
          s"rank order violates prefix order: ${w(0)} !< ${w(1)}")
    }
  }

  test("q166: dup_positions is non-increasing in level (a repeated " +
      "2L-span contains a repeated L-span) and a planted 16-token " +
      "duplicate is caught at every level") {
    val rows = SparkEntry.queries("q166_repeated_spans")(spark, sf0001)
      .orderBy(col("level")).collect()
    assert(rows.length == 4)
    val dp = rows.map(_.getLong(2))
    dp.sliding(2).foreach { w =>
      assert(w(0) >= w(1), s"dup_positions increased: ${dp.toSeq}")
    }
    // planted fixture through the same operator: one 16-token span
    // shared by two docs, a third unrelated
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val span = (1 to 16).map(i => s"s$i").mkString(" ")
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, s"alpha $span omega"),
        Row(2L, s"beta gamma $span"),
        Row(3L, (1 to 30).map(i => s"u$i").mkString(" ")))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val lv = SuffixArray.rankLevels(docs, "doc_id", "text", 16)
    val hit16 = lv(16).groupBy(col("r")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).count()
    assert(hit16 >= 1, "planted 16-token duplicate span not found")
  }

  test("nBucketsFor: one bucket per ~4M positions, clamped to " +
      "[256, 65536] (the SCALE.md sizing rule, r9 verdict #8)") {
    assert(SuffixArray.nBucketsFor(0) == 256)
    assert(SuffixArray.nBucketsFor(1000000000L) == 256)
    assert(SuffixArray.nBucketsFor(4000000000L) == 1000)
    assert(SuffixArray.nBucketsFor(Long.MaxValue / 4) == 65536)
    // ranks are invariant to the bucket count (the decomposition is
    // exact for ANY order-compatible bucketing)
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val a = SuffixArray.rankLevels(docs, "doc_id", "text", 4,
      nBuckets = 7)(4)
    val b = SuffixArray.rankLevels(docs, "doc_id", "text", 4,
      nBuckets = 256)(4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q170/q171: spans are disjoint maximal [start,end) ranges " +
      "inside the doc, every span covers >= 16 tokens, and the " +
      "dup fraction equals span coverage over doc length") {
    val spans = SparkEntry.queries("q170_exact_substr_spans")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, st, en, len) =>
        assert(en - st == len && len >= 16)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // maximal: merged spans can't touch (a touching pair would
          // have been one island)
          assert(s2 > e1, s"overlapping/adjacent spans $e1 $s2")
        case _ =>
      }
    }
    val lens = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySpanSum = spans.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    SparkEntry.queries("q171_dup_fraction")(spark, sf0001).collect()
      .foreach { r =>
        val (id, n, dup, frac) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(n == lens(id))
        assert(dup == bySpanSum.getOrElse(id, 0L))
        assert(dup <= n, s"doc $id: dup $dup > len $n")
        assert(math.abs(frac - dup.toDouble / n) < 1e-6)
      }
  }

  test("q172: clone pairs are symmetric-free (a < b), shared_grams " +
      "is bounded by the smaller doc's distinct full windows, and a " +
      "planted 3x-shared-window pair surfaces") {
    val pairs = SparkEntry.queries("q172_clone_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, sg) =>
      assert(a < b && sg >= 3)
    }
    val lens = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 15).cast("long").as("w"))
      .collect().map(r => r.getLong(0) -> math.max(r.getLong(1), 0L)).toMap
    pairs.foreach { case (a, b, sg) =>
      assert(sg <= math.min(lens(a), lens(b)),
        s"pair ($a,$b) shares $sg > window count")
    }
    // planted: two docs sharing 3 disjoint 16-gram windows (plus
    // padding), a third unrelated — the pair must surface with
    // shared_grams >= 3 through the raw operator path
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def blk(p: String) = (1 to 16).map(i => s"$p$i").mkString(" ")
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, s"${blk("a")} x1 ${blk("b")} x2 ${blk("c")}"),
        Row(2L, s"y1 ${blk("a")} y2 ${blk("b")} y3 ${blk("c")}"),
        Row(3L, (1 to 60).map(i => s"z$i").mkString(" ")))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val lv = SuffixArray.rankLevels(docs, "doc_id", "text", 16)
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val dg = lv(16).join(toks, Seq("doc_id"))
      .filter(col("pos") + 16 <= col("n"))
      .select(col("doc_id"), col("r")).distinct()
    val sharedCnt = dg.groupBy(col("r"))
      .agg(count(lit(1)).as("c")).filter(col("c") === 2)
      .join(dg, Seq("r"))
      .groupBy().agg(count(lit(1))).head.getLong(0)
    assert(sharedCnt >= 6, s"planted shared windows missing: $sharedCnt")
  }
}
