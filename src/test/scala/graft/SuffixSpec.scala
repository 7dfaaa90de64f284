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
}
