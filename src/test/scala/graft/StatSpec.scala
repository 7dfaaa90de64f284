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

  test("curation funnel: monotone stages, final stage equals the " +
      "q48 survivor set") {
    val rows = SparkEntry.queries("q183_curation_funnel")(spark, sf0001)
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3,
        s"funnel must be monotone: $a -> $b")
    }
    val q48 = SparkEntry.queries("q48_clean_pipeline")(spark, sf0001)
      .count()
    assert(rows.last._2 == q48,
      s"final funnel stage ${rows.last._2} != q48 survivors $q48")
  }

  test("q194 rejection reasons partition the corpus and reproduce " +
      "the q183 funnel's stage deltas exactly") {
    val reasons = SparkEntry
      .queries("q194_rejection_reasons")(spark, sf0001)
      .groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(r: String) = reasons.getOrElse(r, 0L)
    val funnel = SparkEntry.queries("q183_curation_funnel")(spark,
        sf0001)
      .orderBy("stage").collect().map(_.getLong(2))
    assert(reasons.keySet.subsetOf(Set("quality_gate",
      "lang_mismatch", "exact_dup", "near_dup", "kept")))
    assert(reasons.values.sum == funnel(0),
      "reasons must partition the raw corpus")
    assert(n("quality_gate") == funnel(0) - funnel(1))
    assert(n("lang_mismatch") == funnel(1) - funnel(2))
    assert(n("exact_dup") == funnel(2) - funnel(3))
    assert(n("near_dup") == funnel(3) - funnel(4))
    assert(n("kept") == funnel(4))
  }

  test("q197 corpus card: metrics recompute from the corpus and " +
      "agree with the operators they reuse") {
    val card = SparkEntry.queries("q197_corpus_card")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = Tables.load(spark, sf0001, "documents")
    assert(card("n_docs") == d.count().toDouble)
    assert(card("n_sources") ==
      d.select("source").distinct().count().toDouble)
    assert(card("n_langs") ==
      d.select("lang").distinct().count().toDouble)
    assert(math.abs(card("avg_tokens_per_doc") -
      card("n_tokens") / card("n_docs")) < 1e-6)
    assert(card("exact_dup_rate") >= 0.0 && card("exact_dup_rate") < 1.0)
    assert(card("lang_agreement_rate") > 0.0 &&
      card("lang_agreement_rate") <= 1.0)
    assert(card("mean_quality") > 0.0 && card("mean_quality") <= 1.0)
    val zipf = SparkEntry.queries("q177_zipf_fit")(spark, sf0001)
      .select(col("slope")).head.getDouble(0)
    assert(card("zipf_slope") == zipf,
      "card must reuse q177's exact slope")
  }

  test("Heaps fit: all-novel corpus gives beta ≈ 1, shared-vocab " +
      "corpus gives beta ≈ 0") {
    // q182's operator logic over planted corpora, replayed inline on
    // a temp dir through the registered query
    def betaOf(texts: Seq[String]): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory("heaps_spec").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s",
          t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q182_heaps_fit")(spark, dir)
        .head().getDouble(3)
    }
    val novel = (0 until 256).map(d =>
      (0 until 8).map(w => s"w${d}_$w").mkString(" "))
    val bNovel = betaOf(novel)
    assert(math.abs(bNovel - 1.0) < 0.05,
      s"all-novel corpus must fit beta ≈ 1, got $bNovel")
    val shared = (0 until 256).map(_ => "a b c d e f g h")
    val bShared = betaOf(shared)
    assert(math.abs(bShared) < 0.05,
      s"shared-vocab corpus must fit beta ≈ 0, got $bShared")
  }

  test("event transition matrix rows are probability distributions " +
      "and match a hand-walked sequence") {
    val out = SparkEntry.queries("q184_event_transitions")(spark, sf0001)
    val sums = out.groupBy("src")
      .agg(round(sum(col("p")), 3).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rounded per-pair probabilities re-sum to 1 within rounding slack
    sums.values.foreach(s => assert(math.abs(s - 1.0) < 0.01, sums))
    // hand-walked planted sequence: one user, a b a b a → (a→b)×2,
    // (b→a)×2
    val dir = java.nio.file.Files
      .createTempDirectory("mk_spec").toString
    Seq((0L, 1000L, 7L, "a", 0.0, "{}"), (1L, 2000L, 7L, "b", 0.0, "{}"),
      (2L, 3000L, 7L, "a", 0.0, "{}"), (3L, 4000L, 7L, "b", 0.0, "{}"),
      (4L, 5000L, 7L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q184_event_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(("a", "b", 2L, 1.0), ("b", "a", 2L, 1.0)), got)
  }

  test("rolling PSI fires on a planted window shift and stays near " +
      "zero on stationary windows") {
    // 3 days of events: days 0-1 identical distribution, day 2
    // shifted — PSI(day1 vs day0) ≈ 0, PSI(day2 vs day1) large
    val day = 86400000000L // µs→ns? events ts is ns under nanosAsLong
    val ev = (0 until 1000).map { i =>
      val d = i % 3
      val v = if (d < 2) (i % 100).toDouble
        else 1000.0 + (i % 100)
      (i.toLong, d * 86400000L * 1000000L + i * 1000000L, (i % 10).toLong,
        "e", v, "{}")
    }
    val dir = java.nio.file.Files
      .createTempDirectory("psi_spec").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q185_rolling_psi")(spark, dir)
      .orderBy("win_ms").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.length == 2, out.toSeq)
    assert(math.abs(out(0)._2) < 0.05,
      s"stationary window must score ≈ 0: ${out(0)}")
    assert(out(1)._2 > 0.25,
      s"planted shift must exceed the 0.25 convention: ${out(1)}")
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

  test("KS two-level prefix decomposition equals the single-window " +
      "formulation on a corpus-sized value domain") {
    // ~20k DISTINCT values across 4 sources — the domain the r10
    // verdict flagged (a bounded-domain assumption the old single
    // Window.orderBy silently relied on). The naive formulation below
    // IS that old code; the decomposed operator must agree exactly.
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 20000).select(
      concat(lit("s"), (col("id") % 4)).as("src"),
      ((col("id") * 1000003L) % 1000000007L).as("v"))
      .localCheckpoint(true)
    val fast = KsDrift.perGroupKs(df, "src", "v")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq

    val d38 = "decimal(38,0)"
    val c = df.groupBy(col("src"), col("v").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val pv = c.groupBy(col("v")).agg(sum(col("c")).as("ctot"))
      .withColumn("cumtot",
        sum(col("ctot")).over(Window.orderBy(col("v"))))
    val sg = c.groupBy(col("src")).agg(sum(col("c")).as("n_grp"))
      .withColumn("n_rest",
        sum(col("n_grp")).over(Window.partitionBy()) - col("n_grp"))
    val grid = pv.crossJoin(broadcast(sg))
      .join(c, Seq("src", "v"), "left")
      .withColumn("cum_grp",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy("src").orderBy(col("v"))))
      .withColumn("d_num",
        abs(col("cum_grp").cast(d38) * col("n_rest").cast(d38) -
          (col("cumtot") - col("cum_grp")).cast(d38) *
            col("n_grp").cast(d38)))
    val dmax = grid.groupBy(col("src"), col("n_grp"), col("n_rest"))
      .agg(max(col("d_num")).as("d_max"))
    val naive = dmax.join(grid.select(col("src"), col("v"),
          col("d_num").as("d_max")), Seq("src", "d_max"))
      .groupBy(col("src"), col("n_grp"), col("n_rest"), col("d_max"))
      .agg(min(col("v")).as("at_value"))
      .select(col("src"), col("n_grp"),
        round(col("d_max").cast("double") /
          (col("n_grp").cast(d38) * col("n_rest").cast(d38))
            .cast("double"), 6).as("ks"),
        col("at_value"))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(fast == naive, s"decomposition diverged:\n$fast\nvs\n$naive")
  }
}
