package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeansExact, LanguageModel, LogReg, Pca}

/** Unit coverage for the trained-model family (q136–q141): Stupid
  * Backoff cascade faces, LR training determinism + separability,
  * exact tie-aware AUC, PCA power-iteration recovery, curriculum
  * invariants.
  */
class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("stupid backoff: all three cascade faces and the OOV floor " +
      "score exactly") {
    val train = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c"), (11L, "x b c"), (12L, "c d e"),
      (13L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel.stupidBackoff(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    // (a,b,c): c3=1, c12(a,b)=1 → 1.0
    assert(out(10L).contains((1L, 1.0)), s"seen trigram: ${out(10L)}")
    // (x,b,c): trigram unseen, bigram (b,c) c=2, c(b)=2 → 0.4·1 = 0.4
    assert(out(11L).contains((1L, 0.4)), s"bigram backoff: ${out(11L)}")
    // (c,d,e): trigram unseen, bigram (d,e) unseen, e OOV → 0
    assert(out(12L).contains((1L, 0.0)), s"OOV floor: ${out(12L)}")
    // 2 tokens: no trigram position → null row (total output)
    assert(out(13L).isEmpty, s"short doc must be null: ${out(13L)}")
  }

  test("stupid backoff: unigram face = α²·c(w3)/N when only the last " +
      "word is known") {
    val train = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    // (z1,z2,r): trigram/bigram unseen; r known: 0.16·(1/5) = 0.032
    val score = Seq((10L, "z1 z2 r")).toDF("doc_id", "text")
    val r = LanguageModel.stupidBackoff(train, score, "doc_id", "text")
      .collect().head
    assert(r.getLong(1) == 1L && math.abs(r.getDouble(2) - 0.032) < 1e-9,
      s"unigram face: $r")
  }

  test("stupid backoff: a corpus scored under its own counts never " +
      "backs off and never scores zero") {
    // every scored trigram occurs in training (the doc itself), so
    // the cascade stays on the trigram face: s = c3/c12 ∈ (0, 1]
    val d = Tables.load(spark, sf0001, "documents")
    val out = LanguageModel.stupidBackoff(d, d, "doc_id", "text")
      .filter(col("n_trigrams").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(col("avg_sb") > 0 && col("avg_sb") <= 1.0, 1L)
          .otherwise(0L)).as("in_range"))
      .head
    assert(out.getLong(0) > 0 && out.getLong(0) == out.getLong(1),
      s"self-trained scores must sit in (0,1]: $out")
  }

  test("logreg: training is deterministic and separates a separable " +
      "corpus") {
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose text here", "en")
      else (i.toLong, "zz yy xx ww vv uu", "xx")
    }.toDF("doc_id", "text", "lang")
    def weights() = {
      val feats = LogReg.features(docs, "doc_id", "text",
        col("lang") === "en", 32).localCheckpoint(eager = false)
      LogReg.train(feats, "doc_id", 32, rounds = 3, lr = 0.5)
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    }
    val w1 = weights()
    val w2 = weights()
    assert(w1 == w2, "training must be bit-deterministic")
    assert(w1.values.exists(_.signum != 0), "weights must move off zero")
    val feats = LogReg.features(docs, "doc_id", "text",
      col("lang") === "en", 32).localCheckpoint(eager = false)
    val w = LogReg.train(feats, "doc_id", 32, rounds = 3, lr = 0.5)
    val scored = LogReg.score(feats, "doc_id", w)
    val auc = LogReg.auc(scored, "p", "y").collect().head.getDouble(2)
    assert(auc == 1.0, s"separable corpus must score AUC 1.0, got $auc")
  }

  test("auc: exact tie-aware values on hand-computed cases") {
    // all-tied scores → 0.5 exactly
    val tied = Seq((0.9, 1), (0.9, 0), (0.9, 1), (0.9, 0)).toDF("p", "y")
    assert(LogReg.auc(tied, "p", "y").collect().head.getDouble(2) == 0.5)
    // perfect separation → 1.0
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("p", "y")
    assert(LogReg.auc(perfect, "p", "y").collect().head.getDouble(2) == 1.0)
    // one inversion among 2×2: pairs = 4, concordant 3, discordant 1
    // → 0.75
    val mixed = Seq((0.9, 1), (0.3, 1), (0.5, 0), (0.1, 0)).toDF("p", "y")
    val r = LogReg.auc(mixed, "p", "y").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getDouble(2) == 0.75,
      s"got $r")
  }

  test("pca: power iteration recovers a planted dominant direction " +
      "and is repartition-invariant") {
    // coordinate 0 carries the variance; coordinate 1 is small noise
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array(i.toFloat, (i % 3).toFloat * 0.1f, 0f, 0f))
    }.toDF("id", "embedding")
    val proj = Pca.pc1Projection(vecs, "id", "embedding", dim = 4, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // projection must be (close to) the centered first coordinate, up
    // to a global sign
    val sign = math.signum(proj(49L) - proj(0L))
    (0 until 50).foreach { i =>
      val expected = sign * (i - 24.5)
      assert(math.abs(proj(i.toLong) - expected) < 0.05,
        s"id=$i proj=${proj(i.toLong)} expected≈$expected")
    }
    val proj2 = Pca.pc1Projection(vecs.repartition(7), "id", "embedding",
        dim = 4, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(proj == proj2, "projections must be repartition-invariant")
  }

  test("abtt: removing the top component kills the planted dominant " +
      "direction") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array(i.toFloat, (i % 3).toFloat * 0.1f, 0f, 0f))
    }.toDF("id", "embedding")
    val corrected = Pca.allButTop(vecs, "id", "embedding", dim = 4, iters = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // the j=0 coordinate carried essentially all variance; after
    // correction its residual must be tiny relative to the original
    // centered magnitude (±24.5)
    (0 until 50).foreach { i =>
      val res = corrected((i.toLong, 0))
      assert(math.abs(res) < 0.1, s"id=$i residual j=0: $res")
    }
  }

  test("kmeans: recovers planted well-separated clusters and is " +
      "repartition-invariant") {
    // 3 tight planted blobs far apart, k=3: seeds 0,1,2 are one per
    // blob by construction (ids interleave blobs)
    val vecs = (0 until 30).map { i =>
      val blob = i % 3
      (i.toLong, Array(blob * 100f + (i / 3) * 0.01f, blob * 50f, 0f, 0f))
    }.toDF("id", "embedding")
    val out = KMeansExact.assign(vecs, "id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 30).foreach { i =>
      assert(out(i.toLong) == out((i % 3).toLong),
        s"id=$i must share its blob's cluster: $out")
    }
    assert(out.values.toSet.size == 3, s"3 distinct clusters: $out")
    val out2 = KMeansExact.assign(vecs.repartition(7), "id", "embedding",
        k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == out2, "assignment must be repartition-invariant")
  }

  test("crossval: folds partition the corpus and accuracies are " +
      "consistent") {
    val d = Tables.load(spark, sf0001, "documents")
    val rows = SparkEntry.queries("q146_nb_crossval")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    assert(rows.map(_._2).sum == d.count(), "folds must partition")
    rows.foreach { case (f, n, c, acc) =>
      assert(c <= n && acc >= 0.0 && acc <= 1.0, s"fold $f: $n $c $acc")
      assert(math.abs(acc - c.toDouble / n) < 1e-6)
    }
  }

  test("quantile normalization: per-source pnorm spans [0,1] " +
      "uniformly") {
    val rows = SparkEntry.queries("q145_quantile_normalize")(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val ps = rs.map(_._2)
      assert(ps.min == 0.0 && ps.max == 1.0,
        s"$src pnorm range: ${ps.min}..${ps.max}")
      assert(ps.distinct.length == ps.length,
        s"$src: strict (q, doc_id) order must make pnorm injective")
    }
  }

  test("label propagation: majority adoption, deterministic " +
      "tie-break, clamped seeds") {
    import graft.operators.GraphRank
    // path a—b—c—d; seeds: a='x', d='y'; undirected edges both ways
    val fwd = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"),
      col("src").as("dst")))
    val seeds = Seq(("a", "x"), ("d", "y")).toDF("node", "label")
    val out = GraphRank.labelPropagate(edges, seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == "x" && out("d") == "y", s"seeds clamp: $out")
    // round 1: b adopts a's 'x', c adopts d's 'y'; round 2: both see a
    // 1–1 tie and the ascending label wins → c flips to 'x'; round 3
    // is stable. The deterministic tie-break is the point.
    assert(out("b") == "x" && out("c") == "x",
      s"tie must break to the ascending label: $out")
  }

  test("chi2 features: perfectly separating tokens score N and " +
      "all-corpus tokens are excluded") {
    // 2 en docs carry 'aa', 2 fr docs carry 'cc', 'bb' is universal:
    // (aa,en): a=2 tw=2 nl=2 N=4 → chi2 = 4·(2·2)²/(2·2·2·2) = 4.0;
    // 'bb' has tw = N and must be filtered out
    val sf = java.nio.file.Files.createTempDirectory("chi2").toString
    Seq((1L, "aa bb", "en", "s", 5L), (2L, "aa bb", "en", "s", 5L),
      (3L, "cc bb", "fr", "s", 5L), (4L, "cc bb", "fr", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val rows = SparkEntry.queries("q149_chi2_features")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))
    // only positive-evidence (token,label) pairs are scored, so each
    // label surfaces exactly its own marker
    assert(rows.toSet == Set(("en", 1, "aa", 4.0), ("fr", 1, "cc", 4.0)),
      s"got ${rows.toSeq}")
  }

  test("classifier kappa: output is internally consistent on the " +
      "real corpus") {
    val r = SparkEntry.queries("q150_classifier_kappa")(spark, sf0001)
      .collect().head
    val (n, po, pe, kappa) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0 && po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(math.abs(kappa -
      BigDecimal((po - pe) / (1 - pe))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"kappa $kappa inconsistent with po=$po pe=$pe")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("mixture allocation: water-filling redistributes a " +
      "capacity-limited source's shortfall, hand-computed") {
    // A=10, B=100, C=100 tokens; budget = 210/2 = 105, target 35 each:
    // A caps at 10, leftover 25 splits 12/12 to B/C (integer floor)
    // → B = C = 47, one residual token deliberately unallocated
    val sf = java.nio.file.Files.createTempDirectory("alloc").toString
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq((1L, text(10), "en", "A", 1L), (2L, text(100), "en", "B", 1L),
      (3L, text(100), "en", "C", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val rows = SparkEntry.queries("q151_mixture_alloc")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("A", 10L, 10L), ("B", 100L, 47L),
      ("C", 100L, 47L)), s"got ${rows.toSeq}")
  }

  test("monitoring reports: PSI reference deciles, profile totals, " +
      "and temperature grid are internally consistent") {
    // q155: the reference side binned by its own deciles must sit at
    // ~1/10 per bin (exact up to percentile ties)
    val psi = SparkEntry.queries("q155_psi_drift")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val nRef = psi.map(_._2).sum
    psi.foreach { case (bin, n) =>
      assert(math.abs(n - nRef / 10.0) <= nRef * 0.04 + 2,
        s"ref bin $bin holds $n of $nRef — deciles must be balanced")
    }
    // q156: doc_id is a dense unique key — distinct = n, nulls = 0
    val prof = SparkEntry.queries("q156_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, nNull, nDist) = prof("doc_id")
    assert(nNull == 0 && nDist == n, s"doc_id profile: ${prof("doc_id")}")
    // q157: exactly one winning temperature
    val temps = SparkEntry.queries("q157_temperature_scaling")(
      spark, sf0001).collect().map(r => (r.getDouble(0), r.getBoolean(3)))
    assert(temps.count(_._2) == 1, s"exactly one is_best: ${temps.toSeq}")
  }

  test("curriculum: annealed admission invariants on the real corpus") {
    val d = Tables.load(spark, sf0001, "documents")
    val sched = SparkEntry.queries("q141_curriculum")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val n = d.count()
    val byEpoch = sched.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byEpoch(4) == n, s"epoch 4 must admit everything: $byEpoch")
    assert(byEpoch(1) <= byEpoch(2) && byEpoch(2) <= byEpoch(3) &&
      byEpoch(3) <= byEpoch(4), s"monotone admission: $byEpoch")
    assert(sched.forall { case (e, _, _, qt) => qt <= e },
      "a doc may only appear in epochs ≥ its quartile")
    // seq is a dense 1..k permutation per epoch
    sched.groupBy(_._1).foreach { case (e, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"epoch $e seq must be dense 1..${rows.length}")
    }
  }
}
