package graft

import org.apache.spark.sql.functions._
import graft.operators.{NaiveBayes, Sketches}

/** NB classifier (q107/q108) and sketch (q109/q110) invariants beyond
  * the DuckDB hash gates.
  */
class ClassifierSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet")

  // ---- Naive Bayes ----------------------------------------------------

  test("nb train: one row per observed (label, token); logp < 0") {
    val m = NaiveBayes.train(docs, "text", "lang").cache()
    val dup = m.groupBy("label", "token").count().filter(col("count") > 1)
    assert(dup.isEmpty)
    assert(m.filter(col("logp") >= 0).isEmpty)
    // per label, Σ P(t|l) over observed tokens ≤ 1: equality exactly
    // when the label observed the whole vocabulary (true for this
    // 31-word corpus), so allow the 6-decimal logp rounding slack
    val mass = m.groupBy("label")
      .agg(sum(exp(col("logp").cast("double"))).as("mass"))
      .filter(col("mass") > 1.0 + 1e-4)
    assert(mass.isEmpty)
  }

  test("nb classify: total assignment, labels from the training set") {
    val out = NaiveBayes.classify(docs, "doc_id", "text", docs, "lang").cache()
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    val labels = docs.select(col("lang")).distinct().as[String].collect().toSet
    val preds = out.select(col("pred_label")).distinct().as[String].collect()
    assert(preds.forall(labels))
  }

  test("nb classify: argmax invariant under a label-preserving shuffle " +
      "of training rows (order-independence of the DECIMAL sums)") {
    val a = NaiveBayes.classify(docs, "doc_id", "text", docs, "lang")
    val b = NaiveBayes.classify(
      docs.repartition(7, col("doc_id")), "doc_id", "text",
      docs.repartition(5, col("text")), "lang")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("nb classify: the r16 fused model build equals the r15 " +
      "formulation verbatim on a corpus WITH a null training label " +
      "(advisor #4 pin: null label competes via prior+smooth only)") {
    import org.apache.spark.sql.types.DecimalType
    val LP = DecimalType(18, 6)
    val train = Seq(
      (1L, "alpha beta beta", "en"),
      (2L, "alpha gamma", "fr"),
      (3L, "beta beta gamma delta", null.asInstanceOf[String]),
      (4L, "alpha alpha beta", "en"),
      (5L, "gamma gamma", "fr")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(train, "doc_id", "text", train, "lang")

    // ---- the r15 shape, re-implemented verbatim ----
    def r6(x: Double): java.math.BigDecimal = {
      val y = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      java.math.BigDecimal.valueOf(y)
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }
    val lt = train
      .select(col("lang").as("label"),
        explode(split(col("text"), " ")).as("_t"))
      .select(col("label"), xxhash64(col("_t")).as("h"))
      .groupBy(col("label"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    val totRows = lt.groupBy("label").agg(sum("cnt").as("tot")).collect()
    val v = lt.select("h").distinct().count()
    val nlRows = train.groupBy(col("lang").as("label"))
      .agg(count(lit(1)).as("nl")).collect()
    val nTrain = nlRows.map(_.getLong(1)).sum
    val labels: Array[Any] = nlRows.map(_.get(0)).sortBy(l =>
      Option(l).map(_.toString).getOrElse(""))
    // label-array order only matters for argmax TIES; this corpus has
    // none, so the differential equality below is order-insensitive
    val nlBy = nlRows.map(r => r.get(0) -> r.getLong(1)).toMap
    val totBy = totRows.map(r => r.get(0) -> r.getLong(1)).toMap
    val prior = labels.map(l =>
      r6(math.log(nlBy(l).toDouble / nTrain.toDouble)))
    val smooth = labels.map(l =>
      r6(math.log(1.0 / (totBy.getOrElse(l, 0L) + v).toDouble)))
    val deltaCols = labels.zipWithIndex.map { case (l, i) =>
      max(when(col("label") === lit(l),
        round(log((col("cnt") + lit(1)).cast("double") /
          lit((totBy.getOrElse(l, 0L) + v).toDouble)), 6).cast(LP) -
          lit(smooth(i)).cast(LP))).as(s"_d$i")
    }.toSeq
    val deltaWide = lt.groupBy(col("h"))
      .agg(deltaCols.head, deltaCols.tail: _*)
    val toks = train
      .select(col("doc_id"), explode(split(col("text"), " ")).as("_t"))
      .select(col("doc_id"), xxhash64(col("_t")).as("h"))
    val aggCols = count(lit(1)).as("n_tok") +:
      labels.indices.map(i =>
        coalesce(sum(col(s"_d$i")), lit(0).cast(LP)).as(s"_s$i"))
    val agg = toks.join(deltaWide, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val scores = labels.indices.map { i =>
      lit(prior(i)).cast(LP) + col("n_tok") * lit(smooth(i)).cast(LP) +
        col(s"_s$i")
    }
    var bestLabel: org.apache.spark.sql.Column = lit(labels(0))
    var bestScore: org.apache.spark.sql.Column = scores(0)
    for (i <- 1 until labels.length) {
      val better = scores(i) > bestScore
      bestLabel = when(better, lit(labels(i))).otherwise(bestLabel)
      bestScore = when(better, scores(i)).otherwise(bestScore)
    }
    val want = agg.select(col("doc_id"), bestLabel.as("pred_label"),
      bestScore.cast("double").as("score"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"r16 fused != r15 formulation:\n" +
        s"got ${got.orderBy("doc_id").collect().mkString(", ")}\n" +
        s"want ${want.orderBy("doc_id").collect().mkString(", ")}")
  }

  test("nb classify: beats the majority-class baseline on lang") {
    val out = NaiveBayes.classify(docs, "doc_id", "text", docs, "lang")
    val joined = out.join(docs, "doc_id")
    val acc = joined.filter(col("pred_label") === col("lang")).count()
      .toDouble / joined.count()
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).as[Long].head.toDouble / docs.count()
    assert(acc > majority,
      s"NB accuracy $acc should beat majority baseline $majority")
  }

  // ---- Sketches -------------------------------------------------------

  test("h60 matches the DuckDB derivation on a pinned value") {
    // DuckDB: CAST('0x'||substr(md5('tok1'),1,15) AS UBIGINT)
    val h = docs.sparkSession.range(1)
      .select(Sketches.h60(lit("tok1")).as("h")).as[Long].head
    assert(h === 766453538335229283L)
  }

  test("cms: estimates never underestimate; exact when width avoids " +
      "collisions") {
    val items = Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 7L))
      .toDF("item", "k")
    val big = Sketches.countMin(items, "item", "k", 4, 4096)
    val est = Sketches.cmsEstimate(items, "item", big, 4, 4096)
      .select(col("item"), col("k"), col("est"))
    assert(est.filter(col("est") < col("k")).isEmpty)
    // 4 items in 4096 buckets: collision probability ~0 — exact
    assert(est.filter(col("est") =!= col("k")).isEmpty)
    // tiny width forces collisions: still an upper bound
    val small = Sketches.countMin(items, "item", "k", 2, 2)
    val est2 = Sketches.cmsEstimate(items, "item", small, 2, 2)
    assert(est2.filter(col("est") < col("k")).isEmpty)
  }

  test("cms: counter frame bounded by depth*width and partition-" +
      "invariant") {
    val tok = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("k"))
    val c1 = Sketches.countMin(tok, "t", "k", 4, 64)
    assert(c1.count() <= 4 * 64)
    val c2 = Sketches.countMin(tok.repartition(11), "t", "k", 4, 64)
    assert(c1.exceptAll(c2).isEmpty && c2.exceptAll(c1).isEmpty)
  }

  test("hll: registers bounded by m; estimate within 3 sigma on the " +
      "trigram domain") {
    val grams = docs
      .select(split(col("text"), " ").as("tk"))
      .select(explode(when(size(col("tk")) >= 3,
        transform(sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("g"))
      .distinct().cache()
    val n = grams.count().toDouble
    val m = 1024
    val regs = Sketches.hllRegisters(grams, "g", m).cache()
    assert(regs.count() <= m)
    assert(regs.filter(col("rmax") < 1 || col("rmax") > 51).isEmpty)
    val est = Sketches.hllEstimate(regs, m)
      .select(col("est")).as[Double].head
    val sigma = 1.04 / math.sqrt(m.toDouble) * n
    assert(math.abs(est - n) <= 3 * sigma,
      s"HLL est $est vs exact $n (sigma $sigma)")
  }

  test("logbin quantile sketch: lower bound within the guaranteed 2x " +
      "band of the exact discrete quantile, and bins merge by add") {
    val v = docs.select(col("source"),
      greatest(col("n_chars").cast("long"), lit(1L)).as("v")).cache()
    val bins = Sketches.logBins(v, Seq("source"), "v")
    assert(bins.groupBy("source").count().filter(col("count") > 64).isEmpty)
    val qs = Sketches.logBinQuantiles(bins, Seq("source"), Seq(500))
    // exact discrete median under the same integer rank rule
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("v")
    val em = v.groupBy("source", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wv))
      .withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .groupBy("source")
      .agg(min(when(col("cum") * lit(1000L) >= col("n") * lit(500L),
        col("v"))).as("m"))
    val joined = qs.join(em, "source")
    assert(joined.filter(col("p500_lower") > col("m") ||
      col("m") >= col("p500_lower") * 2).isEmpty,
      "2x bound violated")
    // mergeability: bins of two halves, summed, equal whole-corpus bins
    val left = v.filter(col("v") % 2 === 0)
    val right = v.filter(col("v") % 2 =!= 0)
    val merged = Sketches.logBins(left, Seq("source"), "v")
      .unionAll(Sketches.logBins(right, Seq("source"), "v"))
      .groupBy("source", "bin").agg(sum("c").as("c"))
    val whole = Sketches.logBins(v, Seq("source"), "v")
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("hll grouped: per-group frames/estimates match the global " +
      "sketch run on each group alone") {
    val toks = docs.select(col("lang"),
      explode(split(col("text"), " ")).as("g"))
    val grouped = Sketches.hllEstimateBy(
      Sketches.hllRegistersBy(toks, Seq("lang"), "g", 256),
      Seq("lang"), 256)
    import spark.implicits._
    val langs = docs.select("lang").distinct().as[String].collect()
    langs.foreach { l =>
      val alone = Sketches.hllEstimate(
        Sketches.hllRegisters(toks.filter(col("lang") === l), "g", 256), 256)
        .select(col("registers_used"), col("v0"), col("est"))
        .head
      val fromGrouped = grouped.filter(col("lang") === l)
        .select(col("registers_used"), col("v0"), col("est")).head
      assert(alone == fromGrouped, s"lang $l: $alone vs $fromGrouped")
    }
  }

  test("hll: register frame is merge-associative (union of corpus " +
      "halves = whole-corpus registers)") {
    val grams = docs.select(explode(split(col("text"), " ")).as("g"))
    val left = grams.filter(xxhash64(col("g")) % 2 === 0)
    val right = grams.filter(xxhash64(col("g")) % 2 =!= 0)
    val whole = Sketches.hllRegisters(grams, "g", 256)
    val merged = Sketches.hllRegisters(left, "g", 256)
      .unionAll(Sketches.hllRegisters(right, "g", 256))
      .groupBy("reg").agg(max("rmax").as("rmax"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
