package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN acceptance: LSH recall against the exact baseline, and the
  * plan-shape guarantee that no exchange is keyed on embedding
  * payloads (the round-1 scale bug).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sf0001, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("planes artifact round-trips the in-plan hyperplane doubles " +
    "bit-exactly (q29/q45 oracle foundation)") {
    // The r6 ANN hash gates replay sign-bit buckets from this parquet:
    // a single double differing in the last ulp could flip a >= 0 sign
    // and silently change a candidate set, so the round-trip must be
    // EXACT equality on every component, not approximate.
    val path = java.nio.file.Files
      .createTempDirectory("planes_spec").toString + "/planes"
    Similarity.savePlanesArtifact(spark, path,
      bitsPerTable = 4, numTables = 24, dim = 64, seed = 7L)
    val back = spark.read.parquet(path)
      .as[(Int, Int, Seq[Double])].collect()
      .map { case (t, b, p) => (t, b) -> p }.toMap
    assert(back.size == 24 * 4)
    for (t <- 0 until 24) {
      val expect = Similarity.gaussianPlanes(4, 64, 7L + t)
      for (b <- 0 until 4)
        assert(back((t, b)) == expect(b), s"plane ($t,$b) drifted")
    }
    // write-once: a second call with the same path must not rewrite
    // (the TrieMap guard) — mutate the dir marker and call again
    val marker = new java.io.File(s"$path/_SPEC_MARKER")
    assert(marker.createNewFile())
    Similarity.savePlanesArtifact(spark, path,
      bitsPerTable = 4, numTables = 24, dim = 64, seed = 7L)
    assert(marker.exists(), "artifact was rewritten on a repeat call")
  }

  test("LSH recall@5 vs exact top-k averages >= 0.9 (q29 gate)") {
    val rec = Similarity.lshRecallAtK(emb, emb.filter(col("id") < 20), k = 5,
      dim = 64, bitsPerTable = 4, numTables = 20)
    val a = rec.agg(avg(col("recall_at_5"))).head.getDouble(0)
    assert(a >= 0.9, s"avg recall@5 = $a")
  }

  test("LSH plan: no exchange keyed on vector columns") {
    val lsh = Similarity.lshTopK(emb, emb.filter(col("id") < 20), k = 5,
      dim = 64, bitsPerTable = 4, numTables = 20)
    val plan = lsh.queryExecution.executedPlan.toString
    val partitionings = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList
    assert(partitionings.nonEmpty)
    partitionings.foreach(p =>
      assert(!p.contains("vec"), s"vector-keyed exchange: $p"))
  }

  test("quantized ANN: recall@5 >= 0.95 at overfetch 4; probe-all " +
      "equals brute force exactly (q82 gate)") {
    val queries = emb.filter(col("id") < 20)
    val rec = Similarity.quantizedRecallAtK(emb, queries, k = 5,
      overfetch = 4)
    val a = rec.agg(avg(col("recall_at_5"))).head.getDouble(0)
    assert(a >= 0.95, s"avg recall@5 = $a")
    // overfetch covering the corpus ⇒ rescoring sees every vector ⇒
    // int8 error cannot change the output at all
    val n = emb.count().toInt
    val full = Similarity.quantizedTopK(emb, queries, k = 5, overfetch = n)
      .collect().map(_.toString).sorted.toSeq
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(full == exact)
  }

  test("PQ: probe-all ADC shortlist + exact rescore equals brute " +
      "force; recall@5 >= 0.9 at overfetch 100 (q180 gate)") {
    import graft.operators.ProductQuant
    val path = java.nio.file.Files
      .createTempDirectory("pq_spec").toString + "/pq"
    val (cb, codes) = ProductQuant.buildIfAbsent(spark,
      ProductQuant.normalize(emb), path, m = 8, subDim = 8, k = 32,
      iters = 4)
    val queries = emb.filter(col("id") < 20)
    val n = emb.count().toInt
    // overfetch covering the corpus ⇒ the rescore sees every vector
    // ⇒ quantization error cannot change the output at all
    val full = ProductQuant.rescoredTopK(emb, queries, cb, codes,
        subDim = 8, kTop = 5, overfetch = n)
      .collect().map(_.toString).sorted.toSeq
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(full == exact)
    // deployed overfetch: recall vs the exact baseline
    val got = ProductQuant.rescoredTopK(emb, queries, cb, codes,
        subDim = 8, kTop = 5, overfetch = 100)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(_.toString).toSet
    val exactPairs = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(_.toString).toSet
    val hit = exactPairs.count(got.contains).toDouble / exactPairs.size
    assert(hit >= 0.9, s"PQ recall@5 = $hit")
  }

  test("IVF-PQ: probe-all cells + corpus overfetch equals brute " +
      "force; recall@5 >= 0.8 at nProbe 8 / overfetch 100 (q190 gate)") {
    import graft.operators.ProductQuant
    val base = java.nio.file.Files
      .createTempDirectory("ivfpq_spec").toString
    val (cb, codes) = ProductQuant.buildIfAbsent(spark,
      ProductQuant.normalize(emb), s"$base/pq", m = 8, subDim = 8,
      k = 32, iters = 4)
    val idx = Similarity.IvfIndex.buildIfAbsent(spark, emb,
      s"$base/ivf", nLists = 16)
    val queries = emb.filter(col("id") < 20)
    val n = emb.count().toInt
    // every cell probed + the whole corpus overfetched ⇒ neither the
    // coarse quantizer nor the PQ codes can change the output
    val full = ProductQuant.ivfPqRescoredTopK(emb, queries, idx, cb,
        codes, subDim = 8, kTop = 5, nProbe = 16, overfetch = n)
      .collect().map(_.toString).sorted.toSeq
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(full == exact)
    // deployed params: the coarse filter's loss COMPOUNDS on PQ noise
    // (measured 0.84 here vs 0.93 for PQ-rescore alone — unstructured
    // embeddings are IVF's worst case); the floor is a regression
    // gate, not the structured-corpus expectation
    val got = ProductQuant.ivfPqRescoredTopK(emb, queries, idx, cb,
        codes, subDim = 8, kTop = 5, nProbe = 8, overfetch = 100)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(_.toString).toSet
    val exactPairs = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(_.toString).toSet
    val hit = exactPairs.count(got.contains).toDouble / exactPairs.size
    assert(hit >= 0.8, s"IVF-PQ recall@5 = $hit")
  }

  test("VecQuantize: unit behaviors and scale-invariance of the " +
      "quantized cosine") {
    import graft.functions.VectorFunctions._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),          // zero vector → all zeros
      (2L, Seq(1.0f, -0.5f, 0.25f)),
      (3L, Seq(100.0f, -50.0f, 25.0f))      // same direction as 2
    ).toDF("id", "vec")
    val got = df.select(col("id"), quantizeInt8(col("vec")).as("q"))
      .orderBy("id").as[(Long, Seq[Byte])].collect().toSeq
    assert(got(0)._2 == Seq[Byte](0, 0, 0))
    assert(got(1)._2 == Seq[Byte](127, -64, 32))   // rint(63.5)=64 (even)
    // scale-invariance: ×100 input quantizes identically
    assert(got(2)._2 == got(1)._2)
  }

  test("IVF: probing every list equals brute force; recall grows with nProbe") {
    val queries = emb.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val full = Similarity.ivfTopK(emb, queries, k = 5, nLists = 16, nProbe = 16)
      .collect().map(_.toString).sorted.toSeq
    assert(full == exact)

    def recall(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(emb, queries, k = 5, nLists = 16, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(want).size.toDouble / want.size
    }
    val r4 = recall(4)
    val r12 = recall(12)
    assert(r12 >= r4, s"recall not monotone: nProbe=4 → $r4, nProbe=12 → $r12")
    assert(r12 >= 0.5, s"recall@12/16 lists too low: $r12")
  }

  test("LSH near-dup pairs: recall >= 0.95 vs exact, zero false " +
      "positives (q45 gate)") {
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.35)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(emb, threshold = 0.35, dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-cosine verification ⇒ every reported pair is a true pair
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall = $recall over ${exact.size} true pairs")
  }

  test("LSH near-dup pairs: id-only exchange variant (wide-embedding " +
      "path) is result-identical") {
    val carried = Similarity.lshNearDupPairs(emb, threshold = 0.35, dim = 64)
      .collect().map(_.toString).sorted.toSeq
    val idJoin = Similarity.lshNearDupPairs(emb, threshold = 0.35, dim = 64,
      carryVectors = false)
      .collect().map(_.toString).sorted.toSeq
    assert(idJoin == carried)
  }

  test("LSH near-dup pairs plan: no nested-loop/cartesian join, no " +
      "vector-keyed exchange (q41's scale bug stays fixed)") {
    val plan = Similarity.lshNearDupPairs(emb, threshold = 0.35, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop join in plan:\n$plan")
    val partitionings = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList
    assert(partitionings.nonEmpty)
    partitionings.foreach(p =>
      assert(!p.contains("vec"), s"vector-keyed exchange: $p"))
  }

  test("SemDeDup pairs: zero false positives — every reported pair is " +
      "in the exact pair set with the same cosine (q73 gate)") {
    val idx = Similarity.IvfIndex.build(emb, nLists = 16)
    val sem = Similarity.semDedupPairs(idx, threshold = 0.35)
      .collect().map(_.toString).toSet
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.35)
      .collect().map(_.toString).toSet
    assert(sem.subsetOf(exact), s"false positives: ${sem.diff(exact)}")
    assert(sem.nonEmpty, "cell-blocked pair set is empty on the test corpus")
  }

  test("SemDeDup: planted twins resolve to one kept representative " +
      "per group (q73 gate)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val dim = 64
    // 200 base vectors; every 4th gets a twin at cosine ≈ 0.999
    // (0.05-sigma element noise). Random 64-dim gaussians concentrate
    // pair cosines near 0 (sd ≈ 1/8), so at threshold 0.9 the true
    // pair set IS the twin set.
    val rows = (0 until 200).flatMap { i =>
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val src = (2L * i, v.toSeq)
      if (i % 4 == 0)
        Seq(src, (2L * i + 1,
          v.map(x => x + 0.05f * rng.nextGaussian().toFloat).toSeq))
      else Seq(src)
    }
    val df = rows.toDF("id", "vec")
    val idx = Similarity.IvfIndex.build(df, nLists = 8)
    val out = Similarity.semDedup(idx, threshold = 0.9)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.length == rows.length, "every vector labeled exactly once")
    // twin recall: both halves share a group (lost only when k-means
    // splits a twin across cells — rare at 0.05 sigma)
    val byId = got.map(g => g._1 -> g._2).toMap
    val twinIds = (0 until 200 by 4).map(i => 2L * i)
    val found = twinIds.count(s => byId(s) == byId(s + 1))
    val recall = found.toDouble / twinIds.size
    assert(recall >= 0.8, s"twin recall = $recall (${found}/${twinIds.size})")
    // resolution invariants: group id is the min member id, exactly
    // one keeper per group, keep ⇔ id == group
    got.groupBy(_._2).foreach { case (g, ms) =>
      assert(ms.map(_._1).min == g, s"group $g label is not the min id")
      assert(ms.count(_._3) == 1, s"group $g has ${ms.count(_._3)} keepers")
    }
    got.foreach { case (id, g, keep) => assert(keep == (id == g)) }
  }

  test("cell-local semDedup equals the global components-loop " +
      "formulation row-for-row, including the cell cap") {
    // The r6 plan rewrite's safety net: same pairs (semDedupPairs),
    // same min-label clusters (DupClusters.components), assembled the
    // r5 way, must match the one-exchange union-find path exactly —
    // this is also the spec that pins the in-memory cosine (VecDot
    // fold + BigDecimal.valueOf HALF_UP round) to the Catalyst
    // arithmetic: one ulp of drift would flip a borderline pair.
    val idx = Similarity.IvfIndex.build(emb, nLists = 8)
    def loopForm(threshold: Double, cap: Int) = {
      val pairs = Similarity.semDedupPairs(idx, threshold, cap)
      val ids = idx.assigned
        .select(col("neighbor_id").as("id"), col("list_id"))
      graft.operators.DupClusters.components(ids.select(col("id")), pairs)
        .join(ids, "id")
        .select(col("id"), col("list_id"), col("cluster").as("group_id"),
          (col("id") === col("cluster")).as("keep"))
    }
    for ((th, cap) <- Seq((0.35, 20000), (0.2, 20000), (0.35, 40))) {
      // cap=40 trips the skew guard on some 8-cell assignments of the
      // 500-vector corpus → capped cells must degrade to singletons
      // in BOTH formulations
      val want = loopForm(th, cap).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
        .toSet
      val got = Similarity.semDedup(idx, th, cap).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
        .toSet
      assert(got == want, s"threshold=$th cap=$cap")
    }
  }

  test("IVF index: save/load round-trip answers queries identically " +
      "(offline-build, online-query split)") {
    val queries = emb.filter(col("id") < 10)
    val idx = Similarity.IvfIndex.build(emb, nLists = 16)
    val direct = idx.topK(queries, k = 5, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    val dir = new java.io.File("target/ivf_idx_spec").getAbsolutePath
    idx.save(dir)
    val loaded = Similarity.IvfIndex.load(spark, dir)
    assert(loaded.nLists == 16)
    val viaDisk = loaded.topK(queries, k = 5, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDisk == direct)
  }

  test("q46 probe path: buildIfAbsent loads a parquet-backed index and " +
      "its recall output equals the inline-built one") {
    val queries = emb.filter(col("id") < 20)
    val path = new java.io.File("target/ivf_idx_q46_spec").getAbsolutePath
    val idx = Similarity.IvfIndex.buildIfAbsent(spark, emb, path, nLists = 16)
    // the probe must read postings from parquet — training lineage
    // (KMeansModel.transform) must not appear in the plan
    val probePlan = idx.topK(queries, k = 5, nProbe = 8)
      .queryExecution.optimizedPlan.toString
    assert(probePlan.toLowerCase.contains("parquet"),
      s"probe does not scan the saved index:\n$probePlan")
    // the probed-cells promise at scale: postings are partitioned by
    // list_id, and the probe join carries a dynamic-partition-pruning
    // subquery — only the nProbe cells' files are read, not the corpus
    val executed = idx.topK(queries, k = 5, nProbe = 8)
      .queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning"),
      s"no dynamic partition pruning on the postings scan:\n$executed")
    val viaIndex = Similarity.ivfRecallAtK(idx, emb, queries, k = 5, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    val inline = Similarity.ivfRecallAtK(emb, queries, k = 5,
      nLists = 16, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == inline)
    // second call returns the JVM-cached loaded index, not a rebuild
    assert(Similarity.IvfIndex.buildIfAbsent(spark, emb, path, nLists = 16)
      eq idx)
  }

  test("filtered ANN: matches brute force run per label, and the " +
      "plan is a broadcast hash join on label — no nested loop") {
    val embL = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))
    val got = Similarity.labelFilteredTopK(embL,
        embL.filter(col("id") < 10), k = 3)
      .collect().map(_.toString).sorted.toSeq
    // independent construction: brute-force within each label slice
    val labels = embL.filter(col("id") < 10).select("label")
      .distinct().as[Int].collect()
    val want = labels.flatMap { l =>
      val slice = embL.filter(col("label") === l).drop("label")
      Similarity.bruteForceTopK(slice,
          slice.filter(col("id") < 10), k = 3)
        .collect().map(_.toString)
    }.sorted.toSeq
    assert(got == want)
    val plan = Similarity.labelFilteredTopK(embL,
        embL.filter(col("id") < 10), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("brute-force top-k is reproducible run to run") {
    val a = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("centroid classifier: separable planted classes classify " +
      "perfectly; repartition-invariant; classify plan is exchange-free") {
    import spark.implicits._
    // two orthogonal-ish classes: axis-0-dominant vs axis-1-dominant,
    // with a deterministic per-id wobble on the other axes
    def mk(id: Long, axis: Int): (Long, Seq[Float], Int) = {
      val v = Array.fill(8)(0.01f * ((id % 7) + 1))
      v(axis) = 1.0f
      (id, v.toSeq, axis)
    }
    val labeled = ((0L until 30L).map(mk(_, 0)) ++
      (30L until 60L).map(mk(_, 1)))
      .toDF("id", "vec", "label")
    val got = Similarity.labelCentroidClassify(labeled, labeled)
      .as[(Long, Long, Double)].collect()
    got.foreach { case (id, pred, cos) =>
      assert(pred == (if (id < 30) 0 else 1), s"id=$id pred=$pred")
      assert(cos > 0.9)
    }
    val reparted = Similarity
      .labelCentroidClassify(labeled.repartition(7), labeled.repartition(5))
      .as[(Long, Long, Double)].collect().toSet
    assert(reparted == got.toSet)
    // classify pass is scan-local: the only exchanges belong to the
    // centroid MODEL build (labeled side), none keyed on vectors
    val plan = Similarity.labelCentroidClassify(labeled, labeled)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"), plan)
  }

  test("centroid classifier cardinality guard: literal and broadcast " +
      "routes agree row-for-row; high-k input takes the broadcast " +
      "route with no plan literals (judge r5)") {
    import spark.implicits._
    def mk(id: Long, axis: Int): (Long, Seq[Float], Int) = {
      val v = Array.fill(8)(0.01f * ((id % 7) + 1))
      v(axis) = 1.0f
      (id, v.toSeq, axis)
    }
    val labeled = ((0L until 30L).map(mk(_, 0)) ++
      (30L until 60L).map(mk(_, 1)) ++ (60L until 90L).map(mk(_, 2)))
      .toDF("id", "vec", "label")
    // route equivalence is a CARDINALITY contract too: duplicate ids
    // in the vectors side must yield one prediction per ROW on both
    // routes (the broadcast argmax groups on a per-row key, not id)
    val dup = labeled.limit(1).union(labeled.limit(1))
    assert(Similarity.labelCentroidClassify(labeled, dup,
      maxLiteralLabels = 100).count() == 2)
    assert(Similarity.labelCentroidClassify(labeled, dup,
      maxLiteralLabels = 1).count() == 2)
    // same data through both routes — identical output, including the
    // 9-decimal cosine (the IEEE norm-fold order matches)
    val lit_ = Similarity
      .labelCentroidClassify(labeled, labeled, maxLiteralLabels = 100)
      .as[(Long, Long, Double)].collect().toSet
    val bcast = Similarity
      .labelCentroidClassify(labeled, labeled, maxLiteralLabels = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(lit_ == bcast)
    // the broadcast route is a real broadcast join + partial-agg argmax
    val bplan = Similarity
      .labelCentroidClassify(labeled, labeled, maxLiteralLabels = 1)
      .queryExecution.executedPlan.toString
    assert(bplan.contains("BroadcastNestedLoopJoin") ||
      bplan.contains("BroadcastExchange"), bplan)
    // 10k-label input trips the default budget: the model must never
    // be collected or embedded — the plan stays small (a literal model
    // would put 10k centroid arrays into the plan string)
    val wide = (0L until 10000L)
      .map(i => (i, Seq.fill(4)((i % 11 + 1).toFloat), i.toInt))
      .toDF("id", "vec", "label")
    val wideDf = Similarity.labelCentroidClassify(wide, wide.limit(50))
    assert(wideDf.queryExecution.executedPlan.toString.length < 200000,
      "plan blow-up suggests the literal route ran at high k")
    val preds = wideDf.as[(Long, Long, Double)].collect()
    assert(preds.length == 50)
    // classes with identical vectors tie on cosine → smallest label
    // wins; every prediction is a real label
    assert(preds.forall(p => p._2 >= 0 && p._2 < 10000))
  }
}
