package graft

import org.apache.spark.sql.{AnalysisException, GraftSqlBridge}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.expr.{MinHashSig, SimHashBits}
import graft.operators.{Salting, SimHashDedup}

/** Regression tests for the round-2 advisor findings: each test pins
  * the exact failure mode described in ADVICE.md.
  */
class AdviceSpec extends SparkSpec {
  import spark.implicits._

  test("simhash maxHamming=0: width-64 band buckets discriminate " +
      "(mask must not wrap to 0)") {
    // With the wrapped mask every doc landed in bucket (0,0); a
    // maxBucketSize below the corpus size then dropped the lone bucket
    // and exact-duplicate search returned empty.
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "one two three"), (4L, "four five six"),
      (5L, "seven eight nine"), (6L, "ten eleven twelve"))
      .toDF("id", "text")
    val pairs = SimHashDedup.nearDuplicatePairs(docs, "id", "text",
        maxHamming = 0, maxBucketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), s"expected the exact-dup pair, got $pairs")
  }

  test("NestAggRewrite: nullable collected column + null-absorbing " +
      "lambda must NOT rewrite") {
    // collect_list drops null c BEFORE the transform runs; the
    // substituted form coalesce(c, 0) is non-null per ROW, so a naive
    // rewrite counts rows the list never contained.
    val df = Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)),
      ("b", None)).toDF("g", "c")
    val q = df.groupBy($"g").agg(
      expr("size(transform(collect_list(c), x -> coalesce(x, 0)))").as("n"),
      expr("array_max(transform(collect_list(c), x -> coalesce(x, -1)))")
        .as("mx"))
      .orderBy($"g")
    val rows = q.collect()
    assert(rows(0).getString(0) == "a" && rows(0).getInt(1) == 2 &&
      rows(0).getLong(2) == 20L, rows.mkString(","))
    assert(rows(1).getString(0) == "b" && rows(1).getInt(1) == 0 &&
      rows(1).isNullAt(2), rows.mkString(","))
  }

  test("saltedJoin rejects right/full outer (small side is replicated)") {
    val big = Seq((1L, "x")).toDF("k", "p")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(big, small, "k", 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(big, small, "k", 4, "full")
    }
    // left_semi stays accepted
    assert(Salting.saltedJoin(big, small, "k", 4, "left_semi").count() == 1)
  }

  test("vec_dot: mismatched vector lengths yield NULL, not a " +
      "truncated partial sum") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 5.0f)))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.dot(col("a"), col("a")).as("ok")).collect()(0)
    assert(r.isNullAt(0), "mismatched lengths must be NULL")
    assert(r.getDouble(1) == 5.0)
  }

  test("minhash_sig / simhash_bits reject arrays with nullable elements") {
    val df = Seq(1).toDF("x")
    val badMh = GraftSqlBridge.column(MinHashSig(
      GraftSqlBridge.expression(
        expr("array(cast(1 as bigint), cast(null as bigint))")), 4))
    intercept[AnalysisException] { df.select(badMh).collect() }
    val badSh = GraftSqlBridge.column(SimHashBits(
      GraftSqlBridge.expression(
        expr("array(array(cast(1 as bigint)), cast(null as array<bigint>))"))))
    intercept[AnalysisException] { df.select(badSh).collect() }
  }

  // ---- round-3 advisor findings ------------------------------------

  test("unpack extracts struct fields by ORDINAL: duplicate field " +
      "names bind positionally") {
    // struct(k, k) has two same-named fields; name-based getField would
    // resolve both targets to the first field (or be ambiguous)
    val df = Seq((1, 2)).toDF("x", "y")
      .select(struct(col("x").as("k"), col("y").as("k")).as("s"))
    val out = graft.dsl.Query.forIn("r", df)
      .let(Seq("p", "q"), col("r.s"))
      .select("p" -> col("p"), "q" -> col("q"))
      .collect()(0)
    assert(out.getInt(0) == 1 && out.getInt(1) == 2, out.toString)
  }

  test("duplicate names within one forIn/let unpack are rejected") {
    val df = Seq((1, 2)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      graft.dsl.Query().forIn(Seq("a", "a"), df)
    }
    intercept[IllegalArgumentException] {
      graft.dsl.Query.forIn("r", df)
        .let(Seq("b", "b"), struct(col("r.x"), col("r.y")))
    }
  }

  test("match root-level 'as z' binds the ORIGINAL document text " +
      "verbatim (no Jackson re-rendering)") {
    import graft.dsl.MatchPattern._
    val raw = """{"a": 1.50}""" // re-render would give {"a":1.5}
    val df = Seq(raw).toDF("j")
    val out = graft.dsl.Query.forIn("r", df)
      .matchRow(col("r.j"),
        Pat(Seq(field("a").as("x")), bindParentTo = Some("z")))
      .select("z" -> col("z")).collect()
    assert(out.length == 1 && out(0).getString(0) == raw,
      out.map(_.getString(0)).mkString(","))
  }

  test("streaming TTL survives a batch of only-late rows (timeout " +
      "clamped past the watermark)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.StreamDedup.simhashPairsStream(
      ms.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds"),
      maxHamming = 4, evictAfter = Some(1000L))
      .writeStream.format("memory").queryName("late_clamp")
      .outputMode("append").start()
    try {
      ms.addData((1L, "some document text here", ts(100)))
      q.processAllAvailable() // watermark advances to ts(100)
      // derived et column carries no event-time metadata, so this
      // late-only batch reaches the function; maxEt + ttl is far
      // below the watermark — unclamped setTimeoutTimestamp threw
      ms.addData((2L, "entirely different words now", ts(0)))
      q.processAllAvailable()
      assert(q.isActive, "query must survive a late-only batch")
    } finally q.stop()
  }

  test("SnapshotDiff fingerprint: NULL shifting between columns and " +
      "separator-in-value payloads are distinct (r10 advice)") {
    import graft.operators.SnapshotDiff
    // (text='x', lang=NULL) vs (text=NULL, lang='x'): the plain
    // concat_ws fingerprint collided (both render "x"), silently
    // dropping a real change from the CDC round-trip.
    val v1 = Seq((1L, Option("x"), Option.empty[String]))
      .toDF("doc_id", "text", "lang")
    val v2 = Seq((1L, Option.empty[String], Option("x")))
      .toDF("doc_id", "text", "lang")
    val d = SnapshotDiff.diff(v1, v2, "doc_id", Seq("text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(d == Seq((1L, "changed")), d.mkString(","))
    // a 0x1F inside a value must not re-align the column boundary
    val w1 = Seq((1L, "a\u001fb", "c")).toDF("doc_id", "text", "lang")
    val w2 = Seq((1L, "a", "b\u001fc")).toDF("doc_id", "text", "lang")
    val d2 = SnapshotDiff.diff(w1, w2, "doc_id", Seq("text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(d2 == Seq((1L, "changed")), d2.mkString(","))
    // and genuinely identical payloads (incl. NULLs) stay unchanged
    val same = SnapshotDiff.diff(v1, v1, "doc_id", Seq("text", "lang"))
    assert(same.isEmpty, "identical snapshots must diff to nothing")
  }

  test("KsDrift: single-group corpus yields NULL ks, not Infinity " +
      "(r10 advice)") {
    val df = Seq(("only", 1L), ("only", 2L), ("only", 3L))
      .toDF("source", "v")
    val out = graft.operators.KsDrift.perGroupKs(df, "source", "v")
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "only" &&
      out(0).isNullAt(2), out.mkString(","))
  }

  test("KsDrift: two-level prefix decomposition matches a direct " +
      "pandas-free reference on a multi-group fixture") {
    // tiny fixture with ties, gaps and a dominant group — the exact
    // KS is computable by hand per distinct value
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 2L), ("b", 5L), ("b", 5L),
      ("c", 9L)).toDF("src", "len")
    val out = graft.operators.KsDrift.perGroupKs(df, "src", "len")
      .orderBy("src").collect()
    // group a: n=4, rest=4; CDFs over v in {1,2,5,9}:
    //   cum_a = 1:2, 2:2, 5:3, 9:4 ; cum_rest = 1:0, 2:1, 5:3, 9:4
    //   D = max|2*4-0*4|=8, |2*4-1*4|=4, |3*4-3*4|=0, 0 -> 8/16=0.5 at v=1
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 4 &&
      out(0).getDouble(2) == 0.5 && out(0).getLong(3) == 1L,
      out.mkString(","))
    // group b: n=3, rest=5; cum_b = 1:0,2:1,5:3,9:3; rest=1:2,2:2,5:3,9:5
    //   |0*5-2*3|=6, |1*5-2*3|=1, |3*5-3*3|=6, |3*5-5*3|=0 -> 6/15=0.4 at v=1
    assert(out(1).getString(0) == "b" && out(1).getLong(1) == 3 &&
      out(1).getDouble(2) == 0.4 && out(1).getLong(3) == 1L,
      out.mkString(","))
    // group c: n=1, rest=7; cum_c=1:0,2:0,5:0,9:1; rest=1:2,2:3,5:6,9:7
    //   |0-2|=2,|0-3|=3,|0-6|=6,|7-7|=0 -> 6/7=0.857143 at v=5
    assert(out(2).getString(0) == "c" && out(2).getLong(1) == 1 &&
      out(2).getDouble(2) == 0.857143 && out(2).getLong(3) == 5L,
      out.mkString(","))
  }

  test("Diversity: an all-zero vector is excluded, not " +
      "group-poisoning (r10 advice)") {
    val emb = Seq(
      ("g", Array(1.0f, 0.0f)), ("g", Array(0.0f, 1.0f)),
      ("g", Array(0.0f, 0.0f)), // zero vector: no direction
      ("z", Array(0.0f, 0.0f))) // group of only zeros: vanishes
      .toDF("label", "embedding")
    val out = graft.operators.Diversity
      .meanPairwiseCosine(emb, "label", "embedding")
      .orderBy("label").collect()
    assert(out.length == 1 && out(0).getString(0) == "g" &&
      out(0).getLong(1) == 2 && out(0).getDouble(2) == 0.0,
      out.mkString(","))
  }

  test("ProductQuant.normalize drops zero vectors (r10 advice)") {
    val emb = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("id", "vec")
    val out = graft.operators.ProductQuant.normalize(emb)
      .orderBy("id").collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    val v = out(0).getSeq[Double](1)
    assert(math.abs(v(0) - 0.6) < 1e-9 && math.abs(v(1) - 0.8) < 1e-9)
  }

  test("heapsFit: empty checkpoint prefixes are excluded from the " +
      "OLS, not silently summed as NULL (r10 advice)") {
    // with the zero row included, Spark's ln(0) -> NULL would be
    // skipped by sum() while count() still saw 4 rows — a silently
    // wrong beta; DuckDB would instead error on ln(0)
    val cum = Seq((0, 10L, 0L), (1, 10L, 2L), (2, 18L, 4L),
      (3, 30L, 8L)).toDF("chk", "vocab", "n_docs")
    val out = graft.queries.StatQueries.heapsFit(cum)
      .orderBy("chk").collect()
    assert(out.length == 3 && out.map(_.getInt(0)).toSeq == Seq(1, 2, 3),
      out.mkString(","))
    val beta = out(0).getDouble(3)
    // exact OLS of ln(vocab) on ln(n_docs) over the 3 surviving
    // checkpoints (4-decimal ln rounding, half-up to 6): 0.792471
    assert(beta == 0.792471, s"beta=$beta")
  }

  test("index maintenance no-op invariants: an unchanged re-crawl " +
      "leaves both postings tables bit-identical (empty delta path)") {
    import graft.operators.{IndexMaintenance, KMeansExact, Retrieval}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
      .limit(60)
    val model = KMeansExact.fitModel(emb, "id", "embedding",
      k = 4, iters = 2)
    val postings = KMeansExact
      .assignFitted(emb, "id", "embedding", model)
      .select(col("id"), col("cluster"))
    val updated = IndexMaintenance
      .updatePostings(postings, emb, emb, "id", "embedding", model)
    // v2 == v1 ⇒ the delta is EMPTY: no evictions, no fresh
    // assignments — the table must come back row-identical
    assert(updated.count() == 60 &&
      updated.join(postings, Seq("id", "cluster")).count() == 60)

    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val v1post = Retrieval.postings(docs, "doc_id", "text")
      .localCheckpoint(eager = false)
    val upd2 = IndexMaintenance
      .updateTextPostings(v1post, docs, docs, "doc_id", "text")
    val n = v1post.count()
    assert(upd2.count() == n &&
      upd2.join(v1post, Seq("doc_id", "dl", "term", "tf")).count() == n)
  }

  test("waterFill: an n=0 group emits epochs 0.0, not NaN (r11 advice)") {
    import spark.implicits._
    val counts = Seq(("a", 100L), ("b", 0L)).toDF("src", "n")
    val out = graft.operators.Budgeting
      .waterFill(counts, "src", "n", 2L, 1L, 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    assert(out("b") == ((0L, 0.0)))
    assert(!out.values.exists(_._2.isNaN))
  }

  test("tokenBudgetSamplePerClass: duplicate class rows in the " +
      "budgets frame fail loudly instead of re-emitting every bucket " +
      "row (r11 advice)") {
    import spark.implicits._
    val docs = Seq((1L, 5L, "en"), (2L, 5L, "en"))
      .toDF("doc_id", "n_tok", "lang")
    val budgets = Seq(("en", 100L), ("en", 50L)).toDF("lang", "b")
    val e = intercept[Throwable] {
      graft.operators.CorpusOps.tokenBudgetSamplePerClass(
        docs, "doc_id", "n_tok", "lang", budgets).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate budget rows")),
      msgs(e).mkString(" | "))
    // distinct class keys still pass (and NULL class keeps its key)
    val ok = graft.operators.CorpusOps.tokenBudgetSamplePerClass(
      docs, "doc_id", "n_tok", "lang",
      Seq(("en", 100L)).toDF("lang", "b")).collect()
    assert(ok.length == 2)
  }

  test("tokenBudgetSamplePerClass: duplicate rows under a NULL class " +
      "key keep the diagnostic text (concat with a NULL class would " +
      "raise a null message) (r12 advice)") {
    import spark.implicits._
    val docs = Seq((1L, 5L, Option.empty[String]),
      (2L, 5L, Option.empty[String])).toDF("doc_id", "n_tok", "lang")
    val budgets = Seq((Option.empty[String], 100L),
      (Option.empty[String], 50L)).toDF("lang", "b")
    val e = intercept[Throwable] {
      graft.operators.CorpusOps.tokenBudgetSamplePerClass(
        docs, "doc_id", "n_tok", "lang", budgets).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("duplicate budget rows") &&
      m.contains("NULL")), msgs(e).mkString(" | "))
  }

  test("containmentFlagStream budget gate bounds total shingle CELLS, " +
      "not just rows: a corpus of few huge documents fails loudly " +
      "(r12 advice)") {
    import spark.implicits._
    // two docs sharing one rare phrase (df=2 shingles) plus ~100
    // unique tokens each: postings = 4 rows, docTab = 2 rows — both
    // under maxModelRows=100 — but each docTab row carries the doc's
    // FULL distinct-shingle array, so shingle cells ≈ 200 blow the
    // same budget
    def body(tag: String) =
      (0 until 100).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, s"shared rare phrase ${body("a")}"),
      (2L, s"shared rare phrase ${body("b")}")).toDF("doc_id", "text")
    val probe = Seq((10L, "shared rare phrase probe"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamDedup.containmentFlagStream(
        probe, corpus, w = 2, maxModelRows = 100L)
    }
    assert(e.getMessage.contains("shingleCells"), e.getMessage)
    // the same corpus passes once the cell budget fits
    graft.streaming.StreamDedup.containmentFlagStream(
      probe, corpus, w = 2, maxModelRows = 1000L)
  }

  test("parquetRowCount is NOT served stale after a same-path " +
      "overwrite in one JVM (r13 advice: mtime-qualified cache key)") {
    import spark.implicits._
    val path = new java.io.File("target/advice_rowcount_probe").getPath
    (1L to 5L).toDF("v").coalesce(1).write.mode("overwrite").parquet(path)
    assert(graft.sources.Artifacts.parquetRowCount(path) == 5L)
    // same path, different data: a path-only cache key would keep
    // answering 5 and hand a sizing law the dead corpus's count.
    // (sleep keeps the directory mtime strictly increasing even on a
    // coarse-granularity filesystem)
    Thread.sleep(1200)
    (1L to 9L).toDF("v").coalesce(1).write.mode("overwrite").parquet(path)
    assert(graft.sources.Artifacts.parquetRowCount(path) == 9L)
  }

  test("IVF _meta is rewritten on a fingerprint-triggered rebuild, " +
      "not left stale from the previous corpus (r13 advice)") {
    import spark.implicits._
    import graft.operators.Similarity
    def vec(seed: Int) = Array.tabulate(4)(i =>
      ((seed * 31 + i * 7) % 13).toFloat)
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, vec(i))).toDF("id", "vec")
    val data = new java.io.File("target/advice_meta_corpus").getPath
    val idx = new java.io.File("target/advice_meta_ivf").getPath
    corpus(40).coalesce(1).write.mode("overwrite").parquet(data)
    def build(metaRows: String) = Similarity.IvfIndex.buildIfAbsent(
      spark, spark.read.parquet(data), idx, nLists = 4,
      fingerprint =
        Some(graft.sources.ArtifactGuard.dataFingerprint(spark, data)),
      meta = Map("corpus_rows" -> metaRows))
    build("40")
    assert(graft.sources.ArtifactGuard.readMeta(spark, idx)
      .get("corpus_rows").contains("40"))
    // regenerate the corpus at the same path with a different count
    // that keeps the SAME artifact path (caller passes the same idx
    // dir) — the fingerprint guard rebuilds, and _meta must follow
    Thread.sleep(1200)
    corpus(44).coalesce(1).write.mode("overwrite").parquet(data)
    build("44")
    assert(graft.sources.ArtifactGuard.readMeta(spark, idx)
      .get("corpus_rows").contains("44"),
      "rebuilt index kept the previous corpus's _meta")
  }
}
