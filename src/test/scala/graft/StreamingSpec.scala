package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming transforms: batch/stream parity for sessionization (the
  * same declarative plan runs incrementally), and custom keyed state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private val eventData = Seq(
    // user 1: two sessions (gap > 30 min between minute 40 and 100)
    (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(40), 3.0),
    (1L, ts(100), 4.0), (1L, ts(110), 5.0),
    // user 2: one session
    (2L, ts(5), 10.0), (2L, ts(20), 20.0))

  test("sessionize: stream equals batch (same plan, incremental run)") {
    val batch = Streams.sessionize(
      eventData.toDF("user_id", "ts", "value"))
      .orderBy(col("user_id"), col("session_start"))
      .collect().map(_.toString).toSeq

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.sessionize(ms.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      ms.addData(eventData: _*)
      q.processAllAvailable()
      val stream = spark.table("sess")
        .orderBy(col("user_id"), col("session_start"))
        .collect().map(_.toString).toSeq
      assert(stream == batch)
      assert(batch.length == 3) // u1 x2 sessions + u2 x1
    } finally q.stop()
  }

  test("interval join: stream pair set equals the batch banded join, " +
      "across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      (100L, 1L, ts(0)), (101L, 1L, ts(30)), (102L, 2L, ts(10)))
    val buys = Seq(
      (200L, 1L, ts(5)), (201L, 1L, ts(90)), (202L, 2L, ts(25)),
      (203L, 3L, ts(10)))
    // batch truth via the banded operator (15-minute window)
    val batch = graft.operators.TemporalJoins.bandedTimeJoin(
        clicks.toDF("click_id", "user_id", "cts")
          .withColumn("cms", unix_millis(col("cts"))).drop("cts"),
        buys.toDF("buy_id", "user_id", "bts")
          .withColumn("bms", unix_millis(col("bts"))).drop("bts"),
        Seq("user_id"), "cms", "bms", windowMs = 15L * 60000L)
      .select("click_id", "buy_id").as[(Long, Long)].collect().sorted.toSeq

    val msL = MemoryStream[(Long, Long, Timestamp)]
    val msR = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.intervalJoinStream(
      msL.toDF().toDF("click_id", "user_id", "cts"),
      msR.toDF().toDF("buy_id", "user_id", "bts"),
      Seq("user_id"), "cts", "bts", window = "15 minutes")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      // matching rows arrive in DIFFERENT batches — the state store
      // must hold each side until the watermark passes the window
      msL.addData(clicks.head); msR.addData(buys.take(2): _*)
      q.processAllAvailable()
      msL.addData(clicks.tail: _*); msR.addData(buys.drop(2): _*)
      q.processAllAvailable()
      val stream = spark.table("ivj").select("click_id", "buy_id")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(stream == batch, s"stream=$stream batch=$batch")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("runningTotals: custom keyed state accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Streams.UserEvent]
    val q = Streams.runningTotals(ms.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("append").start()
    try {
      ms.addData(Streams.UserEvent(1L, 5.0), Streams.UserEvent(1L, 7.0))
      q.processAllAvailable()
      ms.addData(Streams.UserEvent(1L, 8.0), Streams.UserEvent(2L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("totals")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("total")).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1L, 3L, 20.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("tumbling counts run over the events table shape") {
    val df = eventData.toDF("user_id", "ts", "value")
      .withColumn("event_type", lit("click"))
    val out = Streams.tumblingCounts(df).orderBy(col("bucket_start")).collect()
    assert(out.map(_.getLong(2)).sum == 7L)
  }

  test("streaming simhash near-dup: duplicate arriving batches later " +
      "is caught; pair set equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val d1 = "the quick brown fox jumps over the lazy dog again and again"
    val d2 = d1.replace("dog", "cat") // near-dup of d1
    val d3 = "completely different text about spark physical plans here"
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.simhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), maxHamming = 16)
      .writeStream.format("memory").queryName("sh_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, d1), (3L, d3))
      q.processAllAvailable()
      ms.addData((2L, d2)) // near-dup arrives a batch later
      q.processAllAvailable()
      val got = spark.table("sh_stream")
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .distinct() // per-band at-least-once → dedupe like the batch op
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = graft.operators.SimHashDedup.nearDuplicatePairs(
        Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch && got.exists(p => p._1 == 1L && p._2 == 2L),
        s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("streaming simhash at 128-bit: cross-batch pair set equals the " +
      "batch operator at the same width") {
    implicit val sqlCtx = spark.sqlContext
    val d1 = "the quick brown fox jumps over the lazy dog again and again"
    val d2 = d1.replace("dog", "cat")
    val d3 = "completely different text about spark physical plans here"
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.simhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), maxHamming = 24, fpBits = 128)
      .writeStream.format("memory").queryName("sh128_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, d1), (3L, d3))
      q.processAllAvailable()
      ms.addData((2L, d2)) // near-dup arrives a batch later
      q.processAllAvailable()
      val got = spark.table("sh128_stream")
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = graft.operators.SimHashDedup.nearDuplicatePairs(
        Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 24, fpBits = 128)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch && got.exists(p => p._1 == 1L && p._2 == 2L),
        s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("streaming minhash near-dup: cross-batch candidate detection; " +
      "verified pair set equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    // docs from the real corpus so jaccard arithmetic is exercised on
    // natural text; doc 2 is a shingle-level near-dup of doc 1
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, base),
      (2L, base + " phi"),                       // jaccard >= 0.8 vs 1
      (3L, "unrelated words entirely different document content here"),
      (4L, "another distinct document with its own vocabulary set"))
    val corpusDf = corpus.toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.minhashPairsStream(
      ms.toDF().toDF("doc_id", "text"), corpusDf, threshold = 0.8)
      .writeStream.format("memory").queryName("mh_stream")
      .outputMode("append").start()
    try {
      ms.addData(corpus(0), corpus(2))
      q.processAllAvailable()
      ms.addData(corpus(1), corpus(3)) // near-dup arrives a batch later
      q.processAllAvailable()
      val got = spark.table("mh_stream")
        .distinct() // per-band at-least-once → dedupe like the batch op
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.MinHashDedup.nearDuplicatePairs(
        corpusDf, "doc_id", "text", threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == batch && got.exists(p => p._1 == 1L && p._2 == 2L),
        s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("streaming cleaning pipeline: quality filter composes with " +
      "exact dedup in one incremental query") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions.qualityScore
    val ms = MemoryStream[(Long, String, Timestamp)]
    // scan-local scoring + keyed dedup state in ONE streaming plan —
    // the q48 front half running incrementally
    val cleaned = Streams.dedupExactStream(
      ms.toDF().toDF("doc_id", "text", "ts")
        .withColumn("quality", qualityScore(col("text")))
        .filter(col("quality") >= 0.2))
    val q = cleaned.writeStream.format("memory").queryName("clean_s")
      .outputMode("append").start()
    try {
      val junk = "!!! ??? !!! ??? !!! ??? !!! ???" // punct-heavy → filtered
      ms.addData((1L, "the cat sat on the mat and then it sat again", ts(0)),
        (2L, junk, ts(1)))
      q.processAllAvailable()
      ms.addData( // duplicate of doc 1 in a later batch + a keeper
        (3L, "the cat sat on the mat and then it sat again", ts(2)),
        (4L, "a second fluent document with many plain words", ts(3)))
      q.processAllAvailable()
      val ids = spark.table("clean_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("streaming exact dedup: first-seen doc per fingerprint wins, " +
      "cross-batch, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.dedupExactStream(
      ms.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()
    try {
      ms.addData((1L, "hello world", ts(0)), (2L, "other text", ts(1)))
      q.processAllAvailable()
      // duplicate arrives in a LATER batch, within the watermark
      ms.addData((3L, "hello world", ts(2)), (4L, "third text", ts(3)))
      q.processAllAvailable()
      val ids = spark.table("dedup_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("streaming n-gram contamination: per-doc verdicts as docs " +
      "arrive equal the batch operator on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val benchmark = docs.filter(col("doc_id") % 50 === 0)
    val rows = docs.as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = graft.operators.Contamination.flagNgramOverlapStream(
      ms.toDF().toDF("doc_id", "text"), benchmark, "doc_id", "text",
      n = 13)
      .writeStream.format("memory").queryName("contam_s")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // verdicts are per-doc: batch split is free
      q.processAllAvailable()
      val got = spark.table("contam_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      val batch = graft.operators.Contamination
        .flagNgramOverlap(docs, benchmark, "doc_id", "text", n = 13)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(got == batch)
      assert(got.exists(_._3) && got.exists(!_._3)) // non-trivial corpus
    } finally q.stop()
  }

  test("streaming cross-corpus near-dup decontamination: flagged set " +
      "equals the batch q91 operator on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    val d = Tables.load(spark, sf0001, "documents")
    val refSrc = Seq("src0", "src1", "src2", "src3")
    val reference = d.filter(col("source").isin(refSrc: _*))
      .select(col("doc_id"), col("text"))
    val corpus = d.filter(!col("source").isin(refSrc: _*))
      .select(col("doc_id"), col("text"))
    val rows = corpus.as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.crossCorpusFlagStream(
      ms.toDF().toDF("doc_id", "text"), reference, threshold = 0.8)
      .writeStream.format("memory").queryName("xcorp_s")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // stateless: batch split can't matter
      q.processAllAvailable()
      val got = spark.table("xcorp_s")
        .select("doc_id", "ref_id").distinct() // at-least-once per band
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.MinHashDedup.crossCorpusNearDupPairs(
        corpus, reference, "doc_id", "text", threshold = 0.8)
        .select(col("corp_id"), col("ref_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"stream=$got batch=$batch")
      assert(got.nonEmpty) // the corpus plants cross-source near-dups
    } finally q.stop()
  }

  test("streaming manifest: whole epochs + remainder admission " +
      "reproduce batch materializeSample under per-class hash order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions.tokenCount
    import graft.streaming.Streams.BudgetDoc
    val rows = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .localCheckpoint(eager = false)
    val tok = rows.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
    val alloc = graft.operators.Budgeting
      .waterFill(tok, "source", "n_tokens", 2L, 9L, 5L)
      .localCheckpoint(eager = false)
    val batch = graft.operators.Budgeting
      .materializeSample(rows, "doc_id", "n_tok", "source", alloc,
        "n_tokens")
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the model: the same exact integral (w, rem) decomposition
    // materializeSample derives from alloc_micro
    val plan = alloc.select(col("source"),
        expr("cast(alloc_micro as decimal(38,0)) div 1000000")
          .as("atok"),
        col("n_tokens"))
      .collect().map { r =>
        val (atok, n) = (r.getLong(1), r.getLong(2))
        val w = if (n > 0) atok / n else 0L
        r.getString(0) -> ((w, atok - w * n))
      }.toMap
    // feed in the batch sampler's per-class Knuth-hash order; the
    // two-batch split exercises the remainder state across batches
    val ordered = rows
      .withColumn("_h", pmod(col("doc_id") * lit(2654435761L),
        lit(2147483647L)))
      .orderBy(col("_h"), col("doc_id"))
      .select("doc_id", "source", "n_tok").collect()
      .map(r => BudgetDoc(r.getLong(0), r.getString(1), r.getLong(2)))
    val ms = MemoryStream[BudgetDoc]
    val q = graft.streaming.Streams.manifestStream(ms.toDS(), plan)
      .writeStream.format("memory").queryName("mani_s")
      .outputMode("append").start()
    try {
      val (a, b) = ordered.splitAt(ordered.length / 2)
      ms.addData(a.toSeq)
      q.processAllAvailable()
      ms.addData(b.toSeq)
      q.processAllAvailable()
      val got = spark.table("mani_s").select("doc_id", "epoch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"diff=${(got diff batch) ++ (batch diff got)}")
      assert(got.nonEmpty)
      // both halves of the face are non-trivially exercised
      assert(plan.values.exists(_._1 > 0) &&
        plan.values.exists(_._2 > 0), plan.toString)
    } finally q.stop()
  }

  test("streaming containment flag: replaying the corpus against its " +
      "own fitted blocking frames reproduces the batch pair set " +
      "value-for-value, exactly once per direction") {
    implicit val sqlCtx = spark.sqlContext
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    // batch truth: the q164 operator at its registered defaults
    val batch = graft.operators.Containment
      .pairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val rows = d.as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.containmentFlagStream(
      ms.toDF().toDF("doc_id", "text"), d)
      .writeStream.format("memory").queryName("cont_s")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // stateless: batch split can't matter
      q.processAllAvailable()
      val out = spark.table("cont_s").collect()
      // direction-normalized tuples must equal the batch rows
      // BIT-EXACTLY (same keys, counts, and rounded double)
      val got = out.map { r =>
        val (docId, corpId) = (r.getLong(0), r.getLong(1))
        val (na, nb) = (r.getLong(2), r.getLong(3))
        if (docId < corpId)
          (docId, corpId, na, nb, r.getLong(4), r.getDouble(5))
        else (corpId, docId, nb, na, r.getLong(4), r.getDouble(5))
      }.toSet
      assert(got == batch, s"stream=$got batch=$batch")
      assert(got.nonEmpty) // the corpus plants containment pairs
      // full-corpus replay sees each pair from BOTH sides, and the
      // min-rare-shingle filter must emit each side exactly once
      assert(out.length == 2 * batch.size,
        s"expected exactly-once per direction: ${out.length} rows " +
          s"for ${batch.size} pairs")
    } finally q.stop()
  }

  test("streaming containment flag: an ARRIVING wrapper document not " +
      "in the static corpus is caught at containment 1.0 (the " +
      "quote-inclusion capability, production split)") {
    implicit val sqlCtx = spark.sqlContext
    // the blocking df is FITTED on the static corpus alone (arriving
    // docs can't move it), so the quoted original appears twice there
    // — its shingles sit at df=2, inside the [2,5] window — while the
    // arriving wrapper (filler + the original whole) was never seen
    // at fit time and the filler-only arrival shares no rare shingle
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val filler = (1 to 120).map(i => s"pad$i").mkString(" ")
    val corpus = Seq((1L, small), (2L, small))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamDedup.containmentFlagStream(
      ms.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("cont_fx")
      .outputMode("append").start()
    try {
      ms.addData((10L, s"$filler $small"), (11L, filler))
      q.processAllAvailable()
      val got = spark.table("cont_fx")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(5))).toSet
      assert(got == Set((10L, 1L, 1.0), (10L, 2L, 1.0)), got.toString)
    } finally q.stop()
  }

  test("streaming containment flag: the fitted-model budget gate " +
      "fails loudly on an over-sized static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val ms = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamDedup.containmentFlagStream(
        ms.toDF().toDF("doc_id", "text"), d, maxModelRows = 1L)
    }
    assert(e.getMessage.contains("maxModelRows"))
  }

  test("centroid classification is streaming-safe AS-IS: the literal-" +
      "centroid classify pass runs on a stream with batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))
    val rows = emb.select(col("id"), col("vec").cast("array<double>"),
      col("label")).as[(Long, Seq[Double], Int)].collect()
    val ms = MemoryStream[(Long, Seq[Double], Int)]
    // the model is plan literals and the classify pass is a stateless
    // projection, so the SAME operator call compiles to a streaming
    // plan with no state store — the labeled (static) side trains,
    // the stream side classifies
    val q = graft.operators.Similarity.labelCentroidClassify(
      emb, ms.toDF().toDF("id", "vec", "label"))
      .writeStream.format("memory").queryName("centroid_s")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val got = spark.table("centroid_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batch = graft.operators.Similarity.labelCentroidClassify(emb, emb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming semantic dedup: cross-batch pair set equals the " +
      "batch semDedupPairs over the same prebuilt quantizer") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val idx = graft.operators.Similarity.IvfIndex.build(emb, nLists = 8)
    val batch = graft.operators.Similarity
      .semDedupPairs(idx, threshold = 0.35)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val rows = emb.select(col("id"), col("vec").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamDedup.semanticPairsStream(
      ms.toDF().toDF("id", "vec")
        .withColumn("vec", col("vec").cast("array<float>")),
      idx, threshold = 0.35)
      .writeStream.format("memory").queryName("sem_stream")
      .outputMode("append").start()
    try {
      // three chunks: pairs whose halves arrive in different batches
      // must still be caught (state), and within-batch pairs too
      val (a, bc) = rows.splitAt(rows.length / 3)
      val (b, c) = bc.splitAt(bc.length / 2)
      Seq(a, b, c).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("sem_stream")
        .select(col("id_a"), col("id_b"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // EXACT equality, cosines included: the streaming verify is the
      // same bit arithmetic (Similarity.cosine9) as the batch plan's
      // Catalyst expressions, and centroid assignment agrees with the
      // saved postings on this corpus
      assert(got == batch,
        s"stream-only=${got -- batch} batch-only=${batch -- got}")
      assert(batch.nonEmpty, "corpus has no semantic pairs at 0.35?")
    } finally q.stop()
  }

  test("streaming semantic dedup: an overflowing cell CLOSES (the " +
      "batch whole-cell-drop analog) and emits nothing afterwards") {
    implicit val sqlCtx = spark.sqlContext
    // five near-identical vectors -> one cell (the far-away anchors
    // hold the other KMeans cell), every pair cosine ~1; cap 3: pairs
    // among the first three only, then the cell closes
    val base = Seq(1L, 2L, 3L, 4L, 5L)
      .map(i => (i, Seq(1.0f, 0.001f * i)))
    val anchors = Seq(100L, 101L).map(i => (i, Seq(-1.0f, 0.002f * i)))
    val staticDf = (base ++ anchors).toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))
    val idx = graft.operators.Similarity.IvfIndex.build(staticDf, nLists = 2)
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamDedup.semanticPairsStream(
      ms.toDF().toDF("id", "vec")
        .withColumn("vec", col("vec").cast("array<float>")),
      idx, threshold = 0.9, maxCellSize = 3)
      .writeStream.format("memory").queryName("sem_cap")
      .outputMode("append").start()
    try {
      base.foreach { case (i, v) =>
        ms.addData((i, v.map(_.toDouble))); q.processAllAvailable()
      }
      val got = spark.table("sem_cap").select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"expected only pre-saturation pairs, got $got")
    } finally q.stop()
  }

  test("streaming token budget: arrival-order prefix per class, " +
      "exhausted classes stay closed across batches, one-doc overshoot") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.BudgetDoc
    val ms = MemoryStream[BudgetDoc]
    val q = graft.streaming.Streams.tokenBudgetStream(ms.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget_s")
      .outputMode("append").start()
    try {
      // batch 1: class a spends 40+50=90 (<100) then 30 admitted
      // (run-before 90 < 100, overshoots to 120); class b spends 60
      ms.addData(BudgetDoc(1, "a", 40), BudgetDoc(2, "a", 50),
        BudgetDoc(3, "a", 30), BudgetDoc(4, "b", 60))
      q.processAllAvailable()
      // batch 2: class a is exhausted (120 >= 100) → 5 dropped;
      // class b admits 50 (run-before 60 < 100 → overshoot to 110)
      ms.addData(BudgetDoc(5, "a", 10), BudgetDoc(6, "b", 50))
      q.processAllAvailable()
      // batch 3: class b now exhausted (110 >= 100) → 7 dropped
      ms.addData(BudgetDoc(7, "b", 10))
      q.processAllAvailable()
      val got = spark.table("budget_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L, 4L, 6L), got.toString)
    } finally q.stop()
  }

  test("streaming token budget: NULL class keeps its OWN budget, " +
      "separate from the empty-string class (advisor r5)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.BudgetDoc
    val ms = MemoryStream[BudgetDoc]
    val q = graft.streaming.Streams.tokenBudgetStream(ms.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget_null_s")
      .outputMode("append").start()
    try {
      // If NULL and "" shared one budget, doc 3 (run-before 80+90=170)
      // would be dropped; with separate budgets every doc's run-before
      // is under 100 within its own class
      ms.addData(BudgetDoc(1, null, 80), BudgetDoc(2, "", 90),
        BudgetDoc(3, null, 50), BudgetDoc(4, "", 40))
      q.processAllAvailable()
      // both classes now exhausted independently (130 and 130 >= 100)
      ms.addData(BudgetDoc(5, null, 1), BudgetDoc(6, "", 1))
      q.processAllAvailable()
      val got = spark.table("budget_null_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L, 4L), got.toString)
    } finally q.stop()
  }

  test("streaming per-class budgets: hash-order arrival reproduces " +
      "the batch per-class sampler exactly; absent classes admit " +
      "nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions.tokenCount
    import graft.streaming.Streams.BudgetDoc
    val rows = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .localCheckpoint(eager = false)
    // the water-fill's fractional-epoch remainders as the budgets —
    // the exact model q196's admission stage runs under
    val tok = rows.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
    val budgets = graft.operators.Budgeting
      .waterFill(tok, "source", "n_tokens", 2L, 9L, 5L)
      .select(col("source"), col("n_tokens"),
        expr("cast(alloc_micro as decimal(38,0)) div 1000000")
          .as("atok"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2) % math.max(r.getLong(1), 1L)))
      .toMap
      .filter(_._2 > 0) // a dropped class tests the absent-key path
    val batch = graft.operators.CorpusOps
      .tokenBudgetSamplePerClass(rows, "doc_id", "n_tok", "source",
        budgets.toSeq.toDF("source", "b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // feed the stream in the batch sampler's per-class hash order
    val ordered = rows
      .withColumn("_h", pmod(col("doc_id") * lit(2654435761L),
        lit(2147483647L)))
      .orderBy(col("_h"), col("doc_id"))
      .select("doc_id", "source", "n_tok").collect()
      .map(r => BudgetDoc(r.getLong(0), r.getString(1), r.getLong(2)))
    val ms = MemoryStream[BudgetDoc]
    val q = graft.streaming.Streams
      .perClassBudgetStream(ms.toDS(), budgets)
      .writeStream.format("memory").queryName("pcb_s")
      .outputMode("append").start()
    try {
      ms.addData(ordered.toSeq)
      q.processAllAvailable()
      val got = spark.table("pcb_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == batch,
        s"stream/batch divergence: only-stream=${got -- batch} " +
          s"only-batch=${batch -- got}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming ingestion program: quality gate -> n-gram " +
      "decontamination -> token-budget admission in ONE incremental query") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions.{qualityScore, tokenCount}
    import graft.streaming.Streams.BudgetDoc
    val d = Tables.load(spark, sf0001, "documents")
    val benchmark = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
    val rows = d.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    val ms = MemoryStream[(Long, String, String)]
    // three stages, one streaming plan: scan-local quality scoring,
    // stateless broadcast decontamination, then the single stateful
    // operator (per-class budget admission)
    val cleaned = graft.operators.Contamination.decontaminateStream(
      ms.toDF().toDF("doc_id", "text", "lang")
        .filter(qualityScore(col("text")) >= 0.2),
      benchmark, "doc_id", "text", n = 13)
    val admitted = graft.streaming.Streams.tokenBudgetStream(
      cleaned.select(col("doc_id"),
        coalesce(col("lang"), lit("")).as("cls"),
        tokenCount(col("text")).cast("long").as("n_tok"))
        .as[BudgetDoc],
      budget = 2000L)
    val q = admitted.writeStream.format("memory").queryName("ingest_s")
      .outputMode("append").start()
    try {
      // arrival order = doc_id order, split across two micro-batches
      val (first, rest) = rows.sortBy(_._1).splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val got = spark.table("ingest_s").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // batch replay of the same program in the same arrival order
      val cleanBatch = graft.operators.Contamination.decontaminateStream(
        d.select(col("doc_id"), col("text"), col("lang"))
          .filter(qualityScore(col("text")) >= 0.2),
        benchmark, "doc_id", "text", n = 13)
        .select(col("doc_id"), coalesce(col("lang"), lit("")).as("cls"),
          tokenCount(col("text")).cast("long").as("n_tok"))
        .as[(Long, String, Long)].collect().sortBy(_._1)
      val want = cleanBatch.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        var run = 0L
        rs.sortBy(_._1).takeWhile { r =>
          val in = run < 2000L; run += r._3; in }.toSeq
      }.map(_._1).toSet
      assert(got == want, s"got=${got.size} want=${want.size}")
      assert(got.nonEmpty && got.size < rows.length)
    } finally q.stop()
  }

  test("streaming pre-training program (q90's incremental dual): " +
      "quality gate -> exact dedup -> decontamination -> token budget " +
      "in ONE continuous query, batch parity on the real corpus") {
    import graft.functions.TextFunctions
    val d = Tables.load(spark, sf0001, "documents")
    val evalSet = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text")).cache()
    val corpus = d.filter(col("doc_id") % 50 =!= 0)
    val rows = corpus.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    // duplicate docs arriving later must die in the DEDUP stage: plant
    // re-arrivals of early docs in the second micro-batch
    val replays = rows.take(20).map { case (id, lang, text) =>
      (id + 1000000L, lang, text) }

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, Timestamp)]
    // ONE shuffle partition + ordered single-batch feeds pin arrival
    // order through both stateful operators (the budget stage is
    // order-sensitive by definition — arrival order IS its spec)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val program = Streams.pretrainingProgramStream(
        ms.toDF().toDF("doc_id", "lang", "text", "ts"),
        evalSet, budgetPerLang = 2000L)
      val q = program.writeStream.format("memory")
        .queryName("pretrain_s").outputMode("append").start()
      try {
        val (first, rest) = rows.splitAt(rows.length / 2)
        val t0 = ts(0)
        ms.addData(first.toSeq.map(r => (r._1, r._2, r._3, t0)))
        q.processAllAvailable()
        ms.addData((rest ++ replays).toSeq.map(r => (r._1, r._2, r._3, t0)))
        q.processAllAvailable()
        val got = spark.table("pretrain_s").select("doc_id")
          .collect().map(_.getLong(0)).toSet

        // batch dual, stage for stage, over the same arrival order —
        // dedup keeps the FIRST arrival (min doc_id here), and the
        // budget replays cumulatively per language in doc_id order.
        // The decontamination dual is the INDEPENDENT batch operator
        // (flagNgramOverlap), not the streaming helper.
        val gated = corpus
          .filter(TextFunctions.topWordFrac(col("text")) <= 0.2 &&
            TextFunctions.dupWordFrac(col("text")) <= 0.85)
        val deduped = gated.join(
          gated.groupBy(TextFunctions.fingerprintMd5(col("text")).as("fp"))
            .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id")),
          "doc_id")
        val clean = deduped.join(
          graft.operators.Contamination
            .flagNgramOverlap(deduped, evalSet, "doc_id", "text", n = 13)
            .filter(!col("contaminated")).select(col("doc_id")),
          "doc_id")
          .select(col("doc_id"), col("lang"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
          .as[(Long, String, Long)].collect().sortBy(_._1)
        val want = clean.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
          var run = 0L
          rs.sortBy(_._1).takeWhile { r =>
            val in = run < 2000L; run += r._3; in }.toSeq
        }.map(_._1).toSet

        assert(got == want, s"got=${got.size} want=${want.size} " +
          s"onlyGot=${(got -- want).take(5)} onlyWant=${(want -- got).take(5)}")
        // the program genuinely filtered at every stage: replayed
        // duplicates died in dedup, and the budget dropped tail docs
        assert(got.nonEmpty && got.size < rows.length)
        assert(replays.forall(r => !got.contains(r._1)),
          "re-arrived duplicate texts must be dropped by the dedup stage")
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("standing-query BM25 scoring: arriving docs scored under the " +
      "pre-fitted model agree EXACTLY (long micros) with the batch " +
      "aggregation route") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Retrieval
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val queries = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(split(col("text"), " "), 1, 6)))
          .as("term"))
    val post = Retrieval.postings(docs, "doc_id", "text")
      .localCheckpoint(eager = false)
    val (fitted, avgdl) = Retrieval.fitBm25Queries(post, queries)
    // batch aggregation route, full candidate list (k beyond corpus)
    val batch = Retrieval.bm25FromPostings(post, queries, k = 1000)
      .select(col("qid"), col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // streaming literal route over the same docs as an ingest stream
    val rows = docs.as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = Retrieval.bm25ScoreFitted(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", fitted, avgdl)
      .select(col("qid"), col("doc_id"), col("score"))
      .writeStream.format("memory").queryName("standing_bm25")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // scores are per-doc: batch split is free
      q.processAllAvailable()
      val got = spark.table("standing_bm25")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == batch,
        s"standing-query scores diverge: ${got.size} vs ${batch.size}; " +
          s"sample diff ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming multimodal: audio frame features over an ingest " +
      "stream equal the batch decode exactly (stateless mapPartitions)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.Multimodal
    implicit val encMedia = org.apache.spark.sql.Encoders
      .product[Multimodal.MediaRow]
    val docs = Tables.load(spark, sf0001, "documents").limit(60)
    val media = Multimodal.audioFixture(docs)
    val batch = Multimodal.audioFrameFeatures(media, frameLen = 64)
      .collect().map(a =>
        (a.doc_id, a.frame_idx, a.n_samples, a.energy, a.crossings))
      .toSet
    val rows = media.as[Multimodal.MediaRow].collect()
    val ms = MemoryStream[Multimodal.MediaRow]
    val q = Multimodal.audioFrameFeatures(ms.toDF(), frameLen = 64)
      .toDF()
      .writeStream.format("memory").queryName("audio_frames_stream")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // features are per-payload: split is free
      q.processAllAvailable()
      val got = spark.table("audio_frames_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == batch && got.nonEmpty,
        s"streaming frame features diverge: ${got.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("standing Stupid-Backoff LM: arriving docs scored under the " +
      "pre-fitted count model agree EXACTLY with the batch count-table " +
      "join route") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LanguageModel
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val train = docs.filter(col("source") =!= "src1")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    val batch = LanguageModel.stupidBackoff(train, docs, "doc_id", "text")
      .collect().map(key).toSet
    val model = LanguageModel.fit(train, "text")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = LanguageModel.scoreFitted(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("standing_lm")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq) // scores are per-doc: batch split is free
      q.processAllAvailable()
      val got = spark.table("standing_lm").collect().map(key).toSet
      assert(got == batch && got.nonEmpty,
        s"standing LM scores diverge: ${got.size} vs ${batch.size}; " +
          s"sample ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("standing LR scorer: arriving docs scored under the trained " +
      "weight table agree EXACTLY with the batch sigmoid route") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LogReg
    val d = Tables.load(spark, sf0001, "documents")
    val feats = LogReg.features(d, "doc_id", "text",
      col("lang") === "en", 32).localCheckpoint(eager = false)
    val w = LogReg.train(feats, "doc_id", 32, rounds = 3, lr = 0.5)
    val batch = LogReg.score(feats, "doc_id", w)
      .select(col("doc_id"), col("p"), col("pred"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSet
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = LogReg.scoreFitted(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", w, 32)
      .writeStream.format("memory").queryName("standing_lr")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val got = spark.table("standing_lr").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(got == batch && got.nonEmpty,
        s"standing LR diverges: ${got.size} vs ${batch.size}; " +
          s"sample ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("standing k-means assigner: arriving vectors assigned under " +
      "the fitted centroid table agree EXACTLY with the batch " +
      "assignment") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.KMeansExact
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val batch = KMeansExact.assign(emb, "id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet
    val model = KMeansExact.fitModel(emb, "id", "embedding", k = 4, iters = 2)
    val rows = emb.as[(Long, Array[Float])].collect()
    val ms = MemoryStream[(Long, Array[Float])]
    val q = KMeansExact.assignFitted(
      ms.toDF().toDF("id", "embedding"), "id", "embedding", model)
      .writeStream.format("memory").queryName("standing_kmeans")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val got = spark.table("standing_kmeans").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got == batch && got.nonEmpty,
        s"standing k-means diverges: ${got.size} vs ${batch.size}; " +
          s"sample ${(got -- batch).take(3)} / ${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("streaming drift monitor: per-bin counts of arriving docs " +
      "under the fitted reference edges equal the batch q155 monitor " +
      "exactly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Drift
    import graft.functions.TextFunctions.qualityScore
    val scored = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), round(qualityScore(col("text")), 6).as("q"),
        (col("doc_id") % 2 === 0).as("is_ref"))
      .localCheckpoint(eager = false)
    val edges = Drift.fitEdges(scored.filter(col("is_ref")), "q")
    // batch face = q155's n_new per bin (the 'new batch' side)
    val batch = SparkEntry.queries("q155_psi_drift")(spark, sf0001)
      .select(col("bin"), col("n_new"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = scored.filter(!col("is_ref"))
      .select(col("doc_id"), col("q"))
      .as[(Long, Double)].collect()
    val ms = MemoryStream[(Long, Double)]
    val q = Drift.binCounts(ms.toDF().toDF("doc_id", "q"), "q", edges)
      .writeStream.format("memory").queryName("drift_bins")
      .outputMode("complete").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val got = spark.table("drift_bins").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == batch && got.nonEmpty,
        s"streamed bin counts diverge: $got vs $batch")
    } finally q.stop()
  }

  test("streaming drift monitor FIRES on a planted mid-stream shift: " +
      "PSI stays under threshold on in-distribution batches and " +
      "crosses 0.25 when the score distribution moves") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Drift
    import graft.functions.TextFunctions.qualityScore
    val scored = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), round(qualityScore(col("text")), 6).as("q"),
        (col("doc_id") % 2 === 0).as("is_ref"))
      .localCheckpoint(eager = false)
    val ref = scored.filter(col("is_ref"))
    val edges = Drift.fitEdges(ref, "q")
    val refCounts = Drift.binCounts(ref, "q", edges)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = scored.filter(!col("is_ref"))
      .select(col("doc_id"), col("q"))
      .as[(Long, Double)].collect()
    val ms = MemoryStream[(Long, Double)]
    val q = Drift.binCounts(ms.toDF().toDF("doc_id", "q"), "q", edges)
      .writeStream.format("memory").queryName("drift_fire")
      .outputMode("complete").start()
    try {
      def arrived(): Map[Int, Long] = spark.table("drift_fire").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // batch 1: in-distribution (the held-out half of the corpus) —
      // the monitor must NOT fire
      ms.addData(rows.toSeq)
      q.processAllAvailable()
      val calm = Drift.psiValue(refCounts, arrived())
      assert(calm < 0.25,
        s"monitor fired on an in-distribution batch: psi=$calm")
      // batch 2: planted drift — every arriving score shifted past
      // the top reference decile, the mid-stream regression a drift
      // monitor exists to catch
      val shifted = rows.map { case (id, s) => (id + 1000000L, s + 1.0) }
      ms.addData(shifted.toSeq)
      q.processAllAvailable()
      val fired = Drift.psiValue(refCounts, arrived())
      assert(fired > 0.25,
        s"monitor failed to fire on the planted shift: psi=$fired " +
          s"(calm was $calm)")
    } finally q.stop()
  }

  test("standing LM fit: the maxGrams budget gate refuses an " +
      "over-budget vocabulary instead of broadcasting it") {
    import graft.operators.LanguageModel
    val docs = Tables.load(spark, sf0001, "documents")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.fit(docs, "text", maxGrams = 3)
    }
    assert(e.getMessage.contains("broadcast-sized"), e.getMessage)
  }

  test("DSIR standing scorer: streamed logw_micros are bit-identical " +
      "to the batch importance weights on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dsir
    val buckets = 64
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val lw = Dsir.logWeights(d, "doc_id", "text",
      col("lang") === "en", buckets)
    val want = Dsir.importanceWeights(d, "doc_id", "text",
        col("lang") === "en", buckets)
      .collect().map(r => r.getLong(0) ->
        r.getDecimal(1).movePointRight(6).longValueExact()).toMap
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.dsirScoreStream(
      ms.toDF().toDF("doc_id", "text"), lw, buckets)
      .writeStream.format("memory").queryName("dsir_s")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a.toSeq)
      q.processAllAvailable()
      ms.addData(b.toSeq) // stateless: the batch split can't matter
      q.processAllAvailable()
      val got = spark.table("dsir_s")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == want.size && got == want,
        s"stream/batch divergence: ${got.toSet.diff(want.toSet).take(3)}")
      assert(got.values.exists(_ != 0L))
    } finally q.stop()
  }

  test("dHash streaming near-dup vs the static corpus hash table " +
      "equals the brute-force pair set at hamming <= 7") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.ImageHash
    val d = Tables.load(spark, sf0001, "documents").select(col("doc_id"))
    val hashes = ImageHash.dhash(ImageHash.dhashFixture(d)).cache()
    // arriving images: the planted near-dup ids (id % 50 == 1 reuses
    // id-1's pattern with 3 perturbed blocks) plus some clean ids
    val arriving = d.filter(col("doc_id") % 25 === 1)
      .as[Long].collect().toSeq
    val payloads = arriving.map(id =>
      id -> graft.multimodal.ImageHash.dhashPngBytes(id))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamDedup.dhashNearDupStream(
      ms.toDF().toDF("doc_id", "payload"), hashes, maxHamming = 7)
      .writeStream.format("memory").queryName("dhash_s")
      .outputMode("append").start()
    try {
      val (a, b) = payloads.splitAt(payloads.length / 2)
      ms.addData(a)
      q.processAllAvailable()
      ms.addData(b)
      q.processAllAvailable()
      val got = spark.table("dhash_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // exactly-once without state: the first-matching-band filter
      // must also dedupe band collisions, so compare SEQ sizes too
      assert(spark.table("dhash_s").count() == got.size,
        "pair emitted more than once")
      val hs = hashes.collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      val want = (for {
        aid <- arriving
        (cid, (hib, lob)) <- hs if cid != aid
        ham = java.lang.Long.bitCount(hs(aid)._1 ^ hib) +
          java.lang.Long.bitCount(hs(aid)._2 ^ lob)
        if ham <= 7
      } yield (aid, cid, ham.toLong)).toSet
      assert(got == want, s"stream=${got.size} brute=${want.size}")
      assert(got.nonEmpty) // planted pairs must surface
    } finally q.stop()
  }

  test("rolling PSI: streamed window×bin counts + the shared batch " +
      "tail reproduce q185 bit-identically on planted drift") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Drift
    // the StatSpec fixture: days 0-1 stationary, day 2 shifted
    val ev = (0 until 1000).map { i =>
      val d = i % 3
      val v = if (d < 2) (i % 100).toDouble else 1000.0 + (i % 100)
      (i.toLong, d * 86400000L * 1000000L + i * 1000000L,
        (i % 10).toLong, "e", v, "{}")
    }
    val dir = java.nio.file.Files
      .createTempDirectory("psi_stream").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("q185_rolling_psi")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // stream face: edges fitted batch-side (q185's exact percentile
    // arithmetic), arriving events binned scan-locally, windows
    // closed by the watermark, PSI tail on the emitted counts
    val evDF = Tables.load(spark, dir, "events")
      .select(col("value"))
    val edges = Drift.fitEdges(evDF, "value")
    val ms = MemoryStream[(Long, Double)]
    val stream = Streams.windowedBinCountsStream(
      ms.toDF().select(timestamp_millis(col("_1")).as("ts"),
        col("_2").as("value")), edges)
    val q = stream.writeStream.format("memory").queryName("psi_counts")
      .outputMode("append").start()
    try {
      val rows = ev.map(e => (e._2 / 1000000L, e._5))
      val (d01, d2) = rows.partition(_._1 < 2L * 86400000L)
      ms.addData(d01)
      q.processAllAvailable()
      ms.addData(d2)
      q.processAllAvailable()
      // sentinel far past day 2 pushes the watermark over every real
      // window; its own (still-open) window never emits
      ms.addData(Seq((30L * 86400000L, 0.0)))
      q.processAllAvailable()
      val got = Drift.rollingPsi(spark.table("psi_counts"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == batch && got.nonEmpty,
        s"streamed rolling PSI diverges:\n$got\nvs\n$batch")
    } finally q.stop()
  }

  test("transition pairs: streamed per-user last-event chaining " +
      "reproduces q184's adjacent-pair counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.{TransEvent, TransPair}
    val batch = SparkEntry.queries("q184_event_transitions")(
        spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // Tables.load exposes ts as nanos-since-epoch LONG — the exact
    // column the batch window orders by, so the stream sorts on it
    val evs = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map(e => TransEvent(e._1, e._2, e._3, e._4))
      .sortBy(e => (e.ts, e.event_id))
    // split at a strict ts boundary so per-user event-time order
    // holds across the two micro-batches (the ingestion contract)
    var cut = evs.length / 2
    while (cut < evs.length && evs(cut).ts == evs(cut - 1).ts) cut += 1
    val ms = MemoryStream[TransEvent]
    val q = Streams.transitionPairsStream(ms.toDS())
      .writeStream.format("memory").queryName("trans_pairs")
      .outputMode("append").start()
    try {
      ms.addData(evs.take(cut).toSeq)
      q.processAllAvailable()
      ms.addData(evs.drop(cut).toSeq)
      q.processAllAvailable()
      val got = spark.table("trans_pairs")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == batch && got.nonEmpty,
        s"streamed transitions diverge: ${got.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("standing per-source top-k quota: each source's max-n_seen " +
      "emission equals the batch q83 rows after any batch split") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.CapDoc
    val batch = SparkEntry.queries("q83_source_cap")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"), col("n_chars").cast("double"))
      .as[(String, Long, Double)].collect()
      .map(d => CapDoc(d._1, d._2, d._3))
    // adversarial split: second half arrives in REVERSE priority
    // order — top-k of a set is order-free, so parity must still hold
    val (first, rest0) = docs.splitAt(docs.length / 2)
    val rest = rest0.sortBy(d => (d.prio, -d.doc_id))
    val ms = MemoryStream[CapDoc]
    val q = Streams.sourceTopKStream(ms.toDS(), k = 20)
      .writeStream.format("memory").queryName("src_topk")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq)
      q.processAllAvailable()
      ms.addData(rest.toSeq)
      q.processAllAvailable()
      val emissions = spark.table("src_topk")
      // the standing answer: each source's max-n_seen report
      val latest = emissions
        .withColumn("mx", max(col("n_seen"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))))
        .filter(col("n_seen") === col("mx"))
        .select(col("source"), col("rank_in_source"), col("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(latest == batch && latest.nonEmpty,
        s"standing top-k diverges from batch q83: ${latest.size} vs " +
          s"${batch.size}")
      // the versioned report really did update across batches
      assert(emissions.count() > latest.size)
    } finally q.stop()
  }

  test("streaming sequence packing: per-arrival (shard, pack_id) " +
      "assignments are bit-identical to batch q70 across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.PackDoc
    val d = Tables.load(spark, sf0001, "documents")
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    val batch = graft.operators.CorpusOps
      .packGreedy(d, "doc_id", "n_tok", budget = 256, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // globally id-ordered feed ⇒ per-shard id order holds across any
    // batch split (the ingestion contract)
    val docs = d.select(col("doc_id"), col("n_tok"))
      .as[(Long, Long)].collect().sortBy(_._1)
      .map(x => PackDoc(x._1, x._2))
    val ms = MemoryStream[PackDoc]
    val q = Streams.packStream(ms.toDS(), budget = 256, nShards = 8)
      .writeStream.format("memory").queryName("pack_s")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.length / 3)
      ms.addData(a.toSeq)
      q.processAllAvailable()
      ms.addData(b.toSeq)
      q.processAllAvailable()
      val got = spark.table("pack_s")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == batch && got.nonEmpty,
        s"streamed packing diverges: ${got.size} vs ${batch.size}")
      // cross-batch state mattered: some shard's open pack spans the
      // split (pack_id > 0 exists, so packs really advanced)
      assert(got.exists(_._4 > 0))
    } finally q.stop()
  }

  test("streaming as-of enrichment: arriving clicks pick up the " +
      "latest prior purchase exactly as the batch asofBackward") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.{AsofDimRow, AsofEvent}
    val ev = Tables.load(spark, sf0001, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000000").as("ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts DIV 1000000").as("ms"),
        col("value"))
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("value")).as("purchase_value"))
    val batch = graft.operators.TemporalJoins.asofBackward(
        clicks, purchases, Seq("user_id"), "ms",
        toleranceMs = Some(86400000L))
      .select(col("event_id"), col("user_id"), col("ms"),
        col("purchase_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
    val dim = purchases
      .select(col("user_id").as("key"), col("ms"),
        col("purchase_value").as("dim_value"))
      .as[AsofDimRow]
    val arrivals = clicks
      .select(col("event_id"), col("user_id").as("key"), col("ms"))
      .as[AsofEvent].collect()
    val ms = MemoryStream[AsofEvent]
    val q = Streams.asofEnrichStream(ms.toDS(), dim,
        toleranceMs = Some(86400000L))
      .writeStream.format("memory").queryName("asof_s")
      .outputMode("append").start()
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      ms.addData(a.toSeq)
      q.processAllAvailable()
      ms.addData(b.toSeq) // stateless: the split cannot matter
      q.processAllAvailable()
      val got = spark.table("asof_s")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSet
      assert(got == batch && got.nonEmpty,
        s"streamed as-of diverges: ${got.size} vs ${batch.size}")
      // non-trivial on the fixture: both hits and misses occur
      assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
    } finally q.stop()
  }

  test("new faces hold parity under RANDOM micro-batch slicings " +
      "(seeded): packing (id-ordered), standing top-k (any order)") {
    implicit val sqlCtx = spark.sqlContext
    import Streams.{CapDoc, PackDoc}
    val rnd = new scala.util.Random(20260815L)
    val d = Tables.load(spark, sf0001, "documents")
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))

    // packing truth + id-ordered feed (the ingestion contract)
    val packBatch = graft.operators.CorpusOps
      .packGreedy(d, "doc_id", "n_tok", budget = 256, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val packDocs = d.select(col("doc_id"), col("n_tok"))
      .as[(Long, Long)].collect().sortBy(_._1)
      .map(x => PackDoc(x._1, x._2))

    // top-k truth + an order-free shuffled feed
    val capBatch = SparkEntry.queries("q83_source_cap")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val capDocs = rnd.shuffle(
      d.select(col("source"), col("doc_id"), col("n_chars").cast("double"))
        .as[(String, Long, Double)].collect().toSeq)
      .map(x => CapDoc(x._1, x._2, x._3))

    def randomSlices[T](xs: Seq[T], n: Int): Seq[Seq[T]] = {
      val cuts = (Seq(0, xs.length) ++
        Seq.fill(n - 1)(rnd.nextInt(xs.length + 1))).sorted
      cuts.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toSeq
    }

    for (round <- 1 to 3) {
      val msP = MemoryStream[PackDoc]
      val qn = s"pack_rs_$round"
      val qp = Streams.packStream(msP.toDS(), budget = 256, nShards = 8)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(packDocs.toSeq, 4).foreach { s =>
          msP.addData(s); qp.processAllAvailable()
        }
        val got = spark.table(qn).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        assert(got == packBatch, s"packing diverged on slicing $round")
      } finally qp.stop()

      val msC = MemoryStream[CapDoc]
      val cn = s"cap_rs_$round"
      val qc = Streams.sourceTopKStream(msC.toDS(), k = 20)
        .writeStream.format("memory").queryName(cn)
        .outputMode("update").start()
      try {
        randomSlices(capDocs, 4).foreach { s =>
          msC.addData(s); qc.processAllAvailable()
        }
        val latest = spark.table(cn)
          .withColumn("mx", max(col("n_seen"))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("source"))))
          .filter(col("n_seen") === col("mx"))
          .select(col("source"), col("rank_in_source"), col("doc_id"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(latest == capBatch, s"top-k diverged on slicing $round")
      } finally qc.stop()
    }
  }
}
