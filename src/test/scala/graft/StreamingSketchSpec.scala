package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{NaiveBayes, Sketches}

/** Streaming duals of the sketch and classifier operators: the SAME
  * DataFrame code runs incrementally (sketch aggregations are
  * streaming-legal as-is — their state is the sketch, d·w counters /
  * m registers, bounded by construction), and NB scoring against a
  * broadcast fitted model is stateless append-mode.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("streaming HLL: register frame after N batches equals the " +
      "batch sketch (same code, incremental run, bounded state)") {
    val tokens = docs
      .select(explode(split(col("text"), " ")).as("g")).as[String]
      .collect().toSeq
    val batch = Sketches.hllRegisters(tokens.toDF("g"), "g", 256)
      .orderBy("reg").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    val q = Sketches.hllRegisters(ms.toDF().toDF("g"), "g", 256)
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      val (a, b) = tokens.splitAt(tokens.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("hll_regs").orderBy("reg").collect().toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("streaming CMS: counter frame after N batches equals the batch " +
      "sketch; estimates from streamed counters match") {
    val weighted = docs
      .select(explode(split(col("text"), " ")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toSeq
    val batchCounters = Sketches.countMin(
      weighted.toDF("g", "k"), "g", "k", 4, 64)
    val batchRows = batchCounters.orderBy("r", "b").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val q = Sketches.countMin(ms.toDF().toDF("g", "k"), "g", "k", 4, 64)
      .writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    try {
      val (a, b) = weighted.splitAt(weighted.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("cms_counters")
      assert(streamed.orderBy("r", "b").collect().toSeq == batchRows)
      // probing the streamed counters gives the batch estimates
      val estA = Sketches.cmsEstimate(
        weighted.toDF("g", "k"), "g", streamed, 4, 64)
      val estB = Sketches.cmsEstimate(
        weighted.toDF("g", "k"), "g", batchCounters, 4, 64)
      assert(estA.exceptAll(estB).isEmpty && estB.exceptAll(estA).isEmpty)
    } finally q.stop()
  }

  test("NB fitModel scoring equals the distributed classify on the " +
      "real corpus (exact scaled-long replay of the DECIMAL path)") {
    val model = NaiveBayes.fitModel(docs, "text", "lang")
    val viaModel = NaiveBayes.classifyWithModel(docs, "doc_id", "text", model)
    val viaJoin = NaiveBayes.classify(docs, "doc_id", "text", docs, "lang")
    assert(viaModel.exceptAll(viaJoin).isEmpty &&
      viaJoin.exceptAll(viaModel).isEmpty)
  }

  test("NB fitModel enforces the driver model budget") {
    intercept[IllegalArgumentException] {
      NaiveBayes.fitModel(docs, "text", "lang", maxEntries = 10L)
    }
  }

  test("streaming logbins: per-group histogram after N batches equals " +
      "the batch sketch (bounded ≤64-rows-per-group state)") {
    val vals = docs.select(col("source"),
      greatest(col("n_chars").cast("long"), lit(1L)).as("v"))
      .as[(String, Long)].collect().toSeq
    val batch = Sketches.logBins(vals.toDF("source", "v"),
      Seq("source"), "v").orderBy("source", "bin").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val q = Sketches.logBins(ms.toDF().toDF("source", "v"),
        Seq("source"), "v")
      .writeStream.format("memory").queryName("logbins_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = vals.splitAt(vals.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("logbins_stream")
        .orderBy("source", "bin").collect().toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("cdcOpsStream: keyed tombstones make 'removed' an EVENT — " +
      "deletes of held ids emit removed exactly once across retries, " +
      "unknown-id tombstones drop, upserts classify like diffStream") {
    import java.sql.Timestamp
    import graft.operators.SnapshotDiff
    import spark.implicits._
    val v1 = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, Timestamp)]
    val q = SnapshotDiff.cdcOpsStream(
        v1, ms.toDF().toDF("doc_id", "op", "text", "ts"),
        "doc_id", Seq("text"))
      .writeStream.format("memory").queryName("cdc_ops")
      .outputMode("append").start()
    try {
      ms.addData(
        (2L, "delete", null, t(0)),          // held → removed
        (2L, "delete", null, t(1)),          // retried tombstone → dedup
        (9L, "delete", null, t(0)),          // unknown id → dropped
        (3L, "upsert", "gamma", t(0)),       // unchanged → dropped
        (4L, "upsert", "DELTA", t(0)),       // fp moved → changed
        (7L, "upsert", "new doc", t(0)))     // unknown → added
      q.processAllAvailable()
      // a second batch retries the same tombstone inside the
      // watermark: still exactly one removed row
      ms.addData((2L, "delete", null, t(2)))
      q.processAllAvailable()
      val out = spark.table("cdc_ops").as[(Long, String)]
        .collect().sorted.toSeq
      assert(out == Seq((2L, "removed"), (4L, "changed"), (7L, "added")),
        out.mkString(","))
    } finally q.stop()
    // malformed changelog ops fail LOUDLY, not silently drop
    val badMs = MemoryStream[(Long, String, String, Timestamp)]
    val bad = SnapshotDiff.cdcOpsStream(
        v1, badMs.toDF().toDF("doc_id", "op", "text", "ts"),
        "doc_id", Seq("text"))
      .writeStream.format("memory").queryName("cdc_ops_bad")
      .outputMode("append").start()
    try {
      badMs.addData((1L, "truncate", null, t(0)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        bad.processAllAvailable()
      }
      def chain(x: Throwable): Seq[Throwable] =
        if (x == null) Nil else x +: chain(x.getCause)
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("unknown op"))), e.getMessage)
    } finally bad.stop()
  }

  test("streaming snapshot diff: arriving v2 docs classified " +
      "added/changed equals the batch diff minus removals") {
    import graft.operators.SnapshotDiff
    val v1 = docs.select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, upper(col("text")))
          .otherwise(col("text")))
      .unionAll(v1.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
    val batchAddedChanged = SnapshotDiff
      .diff(v1, v2, "doc_id", Seq("text"))
      .filter(col("status") =!= "removed")
      .as[(Long, String)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val rows = v2.as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val q = SnapshotDiff.diffStream(
        v1, ms.toDF().toDF("doc_id", "text"), "doc_id", Seq("text"))
      .writeStream.format("memory").queryName("diff_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("diff_stream")
        .as[(Long, String)].collect().toSet
      assert(stream == batchAddedChanged)
    } finally q.stop()
  }

  test("streaming NB scoring: append-mode stateless scoring of an " +
      "incoming doc stream equals batch predictions") {
    val model = NaiveBayes.fitModel(docs, "text", "lang")
    val batch = NaiveBayes.classifyWithModel(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val q = NaiveBayes.classifyWithModel(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("nb_stream").orderBy("doc_id").collect().toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("streaming PQ: arriving vectors encode to the batch artifact's " +
      "codes and ADC-score standing queries bit-identically") {
    import graft.operators.ProductQuant
    val raw = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val (codebook, codes) = ProductQuant.build(
      ProductQuant.normalize(raw), m = 8, subDim = 8, k = 8, iters = 2)
    val cb = codebook.cache(); val cd = codes.cache()
    try {
      val model = ProductQuant.codebookModel(cb)

      // --- encode face: streamed codes == the batch artifact's codes
      val batchCodes = cd.as[(Long, Int, Int)].collect()
        .groupBy(_._1)
        .map { case (id, rows) =>
          id -> rows.sortBy(_._2).map(_._3).toSeq }
      val vecs = raw.as[(Long, Array[Float])].collect().toSeq
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.Streams.pqEncodeStream(
          ms.toDF().toDF("id", "vec"), model, m = 8, subDim = 8)
        .writeStream.format("memory").queryName("pq_codes_stream")
        .outputMode("append").start()
      try {
        val (a, b) = vecs.splitAt(vecs.length / 2)
        ms.addData(a: _*); q.processAllAvailable()
        ms.addData(b: _*); q.processAllAvailable()
        val streamed = spark.table("pq_codes_stream")
          .as[(Long, Seq[Int])].collect().map(r => r._1 -> r._2).toMap
        assert(streamed.size == batchCodes.size)
        batchCodes.foreach { case (id, cs) =>
          assert(streamed(id) == cs, s"codes diverge for id=$id: " +
            s"stream=${streamed(id)} batch=$cs")
        }
      } finally q.stop()

      // --- score face: streamed ADC distances to standing queries ==
      // the batch ADC join over the same codes (full ranking)
      val queries = raw.filter(col("id") < 5)
      val dtab = ProductQuant.queryDistanceModel(queries, cb, subDim = 8)
      val batchScores = ProductQuant.adcTopK(
          ProductQuant.normalize(queries), cb, cd, subDim = 8,
          kTop = Int.MaxValue)
        .select(col("neighbor_id"), col("query_id"), col("adist"))
        .as[(Long, Long, Double)].collect().toSet
      val ms2 = MemoryStream[(Long, Array[Float])]
      val q2 = graft.streaming.Streams.pqAdcScoreStream(
          ms2.toDF().toDF("id", "vec"), model, dtab, m = 8, subDim = 8)
        .writeStream.format("memory").queryName("pq_adc_stream")
        .outputMode("append").start()
      try {
        val (a, b) = vecs.splitAt(vecs.length / 2)
        ms2.addData(a: _*); q2.processAllAvailable()
        ms2.addData(b: _*); q2.processAllAvailable()
        val streamed = spark.table("pq_adc_stream")
          .filter(col("id") =!= col("query_id"))
          .as[(Long, Long, Double)].collect().toSet
        assert(streamed == batchScores,
          s"ADC scores diverge: ${streamed.size} streamed vs " +
            s"${batchScores.size} batch; sample diff=" +
            (streamed diff batchScores).take(3))
      } finally q2.stop()
    } finally { cb.unpersist(); cd.unpersist() }
  }

  test("streaming index ingest (q191's streaming half): arriving " +
      "vectors classify against static v1 fingerprints and assign " +
      "to cells exactly as the batch maintenance path") {
    import graft.operators.{IndexMaintenance, KMeansExact, SnapshotDiff}
    implicit val sqlCtx = spark.sqlContext
    val v1 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val v2 = v1.filter(col("id") % 17 =!= 0)
      .withColumn("embedding", when(col("id") % 13 === 0,
        transform(col("embedding"), x => negative(x)))
        .otherwise(col("embedding")))
      .unionByName(v1.filter(col("id") % 19 === 0)
        .select((col("id") + lit(5000000L)).as("id"),
          reverse(col("embedding")).as("embedding")))
    val model = KMeansExact.fitModel(v1, "id", "embedding", k = 8,
      iters = 2)
    // batch truth: the fresh (added/changed) assignments the
    // maintenance path unions into the postings
    val d = SnapshotDiff.diff(
      v1.select(col("id"), IndexMaintenance.vecFp6(col("embedding"))
        .as("_efp")),
      v2.select(col("id"), IndexMaintenance.vecFp6(col("embedding"))
        .as("_efp")), "id", Seq("_efp"))
    val freshIds = d.filter(col("status").isin("added", "changed"))
      .select(col("id"))
    val batchFresh = KMeansExact.assignFitted(
        v2.join(broadcast(freshIds), Seq("id")), "id", "embedding", model)
      .select(col("id"), col("cluster"))
      .as[(Long, Int)].collect().toSet
    assert(batchFresh.nonEmpty)
    // stream: v2 vectors arrive; the added/changed classification is
    // diffStream's exact predicate (fp stream-static left join, keep
    // arrivals whose fp is unseen or differs) with the vector payload
    // carried through, and assignFitted is a stateless scan-local map
    // — the whole ingest is one append-legal query
    val v1fp = v1.select(col("id"),
      IndexMaintenance.vecFp6(col("embedding")).as("_fp1"))
    val rows = v2.select(col("id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Array[Float])]
    val carried = ms.toDF().toDF("id", "embedding")
      .withColumn("_efp", IndexMaintenance.vecFp6(col("embedding")))
      .join(v1fp, Seq("id"), "left")
      .filter(col("_fp1").isNull || col("_fp1") =!= col("_efp"))
      .select(col("id"), col("embedding"))
    val q = KMeansExact.assignFitted(carried, "id", "embedding", model)
      .select(col("id"), col("cluster"))
      .writeStream.format("memory").queryName("ingest_assign")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("ingest_assign")
        .as[(Long, Int)].collect().toSet
      assert(streamed == batchFresh,
        s"streamed ingest diverges: ${streamed.size} vs " +
          s"${batchFresh.size}")
    } finally q.stop()
  }
}
