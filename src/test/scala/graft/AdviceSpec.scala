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
}
