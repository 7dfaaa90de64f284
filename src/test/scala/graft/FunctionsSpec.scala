package graft

import org.apache.spark.sql.functions._
import graft.dsl.Query
import graft.functions.CoreFunctions._

/** Expression-level operators: general try-except, recursive flatten,
  * map collector, DSL window clause.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tryExcept: ANSI cast error falls back per row (ref tutorial q9)") {
    val df = Seq("15", "abc", "80").toDF("s")
    val res = df.select(
      tryExcept(col("s").cast("int"), lit(-1)).as("n")).as[Int].collect()
    assert(res.toSeq == Seq(15, -1, 80))
  }

  test("tryExcept: division by zero falls back") {
    val df = Seq(2, 0, 5).toDF("n")
    val res = df.select(
      tryExcept(expr("10 div n"), lit(-1L)).as("d")).as[Long].collect()
    assert(res.toSeq == Seq(5L, -1L, 2L))
  }

  test("tryExcept: mismatched branch types rejected at analysis") {
    val df = Seq(1).toDF("n")
    intercept[Exception] {
      df.select(tryExcept(col("n"), lit("x"))).collect()
    }
  }

  test("try_except available from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT try_except(CAST('zz' AS INT), -7) AS v").head.getInt(0)
    assert(r == -7)
  }

  test("flattenAll removes every nesting level (ref helpers.py flatten)") {
    val df = Seq(Seq(Seq(Seq(1, 2), Seq(3)), Seq(Seq(4)))).toDF("a")
    val out = df.select(flattenAll(df, col("a")).as("f"))
      .head.getSeq[Int](0)
    assert(out == Seq(1, 2, 3, 4))
    // already-flat arrays pass through unchanged
    val flat = Seq(Seq(1, 2)).toDF("a")
    assert(flat.select(flattenAll(flat, col("a"))).head.getSeq[Int](0) ==
      Seq(1, 2))
  }

  test("collectMap materializes the dict container") {
    val df = Seq(("a", 1), ("b", 2), ("a", 1)).toDF("k", "v")
    val m = Query.forIn("t", df)
      .groupByAgg(Seq("k" -> col("t.k")), Seq("n" -> count(lit(1))))
      .collectMap[String, Long](col("k"), col("n"))
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }

  test("VariantType handles dynamic payloads (Spark 4 parse_json)") {
    // SURVEY §1.2: truly dynamic JSON-ish values map to VariantType;
    // the engine's JSON-string path ops coexist with it.
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"k": 87, "tags": ["a","b"]}'),
        |                   '$.k', 'long') AS k,
        |       variant_get(parse_json('{"k": 87, "tags": ["a","b"]}'),
        |                   '$.tags[1]', 'string') AS t""".stripMargin).head
    assert(r.getLong(0) == 87L && r.getString(1) == "b")
  }

  test("property: groupBy auto-nest then explode restores the multiset") {
    // SURVEY §5 test plan: group-then-flatten round-trip invariant
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(30)((rnd.nextInt(4).toString, rnd.nextInt(10)))
      val df = rows.toDF("k", "v")
      val back = Query.forIn("t", df)
        .groupBy("key" -> col("t.k"))
        .forIn("e", col("t")) // explode the nested list
        .toDF.select(col("e.k"), col("e.v"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(back.sorted == rows.sorted, s"seed=$seed")
    }
  }

  test("DSL window clause over a keyed stream") {
    val df = Seq(("u1", 1, 10), ("u1", 2, 20), ("u1", 3, 30),
      ("u2", 1, 5), ("u2", 2, 6)).toDF("user", "seq", "amt")
    val res = Query.forIn("e", df)
      .let("user", col("e.user")).let("seq", col("e.seq"))
      .window("w", keyVars = Seq("user"), orderVars = Seq("seq"),
        start = _ => true,
        end = (s, e) => e.index - s.index == 1,
        tumbling = true)
      .orderBy(col("user"), col("s_idx"))
      .select("user" -> col("user"), "s_idx" -> col("s_idx"),
        "n" -> size(col("w")))
      .collect()
    // u1: [0,1] closed + [2] tail; u2: [0,1] closed
    assert(res.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq(("u1", 0L, 2), ("u1", 2L, 1), ("u2", 0L, 2)))
  }

  test("typed Aggregator escape hatch: weighted mean + bounded " +
      "consistent sample (udaf surface)") {
    import graft.functions.Aggregators
    val wm = udaf(Aggregators.weightedMean)
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 0.0))
      .toDF("g", "v", "w")
    val got = df.groupBy($"g").agg(wm($"v", $"w").as("m"))
      .orderBy($"g").collect()
    assert(got(0).getDouble(1) == 17.5)   // (10+60)/4
    assert(got(1).isNullAt(1))            // all-zero weights → null

    // consistent sample: bounded buffer, deterministic across
    // repartitionings (hash-ranked, not random)
    val cs = udaf(Aggregators.consistentSample(3))
    val ids = (1L to 100L).map(i => ("g", i))
    def sample(parts: Int) = ids.toDF("g", "id")
      .repartition(parts)
      .withColumn("h", xxhash64($"id"))
      .groupBy($"g").agg(cs($"h", $"id").as("s"))
      .head.getSeq[Long](1)
    val s4 = sample(4)
    assert(s4.length == 3 && sample(13) == s4)
  }

  test("canonicalize: NFC + casefold collapses composed/decomposed/case " +
      "variants, stays inside whole-stage codegen, propagates null") {
    import graft.functions.TextFunctions.canonicalize
    val rows = Seq(
      (1L, "Caf\u00e9"),          // composed é, mixed case
      (2L, "CAFE\u0301"),         // decomposed E + combining acute
      (3L, "caf\u00e9"),          // already canonical
      (4L, null.asInstanceOf[String]))
    // repartition blocks ConvertToLocalRelation from folding the
    // projection into a LocalTableScan, so the codegen check below
    // sees the real executed plan
    val df = rows.toDF("id", "t").repartition(2)
      .select($"id", canonicalize($"t").as("c"))
    val got = df.orderBy($"id").collect()
    // all three renderings collapse to the same canonical bytes
    assert(got(0).getString(1) == "caf\u00e9")
    assert(got(1).getString(1) == "caf\u00e9")
    assert(got(2).getString(1) == "caf\u00e9")
    assert(got(3).isNullAt(1))
    // the expression is codegen'd — the projection sits inside a
    // WholeStageCodegen span, not an interpreted fallback (collect
    // first so AQE finalizes the plan)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in simpleString form
    assert(plan.contains("*(1) Project"), plan)
    // ASCII fast path agrees with the Normalizer route
    assert(Seq((1L, "Hello  WORLD")).toDF("id", "t")
      .select(canonicalize($"t")).head.getString(0) == "hello  world")
  }

  test("stripMarkup: subtree drops, tag removal, single-pass entities") {
    import graft.functions.TextFunctions.stripMarkup
    def run(s: String): String =
      Seq(Tuple1(s)).toDF("t").select(stripMarkup($"t")).head.getString(0)
    // script/style bodies vanish even across newlines; tags become
    // spaces so adjacent words don't fuse
    assert(run("<p>a</p><script>\nvar x = \"<b>not text</b>\";\n</script><p>b</p>") == "a b")
    assert(run("<style>p{..}\n.c{..}</style>hi") == "hi")
    // comments drop, attributes don't leak
    assert(run("x<!-- <p>gone</p> -->y<div class=\"k\">z</div>") == "x y z")
    // single-pass entity decode: &amp;lt; → &lt; and STOPS
    assert(run("a &amp;lt; b &lt;c&gt; &nbsp;&quot;d&quot; &#39;e&#39;") ==
      "a &lt; b <c> \"d\" 'e'")
    // plain text passes through with whitespace collapsed
    assert(run("  no   markup\there ") == "no markup here")
  }
}
