package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-9 curation battery (q161–q164) —
  * the hash gates pin the arithmetic; these pin the MEANING (the
  * q160-lesson: a gate can be bit-exact and still admit nothing).
  */
class CurationSpec extends SparkSpec {

  test("q161 DSIR: target-language docs score higher on average, and " +
      "the percentile gate admits ~20% of the corpus") {
    val w = SparkEntry.queries("q161_dsir_select")(spark, sf0001)
      .join(Tables.load(spark, sf0001, "documents")
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .localCheckpoint(eager = false)
    val Array(tgt, rest) = w
      .groupBy(col("lang") === "en").agg(avg(col("logw")))
      .orderBy(col("(lang = en)").desc).collect().map(_.getDouble(1))
    assert(tgt > rest,
      s"importance weights point the wrong way: en=$tgt rest=$rest")
    val n = w.count()
    val sel = w.filter(col("selected")).count()
    assert(sel >= n / 10 && sel <= 3 * n / 10,
      s"80th-percentile gate admitted $sel of $n")
  }

  test("q162 margin alignment: margins discriminate beyond raw " +
      "cosine — some top-1 pairs are rejected, and every accepted " +
      "margin clears the hub-normalized bar") {
    val m = SparkEntry.queries("q162_margin_align")(spark, sf0001)
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
    }
    val accepted = m.count(_.getBoolean(4))
    assert(accepted > 0 && accepted < m.length,
      s"margin gate degenerate: $accepted of ${m.length} accepted " +
        "(all-or-nothing means the normalization does no work)")
  }

  test("q163 alpha sampling: rates are monotone in corpus size but " +
      "COMPRESSED (the tail is upsampled relative to proportional), " +
      "and the integer draws exhaust the budget modulo floors") {
    val rows = SparkEntry.queries("q163_alpha_sampling")(spark, sf0001)
      .orderBy(col("n_tokens")).collect()
    assert(rows.length >= 2)
    val ps = rows.map(_.getDouble(2))
    val toks = rows.map(_.getLong(1))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "p not monotone in n_tokens")
    val spreadP = ps.max / ps.min
    val spreadN = toks.max.toDouble / toks.min.toDouble
    assert(spreadP < spreadN,
      s"alpha<1 must compress the head: p-spread $spreadP vs " +
        s"n-spread $spreadN")
    val draws = rows.map(_.getLong(3)).sum
    assert(draws <= 100000L && draws >= 100000L - rows.length,
      s"draws=$draws should fill the 100000 budget modulo floors")
  }

  test("q164 containment: intersection bounded by both shingle sets, " +
      "and containment dominates Jaccard on every admitted pair") {
    val rows = SparkEntry.queries("q164_containment_dedup")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter <= math.min(na, nb) && inter > 0)
      assert(r.getDouble(5) >= 0.5 && r.getDouble(5) <= 1.0)
      val jaccard = inter.toDouble / (na + nb - inter).toDouble
      assert(r.getDouble(5) >= jaccard - 1e-6,
        s"containment ${r.getDouble(5)} < jaccard $jaccard")
    }
  }

  test("containment operator: a doc quoted whole inside a larger one " +
      "is caught at containment 1.0 where Jaccard-resemblance misses it") {
    // The testdata near-dup pairs are SYMMETRIC (same-length edits),
    // so the asymmetric capability — the reason containment exists —
    // is proven on a constructed quote-inclusion fixture run through
    // the SAME operator the registered query calls.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val filler = (1 to 120).map(i => s"pad$i").mkString(" ")
    val other = (1 to 40).map(i => s"alt$i").mkString(" ")
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, small),                   // the quoted original
        Row(2L, s"$filler $small"),       // wrapper containing it whole
        Row(3L, other))),                 // unrelated control
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val got = graft.operators.Containment
      .pairs(docs, "doc_id", "text", w = 5, dfMin = 2, dfMax = 5,
        threshold = 0.5)
      .collect()
    assert(got.length == 1, s"expected exactly the (1,2) pair: " +
      got.map(_.toString).mkString(", "))
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(5) == 1.0, s"containment ${r.getDouble(5)}")
    val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
    val jaccard = inter.toDouble / (na + nb - inter).toDouble
    assert(jaccard < 0.2,
      s"fixture should be low-resemblance, jaccard=$jaccard")
  }

  test("DSIR: a NULL target predicate counts as RAW on both the model " +
      "and scoring sides (r9 advisory #2 — the coalesce pin)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val base = Seq(
      Row(1L, "alpha beta gamma delta", "en"),
      Row(2L, "epsilon zeta eta theta", "de"),
      Row(3L, "iota kappa lambda mu", null))
    val asNull = df(base)
    // the same corpus with the NULL lang spelled as an explicit
    // non-target: weights must be IDENTICAL if NULL pins to raw
    val asRaw = df(base.init :+ Row(3L, "iota kappa lambda mu", "xx"))
    def w(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dsir.importanceWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 32)
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(w(asNull) == w(asRaw))
  }

  test("q193 UniMax water-fill: hand case — small source caps at E " +
      "epochs, the freed budget flows to the big one") {
    import spark.implicits._
    // n = {a:10, b:100}, E = 2, B = ⌊1.8·110⌋ = 198:
    // caps {20, 200}; a is capped (20·2 + 0 = 40 ≤ 198), b is not
    // (20 + 200·1 = 220 > 198) → τ = (198 − 20)/1 = 178.
    val out = graft.operators.Budgeting
      .waterFill(Seq(("a", 10L), ("b", 100L)).toDF("source", "n"),
        "source", "n", epochCap = 2L, budNum = 9L, budDen = 5L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 20L, true, 20000000L, 2.0),
      ("b", 200L, false, 178000000L, 1.78)))
  }

  test("q193 UniMax water-fill: budget beyond all caps caps " +
      "everyone with no division by zero") {
    import spark.implicits._
    // B = 9·2/5 = 3 ≥ ... with E = 1 caps sum to 2 < 3 → all capped
    val out = graft.operators.Budgeting
      .waterFill(Seq(("a", 1L), ("b", 1L)).toDF("source", "n"),
        "source", "n", epochCap = 1L, budNum = 3L, budDen = 2L)
      .collect().map(r => (r.getBoolean(3), r.getLong(4)))
    assert(out.forall(_._1) && out.forall(_._2 == 1000000L))
  }

  test("q193 UniMax invariants on the corpus: allocations never " +
      "exceed caps, uncapped levels are equal, capped set is the " +
      "ascending-cap prefix, and the budget is exhausted to within " +
      "integer-division floors") {
    val rows = SparkEntry.queries("q193_unimax_budget")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, _, cap, _, alloc) =>
      assert(alloc <= cap * 1000000L, s"$s allocated beyond its cap") }
    val capped = rows.filter(_._4)
    val uncapped = rows.filterNot(_._4)
    assert(capped.nonEmpty && uncapped.nonEmpty,
      "test corpus must exercise both branches (budget 1.8·Σn, E=2)")
    assert(uncapped.map(_._5).distinct.length == 1,
      "every uncapped source gets the same water level")
    val maxCapped = capped.map(_._3).max
    assert(uncapped.forall(_._3 >= maxCapped),
      "capped set must be a prefix of the ascending-cap order")
    val total = rows.map(x => BigInt(x._5)).sum
    val budgetMicro = BigInt(rows.map(_._2).sum) * 9 / 5 * 1000000
    assert(total <= budgetMicro &&
      budgetMicro - total < BigInt(1000000L) * uncapped.length,
      s"water level must exhaust the budget modulo floors: " +
        s"$total vs $budgetMicro")
  }

  test("property: water-fill on random source counts — budget " +
      "exhausted modulo floors, caps respected, uncapped levels " +
      "equal, and the result is input-order invariant") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    val g = Gen.chooseNum(2, 12).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1L, 100000L)))
    val cases = (0 until 12).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
    cases.foreach { ns =>
      val named = ns.zipWithIndex.map { case (n, i) => (f"s$i%02d", n) }
      def run(rows: Seq[(String, Long)]) = graft.operators.Budgeting
        .waterFill(rows.toDF("source", "n"), "source", "n",
          epochCap = 3L, budNum = 7L, budDen = 4L)
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3),
          r.getLong(4)))
      val out = run(named)
      out.foreach { case (s, cap, _, alloc) =>
        assert(alloc <= cap * 1000000L, s"$s over cap in $ns") }
      val (capped, uncapped) = out.partition(_._3)
      assert(uncapped.map(_._4).distinct.length <= 1,
        s"unequal water levels in $ns")
      if (uncapped.nonEmpty && capped.nonEmpty)
        assert(uncapped.map(_._2).min >= capped.map(_._2).max,
          s"capped set is not the ascending-cap prefix in $ns")
      val budgetMicro = BigInt(ns.sum) * 7 / 4 * 1000000
      val total = out.map(x => BigInt(x._4)).sum
      if (uncapped.nonEmpty)
        assert(total <= budgetMicro &&
          budgetMicro - total < BigInt(uncapped.length) * 1000000,
          s"budget not exhausted modulo floors in $ns")
      else assert(total == BigInt(ns.sum) * 3 * 1000000,
        s"all-capped total must be the cap sum in $ns")
      // shuffling the input rows must not move a single number
      assert(run(scala.util.Random.shuffle(named)).toSeq == out.toSeq,
        s"input-order dependence in $ns")
    }
  }

  test("differential: closed-form water-fill equals the paper's " +
      "sequential greedy on random inputs") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    // UniMax Algorithm 1 (Chung et al. 2023), independently
    // reimplemented as the literal loop: ascending by cap, each
    // source takes min(cap, remaining/remainingSources) — allocations
    // in exact micro-tokens with the same single floor division.
    def greedy(ns: Seq[(String, Long)], cap: Long, num: Long,
        den: Long): Map[String, Long] = {
      val budget = BigInt(ns.map(_._2).sum) * num / den
      var remaining = budget * 1000000
      var left = ns.length
      val out = scala.collection.mutable.Map.empty[String, Long]
      ns.sortBy { case (s, n) => (n * cap, s) }.foreach { case (s, n) =>
        val c = BigInt(n) * cap * 1000000
        val fair = remaining / left
        val take = c.min(fair)
        out(s) = take.toLong
        remaining -= take
        left -= 1
      }
      out.toMap
    }
    val g = Gen.chooseNum(2, 10).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1L, 50000L)))
    val cases = (100 until 112).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
    cases.foreach { ns =>
      val named = ns.zipWithIndex.map { case (n, i) => (f"s$i%02d", n) }
      val closed = graft.operators.Budgeting
        .waterFill(named.toDF("source", "n"), "source", "n",
          epochCap = 2L, budNum = 9L, budDen = 5L)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val loop = greedy(named, cap = 2L, num = 9L, den = 5L)
      // the greedy re-floors at every uncapped step, so later
      // uncapped sources may each gain < 1 micro-token over the
      // closed form's single division; capped sources must agree
      // exactly, uncapped within 1 micro
      named.foreach { case (s, _) =>
        assert((closed(s) - loop(s)).abs <= 1L,
          s"greedy/closed divergence at $s in $ns: " +
            s"${closed(s)} vs ${loop(s)}")
      }
    }
  }

  test("q198 mixture table agrees column-for-column with the " +
      "policies it composes") {
    val cmp = SparkEntry.queries("q198_mixture_compare")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val a163 = SparkEntry.queries("q163_alpha_sampling")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val a193 = SparkEntry.queries("q193_unimax_budget")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4))))
      .toMap
    val budgetMicro =
      (BigInt(a193.values.map(_._1).sum) * 9 / 5 * 1000000).toDouble
    assert(cmp.keySet == a163.keySet && cmp.keySet == a193.keySet)
    cmp.foreach { case (s, (n, nat, alpha, uni, delta)) =>
      assert(n == a193(s)._1)
      assert(alpha == a163(s), s"$s alpha share != q163's p")
      val expected = BigDecimal(a193(s)._2 / budgetMicro)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(uni == expected, s"$s unimax share != q193 alloc/B")
      assert(math.abs(delta - BigDecimal(uni - alpha).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(nat > 0 && nat < 1)
    }
    val natSum = cmp.values.map(_._2).sum
    assert(math.abs(natSum - 1.0) < cmp.size * 1e-6)
  }

  test("q196 manifest: (doc, epoch) unique, epochs contiguous per " +
      "source, and consumed tokens hit the q193 allocation to " +
      "within one document") {
    val man = SparkEntry.queries("q196_unimax_manifest")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(man.nonEmpty)
    assert(man.map(x => (x._1, x._4)).distinct.length == man.length,
      "(doc_id, epoch) must be unique")
    val alloc = SparkEntry.queries("q193_unimax_budget")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4))))
      .toMap
    man.groupBy(_._2).foreach { case (src, rows) =>
      val (n, allocMicro) = alloc(src)
      val allocTok = allocMicro / 1000000L
      val w = if (n > 0) allocTok / n else 0L
      val rem = allocTok - w * n
      val epochs = rows.map(_._4).distinct.sorted
      val expected = (0L until (w + (if (rem > 0) 1L else 0L)))
      assert(epochs.toSeq == expected.toSeq,
        s"$src epochs $epochs != $expected (w=$w rem=$rem)")
      val consumed = rows.map(x => BigInt(x._3)).sum
      val maxDoc = rows.map(_._3).max.max(1L)
      assert(consumed >= allocTok && consumed < allocTok + maxDoc,
        s"$src consumed $consumed outside [$allocTok, " +
          s"${allocTok + maxDoc}) — prefix overshoot broke")
    }
  }
}
