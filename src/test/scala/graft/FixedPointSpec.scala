package graft

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.expr._

/** The r15 fixed-point kernels (FixedPointExprs) replace the
  * DECIMAL(18,6) BigDecimal arithmetic of PCA/ABTT/k-means with
  * unscaled-long math. These tests pin the EXACTNESS claims the
  * rewrite rests on — each kernel against the DECIMAL formulation it
  * replaced, and the 128-bit accumulator against BigInteger ground
  * truth with values big enough to force carries (the part sf-scale
  * data never exercises).
  */
class FixedPointSpec extends SparkSpec {

  import org.apache.spark.sql.GraftSqlBridge.{column => brCol, expression => brEx}

  /** MatchFuzzSpec's deterministic-sampling idiom (no scalatestplus
    * in the offline cache): n samples from `gen` at fixed seeds.
    */
  private def forAll[A](gen: Gen[A], n: Int = 60)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  test("toUnscaled6 == Spark round(_,6).cast(decimal(18,6)) on doubles " +
      "(incl. halfway ties and negative values)") {
    val gen = Gen.oneOf(
      Gen.choose(-10.0, 10.0),
      Gen.choose(-1e6, 1e6),
      // exact halfway ties at the 7th decimal — the HALF_UP edge
      Gen.choose(-2000000L, 2000000L).map(_ / 2e6 + 0.00000005))
    forAll(gen) { (x: Double) =>
      val spark2 = spark
      import spark2.implicits._
      val viaSpark = Seq(x).toDF("x")
        .select(round(col("x"), 6).cast("decimal(18,6)").as("d"))
        .head().getDecimal(0)
      assert(FixedPoint.toUnscaled6(x) ===
        viaSpark.setScale(6).unscaledValue().longValueExact())
    }
  }

  test("add128/dec128: 128-bit accumulation == BigInteger sum, " +
      "including carries past 2^63 in both directions") {
    val gen = Gen.listOfN(64, Gen.oneOf(
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.const(Long.MaxValue / 2), Gen.const(Long.MinValue / 2),
      Gen.choose(-1000L, 1000L)))
    forAll(gen) { (vs: List[Long]) =>
      val buf = new Array[Long](2)
      vs.foreach(v => FixedPoint.add128(buf, 0, v))
      val expected = vs.map(BigInteger.valueOf).foldLeft(BigInteger.ZERO)(_ add _)
      assert(FixedPoint.dec128(buf(0), buf(1), 12) ===
        new JBigDecimal(expected, 12))
    }
  }

  test("FixedDotDec == sum(a_dec * b_dec) over the exploded " +
      "DECIMAL(18,6) coordinates") {
    val spark2 = spark
    import spark2.implicits._
    val gen = Gen.listOfN(16,
      Gen.zip(Gen.choose(-4.0, 4.0), Gen.choose(-4.0, 4.0)))
    forAll(gen, 25) { (pairs: List[(Double, Double)]) =>
      val df = Seq((pairs.map(_._1.toFloat).toArray,
        pairs.map(_._2.toFloat).toArray)).toDF("a", "b")
      val viaDecimal = df
        .select(posexplode(col("a")).as(Seq("j", "xa")), col("b"))
        .select(col("j"), round(col("xa").cast("double"), 6)
          .cast("decimal(18,6)").as("da"),
          round(element_at(col("b"), col("j") + 1).cast("double"), 6)
            .cast("decimal(18,6)").as("db"))
        .agg(sum(col("da") * col("db")).cast("decimal(38,12)"))
        .head().getDecimal(0)
      val viaFixed = df.select(
        brCol(FixedDotDec(
          FixedPointVec(brEx(col("a"))),
          FixedPointVec(brEx(col("b"))))).as("d"))
        .head().getDecimal(0)
      assert(viaFixed === viaDecimal)
    }
  }

  test("GramUpperAgg == the covariance self-join's per-(j,k) DECIMAL " +
      "sums on a random corpus") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = (1 to 40).map { i =>
      (i.toLong, Array.tabulate(6)(j =>
        math.sin(i * 7 + j * 3).toFloat * 3f))
    }
    val df = vecs.toDF("id", "v")
    // old formulation: explode to DECIMAL, self-join on id, upper tri
    val x = df.select(col("id"), posexplode(col("v")).as(Seq("j", "xr")))
      .select(col("id"), col("j"),
        round(col("xr").cast("double"), 6).cast("decimal(18,6)").as("x"))
    val a = x.select(col("id"), col("j"), col("x").as("xa"))
    val b = x.select(col("id"), col("j").as("k"), col("x").as("xb"))
    val oldSums = a.join(b, Seq("id")).filter(col("j") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("xa") * col("xb")).cast("decimal(38,12)").as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val gram = df.agg(brCol(
      GramUpperAgg(FixedPointVec(brEx(col("v")))).toAggregateExpression())
      .as("g")).head().getSeq[JBigDecimal](0)
    var cell = 0
    for (j <- 0 until 6; k <- j until 6) {
      assert(gram(cell).compareTo(oldSums((j, k))) === 0,
        s"cell ($j,$k)")
      cell += 1
    }
  }

  test("LongVecSumAgg == per-dimension DECIMAL sums") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = (1 to 30).map { i =>
      (i.toLong, Array.tabulate(5)(j => math.cos(i + j).toFloat * 2f))
    }
    val df = vecs.toDF("id", "v")
    val oldSums = df
      .select(posexplode(col("v")).as(Seq("j", "xr")))
      .select(col("j"), round(col("xr").cast("double"), 6)
        .cast("decimal(18,6)").as("x"))
      .groupBy(col("j")).agg(sum(col("x")).cast("decimal(38,6)").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val sums = df.agg(brCol(
      LongVecSumAgg(FixedPointVec(brEx(col("v")))).toAggregateExpression())
      .as("s")).head().getSeq[JBigDecimal](0)
    for (j <- 0 until 5)
      assert(sums(j).compareTo(oldSums(j)) === 0, s"dim $j")
  }

  test("NearestCentroidFixed == the (d2, cluster)-window argmin, " +
      "tie on the smaller cluster id") {
    val spark2 = spark
    import spark2.implicits._
    // centroid 1 duplicates centroid 0 → every row ties; the window
    // tie-break (and the kernel's strict-less) must pick cluster 0
    val cents: Array[Array[Long]] = Array(
      Array(1000000L, -500000L), Array(1000000L, -500000L),
      Array(0L, 0L))
    val df = Seq((1L, Array(0.9f, -0.4f)), (2L, Array(0.1f, 0.1f)))
      .toDF("id", "v")
    val out = df.select(col("id"), brCol(NearestCentroidFixed(
        brEx(brCol(FixedPointVec(brEx(col("v"))))), cents)).as("n"))
      .select(col("id"), col("n.cluster"),
        col("n.d2").cast("double").as("d2"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) === 0) // tie between 0 and 1 → 0
    assert(out(1).getInt(1) === 2)
    // d2 is the exact decimal: (0.9-1.0)² + (-0.4+0.5)² = 0.02
    assert(math.abs(out(0).getDouble(2) - 0.02) < 1e-12)
  }

  test("vecToUnscaled rejects null vector elements loudly " +
      "(advisor r16 guard: no silent 0.0 coercion)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Tuple1(Array[java.lang.Float](1.5f, null, 2.0f)))
      .toDF("v")
    val e = intercept[Exception] {
      df.select(brCol(FixedPointVec(brEx(col("v")))).as("u"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null element")),
      s"expected the null-element guard, got: ${messages(e)}")
  }

  test("Pca muStats rejects non-null EMPTY vectors loudly " +
      "(advisor r16 guard: no inflated mean divisor)") {
    val spark2 = spark
    import spark2.implicits._
    val emb = Seq(
      (1L, Array(0.5f, 0.25f)),
      (2L, Array.empty[Float]),
      (3L, Array(1.0f, -1.0f))).toDF("id", "embedding")
    val e = intercept[Exception] {
      graft.operators.Pca.pc1Projection(emb, "id", "embedding",
        dim = 2, iters = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("empty (zero-length) vectors")),
      s"expected the empty-vector guard, got: ${messages(e)}")
  }
}
