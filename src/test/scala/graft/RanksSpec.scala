package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Ranks

/** Differential test for the decomposed global-rank primitives: for
  * ScalaCheck-generated frames (duplicate-heavy value distributions,
  * n both below and above the tile count), `Ranks.bucketedRowNumber`
  * + `Ranks.ntileOf` must reproduce Spark's single-window
  * `row_number()`/`ntile(k)` BIT-exactly — the q154 rewrite's whole
  * claim. Buckets are deliberately coarse (collisions guaranteed) to
  * exercise the offset + in-bucket composition, and the tie-broken
  * order (v, id) is strict so both formulations are deterministic.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 400)
    vs <- Gen.listOfN(n, Gen.choose(0, 99).map(_ / 100.0))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def cases(count: Int): Seq[List[(Long, Double)]] = {
    val p = Gen.Parameters.default
    (1 to count).flatMap(i => genRows.apply(p, Seed(i.toLong))) :+
      List((0L, 0.5)) // single-row edge
  }

  test("bucketedRowNumber == global row_number over (v, id)") {
    for (rows <- cases(12)) {
      val df = rows.toDF("id", "v")
      val got = Ranks.bucketedRowNumber(df,
          floor(col("v") * 8).cast("int"),
          Seq(col("v"), col("id")), "rn")
        .select(col("id"), col("rn").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("rn").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"n=${rows.size}")
    }
  }

  test("ntileOf == ntile(k) for k in {3, 10, 64}") {
    for (rows <- cases(8); k <- Seq(3, 10, 64)) {
      val df = rows.toDF("id", "v")
      val n = rows.size.toLong
      val got = Ranks.bucketedRowNumber(df,
          floor(col("v") * 8).cast("int"),
          Seq(col("v"), col("id")), "rn")
        .withColumn("bin", Ranks.ntileOf(col("rn"), lit(n), k))
        .select(col("id"), col("bin").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df.withColumn("bin",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("bin").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }
}
