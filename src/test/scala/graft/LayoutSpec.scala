package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting
import graft.sources.Layout

/** Physical layout: bucketed co-located joins (no exchange, no sort)
  * and salted skew joins (same result, spread hot keys).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no exchange and no sort") {
    val customer = Tables.load(spark, sf0001, "customer")
    val orders = Tables.load(spark, sf0001, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    Layout.writeBucketed(customer, "cust_b", Seq("c_custkey"), 8)
    Layout.writeBucketed(orders, "ord_b", Seq("c_custkey"), 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.table(spark, "cust_b")
        .join(Layout.table(spark, "ord_b"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() ==
        customer.join(orders, "c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join: identical result, salt in the join keys") {
    // skewed big side: one hot key
    val big = (Seq.fill(500)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name")

    val salted = Salting.saltedJoin(big, small, "k", saltFactor = 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt not in join plan:\n$plan")

    // left_outer keeps unmatched big rows exactly once
    val lo = Salting.saltedJoin(big, small, "k", 8, "left_outer")
    assert(lo.count() == big.count())
  }

  test("training shards: lossless, balanced, deterministic, and " +
      "readable one shard at a time") {
    import spark.implicits._
    val n = 4000
    val df = (0 until n).map(_.toLong).toDF("id")
      .withColumn("payload", concat(lit("doc_"), col("id")))
    val path = new java.io.File("target/tmp/train_shards").getAbsolutePath
    Layout.writeTrainingShards(df, "id", nShards = 8, path)

    val back = spark.read.parquet(path)
    // lossless: every row comes back with its payload
    assert(back.count() == n)
    assert(back.select("id").as[Long].collect().toSet ==
      (0L until n).toSet)
    // assignment is the documented pure function of the id
    val bad = back.filter(
      col("pos") =!= pmod(col("id") * lit(2654435761L), lit(2147483647L)) ||
      col("shard") =!= (col("pos") % 8).cast("int")).count()
    assert(bad == 0)
    // hash balance: all 8 shards within 20% of the mean
    val counts = back.groupBy("shard").count().as[(Int, Long)]
      .collect().toMap
    assert(counts.keySet == (0 until 8).toSet)
    assert(counts.values.forall(c => math.abs(c - n / 8.0) < n / 8.0 * 0.2),
      counts.toString)
    // one shard = one partition directory, independently readable
    val s3 = spark.read.parquet(s"$path/shard=3")
    assert(s3.count() == counts(3))
    // overwrite is deterministic: identical assignment on a rewrite
    // (materialize BEFORE rewriting — the lazy plan would re-list
    // the overwritten files)
    val first = back.select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    Layout.writeTrainingShards(df, "id", nShards = 8, path)
    val again = spark.read.parquet(path)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(again == first)
  }

  test("partitioned layout: a shard predicate prunes at PLANNING time " +
      "(PartitionFilters, no data filter) — the 100 TB selective read") {
    import spark.implicits._
    val df = (0 until 1000).map(_.toLong).toDF("id")
      .withColumn("payload", concat(lit("doc_"), col("id")))
    val path = new java.io.File("target/tmp/prune_shards").getAbsolutePath
    Layout.writeTrainingShards(df, "id", nShards = 8, path)
    val q = spark.read.parquet(path).filter(col("shard") === 3)
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must appear as a partition filter on the scan,
    // and must NOT fall through to a row-level data filter
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isDefined,
      s"shard predicate did not reach PartitionFilters:\n$plan")
    assert("PushedFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isEmpty,
      s"shard predicate leaked into data filters:\n$plan")
    // pruned scan reads exactly the one directory's rows
    val full = spark.read.parquet(path)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(q.count() == full(3))
  }

  test("z-order layout: a box predicate on EITHER column clusters " +
      "into few files; the wrong-column linear sort spreads over all") {
    import spark.implicits._
    // full 128x128 grid
    val grid = spark.range(128L * 128L)
      .select((col("id") % 128).as("x"), (col("id") / 128).as("y"))
    // z-value is a bijection on the grid (no two cells collide)
    val nz = grid.select(Layout.zValue(col("x"), col("y"), 7).as("z"))
      .distinct().count()
    assert(nz == 128L * 128L)

    val zPath = new java.io.File("target/tmp/zorder").getAbsolutePath
    val linPath = new java.io.File("target/tmp/linear").getAbsolutePath
    Layout.writeZOrdered(grid, zPath, "x", "y", bits = 7, numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    def filesMatching(path: String, pred: org.apache.spark.sql.Column) =
      spark.read.parquet(path).where(pred)
        .select(input_file_name()).distinct().count()

    // predicate on y: the x-sorted layout spreads matches everywhere
    val pred = col("y") >= 8 && col("y") < 24
    val zFiles = filesMatching(zPath, pred)
    val linFiles = filesMatching(linPath, pred)
    assert(linFiles == 16, s"expected all 16 linear files, got $linFiles")
    assert(zFiles <= 6, s"z-order should cluster the box into a few of " +
      s"16 files, got $zFiles")
    // and the z layout stays clustered on x too (no traded dimension)
    val zFilesX = filesMatching(zPath, col("x") >= 8 && col("x") < 24)
    assert(zFilesX <= 6, s"x-box hit $zFilesX z-ordered files")
    // lossless
    assert(spark.read.parquet(zPath).count() == 128L * 128L)
  }
}
