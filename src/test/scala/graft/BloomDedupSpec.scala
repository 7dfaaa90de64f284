package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomDedup

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf0001, "documents")

  /** Ground truth: the plain (shuffle-heavy) anti join. */
  private def naive(corpus: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame) =
    corpus.withColumn("__k", col("key"))
      .join(reference.select(col("key").as("__k")), Seq("__k"), "left_anti")
      .drop("__k")

  test("exactly matches the naive anti join on planted duplicates") {
    // corpus: ids 0-99; reference: every key ending in 0-2 plus some
    // keys the corpus does not have at all
    val corpus = (0 until 100).map(i => (i.toLong, s"k${i % 10}_$i"))
      .toDF("id", "key")
    val reference = ((0 until 100).filter(_ % 10 < 3)
      .map(i => s"k${i % 10}_$i") ++ Seq("absent1", "absent2"))
      .toDF("key")
    val got = BloomDedup.dedupAgainstReference(
      corpus, reference, col("key"), expectedItems = 1000)
      .select("id").as[Long].collect().toSet
    val want = naive(corpus, reference).select("id").as[Long]
      .collect().toSet
    assert(got == want)
    assert(want.size == 70) // 30 of 100 keys planted in the reference
  }

  test("exact for ANY fpp: a saturated filter still confirms precisely") {
    val corpus = (0 until 200).map(i => (i.toLong, s"key_$i"))
      .toDF("id", "key")
    val reference = (0 until 200 by 4).map(i => s"key_$i").toDF("key")
    // expectedItems=1 + fpp near 1 → nearly every row is a candidate;
    // the confirm joins must still produce the exact answer
    val got = BloomDedup.dedupAgainstReference(
      corpus, reference, col("key"), expectedItems = 1, fpp = 0.9)
      .select("id").as[Long].collect().toSet
    assert(got == (0 until 200).filter(_ % 4 != 0).map(_.toLong).toSet)
  }

  test("null keys always survive; empty reference keeps everything") {
    val corpus = Seq((1L, "a"), (2L, null), (3L, "b"))
      .toDF("id", "key")
    val ref = Seq("a").toDF("key")
    val got = BloomDedup.dedupAgainstReference(
      corpus, ref, col("key"), expectedItems = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    val emptyRef = Seq.empty[String].toDF("key")
    val all = BloomDedup.dedupAgainstReference(
      corpus, emptyRef, col("key"), expectedItems = 10)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
  }

  test("real-corpus head dedup matches the naive plan") {
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val head = array_join(slice(split(norm, " "), 1, 12), " ")
    val refSrc = Seq("src0", "src1", "src2", "src3")
    val corpus = docs.filter(!col("source").isin(refSrc: _*))
      .withColumn("key", head)
    val reference = docs.filter(col("source").isin(refSrc: _*))
      .withColumn("key", head)
    val got = BloomDedup.dedupAgainstReference(
      corpus.drop("key"), reference.drop("key"), head,
      expectedItems = 10000)
      .select("doc_id").as[Long].collect().toSet
    val want = naive(corpus, reference).select("doc_id").as[Long]
      .collect().toSet
    assert(got == want)
  }

  test("neither corpus ever shuffles: no sort-merge join, both " +
      "confirm joins broadcast") {
    val corpus = (0 until 50).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val reference = (0 until 50 by 2).map(i => s"k$i").toDF("key")
    val plan = BloomDedup.dedupAgainstReference(
        corpus, reference, col("key"), expectedItems = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the semi (confirm) and anti (final) joins both build on the
    // broadcast candidate/dup key sets
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("prefilter probe is the native might_contain expression, not a " +
      "Scala UDF (r6 advisory: the probe codegens on the corpus scan)") {
    val reference = (0 until 50 by 2).map(i => s"k$i").toDF("key")
      .select(col("key").as("__bd_key"))
    val bytes = BloomDedup.buildFilterBytes(reference, 100, 0.01)
    assert(bytes != null)
    // the probe filter sits inside a WholeStageCodegen span with no
    // Scala UDF dispatch (spark.range is a real datasource, so the
    // optimizer can't fold the probe into a pre-evaluated local
    // relation; the operator's own prefilter stage is hidden behind
    // its checkpoint, so the probe column is asserted directly)
    val probe = spark.range(50)
      .select(col("id"), concat(lit("k"), col("id")).as("key"))
      .filter(BloomDedup.mightContainColumn(bytes, xxhash64(col("key"))))
    assert(probe.count() >= 25) // all 25 members + any false positives
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("*(") && !plan.contains("UDF"), plan)
    // empty reference → NULL bytes → operator keeps everything
    assert(BloomDedup.buildFilterBytes(
      reference.limit(0), 100, 0.01) == null)
  }

  test("candidate sets above the broadcast budget degrade to shuffle " +
      "joins with the same exact answer") {
    // snapshot-overlap regime: 90% of the corpus is duplicate, so the
    // candidate set is corpus-scale; budget=10 forces the fallback
    val corpus = (0 until 200).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val reference = (0 until 180).map(i => s"k$i").toDF("key")
    val deduped = BloomDedup.dedupAgainstReference(
      corpus, reference, col("key"), expectedItems = 1000,
      broadcastBudgetRows = 10)
    assert(deduped.select("id").as[Long].collect().toSet ==
      (180 until 200).map(_.toLong).toSet)
    // no forced broadcast of a corpus-scale key set: the broadcast
    // hint must be absent from the optimized plan (AQE may still pick
    // its own small-table broadcast at this toy scale — the guard
    // governs the FORCED hint, so that's what the assert targets)
    val optimized = deduped.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("broadcast"), optimized)
  }
}
