package graft

import org.apache.spark.sql.functions._
import graft.multimodal.ImageHash

/** dHash family (q167/q168) semantics on top of the hash gates. */
class ImageHashSpec extends SparkSpec {

  private lazy val hashes =
    ImageHash.dhash(ImageHash.dhashFixture(
      Tables.load(spark, sf0001, "documents")))
      .localCheckpoint()

  test("q167: real decode is deterministic and hashes are 32-bit " +
      "non-negative halves") {
    val h2 = ImageHash.dhash(ImageHash.dhashFixture(
      Tables.load(spark, sf0001, "documents")))
    assert(hashes.exceptAll(h2).isEmpty && h2.exceptAll(hashes).isEmpty)
    assert(hashes.filter(col("hash_hi") < 0 || col("hash_lo") < 0 ||
      col("hash_hi") > 0xffffffffL || col("hash_lo") > 0xffffffffL)
      .count() == 0)
  }

  test("q168: every planted pair (i-1, i) for i % 50 == 1 is found " +
      "at small Hamming distance") {
    val pairs = ImageHash.nearDuplicatePairs(hashes, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 50 === 1)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { i =>
      assert(pairs.contains((i - 1, i)),
        s"planted near-dup pair (${i - 1}, $i) not found")
    }
  }

  test("q168: 8x8-bit banding has EXACT recall at Hamming <= 7 — " +
      "blocked result equals the all-pairs scan (pigeonhole)") {
    val blocked = ImageHash.nearDuplicatePairs(hashes, maxHamming = 7)
    val a = hashes.select(col("doc_id").as("doc_a"),
      col("hash_hi").as("ha"), col("hash_lo").as("la"))
    val b = hashes.select(col("doc_id").as("doc_b"),
      col("hash_hi").as("hb"), col("hash_lo").as("lb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (expr("bit_count(ha ^ hb)") + expr("bit_count(la ^ lb)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 7)
    assert(blocked.exceptAll(brute).isEmpty &&
      brute.exceptAll(blocked).isEmpty,
      "banded blocking diverged from the exact all-pairs scan")
    // and the corpus makes the claim non-trivial: accidental pairs
    // beyond the planted ones exist at distance 6-7
    assert(brute.count() > Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 50 === 1).count())
  }
}
