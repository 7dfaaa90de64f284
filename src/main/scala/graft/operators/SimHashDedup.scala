package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit sign fingerprints of the
  * token-hash distribution, Hamming-ball search via bit-band blocking
  * (Charikar'02 / the Google-crawl dedup construction).
  *
  * The fingerprint is a pure per-row expression (higher-order
  * functions over the token array — no shuffle, no UDF); the pair
  * search exchanges only (id, 16-bit band) rows. For Hamming radius
  * ≤ 3, 4 bands of 16 bits guarantee at least one exact band match
  * (pigeonhole), so candidate generation has perfect recall.
  */
object SimHashDedup {

  /** 64-slot signed bit-count accumulator over token hashes, then
    * sign → bits. Output: array<int>[64] of 0/1.
    * Built as one SQL lambda expression (getbit isn't exposed in the
    * Scala Column API); stays codegen-friendly and ANSI-safe.
    */
  def simhashBits(textColName: String): Column = {
    val sums =
      s"""aggregate(
           transform(split($textColName, ' '), t -> xxhash64(t)),
           array_repeat(CAST(0 AS BIGINT), 64),
           (acc, h) -> zip_with(acc,
             transform(sequence(0, 63),
               j -> CASE WHEN getbit(h, j) = 1 THEN 1 ELSE -1 END),
             (a, b) -> a + CAST(b AS BIGINT)))"""
    transform(expr(sums), c => when(c > 0, lit(1)).otherwise(lit(0)))
  }

  /** Hamming distance between two bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), (acc, v) => acc + v)

  /** docs → (id, bits) */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhashBits(textCol).as("bits"))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming, via
    * 4×16-bit band blocking (exact recall for maxHamming ≤ 3).
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
    val bandHashes = array((0 until 4).map { j =>
      xxhash64(slice(col("bits"), j * 16 + 1, 16), lit(j))
    }: _*)
    val buckets = fp.select(col("id"), posexplode(bandHashes).as(Seq("band", "bucket")))
    val sized = LshSkew.capBuckets(buckets, maxBucketSize, "simhash_lsh_skew")
    val a = sized.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = sized.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(fp.select(col("id").as("id_a"), col("bits").as("bits_a")), "id_a")
      .join(fp.select(col("id").as("id_b"), col("bits").as("bits_b")), "id_b")
      .withColumn("hamming", hamming(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
  }
}
