package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → banded bucket join → exact-Jaccard
  * verification. The classic trillion-token-corpus dedup pipeline,
  * expressed entirely as DataFrame transformations:
  *
  *   1. per-doc shingling + signatures are scan-local (no shuffle,
  *      whole-stage-codegen'd higher-order functions, no UDFs);
  *   2. the only shuffles are the band-bucket exchange (`numBands`
  *      rows per doc, ~16 bytes each — tiny next to the text) and the
  *      two verification joins;
  *   3. oversized buckets (hot bands from boilerplate text) are
  *      capped at `maxBucketSize` to keep the candidate join from
  *      going quadratic on skew — the standard large-corpus guard.
  *
  * Hash family: h_i(s) = xxhash64(xxhash64(s), i) — i-indexed rehash
  * of a base shingle hash. ANSI-safe (no overflowing multiplies) and
  * cheap: the string is hashed once, the per-permutation rehash works
  * on 16 bytes.
  *
  * With numHashes=128 / 32 bands of 4 rows, recall at Jaccard 0.9 is
  * 1 - (1-0.9⁴)³² ≈ 1 - 1.4e-15 — effectively exact, which is why the
  * driver-facing query can be checked against a brute-force oracle.
  */
object MinHashDedup {

  /** Distinct k-token shingles of a whitespace-tokenized text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** doc → (id, shingles, sig: array<long>[numHashes]).
    * The 128-permutation min pass is one codegen'd two-level loop
    * (MinHashSig) — not 128 interpreted lambda passes.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, shingleSize: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("shingles"))
      .withColumn("hs", transform(col("shingles"), s => xxhash64(s)))
    val sig = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expr.MinHashSig(
        org.apache.spark.sql.GraftSqlBridge.expression(col("hs")), numHashes))
    base.select(col("id"), col("shingles"), sig.as("sig"))
  }

  /** Candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.
    * Single-pass shape: signatures are computed once, (id, band,
    * bucket) rows take ONE groupBy exchange, and in-bucket pairs are
    * generated post-shuffle (no self-join recomputing signatures).
    * Oversized buckets (boilerplate skew) are capped with observed
    * drop metrics — see LshSkew.
    */
  def candidatePairs(sigs: DataFrame, numBands: Int, rowsPerBand: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    val bandHashes = array((0 until numBands).map { j =>
      xxhash64(slice(col("sig"), j * rowsPerBand + 1, rowsPerBand), lit(j))
    }: _*)
    val buckets = sigs.select(
      struct(col("id")).as("m"),
      posexplode(bandHashes).as(Seq("band", "bucket")))
    val capped = LshSkew.groupCapped(buckets, maxBucketSize, "minhash_lsh_skew")
    LshSkew.bucketPairs(capped)
      .select(col("m1.id").as("id_a"), col("m2.id").as("id_b"))
      .distinct()
  }

  /** Full pipeline: near-duplicate pairs with exact shingle Jaccard ≥
    * `threshold`. Output: (doc_a, doc_b, jaccard), jaccard as exact
    * |∩|/|∪| double.
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, numBands: Int = 32,
      shingleSize: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val sigs = signatures(docs, idCol, textCol, numHashes, shingleSize)
    val cands = candidatePairs(sigs, numBands, numHashes / numBands, maxBucketSize)
    // verification needs only the shingle sets — rebuild them without
    // the 128-hash signature computation (this subtree is evaluated
    // twice for the two sides of the verification join; shingling is
    // cheap next to the minhash pass)
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("shingles"))
    cands
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard top-k most-similar pairs (brute force over
    * LSH candidates with a low-similarity band threshold, then global
    * top-k). For "show me the k closest pairs" UX; at corpus scale the
    * candidate generation is the same LSH machinery.
    */
  def topKSimilarPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int = 128, numBands: Int = 64): DataFrame =
    nearDuplicatePairs(docs, idCol, textCol, threshold = 0.0,
      numHashes = numHashes, numBands = numBands)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(k)
}
