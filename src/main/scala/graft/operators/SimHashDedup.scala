package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit sign fingerprints of the
  * token-hash distribution, Hamming-ball search via bit-band blocking
  * (Charikar'02 / the Google-crawl dedup construction).
  *
  * The fingerprint is a pure per-row expression (higher-order
  * functions over the token array — no shuffle, no UDF); the pair
  * search exchanges only (id, band-bucket) rows. Band layout is
  * DERIVED from the search radius: `maxHamming + 1` bands guarantee by
  * pigeonhole that any pair within the radius shares at least one
  * exact band — candidate generation has perfect recall at every
  * radius, so the pair query is brute-force-oracle-checkable.
  *
  * Two token-hash families:
  *   - md5-hex bit extraction (default): identical arithmetic is
  *     expressible in DuckDB SQL, making fingerprints cross-engine
  *     verifiable (the correctness-gate requirement);
  *   - xxhash64 + getbit: cheaper per token; use in production where
  *     cross-engine verifiability is not needed.
  */
object SimHashDedup {

  /** 64-slot signed bit-count accumulator over token hashes, then
    * sign → bits. Output: array<int>[64] of 0/1.
    * Built as one SQL lambda expression; stays codegen-friendly and
    * ANSI-safe.
    *
    * md5 mode: bit j of a token's hash = bit (3 - j%4) of hex digit
    * j/4 of md5(token) — plain string/integer arithmetic that DuckDB
    * mirrors exactly.
    */
  def simhashBits(textColName: String, portable: Boolean = true): Column = {
    val perTokenBits =
      if (portable)
        """transform(sequence(0, 63), j ->
             CASE WHEN ((instr('0123456789abcdef',
                               substring(h, CAST(j DIV 4 AS INT) + 1, 1)) - 1)
                        DIV (CASE CAST(j % 4 AS INT)
                             WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END))
                       % 2 = 1
                  THEN 1 ELSE -1 END)"""
      else
        """transform(sequence(0, 63),
             j -> CASE WHEN getbit(h, j) = 1 THEN 1 ELSE -1 END)"""
    val tokenHash = if (portable) "md5(t)" else "xxhash64(t)"
    val sums =
      s"""aggregate(
           transform(split($textColName, ' '), t -> $tokenHash),
           array_repeat(CAST(0 AS BIGINT), 64),
           (acc, h) -> zip_with(acc, $perTokenBits,
             (a, b) -> a + CAST(b AS BIGINT)))"""
    transform(expr(sums), c => when(c > 0, lit(1)).otherwise(lit(0)))
  }

  /** Hamming distance between two bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), (acc, v) => acc + v)

  /** docs → (id, bits) */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      portable: Boolean = true): DataFrame =
    docs.select(col(idCol).as("id"), simhashBits(textCol, portable).as("bits"))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming.
    * Band blocking with `maxHamming + 1` bands of ~64/(maxHamming+1)
    * bits each: a pair within the radius differs in ≤ maxHamming
    * bands, so (pigeonhole) at least one band matches exactly —
    * perfect candidate recall; exact Hamming verification follows.
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      portable: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    val numBands = maxHamming + 1
    val bounds = (0 to numBands).map(j => j * 64 / numBands)
    val fp = fingerprints(docs, idCol, textCol, portable)
    val bandHashes = array((0 until numBands).map { j =>
      xxhash64(slice(col("bits"), bounds(j) + 1, bounds(j + 1) - bounds(j)),
        lit(j))
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
