package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit sign fingerprints of the
  * token-hash distribution, Hamming-ball search via bit-band blocking
  * (Charikar'02 / the Google-crawl dedup construction).
  *
  * Representation: the fingerprint is ONE packed BIGINT (bit 0 of the
  * hash = bit 63 of the long). Everything downstream works on that
  * 8-byte value — band buckets are bit-slices (shift+mask, no extra
  * hashing), Hamming verification is `bit_count(a ^ b)`, and the only
  * exchanged payloads are (id, band, bucket) rows and 8-byte
  * fingerprints. At corpus scale that is the difference between
  * shuffling ~1 KB of int-array per doc and 8 bytes.
  *
  * Band layout is DERIVED from the search radius: `maxHamming + 1`
  * bands guarantee by pigeonhole that any pair within the radius
  * shares at least one exact band — candidate generation has perfect
  * recall at every radius, so the pair query is
  * brute-force-oracle-checkable.
  *
  * Scale law (measured in ScaleStress / PERF.md): a band of
  * `64/(maxHamming+1)` bits has only `2^(64/(maxHamming+1))` possible
  * buckets, so the radius bounds the blocking capacity — radius 8
  * (~128 buckets/band) saturates the bucket cap around 10⁵ docs,
  * radius 4 (~4096/band) is healthy at 2.5×10⁵. Shrink the radius as
  * the corpus grows (or widen the fingerprint); the LshSkew drop
  * metrics are the alarm that says when.
  *
  * Two token-hash families:
  *   - md5-hex (default): bit j of a token's hash = bit (3 - j%4) of
  *     hex digit j/4 of md5(token) — identical arithmetic is
  *     expressible in DuckDB SQL, making fingerprints cross-engine
  *     verifiable. Parsed 4 hex chars at a time via conv() + getbit
  *     (4 string ops per token, not 64).
  *   - xxhash64 + getbit: cheaper still; use in production where
  *     cross-engine verifiability is not needed.
  */
object SimHashDedup {

  /** 64-slot signed bit-count accumulator over token hashes, then
    * sign → bits. Output: array<int>[64] of 0/1, bit 0 first.
    * One SQL lambda expression — codegen-friendly, ANSI-safe.
    */
  def simhashBits(textColName: String, portable: Boolean = true): Column =
    if (portable) {
      // per token: four 16-bit chunks of md5's first 16 hex chars
      // (chunk 0 most significant); the sign accumulation is one
      // codegen'd loop (SimHashBits expression) — not a 64-element
      // zip_with allocation per token
      // conv() is nullable in Catalyst (can return null on bad input);
      // md5 hex never triggers that, so coalesce to 0 purely to make
      // the element type non-null — SimHashBits rejects containsNull
      // arrays (its getLong would silently read null as 0).
      val chunks = expr(
        s"""transform(split($textColName, ' '), t ->
              transform(sequence(0, 3), c ->
                coalesce(CAST(conv(substring(md5(t), CAST(1 + c * 4 AS INT), 4),
                              16, 10) AS BIGINT), CAST(0 AS BIGINT))))""")
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.expr.SimHashBits(
          org.apache.spark.sql.GraftSqlBridge.expression(chunks)))
    } else {
      val sums =
        s"""aggregate(
             transform(split($textColName, ' '), t -> xxhash64(t)),
             array_repeat(CAST(0 AS BIGINT), 64),
             (acc, h) -> zip_with(acc,
               transform(sequence(0, 63),
                 j -> CASE WHEN getbit(h, CAST(j AS INT)) = 1 THEN 1 ELSE -1 END),
               (a, b) -> a + CAST(b AS BIGINT)))"""
      transform(expr(sums), c => when(c > 0, lit(1)).otherwise(lit(0)))
    }

  /** Pack the 0/1 bit array column into one BIGINT (bit 0 → bit 63 of
    * the long), the engine-internal fingerprint form.
    */
  def packBits(bitsColName: String): Column =
    expr(s"""aggregate(zip_with($bitsColName, sequence(63, 0, -1),
         (b, p) -> IF(b = 1, shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)),
                      CAST(0 AS BIGINT))),
         CAST(0 AS BIGINT), (a, x) -> a | x)""")

  /** Hamming distance between two packed fingerprint columns. */
  def hammingPacked(aName: String, bName: String): Column =
    expr(s"bit_count($aName ^ $bName)")

  /** docs → (id, bits array<int>[64]) — the human-readable form. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      portable: Boolean = true): DataFrame =
    docs.select(col(idCol).as("id"), simhashBits(textCol, portable).as("bits"))

  /** docs → (id, fp BIGINT) — the engine form. */
  def fingerprintsPacked(docs: DataFrame, idCol: String, textCol: String,
      portable: Boolean = true): DataFrame =
    fingerprints(docs, idCol, textCol, portable)
      .select(col("id"), packBits("bits").as("fp"))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming.
    * Band blocking with `maxHamming + 1` bands of ~64/(maxHamming+1)
    * bits each: a pair within the radius differs in ≤ maxHamming
    * bands, so (pigeonhole) at least one band matches exactly —
    * perfect candidate recall; exact bit_count verification follows.
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      portable: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    val numBands = maxHamming + 1
    val bounds = (0 to numBands).map(j => j * 64 / numBands)
    val fp = fingerprintsPacked(docs, idCol, textCol, portable)
    // band j = bits [bounds(j), bounds(j+1)) of the fingerprint,
    // extracted by shift+mask — the bucket id IS the slice value
    val bandBuckets = array((0 until numBands).map { j =>
      val width = bounds(j + 1) - bounds(j)
      // JVM shift counts are mod 64: `1L << 64` is 1, so the width-64
      // band (maxHamming = 0, one band = whole fingerprint) needs the
      // explicit all-ones mask or every doc lands in bucket 0.
      val mask = if (width == 64) -1L else (1L << width) - 1
      expr(s"shiftrightunsigned(fp, ${64 - bounds(j + 1)})")
        .bitwiseAND(lit(mask))
    }: _*)
    // Single-pass shape: the 8-byte fingerprint rides through ONE
    // bucket exchange as the member payload; in-bucket pairs are
    // generated post-shuffle, so fingerprints are computed exactly
    // once and no join appears anywhere in the plan.
    val buckets = fp.select(
      struct(col("id"), col("fp")).as("m"),
      posexplode(bandBuckets).as(Seq("band", "bucket")))
    val capped = LshSkew.groupCapped(buckets, maxBucketSize, "simhash_lsh_skew")
    LshSkew.bucketPairs(capped)
      .withColumn("hamming", hammingPacked("m1.fp", "m2.fp"))
      .filter(col("hamming") <= maxHamming)
      .select(col("m1.id").as("doc_a"), col("m2.id").as("doc_b"), col("hamming"))
      .distinct()
  }
}
