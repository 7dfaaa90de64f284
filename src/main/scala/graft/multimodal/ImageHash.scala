package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Perceptual image near-dup: difference hash (dHash — the public
  * 9×8 gradient fingerprint; Krawetz 2013) over REAL decoded pixels,
  * then banded Hamming blocking + exact verify — the image analog of
  * the q25/q27 text near-dup machinery, closing the loop between the
  * media decoders and the dedup family.
  *
  * Exactness: the hash compares block SUMS (equal-size blocks), so
  * no division ever happens; bits pack into two non-negative 32-bit
  * halves (hi = rows 0–3, lo = rows 4–7, bit k = r*8+c), integers end
  * to end. The fixture's 2×2 blocks are constant-gray quadratic
  * residues of (doc_id, block), so DuckDB replays the DECODED hash
  * arithmetically while Spark runs the real PNG decode.
  *
  * Scale shape: one narrow decode pass (payload → 16 bytes of hash;
  * images never shuffle), banding exchanges (band, 8-bit key, id)
  * triples, exact verify joins hashes back by id. Eight 8-bit bands
  * give EXACT recall at Hamming ≤ 7 by pigeonhole — ≤7 differing
  * bits cannot touch all 8 bands — so the blocked plan equals the
  * all-pairs oracle, not an approximation of it.
  */
object ImageHash {

  final case class HashRow(doc_id: Long, width: Int, height: Int,
      hash_hi: Long, hash_lo: Long)

  /** 18×16 gray PNG per document; 2×2 blocks of constant gray
    * b = qr(seed, blockIdx), where docs with id % 50 == 1 reuse the
    * previous id's pattern with 3 perturbed blocks (idx % 29 == 0) —
    * planted dHash near-dups the way the text fixtures plant
    * near-dup token edits.
    */
  private[graft] def blockGray(id: Long, idx: Int): Int = {
    val seed = if (id % 50 == 1) id - 1 else id
    val v = (seed * 999983L + idx * 7919L + 12345L) % 1000003L
    val b = ((v * v) % 1000003L % 256L).toInt
    if (id % 50 == 1 && idx % 29 == 0) (b + 128) % 256 else b
  }

  private[graft] def dhashPngBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val g = blockGray(id, r * 9 + c)
        val rgb = (g << 16) | (g << 8) | g
        img.setRGB(2 * c, 2 * r, rgb); img.setRGB(2 * c + 1, 2 * r, rgb)
        img.setRGB(2 * c, 2 * r + 1, rgb)
        img.setRGB(2 * c + 1, 2 * r + 1, rgb)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** documents → real-PNG media table with planted near-dup pairs
    * (the imageFixture pattern: id list spread across executor
    * threads first, encode scan-local).
    */
  def dhashFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    implicit val enc = Encoders.product[Multimodal.MediaRow]
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => Multimodal.MediaRow(id, "image", dhashPngBytes(id)))
      .toDF()
  }

  /** Decode + dHash in one executor pass:
    * (doc_id, width, height, hash_hi, hash_lo). Grid is 9×8 integer
    * block rectangles (x ∈ [c·w/9, (c+1)·w/9)); bit(r,c) = 1 iff
    * sum(block r,c)·n(r,c+1) < sum(block r,c+1)·n(r,c) — the mean
    * comparison with the division cleared, exact for any dims.
    * Undecodable payloads fail loudly (the ImageIoDecoder contract).
    */
  def dhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[HashRow]
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"doc $id: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        require(w >= 9 && h >= 8, s"doc $id: $w x $h too small for dHash")
        // block sums + pixel counts over the 9×8 integer grid
        val sums = Array.ofDim[Long](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val r = math.min(y * 8 / h, 7)
          var x = 0
          while (x < w) {
            val c = math.min(x * 9 / w, 8)
            val rgb = img.getRGB(x, y)
            val lum =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            sums(r)(c) += lum; cnts(r)(c) += 1
            x += 1
          }
          y += 1
        }
        var hi = 0L; var lo = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            val bit =
              sums(r)(c) * cnts(r)(c + 1) < sums(r)(c + 1) * cnts(r)(c)
            if (bit) {
              val k = (r % 4) * 8 + c
              if (r < 4) hi |= 1L << k else lo |= 1L << k
            }
            c += 1
          }
          r += 1
        }
        HashRow(id, w, h, hi, lo)
      }
      .toDF()
  }

  /** Near-dup pairs at Hamming ≤ maxHamming over (hash_hi, hash_lo):
    * 8 bands of 8 bits block candidates (exact recall for
    * maxHamming ≤ 7 by pigeonhole), ids-only exchange, exact
    * bit_count verify. Returns (doc_a, doc_b, hamming).
    */
  def nearDuplicatePairs(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming=$maxHamming: 8x8-bit banding guarantees recall only to 7")
    val banded = hashes.select(col("doc_id"), explode(array(
        (0 until 8).map { j =>
          val h = if (j < 4) col("hash_hi") else col("hash_lo")
          struct(lit(j).as("band"),
            h.bitwiseAND(lit(255L << (8 * (j % 4))))
              .as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val cand = banded.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("b")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val ha = hashes.select(col("doc_id").as("a"),
      col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a"))
    val hb = hashes.select(col("doc_id").as("b"),
      col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b"))
    cand.join(ha, Seq("a")).join(hb, Seq("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        (expr("bit_count(hi_a ^ hi_b)") +
          expr("bit_count(lo_a ^ lo_b)")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
