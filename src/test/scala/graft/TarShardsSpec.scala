package graft

import org.apache.spark.sql.functions._
import graft.sources.TarShards

/** WebDataset-style tar shard sink: lossless roundtrip, deterministic
  * sharding, and BYTE-IDENTICAL rewrites (shard checksums as
  * reproducibility receipts).
  */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.range(200)
    .select(col("id"),
      // deterministic fake image bytes: length and content are pure
      // functions of the id, including empty and block-boundary sizes
      expr("""substring(unhex(repeat(md5(CAST(id AS STRING)), 44)),
               1, CAST(id % 700 AS INT))""").as("img"),
      concat(lit("caption for "), col("id")).as("txt"))

  private val path = new java.io.File("target/tmp/tar_shards").getAbsolutePath

  test("tar shards: lossless roundtrip of every (key, ext, payload)") {
    val df = corpus
    val sizes = TarShards.writeTarShards(
      df, "id", Map("img" -> "img", "txt" -> "txt"), 4, path)
    assert(sizes.keySet == (0 until 4).toSet)
    assert(sizes.values.sum == 200L)

    val back = TarShards.readTarShards(spark, path).cache()
    assert(back.count() == 400) // 200 keys x 2 extensions
    // payloads byte-exact: compare md5 + length per (key, ext)
    val a = back.select(col("key"), col("ext"),
      md5(col("payload")).as("m"), length(col("payload")).as("l"))
    val b = df.select(col("id").as("key"), md5(col("img")).as("m"),
        length(col("img")).as("l")).withColumn("ext", lit("img"))
      .unionByName(df.select(col("id").as("key"),
        md5(col("txt").cast("binary")).as("m"),
        length(col("txt").cast("binary")).as("l"))
        .withColumn("ext", lit("txt")))
    assert(a.exceptAll(b.select("key", "ext", "m", "l")).isEmpty &&
      b.select("key", "ext", "m", "l").exceptAll(a).isEmpty)
    // shard column agrees with the Knuth assignment contract
    val wrong = back.filter(col("shard") =!=
      pmod(col("key") * lit(2654435761L), lit(2147483647L)) % 4).count()
    assert(wrong == 0)
  }

  test("tar shards: rewrite produces byte-identical archives " +
      "(reproducibility receipts)") {
    val df = corpus
    def checksums(): Map[String, String] = {
      TarShards.writeTarShards(
        df, "id", Map("img" -> "img", "txt" -> "txt"), 4, path)
      spark.read.format("binaryFile").load(s"$path/shard-*.tar")
        .select(col("path"), md5(col("content")).as("m"))
        .as[(String, String)].collect().toMap
    }
    val first = checksums()
    val second = checksums()
    assert(first == second && first.size == 4)
    // and a differently-partitioned input changes nothing
    val third = {
      TarShards.writeTarShards(df.repartition(13),
        "id", Map("img" -> "img", "txt" -> "txt"), 4, path)
      spark.read.format("binaryFile").load(s"$path/shard-*.tar")
        .select(col("path"), md5(col("content")).as("m"))
        .as[(String, String)].collect().toMap
    }
    assert(third == first)
  }

  test("tar shards: entries parse as valid USTAR (recomputed header " +
      "checksums match the stored field)") {
    TarShards.writeTarShards(
      corpus, "id", Map("img" -> "img", "txt" -> "txt"), 2, path)
    val tars = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(tars.length == 2)
    tars.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      var off = 0
      var entries = 0
      while (off + 512 <= bytes.length && bytes(off) != 0) {
        val stored = Integer.parseInt(
          new String(bytes, off + 148, 6, "US-ASCII"), 8)
        val sum = (0 until 512).map { i =>
          if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff
        }.sum
        assert(stored == sum, s"${f.getName} entry $entries checksum")
        assert(new String(bytes, off + 257, 5, "US-ASCII") == "ustar")
        val size = java.lang.Long.parseLong(
          new String(bytes, off + 124, 11, "US-ASCII").trim, 8)
        off += 512 + ((size.toInt + 511) / 512) * 512
        entries += 1
      }
      assert(entries > 0)
      // archive ends with two zero blocks
      assert(bytes.length >= off + 1024 &&
        bytes.slice(off, off + 1024).forall(_ == 0))
    }
  }
}
