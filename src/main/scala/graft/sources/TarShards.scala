package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the interchange format multimodal
  * training loaders consume: each shard is a tar archive whose
  * entries are `<key>.<ext>` files, with all of a sample's pieces
  * (`000123.img`, `000123.txt`, `000123.json`) stored contiguously so
  * a loader streams samples sequentially with no index. Pure-JVM
  * USTAR writing/parsing (the tar layout is 512-byte headers with
  * octal ASCII fields — no library needed), consistent with the
  * repo's no-new-dependencies rule.
  *
  * Determinism is the contract, as with `Layout.writeTrainingShards`:
  * shard assignment and within-shard order are the same Knuth-hash
  * pure functions of the key, entry metadata is pinned (mtime 0,
  * fixed mode/uid), so a rewrite produces BYTE-IDENTICAL tar files —
  * shard checksums become reproducibility receipts for a training
  * run. Scale shape: one exchange keyed on the 4-byte shard id (the
  * global shuffle, paid once at write), each task streams its
  * shard(s) to disk entry by entry — nothing sample-sized ever
  * accumulates beyond the row in flight.
  */
object TarShards {

  private val BLOCK = 512

  private def headerBytes(name: String, size: Long): Array[Byte] = {
    require(name.length <= 100, s"tar entry name too long: $name")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)                                   // name
    put(100, "0000644\u0000")                      // mode
    put(108, "0000000\u0000")                      // uid
    put(116, "0000000\u0000")                      // gid
    put(124, f"$size%011o" + "\u0000")             // size (octal)
    put(136, "00000000000\u0000")                  // mtime 0: reproducible
    put(148, "        ")                           // chksum = spaces for now
    h(156) = '0'                                   // typeflag: regular file
    put(257, "ustar\u000000")                      // USTAR magic + version
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o" + "\u0000 ")
    h
  }

  /** Write `df` as `nShards` deterministic tar shards at
    * `path/shard-<k>.tar`. `payload` maps an entry EXTENSION to the
    * column holding its bytes (BinaryType or StringType — strings are
    * written UTF-8); every row becomes `|payload|` entries named
    * `<key>.<ext>`, extensions in sorted order, rows in the
    * shard-local Knuth-hash order. Returns the (shard, n_rows) sizes.
    */
  def writeTarShards(df: DataFrame, keyCol: String,
      payload: Map[String, String], nShards: Int, path: String)
      : Map[Int, Long] = {
    require(payload.nonEmpty, "need at least one payload column")
    val spark = df.sparkSession
    val exts = payload.keys.toSeq.sorted
    val cols = col(keyCol).cast("long").as("_key") +:
      exts.map(e => col(payload(e)).cast("binary").as(s"_p_$e"))
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)       // no stale shards
    fs.mkdirs(out)

    val sized = Layout.shardAssignment(df.select(cols: _*), "_key", nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"), col("_key"))

    import spark.implicits._
    sized.mapPartitions { rows =>
      // a partition holds whole shards (repartition keys on shard);
      // stream each to its tar, switching files on the shard boundary
      val conf = hconf.value
      var cur: java.io.OutputStream = null
      var curShard = -1
      var n = 0L
      val counts = scala.collection.mutable.Map[Int, Long]()
      def close(): Unit = if (cur != null) {
        cur.write(new Array[Byte](2 * BLOCK))    // end-of-archive
        cur.close(); counts(curShard) = n; cur = null
      }
      rows.foreach { r =>
        val shard = r.getAs[Int]("shard")
        if (shard != curShard) {
          close()
          val p = new org.apache.hadoop.fs.Path(path, f"shard-$shard%05d.tar")
          cur = p.getFileSystem(conf).create(p, true)
          curShard = shard; n = 0L
        }
        val key = r.getAs[Long]("_key")
        exts.foreach { e =>
          val bytes = r.getAs[Array[Byte]](s"_p_$e")
          require(bytes != null,
            s"NULL payload for key=$key ext=$e — a tar entry has no " +
              "NULL representation; coalesce to empty bytes upstream " +
              "if absence is intended")
          cur.write(headerBytes(f"$key%012d.$e", bytes.length.toLong))
          cur.write(bytes)
          val pad = (BLOCK - bytes.length % BLOCK) % BLOCK
          if (pad > 0) cur.write(new Array[Byte](pad))
        }
        n += 1
      }
      close()
      counts.iterator.map { case (s, c) => (s, c) }
    }.collect().toMap
  }

  /** Read tar shards back as `(shard, key, ext, payload)` rows —
    * each task parses whole archives sequentially (the WebDataset
    * read pattern). Shards should be loader-sized (hundreds of MB),
    * which `binaryFile` holds in memory per task; the writer's
    * nShards controls that.
    */
  def readTarShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(p)
          .map(_.group(1).toInt).getOrElse(-1)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, String, Array[Byte])]
        var off = 0
        var done = false
        while (!done && off + BLOCK <= bytes.length) {
          if (bytes(off) == 0) done = true       // end-of-archive block
          else {
            val nameEnd = (off until off + 100)
              .find(bytes(_) == 0).getOrElse(off + 100)
            val name = new String(bytes, off, nameEnd - off, "US-ASCII")
            val size = java.lang.Long.parseLong(
              new String(bytes, off + 124, 11, "US-ASCII").trim, 8)
            val dot = name.lastIndexOf('.')
            val key = name.substring(0, dot).toLong
            val ext = name.substring(dot + 1)
            val payload = java.util.Arrays.copyOfRange(
              bytes, off + BLOCK, off + BLOCK + size.toInt)
            out += ((shard, key, ext, payload))
            off += BLOCK + ((size.toInt + BLOCK - 1) / BLOCK) * BLOCK
          }
        }
        out
      }
      .toDF("shard", "key", "ext", "payload")
  }
}
