package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode pass: schema, determinism, and feature vectors") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    assert(media.schema("payload").dataType.typeName == "binary")

    val decoded = Multimodal.decode(media, Multimodal.StubDecoder)
    val rows = decoded.collect()
    assert(rows.length == 500)
    // feature = normalized 8-bucket histogram → sums to ~1
    rows.take(20).foreach { d =>
      assert(d.feature.length == 8)
      assert(math.abs(d.feature.sum - 1f) < 1e-3, s"doc ${d.doc_id}")
      assert(d.width == (640 - d.n_bytes % 320).toInt)
    }
    // deterministic across runs
    val again = Multimodal.decode(media, Multimodal.StubDecoder).collect()
    assert(rows.map(_.doc_id).sorted.toSeq == again.map(_.doc_id).sorted.toSeq)
    assert(rows.sortBy(_.doc_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.feature.toSeq).toSeq)
  }

  test("decode is a scan-local pass (no exchange in the plan)") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    val plan = Multimodal.decode(media, Multimodal.StubDecoder).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("resize fits the target box, preserves aspect, never upscales") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    val decoded = Multimodal.decode(media, Multimodal.StubDecoder)
    val resized = Multimodal.resize(decoded, maxW = 320, maxH = 240).collect()
    val orig = decoded.collect().map(d => d.doc_id -> d).toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.width <= 320 && r.height <= 240, s"doc ${r.doc_id}")
      assert(r.width <= o.width && r.height <= o.height) // no upscale
      // aspect preserved within integer truncation
      val s = math.min(1.0, math.min(320.0 / o.width, 240.0 / o.height))
      assert(r.width == math.max(1, (o.width * s).toInt))
      assert(r.height == math.max(1, (o.height * s).toInt))
    }
  }

  test("frameSample: every step-th frame, contiguous deterministic " +
      "slices, scan-local") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    val frames = Multimodal.frameSample(media, step = 4, Multimodal.StubDecoder)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val byDoc = frames.collect().groupBy(_.doc_id)
    val meta = Multimodal.decode(media, Multimodal.StubDecoder).collect().map(d => d.doc_id -> d).toMap
    byDoc.foreach { case (id, fs) =>
      val d = meta(id)
      assert(d.modality == "video")
      assert(fs.map(_.frame_idx).sorted.toSeq ==
        (0L until d.n_frames.toLong by 4L).toSeq)
      val sz = (d.n_bytes / d.n_frames).toInt
      fs.foreach { f =>
        assert(f.offset == f.frame_idx * sz)
        assert(f.frame_bytes.length == sz)
      }
    }
  }

  test("MediaDecoder is pluggable: a second implementation drives the " +
      "same decode/frameSample plumbing (production codec drop-in)") {
    // fixed-metadata decoder: what a real container-header parser
    // would return — distinct from the stub on every field it touches
    object FixedDecoder extends Multimodal.MediaDecoder {
      override def decodeOne(m: Multimodal.MediaRow): Multimodal.Decoded =
        Multimodal.Decoded(m.doc_id, m.modality, m.payload.length.toLong,
          width = 128, height = 64, n_frames = 2,
          feature = Array(1f, 0f, 0f, 0f))
    }
    val media = Multimodal.mediaTable(
      Tables.load(spark, sf0001, "documents").limit(30))
    val decoded = Multimodal.decode(media, FixedDecoder).collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall(d => d.width == 128 && d.height == 64 &&
      d.feature.sameElements(Array(1f, 0f, 0f, 0f))))
    // frameSample consults the injected decoder's n_frames (2), so
    // step=1 yields exactly 2 frames per video payload
    val frames = Multimodal.frameSample(media, step = 1, FixedDecoder)
      .collect().groupBy(_.doc_id)
    val videos = media.filter(col("modality") === "video").count()
    assert(frames.size == videos && frames.values.forall(_.length == 2))
    // and the default stub still yields its own shape on the same rows
    val stubDecoded = Multimodal.decode(media, Multimodal.StubDecoder).collect()
    assert(stubDecoded.exists(d => d.width != 128))
  }

  test("ImageIoDecoder decodes a handcrafted PNG to exact dims and " +
      "luminance histogram (real container parsing, real pixels)") {
    // 4×2 image: top row gray 10 (bucket 0), bottom row gray 200
    // (bucket 6) — fractions exactly 0.5 each
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach { x =>
      img.setRGB(x, 0, (10 << 16) | (10 << 8) | 10)
      img.setRGB(x, 1, (200 << 16) | (200 << 8) | 200)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.ImageIoDecoder.decodeOne(
      Multimodal.MediaRow(7L, "image", bos.toByteArray))
    assert(d.width == 4 && d.height == 2 && d.n_frames == 1)
    assert(d.feature.toSeq == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0.5f, 0f))
  }

  test("imageFixture roundtrip: generate real PNGs, decode with " +
      "ImageIoDecoder through the decode() plumbing, recover the " +
      "constructed dims and histogram for every doc") {
    val docs = Tables.load(spark, sf0001, "documents").limit(60)
    val media = Multimodal.imageFixture(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    // payloads are REAL PNGs (magic bytes), not text stand-ins
    val first = media.select(col("payload")).head.getAs[Array[Byte]](0)
    assert(first.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val decoded = Multimodal.decode(media, Multimodal.ImageIoDecoder)
      .collect()
    assert(decoded.length == 60)
    decoded.foreach { d =>
      val id = d.doc_id
      assert(d.width == 16 + (id % 17).toInt, s"doc $id width")
      assert(d.height == 2 * (8 + (id % 9)).toInt, s"doc $id height")
      val b1 = ((id % 256) >> 5).toInt
      val b2 = (((id * 7) % 256) >> 5).toInt
      val want = Array.fill(8)(0f)
      if (b1 == b2) want(b1) = 1f else { want(b1) = 0.5f; want(b2) = 0.5f }
      assert(d.feature.toSeq == want.toSeq, s"doc $id histogram")
    }
  }

  test("WavDecoder decodes a handcrafted WAV to exact header fields " +
      "and amplitude histogram (real RIFF parsing, real samples)") {
    // 8 samples: four at -32768 (bucket 0), four at 32767 (bucket 7)
    val pcm = new Array[Byte](16)
    (0 until 4).foreach { i =>
      pcm(2 * i) = 0x00; pcm(2 * i + 1) = 0x80.toByte         // -32768
      pcm(8 + 2 * i) = 0xff.toByte; pcm(9 + 2 * i) = 0x7f     //  32767
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // canonical 44-byte RIFF header — the q98 oracle's n_bytes formula
    assert(wav.length == 44 + 16, s"non-canonical WAV header: ${wav.length}")
    assert(new String(wav.take(4)) == "RIFF" &&
      new String(wav.slice(8, 12)) == "WAVE")
    val d = Multimodal.WavDecoder.decodeOne(
      Multimodal.MediaRow(3L, "audio", wav))
    assert(d.width == 8000 && d.height == 16 && d.n_frames == 8)
    assert(d.feature.toSeq == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
  }

  test("audioFixture roundtrip: generate real WAVs, decode with " +
      "WavDecoder through the decode() plumbing, recover the " +
      "constructed sample count and histogram for every doc") {
    val docs = Tables.load(spark, sf0001, "documents").limit(60)
    val media = Multimodal.audioFixture(docs)
    val first = media.select(col("payload")).head.getAs[Array[Byte]](0)
    assert(new String(first.take(4)) == "RIFF")
    val decoded = Multimodal.decode(media, Multimodal.WavDecoder).collect()
    assert(decoded.length == 60)
    decoded.foreach { d =>
      val id = d.doc_id
      val n = 256 << (id % 2).toInt
      assert(d.width == 8000 && d.height == 16, s"doc $id header")
      assert(d.n_frames == n, s"doc $id frames")
      assert(d.n_bytes == 44 + 2L * n, s"doc $id container size")
      val want = Array.fill(8)(0)
      (0 until n).foreach { i =>
        want((((id * 131 + i.toLong * 7919) % 65536L) >> 13).toInt) += 1
      }
      // power-of-two n → every fraction count/n is exact in float
      assert(d.feature.toSeq == want.map(_.toFloat / n).toSeq,
        s"doc $id histogram")
    }
  }

  test("Y4mDecoder decodes a handcrafted Y4M stream to exact dims, " +
      "frame count and luma histogram, including a 420 colorspace") {
    // mono: 4x2, 3 frames, luma = frame index everywhere → buckets 0
    val mono = ("YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono\n" +
      (0 until 3).map(f => "FRAME\n" + new String(Array.fill(8)(f.toChar)))
        .mkString).getBytes("ISO-8859-1")
    val d = Multimodal.Y4mDecoder.decodeOne(
      Multimodal.MediaRow(5L, "video", mono))
    assert(d.width == 4 && d.height == 2 && d.n_frames == 3)
    assert(d.n_bytes == mono.length.toLong)
    assert(d.feature.toSeq == Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
    // 420: 2x2 → frame = 4 Y + 1 U + 1 V bytes; luma 255 → bucket 7;
    // chroma bytes (0) must NOT enter the histogram
    val c420 = ("YUV4MPEG2 W2 H2 F30:1 C420\n" +
      "FRAME\n" + new String(Array[Char](255, 255, 255, 255, 0, 0)))
      .getBytes("ISO-8859-1")
    val d2 = Multimodal.Y4mDecoder.decodeOne(
      Multimodal.MediaRow(6L, "video", c420))
    assert(d2.width == 2 && d2.height == 2 && d2.n_frames == 1)
    assert(d2.feature.toSeq == Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f))
    // FRAME lines may carry parameters — demux must skip to the EOL
    val withParams = ("YUV4MPEG2 W2 H1 Cmono\n" +
      "FRAME Ixyz\n" + "ab").getBytes("ISO-8859-1")
    val d3 = Multimodal.Y4mDecoder.decodeOne(
      Multimodal.MediaRow(7L, "video", withParams))
    assert(d3.n_frames == 1 && d3.width == 2 && d3.height == 1)
  }

  test("videoFixture roundtrip: generate real Y4M streams, decode with " +
      "Y4mDecoder through the decode() plumbing, recover the " +
      "constructed dims, frame count and histogram for every doc") {
    val docs = Tables.load(spark, sf0001, "documents").limit(60)
    val media = Multimodal.videoFixture(docs)
    val first = media.select(col("payload")).head.getAs[Array[Byte]](0)
    // payloads are REAL Y4M streams with the 38-byte fixture header
    // (the q51/q99 oracle offset formulas pin this length)
    assert(new String(first.take(10), "US-ASCII") == "YUV4MPEG2 ")
    assert(first.indexOf('\n'.toByte) == 37)
    val decoded = Multimodal.decode(media, Multimodal.Y4mDecoder).collect()
    assert(decoded.length == 60)
    decoded.foreach { d =>
      val id = d.doc_id
      val w = 16 << (id % 2).toInt
      val nf = 1 << (id % 4).toInt
      assert(d.width == w && d.height == 16, s"doc $id dims")
      assert(d.n_frames == nf, s"doc $id frames")
      assert(d.n_bytes == 38L + nf.toLong * (6 + w * 16),
        s"doc $id container size")
      val n = w * 16 * nf
      val want = Array.fill(8)(0)
      (0 until n).foreach { j =>
        want((((id * 131 + j.toLong * 7919) % 256L) >> 5).toInt) += 1
      }
      // power-of-two n → every fraction count/n is exact in float
      assert(d.feature.toSeq == want.map(_.toFloat / n).toSeq,
        s"doc $id histogram")
    }
  }

  test("Y4mDecoder.demuxFrames walks REAL container boundaries: " +
      "offsets point past each FRAME line and frame bytes equal the " +
      "exact plane slices") {
    val docs = Tables.load(spark, sf0001, "documents").limit(40)
    val media = Multimodal.videoFixture(docs)
    val payloads = media.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    val frames = Multimodal
      .frameSample(media, step = 1, Multimodal.Y4mDecoder)
      .collect().groupBy(_.doc_id)
    assert(frames.size == 40)
    frames.foreach { case (id, fs) =>
      val w = 16 << (id % 2).toInt
      val sz = w * 16
      val nf = 1 << (id % 4).toInt
      assert(fs.map(_.frame_idx).sorted.toSeq == (0L until nf.toLong),
        s"doc $id frame indices")
      fs.foreach { f =>
        assert(f.offset == 38 + (f.frame_idx + 1) * 6 + f.frame_idx * sz,
          s"doc $id frame ${f.frame_idx} offset")
        val expect = payloads(id)
          .slice(f.offset.toInt, f.offset.toInt + sz)
        assert(f.frame_bytes.sameElements(expect),
          s"doc $id frame ${f.frame_idx} bytes")
      }
    }
  }

  test("Y4mDecoder fails loudly on malformed streams") {
    intercept[Exception] { // not a Y4M signature
      Multimodal.Y4mDecoder.decodeOne(
        Multimodal.MediaRow(1L, "video", "RIFF junk\n".getBytes))
    }
    intercept[Exception] { // truncated frame data
      Multimodal.Y4mDecoder.decodeOne(Multimodal.MediaRow(2L, "video",
        "YUV4MPEG2 W4 H4 Cmono\nFRAME\nab".getBytes))
    }
    intercept[Exception] { // garbage between frames
      Multimodal.Y4mDecoder.decodeOne(Multimodal.MediaRow(3L, "video",
        ("YUV4MPEG2 W2 H1 Cmono\nFRAME\nab" + "JUNK\nxy").getBytes))
    }
  }

  test("WavDecoder fails loudly on a non-PCM-shaped payload") {
    val junk = Multimodal.MediaRow(1L, "audio", "not audio".getBytes)
    intercept[Exception] {
      Multimodal.WavDecoder.decodeOne(junk)
    }
  }

  test("ImageIoDecoder fails loudly on an undecodable payload") {
    val junk = Multimodal.MediaRow(1L, "image", "not an image".getBytes)
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decodeOne(junk)
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("features feed the ANN operators (array<float> compatible)") {
    val feats = Multimodal.decode(
      Multimodal.mediaTable(Tables.load(spark, sf0001, "documents")),
      Multimodal.StubDecoder)
      .toDF().select(col("doc_id").as("id"), col("feature").as("vec"))
    val top = graft.operators.Similarity
      .bruteForceTopK(feats, feats.filter(col("id") < 3), k = 2)
      .collect()
    assert(top.length == 6)
  }

  test("audioFrameFeatures: frames tile the decoded stream exactly, " +
      "crossings bounded by frame length") {
    val docs = Tables.load(spark, sf0001, "documents").limit(40)
    val out = Multimodal
      .audioFrameFeatures(Multimodal.audioFixture(docs), frameLen = 64)
      .toDF().cache()
    // per doc: Σ n_samples = 256 << (id % 2), frame_idx contiguous
    val perDoc = out.groupBy("doc_id").agg(
      sum("n_samples").as("total"), count(lit(1)).as("nf"),
      max("frame_idx").as("mx"), min("frame_idx").as("mn"))
    val bad = perDoc.filter(
      col("total") =!= when(col("doc_id") % 2 === 0, 256).otherwise(512) ||
      col("mx") =!= col("nf") - 1 || col("mn") =!= 0)
    assert(bad.isEmpty)
    assert(out.filter(col("crossings") >= col("n_samples")).isEmpty)
    assert(out.filter(col("energy") < 0).isEmpty)
  }

  test("videoFrameStats: one row per real frame, diff NULL exactly on " +
      "frame 0, luma bounded by 255*n_px") {
    val docs = Tables.load(spark, sf0001, "documents").limit(40)
    val out = Multimodal
      .videoFrameStats(Multimodal.videoFixture(docs)).toDF().cache()
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    // nf = 1 << (doc_id % 4)
    assert(perDoc.filter(
      col("nf") =!= expr("shiftleft(1, cast(doc_id % 4 as int))"))
      .isEmpty)
    assert(out.filter(col("diff_sum").isNull && col("frame_idx") =!= 0)
      .isEmpty)
    assert(out.filter(col("diff_sum").isNotNull && col("frame_idx") === 0)
      .isEmpty)
    assert(out.filter(col("luma_sum") > lit(255) * col("n_px")).isEmpty)
    // n_px = w*h from the real container: 256 << (doc_id % 2)
    assert(out.filter(
      col("n_px") =!= when(col("doc_id") % 2 === 0, 256).otherwise(512))
      .isEmpty)
  }

  test("audio segments: hand-planted energy track splits into the " +
      "expected voiced runs") {
    import spark.implicits._
    import graft.multimodal.Segmentation
    // energies (10, 0, 10, 10, 0): mean 6 → voiced at 0, 2, 3 →
    // segments [0,1) and [2,4); crossings ride along summed
    val frames = Seq(
      (7L, 0L, 64L, 10L, 3L), (7L, 1L, 64L, 0L, 1L),
      (7L, 2L, 64L, 10L, 4L), (7L, 3L, 64L, 10L, 5L),
      (7L, 4L, 64L, 0L, 0L))
      .toDF("doc_id", "frame_idx", "n_samples", "energy", "crossings")
    val got = Segmentation.audioSegments(frames)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (7L, 1L, 0L, 1L, 10L, 3L),
      (7L, 2L, 2L, 2L, 20L, 9L)), got)
    // all-equal energies: nothing exceeds the mean → no segments
    val flat = Seq((8L, 0L, 64L, 5L, 0L), (8L, 1L, 64L, 5L, 0L))
      .toDF("doc_id", "frame_idx", "n_samples", "energy", "crossings")
    assert(Segmentation.audioSegments(flat).isEmpty)
  }

  test("video scenes: a planted diff spike opens a new shot and the " +
      "brightest frame is its keyframe") {
    import spark.implicits._
    import graft.multimodal.Segmentation
    // diffs (null, 1, 9, 1): Σ=11, n=3 → cut at frame 0 (always) and
    // frame 2 (9·3 > 11) → shots [0,2) and [2,4); keyframes = max
    // luma (ties → earliest)
    val stats = Seq(
      (3L, 0L, 256L, 100L, None: Option[Long]),
      (3L, 1L, 256L, 300L, Some(1L)),
      (3L, 2L, 256L, 200L, Some(9L)),
      (3L, 3L, 256L, 200L, Some(1L)))
      .toDF("doc_id", "frame_idx", "n_px", "luma_sum", "diff_sum")
    val got = Segmentation.videoScenes(stats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == Set(
      (3L, 0L, 0L, 2L, 400L, 1L, 300L),
      (3L, 1L, 2L, 2L, 400L, 2L, 200L)), got)
    // single-frame payload → exactly one shot, itself the keyframe
    val single = Seq((4L, 0L, 256L, 50L, None: Option[Long]))
      .toDF("doc_id", "frame_idx", "n_px", "luma_sum", "diff_sum")
    val one = Segmentation.videoScenes(single).collect()
    assert(one.length == 1 && one(0).getLong(1) == 0L &&
      one(0).getLong(5) == 0L)
  }

  test("GifDecoder: a REAL LZW-compressed animated container decodes " +
      "through the seam — exact dims, frame count, and the generated " +
      "luma recovered bit-exactly after the compress/decompress " +
      "roundtrip") {
    // the compressed-container case the r13 verdict carries: unlike
    // Y4M there is no fixed frame stride; only the codec can find
    // the frames. Payloads are genuine JDK-written GIF bytes.
    (0L to 5L).foreach { id =>
      val payload = Multimodal.gifBytes(id)
      assert(new String(payload.take(6), "US-ASCII").startsWith("GIF8"),
        s"doc $id: not a GIF container")
      val d = Multimodal.GifDecoder.decodeOne(
        Multimodal.MediaRow(id, "video", payload))
      val frames = 1 + (id % 2).toInt
      assert(d.width == 16 && d.height == 16 && d.n_frames == frames,
        s"doc $id header fields")
      assert(d.n_bytes == payload.length.toLong)
      // generation arithmetic: gray = ((id·31 + f·97 + y·16 + x)·8)
      // mod 256 — quantization-exact (all levels multiples of 8), so
      // the decoded histogram equals the pre-encode histogram
      val want = Array.fill(8)(0)
      for (f <- 0 until frames; p <- 0 until 256)
        want(((((id * 31 + f * 97 + p) * 8) % 256) >> 5).toInt) += 1
      val n = (frames * 256).toFloat
      assert(d.feature.toSeq == want.map(_.toFloat / n).toSeq,
        s"doc $id histogram survived LZW roundtrip")
      // demux yields one DECODED luma plane per frame (offset =
      // frame index: byte offsets are meaningless across LZW blocks)
      val demuxed = Multimodal.GifDecoder.demuxFrames(
        Multimodal.MediaRow(id, "video", payload)).toSeq
      assert(demuxed.map(_.frame_idx) == (0L until frames.toLong))
      demuxed.foreach { fr =>
        val f = fr.frame_idx
        val wantLuma = Array.tabulate(256)(p =>
          (((id * 31 + f * 97 + p) * 8) % 256).toByte)
        assert(java.util.Arrays.equals(fr.frame_bytes, wantLuma),
          s"doc $id frame $f decoded luma")
      }
    }
    // the seam's batch path (what decode()/mapPartitions drive)
    val batch = (0L to 3L).map(id =>
      Multimodal.MediaRow(id, "video", Multimodal.gifBytes(id)))
    val ds = Multimodal.GifDecoder.decodeBatch(batch)
    assert(ds.map(_.doc_id) == (0L to 3L))
    // loud failure on a corrupt compressed container, same policy as
    // the other real decoders
    val corrupt = Multimodal.gifBytes(1L).take(20)
    intercept[Exception] {
      Multimodal.GifDecoder.decodeOne(
        Multimodal.MediaRow(9L, "video", corrupt))
    }
  }

  test("GifDecoder through the decode() plumbing stays scan-local " +
      "and matches the per-row decode") {
    import spark.implicits._
    val media = (0L to 7L).map(id =>
      Multimodal.MediaRow(id, "video", Multimodal.gifBytes(id)))
      .toDS().toDF()
    val out = Multimodal.decode(media, Multimodal.GifDecoder)
    // no exchange: decode is a per-partition map over the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode grew an exchange:\n$plan")
    val rows = out.collect()
    assert(rows.length == 8)
    rows.foreach { d =>
      assert(d.n_frames == 1 + (d.doc_id % 2).toInt && d.width == 16)
    }
  }
}
