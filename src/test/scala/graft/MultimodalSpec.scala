package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode pass: schema, determinism, and feature vectors") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    assert(media.schema("payload").dataType.typeName == "binary")

    val decoded = Multimodal.decode(media)
    val rows = decoded.collect()
    assert(rows.length == 500)
    // feature = normalized 8-bucket histogram → sums to ~1
    rows.take(20).foreach { d =>
      assert(d.feature.length == 8)
      assert(math.abs(d.feature.sum - 1f) < 1e-3, s"doc ${d.doc_id}")
      assert(d.width == (640 - d.n_bytes % 320).toInt)
    }
    // deterministic across runs
    val again = Multimodal.decode(media).collect()
    assert(rows.map(_.doc_id).sorted.toSeq == again.map(_.doc_id).sorted.toSeq)
    assert(rows.sortBy(_.doc_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.feature.toSeq).toSeq)
  }

  test("decode is a scan-local pass (no exchange in the plan)") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    val plan = Multimodal.decode(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("resize fits the target box, preserves aspect, never upscales") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf0001, "documents"))
    val decoded = Multimodal.decode(media)
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
    val frames = Multimodal.frameSample(media, step = 4)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val byDoc = frames.collect().groupBy(_.doc_id)
    val meta = Multimodal.decode(media).collect().map(d => d.doc_id -> d).toMap
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
    val stubDecoded = Multimodal.decode(media).collect()
    assert(stubDecoded.exists(d => d.width != 128))
  }

  test("features feed the ANN operators (array<float> compatible)") {
    val feats = Multimodal.decode(
      Multimodal.mediaTable(Tables.load(spark, sf0001, "documents")))
      .toDF().select(col("doc_id").as("id"), col("feature").as("vec"))
    val top = graft.operators.Similarity
      .bruteForceTopK(feats, feats.filter(col("id") < 3), k = 2)
      .collect()
    assert(top.length == 6)
  }
}
