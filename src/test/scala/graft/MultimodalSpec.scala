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
