package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness: at 100 TB an over-aggressive gate can empty
  * an entire pipeline stage, and every downstream operator must
  * degrade to an empty result — not an NPE from a head() on nothing,
  * a KMeans over zero rows, or a bloom filter of zero items. This
  * spec materializes an EMPTY copy of every driver table (real
  * schemas, zero rows) and runs the whole query registry against it.
  *
  * Exclusions are the model-TRAINING operators whose semantics
  * genuinely require data, each failing fast with a clear message
  * rather than a deep stack: q46/q73/q92 (KMeans coarse quantizer),
  * q94/q96 (label-centroid classifier requires labeled rows), and
  * q137/q138/q139 (logistic-regression GD requires a non-empty batch
  * — `require(nDocs > 0, "empty corpus")`).
  */
class EmptyCorpusSpec extends SparkSpec {

  private val trainRequiresData =
    Set("q46_ann_ivf", "q73_semdedup", "q92_cluster_balanced_sample",
      "q94_centroid_classify", "q96_classifier_balanced",
      "q137_logreg_train", "q138_logreg_score", "q139_auc",
      "q154_calibration", "q157_temperature_scaling", "q160_model_curation",
      // q169 probes the same KMeans coarse quantizer as q46 — the
      // index build genuinely requires vectors
      "q169_margin_align_ivf",
      // q179 scores under the q137/q138 trained-LR artifact — same
      // GD-requires-data precondition
      "q179_infobatch_prune",
      // q180's PQ codebook training is per-subspace KMeans — requires
      // vectors (require("empty corpus") in ProductQuant.buildIfAbsent)
      "q180_pq_adc",
      // q190 composes BOTH trained quantizers (q46's coarse cells +
      // q180's PQ codebooks) — the same vectors-required boundary
      "q190_ivfpq",
      // q191 maintains postings under the exact-Lloyd fitted model —
      // training requires vectors (assignFitted's
      // require("empty centroid model") fails fast)
      "q191_ivf_cdc")

  private lazy val emptyDir: String = {
    val dir = new java.io.File("target/empty_sf").getAbsolutePath
    Tables.names.foreach { t =>
      Tables.load(spark, sf0001, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on an empty corpus (zero rows, " +
      "no crash) except the documented training ops") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!trainRequiresData.contains(name)) {
        try fn(spark, emptyDir).count()
        catch { case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the training ops fail fast on empty input with a clear error") {
    for (name <- trainRequiresData) {
      val e = intercept[Exception] {
        SparkEntry.queries(name)(spark, emptyDir).count()
      }
      // the failure must be a stated precondition (require/KMeans
      // input check), not an incidental NPE from a deep stack
      val msg = Option(e.getMessage).getOrElse("").toLowerCase
      assert(msg.contains("requirement") || msg.contains("empty") ||
        msg.contains("no rows") || msg.contains("nothing"),
        s"$name failed with a non-diagnostic error: ${e.getClass.getName} $msg")
    }
  }
}
