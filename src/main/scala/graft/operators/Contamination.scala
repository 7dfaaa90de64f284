package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprintMd5

/** Benchmark-contamination detection: flag corpus documents whose
  * normalized text exactly matches a document in an evaluation set —
  * the standard pre-training hygiene pass (training on eval data
  * silently inflates benchmark scores).
  *
  * Shape at 100 TB: the benchmark side is SMALL (thousands of eval
  * items vs billions of docs), so its digest set broadcasts and the
  * check is a map-side left-semi lookup on the corpus scan — no
  * corpus shuffle, no text comparison (16-byte digests), one pass.
  * Matching is by `fingerprintMd5` normalization (lowercase,
  * whitespace-collapsed) — the same key exact dedup uses; for
  * fuzzier containment (eval text embedded inside a training doc),
  * compose with the n-gram machinery in MinHashDedup instead.
  */
object Contamination {

  /** `corpus` (idCol, textCol) × `benchmark` (textCol) →
    * corpus rows + `contaminated` flag.
    */
  def flag(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bench = benchmark
      .select(fingerprintMd5(col(textCol)).as("fp")).distinct()
    corpus
      .select(col(idCol), fingerprintMd5(col(textCol)).as("fp"))
      .join(broadcast(bench.withColumn("contaminated", lit(true))),
        Seq("fp"), "left_outer")
      .select(col(idCol),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** The enforcement form: corpus minus contaminated docs (map-side
    * broadcast anti-join, same single-pass shape).
    */
  def remove(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bench = benchmark
      .select(fingerprintMd5(col(textCol)).as("fp")).distinct()
    corpus
      .withColumn("_fp", fingerprintMd5(col(textCol)))
      .join(broadcast(bench), col("_fp") === col("fp"), "left_anti")
      .drop("_fp")
  }
}
