package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic ×N corpus replication shared by the stress harnesses
  * (TailStress) and the sized-corpus quality gate
  * (IvfSizedRecallSpec): one definition so the corpus the per-round
  * stress measures and the corpus the suite GATES are the same data.
  *
  * Embedding copies are sign-flipped per (copy, coordinate) — an
  * isometry per copy (all vectors in a copy share the flip pattern,
  * so within-copy inner products are EXACTLY the base corpus's) that
  * decorrelates copies from each other. The replicated corpus is
  * therefore the adversarial case for a coarse quantizer: f mutually
  * decorrelated isometric images of the base geometry, no global
  * cluster structure for KMeans to exploit — recall laws calibrated
  * here are worst-case, not best-case.
  */
object StressData {
  val Stride = 1000000L

  def replicateEmbeddings(emb: DataFrame, f: Int): DataFrame =
    if (f == 1) emb
    else emb.crossJoin(emb.sparkSession.range(f).select(col("id").as("cp")))
      .select(
        (col("vec_id") + col("cp") * Stride).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * when(pmod(xxhash64(col("cp"), i), lit(2)) === 0,
            lit(1.0f)).otherwise(lit(-1.0f))).cast("float"))
          .as("embedding"),
        col("label"))
}
