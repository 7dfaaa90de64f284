package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Exact mean pairwise cosine per group — the embedding-diversity
  * report (the signal behind SemDeDup-style pruning decisions, Abbas
  * et al. 2023) computed WITHOUT pairing: for L2-normalized vectors
  * uᵢ, Σ_{i≠j} uᵢ·uⱼ = ‖Σᵢuᵢ‖² − Σᵢ‖uᵢ‖², so the O(n²) statistic
  * collapses to one per-dimension sum — O(n·d), two keyed exchanges,
  * exact.
  *
  * Determinism contract: normalized coordinates round to 9 decimals
  * and are carried as DECIMAL(10,9); per-dimension sums cast to
  * DECIMAL(18,9) (exact up to 10⁹ vectors per group — past that,
  * widen the cast) so squares stay inside DECIMAL(38,18); the single
  * double division by n(n−1) is the only non-exact step, rounded
  * to 6.
  */
object Diversity {

  /** `emb`: (groupCol, vecCol: array<float>). Output:
    * (groupCol, n_vecs, diversity) — diversity NULL for singleton
    * groups (no pairs to average). All-zero vectors carry no
    * direction, so cosine is undefined for them: they are EXCLUDED
    * before normalization (r10 ADVICE — an unguarded x/0 would turn
    * one zero vector into a group-poisoning Infinity/NaN) and
    * `n_vecs` counts only the vectors that entered the statistic; a
    * group of only zero vectors disappears from the output.
    */
  def meanPairwiseCosine(emb: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val nz = emb
      .select(col(groupCol), col(vecCol),
        VectorFunctions.l2Norm(col(vecCol)).as("nm"))
      .filter(col("nm") > 0)
    val u = nz
      .select(col(groupCol), col("nm"),
        posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col(groupCol), col("j"),
        round(col("x").cast("double") / col("nm"), 9)
          .cast("decimal(10,9)").as("u"))
    val sj = u.groupBy(col(groupCol), col("j"))
      .agg(sum(col("u")).as("sj0"))
      .select(col(groupCol), col("sj0").cast("decimal(18,9)").as("sj"))
    val ss = sj.groupBy(col(groupCol))
      .agg(sum(col("sj") * col("sj")).as("sumsq"))
    val sq = u.groupBy(col(groupCol))
      .agg(sum(col("u") * col("u")).as("sumq"))
    val n = nz.groupBy(col(groupCol)).agg(count(lit(1)).as("n_vecs"))
    n.join(ss, Seq(groupCol)).join(sq, Seq(groupCol))
      .select(col(groupCol), col("n_vecs"),
        when(col("n_vecs") >= 2,
          round((col("sumsq") - col("sumq")).cast("double") /
            (col("n_vecs").cast("decimal(38,0)") *
              (col("n_vecs") - 1).cast("decimal(38,0)"))
              .cast("double"), 6)).as("diversity"))
  }
}
