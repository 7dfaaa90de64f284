package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimensionality reduction for embedding corpora: a signed (±1)
  * Johnson–Lindenstrauss random projection. `out[j] = Σᵢ x[i]·s(i,j)`
  * with `s(i,j) ∈ {+1,−1}` derived from md5 of the (i, j) index pair
  * — the Achlioptas database-friendly JL variant, which preserves
  * pairwise distances within (1±ε) at k = O(ln n / ε²) output dims
  * and needs no stored projection matrix: the "matrix" is a hash
  * function, so any engine (and any retry) regenerates it
  * bit-identically. The pipeline move: shrink 1024-dim embeddings to
  * 64 before ANN/SemDeDup so the LSH/IVF exchanges carry 16× fewer
  * bytes.
  *
  * Cross-engine exactness: each input element is rounded to 6
  * decimals and summed as DECIMAL (q71 discipline) — the projection
  * is then integer-exact arithmetic on 6-decimal fixed-point values,
  * order-independent under repartitioning, and replayable in SQL
  * from the same md5 signs (q74's convention: first-8-hex-chars
  * bucket, 9th-hex-char parity sign — here the parity char of
  * md5("i:j")).
  *
  * Scale shape: one posexplode (n·d rows) fanned ×k by a codegen'd
  * array transform, collapsed by map-side partial aggregation on
  * (id, j) — the same two-level-agg shape whose interpreted-HOF
  * alternative benched 15× slower for q74. The single exchange is
  * keyed (id, j): n·k rows of one decimal each, independent of the
  * input dimension d.
  */
object Projections {

  /** Project `vecCol` (array<float|double>) down to `outDim` dims.
    * Output: exploded long form (idCol, j, v) — dense, `outDim` rows
    * per input vector (empty/NULL vectors yield no rows).
    */
  def signedProjection(embs: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    require(outDim >= 2 && outDim <= 512, s"outDim=$outDim")
    val sign = when(
      conv(substring(md5(concat(col("i").cast("string"), lit(":"),
        col("t").cast("string"))), 9, 1), 16, 10).cast("long") % 2 === 0,
      lit(1)).otherwise(lit(-1))
    embs
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col(idCol), col("i"),
        round(col("x").cast("double"), 6).cast("decimal(18,6)").as("x6"),
        explode(sequence(lit(0), lit(outDim - 1))).as("t"))
      .groupBy(col(idCol), col("t").as("j"))
      .agg(sum(col("x6") * sign).as("v_dec"))
      .select(col(idCol), col("j"), col("v_dec").cast("double").as("v"))
  }
}
