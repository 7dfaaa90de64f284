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
  * Cross-engine exactness: each input element is rounded to integer
  * MICROS (×10⁶ — 6-decimal fixed point, summed as primitive longs
  * inside whole-stage codegen rather than the BigDecimal path) — the
  * projection is then integer-exact, order-independent under
  * repartitioning, and replayable in SQL from the same md5 signs
  * (q74's convention: 9th-hex-char parity of md5("i:j")).
  *
  * Scale shape: the sign "matrix" materializes ONCE as an
  * (inDim·outDim)-row broadcast table — md5 runs inDim·outDim times
  * total, not once per (element, output-dim) pair (measured 5.7 s →
  * the broadcast route at sf0.1: the n·d·k md5 calls were the whole
  * cost). The ×k fan-out is the broadcast hash join's multiplicity,
  * collapsed by map-side partial aggregation on (id, j); the single
  * exchange carries n·k one-decimal rows, independent of the input
  * dimension d.
  */
object Projections {

  /** Project `vecCol` (array<float|double>, elements indexed
    * 0 ≤ i < `inDim`) down to `outDim` dims. Elements at positions
    * ≥ `inDim` would silently miss the sign table — callers pass the
    * schema's true dimension.
    *
    * Output: exploded long form (idCol, j, v) — dense, `outDim` rows
    * per input vector (empty/NULL vectors yield no rows).
    */
  def signedProjection(embs: DataFrame, idCol: String, vecCol: String,
      outDim: Int, inDim: Int): DataFrame = {
    require(outDim >= 2 && outDim <= 512, s"outDim=$outDim")
    require(inDim >= 1 && inDim <= 16384, s"inDim=$inDim")
    val spark = embs.sparkSession
    val signs = spark.range(inDim.toLong * outDim)
      .select((col("id") / outDim).cast("int").as("i"),
        (col("id") % outDim).cast("int").as("j"))
      .select(col("i"), col("j"),
        when(conv(substring(md5(concat(col("i").cast("string"), lit(":"),
          col("j").cast("string"))), 9, 1), 16, 10).cast("long") % 2 === 0,
          lit(1)).otherwise(lit(-1)).as("s"))
    embs
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col(idCol), col("i"),
        round(col("x").cast("double") * lit(1000000.0), 0).cast("long")
          .as("xm"))
      .join(broadcast(signs), Seq("i"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("xm") * col("s")).as("v_m"))
      .select(col(idCol), col("j"),
        (col("v_m").cast("double") / lit(1000000.0)).as("v"))
  }

  /** [[signedProjection]] reassembled to dense (idCol, vec) rows —
    * the input shape of the ANN/SemDeDup family, so a pipeline can
    * project-then-search (q123). One extra exchange keyed on the id
    * to regroup the `outDim` slots; slot order is the array order, so
    * any engine rebuilding the list sorted by j gets the identical
    * vector.
    */
  def signedProjectionVectors(embs: DataFrame, idCol: String,
      vecCol: String, outDim: Int, inDim: Int): DataFrame =
    signedProjection(embs, idCol, vecCol, outDim, inDim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("j"), col("v"))))
        .as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(outDim - 1)), j =>
          element_at(col("_m"), j)).as("vec"))
}
