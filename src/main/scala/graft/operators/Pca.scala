package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction by power iteration over the
  * (6-decimal fixed-point) covariance of an embedding column — the
  * embedding-hygiene primitive corpus pipelines run before dedup or
  * retrieval: dominant-direction removal (Mu et al. 2018's "all-but-
  * the-top" post-processing) and variance diagnostics both start
  * from PC1.
  *
  * EXACT replay discipline: the input coordinates are rounded to 6
  * decimals into DECIMAL once; the mean, the covariance, every
  * matvec, and the final projections are then exact DECIMAL sums with
  * pinned double divisions (IEEE division and sqrt are bit-specified;
  * only the per-step 6-decimal re-rounding keeps magnitudes in fixed
  * point). The DuckDB oracle replays the identical arithmetic with
  * the iteration unrolled into CTE stages and lands on the same
  * projections bit-for-bit. Convergence sign/speed is therefore a
  * FUNCTION of the data, not of the engine.
  *
  * Scale shape: one corpus pass explodes vectors to (id, j, x) — the
  * d² work lives in the covariance self-join, whose groupBy(j,k) is
  * map-side combined so the exchange carries at most d² rows per
  * task, never the corpus. The d×d covariance (a few thousand rows
  * for d ≤ 128) is localCheckpoint-ed and each power-iteration round
  * is a d²-row join against a d-row vector — driver/exchange work is
  * O(iters · d²), independent of corpus size. At very large d the
  * production swap is a per-partition Gram Aggregator (same output,
  * one pass, no explode); the plan here keeps the declarative form
  * Catalyst can prune.
  */
object Pca {

  /** (idCol, j:int, x:decimal(18,6)): exploded 6-decimal fixed-point
    * coordinates.
    */
  def explodeFixed(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), posexplode(col(vecCol)).as(Seq("j", "xr")))
      .select(col(idCol), col("j"),
        round(col("xr").cast("double"), 6).cast("decimal(18,6)").as("x"))

  /** Centered coordinates (idCol, j, cx:decimal(18,6)) plus the
    * per-dimension mean table (j, mu).
    */
  def centered(x: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val mu = x.groupBy(col("j"))
      .agg(round(sum(col("x")).cast("double") /
        count(lit(1)).cast("double"), 6).cast("decimal(18,6)").as("mu"))
    val cx = x.join(broadcast(mu), Seq("j"))
      .select(col(idCol), col("j"),
        (col("x") - col("mu")).cast("decimal(18,6)").as("cx"))
    (cx, mu)
  }

  /** 6-decimal covariance (j, k, c) of the centered coordinates.
    * Computed on the upper triangle only (the DECIMAL multiply is the
    * hot path — symmetry halves it, bit-identically: (j,k) and (k,j)
    * sum the same product multiset) and mirrored.
    */
  def covariance(cx: DataFrame, idCol: String, n: Long): DataFrame = {
    val a = cx.select(col(idCol), col("j"), col("cx").as("cxa"))
    val b = cx.select(col(idCol), col("j").as("k"), col("cx").as("cxb"))
    val upper = a.join(b, Seq(idCol))
      .filter(col("j") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(round(sum(col("cxa") * col("cxb")).cast("double") /
        lit(n).cast("double"), 6).cast("decimal(18,6)").as("c"))
    upper.unionByName(upper.filter(col("j") =!= col("k"))
      .select(col("k").as("j"), col("j").as("k"), col("c")))
  }

  /** `iters` power-iteration rounds from the uniform unit start
    * (v0_j = 1/sqrt(d) rounded to 6): returns (j, v:decimal(18,6)).
    * Each round: u = C·v exactly in DECIMAL, re-rounded to 6; v' =
    * round(u / ||u||, 6) with the norm an exact decimal
    * sum-of-squares under one pinned sqrt.
    */
  def powerIteration(cov: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters=$iters")
    val spark = cov.sparkSession
    import spark.implicits._
    val covCk = cov.localCheckpoint(eager = false)
    val v0 = round(lit(1.0) / sqrt(lit(dim.toDouble)), 6)
    var v: DataFrame = spark.range(dim)
      .select(col("id").cast("int").as("j"),
        v0.cast("decimal(18,6)").as("v"))
    for (_ <- 1 to iters) {
      val u = covCk
        .join(v.select(col("j").as("k"), col("v")), Seq("k"))
        .groupBy(col("j"))
        .agg(round(sum(col("c") * col("v")).cast("double"), 6)
          .cast("decimal(18,6)").as("u"))
      val nrm = u.agg(
        sqrt(sum(col("u") * col("u")).cast("double")).as("nrm"))
      val next = u.crossJoin(broadcast(nrm))
        .select(col("j"),
          round(col("u").cast("double") / col("nrm"), 6)
            .cast("decimal(18,6)").as("v"))
        .collect()
      // flatten lineage between rounds: d rows, a bounded model
      // boundary (the NB/BPE contract)
      v = next.map(r => (r.getInt(0), r.getDecimal(1))).toSeq
        .toDF("j", "v")
        .select(col("j"), col("v").cast("decimal(18,6)").as("v"))
    }
    v
  }

  /** Per-vector projection onto the component: (idCol, pc1:double) —
    * an exact DECIMAL dot product per vector.
    */
  def project(cx: DataFrame, idCol: String, v: DataFrame): DataFrame =
    cx.join(broadcast(v), Seq("j"))
      .groupBy(col(idCol))
      .agg(sum(col("cx") * col("v")).cast("double").as("pc1"))

  /** End-to-end: explode → center → covariance → power-iterate →
    * project. Returns (idCol, pc1).
    */
  def pc1Projection(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int): DataFrame = {
    val x = explodeFixed(emb, idCol, vecCol)
    val (cxRaw, _) = centered(x, idCol)
    val cx = cxRaw.localCheckpoint(eager = false)
    val n = emb.count()
    val v = powerIteration(covariance(cx, idCol, n), dim, iters)
    project(cx, idCol, v)
  }

  /** All-but-the-top correction (Mu et al. 2018): every centered
    * vector minus its PC1 component, x̂ = cx − (cx·v)·v, with the
    * projection re-rounded to 6 decimals so the subtraction stays an
    * exact DECIMAL. Output: (idCol, j, corrected:double) — the
    * dominant-direction-free embedding, exploded.
    */
  def allButTop(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int): DataFrame = {
    val x = explodeFixed(emb, idCol, vecCol)
    val (cxRaw, _) = centered(x, idCol)
    val cx = cxRaw.localCheckpoint(eager = false)
    val n = emb.count()
    val v = powerIteration(covariance(cx, idCol, n), dim, iters)
    val proj = cx.join(broadcast(v), Seq("j"))
      .groupBy(col(idCol))
      .agg(round(sum(col("cx") * col("v")).cast("double"), 6)
        .cast("decimal(18,6)").as("p6"))
    cx.join(proj, Seq(idCol))
      .join(broadcast(v), Seq("j"))
      .select(col(idCol), col("j"),
        (col("cx") - col("p6") * col("v")).cast("double").as("corrected"))
  }

  /** The oracle replay of [[pc1Projection]] as DuckDB SQL, iteration
    * unrolled. Kept HERE so the arithmetic and its replay live side
    * by side (the q119 pattern).
    */
  def pc1OracleSql(dim: Int, iters: Int): String =
    s"""
      WITH ${pcaCtes(dim, iters)}
      SELECT c.id AS vec_id, CAST(sum(c.cx * v$iters.v) AS DOUBLE) AS pc1
      FROM c JOIN v$iters ON c.j = v$iters.j
      GROUP BY 1 ORDER BY 1"""

  /** Oracle replay of [[allButTop]]: the [[pc1OracleSql]] CTEs plus
    * the re-rounded projection and the exact-DECIMAL subtraction.
    */
  def abttOracleSql(dim: Int, iters: Int): String =
    s"""
      WITH ${pcaCtes(dim, iters)},
      proj AS (
        SELECT c.id,
               CAST(round(CAST(sum(c.cx * v$iters.v) AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS p6
        FROM c JOIN v$iters ON c.j = v$iters.j GROUP BY 1),
      outp AS (
        SELECT c.id, c.j,
               CAST(c.cx - proj.p6 * v$iters.v AS DOUBLE) AS corrected
        FROM c JOIN proj USING (id) JOIN v$iters ON c.j = v$iters.j)
      SELECT id AS vec_id, j, corrected FROM outp ORDER BY vec_id, j"""

  private def pcaCtes(dim: Int, iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "v0" else s"v${r - 1}"
      s"""u$r AS (
        SELECT cov.j, CAST(round(CAST(sum(cov.c * $prev.v) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS u
        FROM cov JOIN $prev ON cov.k = $prev.j GROUP BY 1),
      n$r AS (SELECT sqrt(CAST(sum(u*u) AS DOUBLE)) AS nrm FROM u$r),
      v$r AS (
        SELECT j, CAST(round(CAST(u AS DOUBLE) / (SELECT nrm FROM n$r), 6)
               AS DECIMAL(18,6)) AS v
        FROM u$r)"""
    }.mkString(",\n      ")
    s"""x AS (
        SELECT vec_id AS id, CAST(j - 1 AS INT) AS j,
               CAST(round(CAST(embedding[j] AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS x
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS t(j)),
      mu AS (
        SELECT j, CAST(round(CAST(sum(x) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS mu
        FROM x GROUP BY 1),
      c AS (
        SELECT id, x.j, CAST(x.x - mu.mu AS DECIMAL(18,6)) AS cx
        FROM x JOIN mu USING (j)),
      nn AS (SELECT count(DISTINCT id) AS n FROM x),
      cov AS (
        SELECT a.j, b.j AS k,
               CAST(round(CAST(sum(a.cx * b.cx) AS DOUBLE) /
                 (SELECT CAST(n AS DOUBLE) FROM nn), 6)
                 AS DECIMAL(18,6)) AS c
        FROM c a JOIN c b USING (id) GROUP BY 1, 2),
      v0 AS (
        SELECT CAST(t.j AS INT) AS j,
               CAST(round(1.0 / sqrt(CAST($dim AS DOUBLE)), 6)
                 AS DECIMAL(18,6)) AS v
        FROM range(0, $dim) AS t(j)),
      $rounds"""
  }
}
