package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means with EXACT cross-engine replay — the clustering
  * primitive behind corpus curation (topic balancing, SemDeDup-style
  * cell blocking, diversity sampling) surfaced as a first-class,
  * hash-gated operator instead of a library black box:
  *
  *  - init: the vectors with the `k` smallest ids are the seed
  *    centroids (deterministic, data-defined — the replayable stand-in
  *    for random init; k-means++ would add a sampling chain the
  *    oracle cannot replay exactly);
  *  - assignment: squared L2 distance as an exact DECIMAL sum of
  *    (x−c)² over 6-decimal fixed-point coordinates; argmin breaks
  *    ties on cluster id ascending (total order, no float caprice);
  *  - update: per-dimension mean = exact DECIMAL sum, ONE pinned
  *    double division, re-rounded to 6 decimals; an emptied cluster
  *    keeps its previous centroid (coalesce — replayed identically).
  *
  * The DuckDB oracle unrolls `iters` assign/update rounds as CTE
  * stages and must land on the IDENTICAL assignment table.
  *
  * Scale shape: each round is one broadcast of the k·d centroid table
  * against the exploded coordinates (scan-local distance terms,
  * map-side-combined groupBy(id, cluster)), then one argmin window
  * keyed BY VECTOR and one k·d-sized aggregation for the update —
  * the exchange never carries more than (id, cluster, decimal) rows
  * and the model stays k·d rows between rounds (the NB/BPE bounded-
  * model-boundary contract).
  */
object KMeansExact {

  /** `iters` Lloyd rounds over `emb` (idCol, vecCol:array<float>).
    * Returns the final assignment (idCol, cluster:int,
    * d2:double) — d2 the exact squared distance to the winning
    * centroid, cast from DECIMAL.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    loop(emb, idCol, vecCol, k, iters)._1

  /** The centroid table the FINAL assignment was computed against
    * (i.e. after iters−1 updates — exactly what [[assign]]'s output
    * row distances refer to), collected as the broadcastable standing
    * model: (cluster, j) → 6-decimal coordinate.
    */
  def fitModel(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Map[(Int, Int), java.math.BigDecimal] =
    loop(emb, idCol, vecCol, k, iters)._2
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).setScale(6))
      .toMap

  /** Standing (streaming) assigner: arriving vectors are assigned
    * under the fitted centroid table completely scan-locally
    * (stateless mapPartitions — the standing-LM/LR shape), with the
    * IDENTICAL fixed-point arithmetic as [[assign]]: coordinates
    * rounded half-up to 6, exact BigDecimal squared distances,
    * (d2, cluster) total-order argmin. Parity proven in
    * StreamingSpec. Output: (idCol, cluster, d2).
    */
  def assignFitted(docs: DataFrame, idCol: String, vecCol: String,
      model: Map[(Int, Int), java.math.BigDecimal]): DataFrame = {
    require(model.nonEmpty, "empty centroid model")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val m = bc.value
        val clusters = m.keys.map(_._1).toArray.distinct.sorted
        it.map { case (id, vec) =>
          val x6 = vec.map(v => java.math.BigDecimal
            .valueOf(v.toDouble).setScale(6, java.math.RoundingMode.HALF_UP))
          var bestK = -1
          var bestD: java.math.BigDecimal = null
          clusters.foreach { c =>
            var d = java.math.BigDecimal.ZERO
            var j = 0
            while (j < x6.length) {
              m.get((c, j)).foreach { cj =>
                val diff = x6(j).subtract(cj)
                d = d.add(diff.multiply(diff))
              }
              j += 1
            }
            if (bestD == null || d.compareTo(bestD) < 0) {
              bestK = c; bestD = d
            }
          }
          (id, bestK, bestD.doubleValue)
        }
      }
      .toDF(idCol, "cluster", "d2")
  }

  /** Assignment plus the centroid TABLE it was computed against
    * (cluster, j, c: DECIMAL(18,6)) — for operators that persist
    * both sides as artifacts (the PQ codebook build).
    */
  def assignAndModel(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) =
    loop(emb, idCol, vecCol, k, iters)

  private def loop(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 2 && k <= 256 && iters >= 1 && iters <= 16,
      s"k=$k iters=$iters")
    val spark = emb.sparkSession
    val x = Pca.explodeFixed(emb, idCol, vecCol)
      .localCheckpoint(eager = false)

    // seed centroids: the k smallest ids, renumbered 0..k-1 in id
    // order (rank over a k-row frame after a min-k reduce, not a
    // corpus sort)
    val seedIds = emb.select(col(idCol))
      .orderBy(col(idCol)).limit(k)
    var cent: DataFrame = x.join(broadcast(seedIds), Seq(idCol))
      .select(dense_rank().over(
          org.apache.spark.sql.expressions.Window.orderBy(col(idCol)))
          .cast("int").minus(1).as("cluster"),
        col("j"), col("x").as("c"))
      .localCheckpoint(eager = false)

    var assigned: DataFrame = null
    var centUsed: DataFrame = cent
    for (_ <- 1 to iters) {
      centUsed = cent
      // the difference re-cast to (18,6) is exact (same scale) and
      // keeps the squared term inside DECIMAL(38) on both engines
      val diff = (col("x") - col("c")).cast("decimal(18,6)")
      val d2 = x.join(broadcast(cent), Seq("j"))
        .groupBy(col(idCol), col("cluster"))
        .agg(sum(diff * diff).as("d2"))
      assigned = d2
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol))
            .orderBy(col("d2"), col("cluster"))))
        .filter(col("rn") === 1)
        .select(col(idCol), col("cluster"), col("d2"))
      val upd = x.join(assigned.select(col(idCol), col("cluster")),
          Seq(idCol))
        .groupBy(col("cluster"), col("j"))
        .agg(round(sum(col("x")).cast("double") /
          count(lit(1)).cast("double"), 6)
          .cast("decimal(18,6)").as("cnew"))
      cent = cent
        .join(upd, Seq("cluster", "j"), "left")
        .select(col("cluster"), col("j"),
          coalesce(col("cnew"), col("c")).as("c"))
        .localCheckpoint(eager = false)
    }
    (assigned.select(col(idCol), col("cluster"),
      col("d2").cast("double").as("d2")), centUsed)
  }

  private def roundSql(r: Int): String = {
    val prev = if (r == 1) "c0" else s"c${r - 1}"
    s"""d$r AS (
        SELECT x.id, $prev.cluster,
               sum(CAST(x.x - $prev.c AS DECIMAL(18,6))
                   * CAST(x.x - $prev.c AS DECIMAL(18,6))) AS d2
        FROM x JOIN $prev ON x.j = $prev.j
        GROUP BY 1, 2),
      a$r AS (
        SELECT id, cluster, d2,
               row_number() OVER (PARTITION BY id ORDER BY d2, cluster)
                 AS rn
        FROM d$r),
      u$r AS (
        SELECT a.cluster, x.j,
               CAST(round(CAST(sum(x.x) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS cnew
        FROM x JOIN (SELECT id, cluster FROM a$r WHERE rn = 1) a
          USING (id)
        GROUP BY 1, 2),
      c$r AS (
        SELECT $prev.cluster, $prev.j,
               coalesce(u$r.cnew, $prev.c) AS c
        FROM $prev LEFT JOIN u$r
          ON $prev.cluster = u$r.cluster AND $prev.j = u$r.j)"""
  }

  /** WITH-clause body that trains on the `embeddings` table (CTE `x`
    * holds its 6-decimal exploded positions) and ends at the FITTED
    * centroid table — the table [[fitModel]] collects, i.e.
    * c{iters−1}, the one the final assignment round reads. For
    * oracles that assign OTHER frames under the fitted model (the
    * q191 CDC index replay). Returns (cteBody, fittedTableName).
    */
  def fittedCentroidCte(k: Int, iters: Int): (String, String) = {
    val rounds = (1 to (iters - 1)).map(roundSql)
    val body = s"""x AS (
        SELECT vec_id AS id, CAST(j - 1 AS INT) AS j,
               CAST(round(CAST(embedding[j] AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS x
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS t(j)),
      seeds AS (
        SELECT vec_id AS id,
               CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                 AS cluster
        FROM embeddings ORDER BY vec_id LIMIT $k),
      c0 AS (
        SELECT seeds.cluster, x.j, x.x AS c
        FROM x JOIN seeds USING (id))""" +
      (if (rounds.isEmpty) "" else rounds.mkString(",\n      ", ",\n      ", ""))
    (body, s"c${iters - 1}")
  }

  /** DuckDB replay of [[assign]], rounds unrolled (the Pca/LogReg
    * oracle pattern).
    */
  def oracleSql(k: Int, iters: Int): String = {
    val (prefix, _) = fittedCentroidCte(k, iters)
    s"""
      WITH $prefix,
      ${roundSql(iters)}
      SELECT id AS vec_id, cluster, CAST(d2 AS DOUBLE) AS d2
      FROM a$iters WHERE rn = 1 ORDER BY vec_id"""
  }
}
