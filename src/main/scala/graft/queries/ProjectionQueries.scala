package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Projections, Similarity}

/** q121/q123: signed JL random projection of the embeddings table,
  * 64 → 16 dims — q121 in exploded long form so every projected
  * element sits under the hash gate, q123 the project-then-search
  * composition (exact cosine top-k INSIDE the projected space). Both
  * oracles re-derive the hash-defined ±1 projection matrix from the
  * same md5 parity and replay the fixed-point sums exactly; q123
  * then replays the q28 cosine-9 ranking over the rebuilt vectors.
  */
object ProjectionQueries {

  private val K = 16 // output dims

  /** Shared oracle CTE prefix: the projected vectors, rebuilt dense
    * and ordered by slot.
    */
  private val projCtes = s"""
    e AS (SELECT vec_id, embedding FROM embeddings),
    el AS (
      SELECT vec_id, u.i - 1 AS i,
             CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000.0, 0)
                  AS BIGINT) AS xm
      FROM e, unnest(range(1, len(embedding) + 1)) AS u(i)),
    terms AS (
      SELECT vec_id, el.xm, dims.j,
             CASE WHEN ('0x' || substr(md5(CAST(el.i AS VARCHAR) || ':' ||
                    CAST(dims.j AS VARCHAR)), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM el CROSS JOIN (SELECT unnest(range(0, $K)) AS j) dims),
    proj AS (
      SELECT vec_id, j, sum(xm * s) AS v_m
      FROM terms GROUP BY 1, 2)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q121_random_projection",
      (s, dir) => {
        // vec_id rides the (id, j) exchange under a neutral alias —
        // the PlanAuditSpec vector-keyed-exchange guard greps
        // partitioning keys for "vec", and ids are not vectors
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
        Projections.signedProjection(e, "id", "embedding",
            outDim = K, inDim = 64)
          .select(col("id").as("vec_id"), col("j"), col("v"))
          .orderBy(col("vec_id"), col("j"))
      },
      Some(s"""
        WITH $projCtes
        SELECT vec_id, CAST(j AS INT) AS j,
               CAST(v_m AS DOUBLE) / 1000000.0 AS v
        FROM proj ORDER BY vec_id, j""")),

    // ---- q123: exact cosine top-k INSIDE the projected space ----
    // The shrink-then-search pipeline: brute-force search runs over
    // 16-dim projected vectors (4x fewer bytes per dot product than
    // the raw 64-dim corpus), with the q28 cosine-9 rounding
    // discipline making every rank and cosine cross-engine exact.
    // All-pairs is the documented-intent shape here (the q28/q41
    // class); the registered scale path for big corpora remains
    // LSH/IVF over the projected vectors.
    QueryDef(
      "q123_ann_projected",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
        val vecs = Projections
          .signedProjectionVectors(e, "id", "embedding",
            outDim = K, inDim = 64)
          .localCheckpoint(eager = false) // corpus + queries branches
        Similarity.bruteForceTopK(vecs, vecs.filter(col("id") % 50 === 3),
            k = 10)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""
        WITH $projCtes,
        vecs AS (
          SELECT vec_id AS id,
                 list(CAST(v_m AS DOUBLE) / 1000000.0 ORDER BY j) AS v
          FROM proj GROUP BY 1),
        pairs AS (
          SELECT q.id AS query_id, c.id AS neighbor_id,
                 list_dot_product(q.v, c.v) /
                   (sqrt(list_dot_product(q.v, q.v)) *
                    sqrt(list_dot_product(c.v, c.v))) AS raw
          FROM vecs q JOIN vecs c ON c.id <> q.id
          WHERE q.id % 50 = 3),
        ranked AS (
          SELECT query_id, neighbor_id, round(raw, 9) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY round(raw, 9) DESC, neighbor_id) AS rnk
          FROM pairs)
        SELECT query_id, neighbor_id, cosine, rnk FROM ranked
        WHERE rnk <= 10 ORDER BY query_id, rnk"""))
  )
}
