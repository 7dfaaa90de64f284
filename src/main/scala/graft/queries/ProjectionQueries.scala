package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Projections

/** q121: signed JL random projection of the embeddings table, 64 →
  * 16 dims, in exploded long form so every projected element sits
  * under the hash gate. The oracle re-derives the hash-defined ±1
  * projection matrix from the same md5 parity and replays the
  * fixed-point sums exactly.
  */
object ProjectionQueries {

  private val K = 16 // output dims

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
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
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
          FROM terms GROUP BY 1, 2)
        SELECT vec_id, CAST(j AS INT) AS j,
               CAST(v_m AS DOUBLE) / 1000000.0 AS v
        FROM proj ORDER BY vec_id, j"""))
  )
}
