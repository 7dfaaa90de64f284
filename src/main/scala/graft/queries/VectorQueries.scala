package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Round-10 embedding-geometry battery: Matryoshka truncation recall
  * (q178) and product-quantization ADC search (q180) — the two
  * storage/recall trade-offs a 100 TB embedding store actually
  * deploys (truncate dimensions vs quantize them), measured against
  * the exact q28 baseline with the registry's determinism contracts.
  */
object VectorQueries {

  private val MrlDims = Seq(8, 16, 32, 64)

  /** One truncated-space exact-top-k CTE chain (the q28 arithmetic
    * verbatim, over the m-prefix of every vector).
    */
  private def mrlCtes(m: Int): String = s"""
        t$m AS (SELECT id, v[1:$m] AS v FROM e),
        p$m AS (
          SELECT q.id AS query_id, c.id AS neighbor_id,
                 round(list_dot_product(q.v, c.v) /
                   (sqrt(list_dot_product(q.v, q.v)) *
                    sqrt(list_dot_product(c.v, c.v))), 9) AS cosine
          FROM t$m q JOIN t$m c ON c.id <> q.id
          WHERE q.id < 20),
        r$m AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS rnk
          FROM p$m),
        k$m AS (SELECT query_id, neighbor_id FROM r$m WHERE rnk <= 5)"""

  def defs: Seq[QueryDef] = Seq(

    // ---- q178: Matryoshka truncation recall curve ----
    // MRL (Kusupati et al. 2022) deployment question: how much
    // top-k recall survives keeping only the first m dimensions?
    // Exact top-5 in each truncated space vs the full-dimension
    // exact top-5, recall@5 per m — the report that picks the
    // serving dimension before anyone re-embeds a corpus. The
    // m = 64 row is the built-in sanity anchor (recall exactly 1).
    // All-pairs by documented intent (the q28/q123 family): queries
    // are a bounded broadcast frame; the 100 TB path runs the same
    // truncation under the q45/q46 LSH/IVF candidate generation.
    QueryDef(
      "q178_mrl_recall",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val full = Similarity.bruteForceTopK(
            emb, emb.filter(col("id") < 20), k = 5)
          .select(col("query_id"), col("neighbor_id"))
          .localCheckpoint(eager = false)
        val denom = full.agg(count(lit(1)).as("total"))
        val perDim = MrlDims.map { m =>
          val t = emb.select(col("id"), slice(col("vec"), 1, m).as("vec"))
          Similarity.bruteForceTopK(t, t.filter(col("id") < 20), k = 5)
            .join(full, Seq("query_id", "neighbor_id"), "left_semi")
            .agg(count(lit(1)).as("hits"))
            .select(lit(m).as("dim"), col("hits"))
        }.reduce(_ union _)
        perDim.crossJoin(broadcast(denom))
          .select(col("dim"), col("hits"),
            round(col("hits").cast("double") /
              col("total").cast("double"), 6).as("recall"))
          .orderBy(col("dim"))
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        ${MrlDims.map(mrlCtes).mkString(",\n")},
        denom AS (SELECT count(*) AS total FROM k64),
        hits AS (
          ${MrlDims.map(m =>
            s"""SELECT $m AS dim, count(*) AS hits
              FROM k$m t JOIN k64 f USING (query_id, neighbor_id)""")
            .mkString("\n          UNION ALL\n          ")})
        SELECT dim, hits,
               round(hits::DOUBLE / total::DOUBLE, 6) AS recall
        FROM hits CROSS JOIN denom
        ORDER BY dim"""))
  )
}
