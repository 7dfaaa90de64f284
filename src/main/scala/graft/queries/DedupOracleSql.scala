package graft.queries

/** Shared DuckDB oracle fragment for exact trigram-shingle Jaccard
  * pairs — the SPARSE formulation. The textbook form
  * (`sh a JOIN sh b ON a.doc_id < b.doc_id` + `list_intersect` per
  * pair) is exact but quadratic in documents: at sf0.1 it is 12.5M
  * pairs × a ~200-element list intersection EACH, which turned the
  * builder's sf0.1 mirror sweep into multi-hour DuckDB runs (q175's
  * triangle oracle re-inlined the pair CTE three times and ran for
  * 2h+ before this rewrite). Candidates here come from an equi-join
  * on the EXPLODED shingles instead — Σ_g n_g² work, seconds at
  * sf0.1 — and the result is EXACTLY equivalent for every consumer
  * that applies a positive threshold or ranks positive-Jaccard pairs:
  * J(A,B) ≥ t > 0 implies at least one shared shingle, so no
  * qualifying pair can be missed, and the Jaccard DOUBLE is
  * bit-identical because |A∪B| = |A|+|B|−|A∩B| is computed in exact
  * integers before the one division (same dividend/divisor as
  * `len(list_intersect)/len(list_distinct(a||b))`). Verified equal
  * row-for-row against the textbook form at sf0.01 before adoption.
  *
  * Emits CTEs `ex`, `cnt`, `inter`, `pairs(a, b, jaccard)` with
  * a < b; pairs sharing NO shingle (jaccard = 0) are absent.
  * Requires an in-scope CTE `sh(doc_id, shingles)` whose shingle
  * lists are per-doc DISTINCT (every site's `sh` uses
  * `list_distinct`, incl. the <3-token whole-text fallback) — the
  * `count(*)` intersection and the union identity both depend on it.
  */
object DedupOracleSql {

  val sparsePairs: String = """
        ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        cnt AS (SELECT doc_id, len(shingles) AS ns FROM sh),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM ex x JOIN ex y ON y.g = x.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT inter.a, inter.b,
                 CAST(i AS DOUBLE) / (ca.ns + cb.ns - i) AS jaccard
          FROM inter
          JOIN cnt ca ON ca.doc_id = inter.a
          JOIN cnt cb ON cb.doc_id = inter.b)"""
}
