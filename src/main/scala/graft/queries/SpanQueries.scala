package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{SpanDedup, Winnowing}

/** Substring-granularity dedup battery over `documents`: exact
  * duplicated-span detection (q103, the ExactSubstr stage of an LLM
  * data pipeline at W-token window granularity) and robust winnowing
  * fingerprints (q104 selection, q105 near-dup pairing). Each oracle
  * replays the EXACT selection semantics in DuckDB SQL — md5 hex
  * hashes and lexicographic string comparison agree between the two
  * engines, so these are hash-gated, not rows-only.
  */
object SpanQueries {

  // q103: W-token windows.
  private val W = 8
  // q104/q105: k-token grams, winnowing window w over gram hashes.
  private val K = 4
  private val WW = 4
  private val MinShared = 2
  private val MaxDocsPerFp = 64

  /** (doc_id, pos, gh) for every W-token window — DuckDB mirror of
    * [[SpanDedup.windowHashes]]. `range` is end-exclusive and list
    * slices are 1-based end-inclusive in DuckDB, hence the bounds.
    * The Spark exchange carries window xxhash64s; the oracle groups
    * the window STRINGS themselves — equal up to 64-bit collisions
    * (the q80 discipline).
    */
  private val winSql = s"""
    SELECT doc_id, i AS pos,
           array_to_string(tk[i:i + ${W - 1}], ' ') AS gh
    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         LATERAL unnest(range(1, len(tk) - ${W - 2})) AS r(i)
    WHERE len(tk) >= $W"""

  /** Winnowed (doc_id, pos, fp) — DuckDB mirror of
    * [[Winnowing.fingerprints]]: k-gram md5s, per-window min with
    * rightmost tie-break (max(pos) among the window's minimal
    * hashes), full windows only.
    */
  private val winnowSql = s"""
    WITH h AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(tk[i:i + ${K - 1}], ' ')) AS hh
      FROM (SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents),
           LATERAL unnest(range(1, len(tk) - ${K - 2})) AS r(i)
      WHERE len(tk) >= $K),
    we AS (
      SELECT doc_id, pos AS jend,
             min(hh) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN ${WW - 1} PRECEDING AND CURRENT ROW) AS mn,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN ${WW - 1} PRECEDING AND CURRENT ROW) AS cnt
      FROM h),
    sel AS (
      SELECT f.doc_id, f.jend, f.mn, max(h.pos) AS pos
      FROM we f JOIN h ON h.doc_id = f.doc_id
        AND h.pos BETWEEN f.jend - ${WW - 1} AND f.jend
        AND h.hh = f.mn
      WHERE f.cnt = $WW
      GROUP BY 1, 2, 3)
    SELECT DISTINCT doc_id, pos, mn AS fp FROM sel"""

  val defs: Seq[QueryDef] = Seq(

    // ---- q103: exact duplicated-span detection (ExactSubstr at
    // W-token granularity): maximal token ranges every W-window of
    // which occurs >= 2 times corpus-wide ----
    QueryDef(
      "q103_dup_spans",
      (s, dir) => {
        SpanDedup.duplicatedSpans(
            Tables.loadWide(s, dir, "documents"), "doc_id", "text", W)
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some(s"""
        WITH w AS ($winSql),
        d AS (SELECT gh FROM w GROUP BY gh HAVING count(*) >= 2),
        m AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (gh)),
        i AS (SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id
                       ORDER BY pos) AS grp
              FROM m)
        SELECT doc_id, min(pos) AS span_start,
               max(pos) + ${W - 1} AS span_end,
               count(*) AS n_windows
        FROM i GROUP BY doc_id, grp
        ORDER BY doc_id, span_start""")),

    // ---- q104: robust winnowing fingerprint selection (MOSS) ----
    QueryDef(
      "q104_winnowing",
      (s, dir) => {
        Winnowing.fingerprints(
            Tables.loadWide(s, dir, "documents"), "doc_id", "text", K, WW)
          .orderBy(col("doc_id"), col("pos"))
      },
      Some(s"""
        $winnowSql ORDER BY doc_id, pos""")),

    // ---- q105: winnowing near-dup pairs (shared-fingerprint join
    // with the observed boilerplate cap, replayed as HAVING) ----
    QueryDef(
      "q105_winnow_neardup",
      (s, dir) => {
        Winnowing.nearDupPairs(
            Tables.loadWide(s, dir, "documents"), "doc_id", "text",
            K, WW, MinShared, MaxDocsPerFp)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH fp AS ($winnowSql),
        f2 AS (SELECT DISTINCT doc_id, fp FROM fp),
        ok AS (SELECT fp FROM f2 GROUP BY fp
               HAVING count(*) <= $MaxDocsPerFp),
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS n_shared
          FROM f2 a JOIN f2 b USING (fp) JOIN ok USING (fp)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, n_shared FROM p
        WHERE n_shared >= $MinShared
        ORDER BY id_a, id_b"""))
  )
}
