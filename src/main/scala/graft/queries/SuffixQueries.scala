package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SuffixArray

/** q165/q166: the suffix-array family — distributed prefix-doubling
  * suffix ranks (the exact-substring-dedup primitive; Lee et al.
  * 2021) and the repeated-span curve it powers. Oracles replay the
  * ranks as one global dense_rank over space-joined token prefixes
  * (order-equivalent because corpus tokens are non-empty [a-z0-9_] —
  * every token char > ' '; see SuffixArray scaladoc).
  */
object SuffixQueries {

  private val MaxLen = 16

  def defs: Seq[QueryDef] = Seq(

    // ---- q165: suffix-array ranks by prefix doubling ----
    // Every token-level suffix ranked by its first 16 tokens in 4
    // doubling rounds (keyed shift-join + two-level bucketed dense
    // rank per round — no single-task global window; the oracle
    // SPELLS the one-window form the decomposition equals).
    QueryDef(
      "q165_suffix_ranks",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        SuffixArray.rankLevels(d, "doc_id", "text", MaxLen)(MaxLen)
          .select(col("doc_id"), col("pos"), col("r").as("rank"))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        s AS (
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                 array_to_string(tk[i:i+15], ' ') AS p
          FROM tk, LATERAL unnest(range(1, len(tk) + 1)) AS u(i))
        SELECT doc_id, pos, dense_rank() OVER (ORDER BY p) AS rank
        FROM s ORDER BY doc_id, pos""")),

    // ---- q166: repeated-span curve from the suffix ranks ----
    // How much of the corpus sits inside a repeated L-token span, for
    // L = 2, 4, 8, 16 — equal level-L rank = identical L-gram, so the
    // doubling structure answers every level at once (the statistic
    // driving "dedup before you train"; positions shorter than L are
    // excluded, they rank by a shorter prefix).
    QueryDef(
      "q166_repeated_spans",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val levels = SuffixArray.rankLevels(d, "doc_id", "text", MaxLen)
        val lens = d.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
        Seq(2, 4, 8, 16).map { l =>
          levels(l).join(lens, Seq("doc_id"))
            .filter(col("pos") + l <= col("n"))
            .groupBy(col("r")).agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") >= 2)
            .agg(coalesce(count(lit(1)), lit(0L)).as("n_dup_spans"),
              coalesce(sum(col("cnt")), lit(0L)).as("dup_positions"),
              coalesce(max(col("cnt")), lit(0L)).as("max_repeat"))
            .select(lit(l.toLong).as("level"), col("n_dup_spans"),
              col("dup_positions"), col("max_repeat"))
        }.reduce(_.unionAll(_)).orderBy(col("level"))
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        lv AS (SELECT unnest([2, 4, 8, 16]) AS level),
        g AS (
          SELECT level,
                 array_to_string(tk[i:i+level-1], ' ') AS g
          FROM lv, tk,
               LATERAL unnest(range(1, len(tk) + 2 - level)) AS u(i)),
        c AS (
          SELECT level, g, count(*) AS cnt
          FROM g GROUP BY 1, 2 HAVING count(*) >= 2),
        agg AS (
          SELECT level, count(*) AS n_dup_spans, sum(cnt) AS dup_positions,
                 max(cnt) AS max_repeat
          FROM c GROUP BY 1)
        SELECT CAST(lv.level AS BIGINT) AS level,
               CAST(coalesce(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(coalesce(a.dup_positions, 0) AS BIGINT) AS dup_positions,
               CAST(coalesce(a.max_repeat, 0) AS BIGINT) AS max_repeat
        FROM lv LEFT JOIN agg a USING (level) ORDER BY level"""))
  )
}
