package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprintMd5

/** Benchmark-contamination detection: flag corpus documents whose
  * normalized text exactly matches a document in an evaluation set —
  * the standard pre-training hygiene pass (training on eval data
  * silently inflates benchmark scores).
  *
  * Shape at 100 TB: the benchmark side is SMALL (thousands of eval
  * items vs billions of docs), so its digest set broadcasts and the
  * check is a map-side left-semi lookup on the corpus scan — no
  * corpus shuffle, no text comparison (16-byte digests), one pass.
  * Matching is by `fingerprintMd5` normalization (lowercase,
  * whitespace-collapsed) — the same key exact dedup uses; for
  * fuzzier containment (eval text embedded inside a training doc),
  * compose with the n-gram machinery in MinHashDedup instead.
  */
object Contamination {

  /** `corpus` (idCol, textCol) × `benchmark` (textCol) →
    * corpus rows + `contaminated` flag.
    */
  def flag(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bench = benchmark
      .select(fingerprintMd5(col(textCol)).as("fp")).distinct()
    corpus
      .select(col(idCol), fingerprintMd5(col(textCol)).as("fp"))
      .join(broadcast(bench.withColumn("contaminated", lit(true))),
        Seq("fp"), "left_outer")
      .select(col(idCol),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Windowed-overlap contamination — the GPT-3-style upgrade of
    * [[flag]]: a corpus document is contaminated iff it shares ANY
    * `n`-token window with an eval document (Brown et al. 2020 used
    * 13-grams), which catches eval text EMBEDDED inside a larger
    * training document, not just whole-document copies. Output:
    * (id, n_overlap = distinct shared windows, contaminated).
    *
    * Shape at 100 TB: both sides' window hashes come from
    * `CorpusOps.distinctWindowHashes` (scan-local, 8-byte keys, no
    * gram text on any exchange). The eval side is small, so its
    * distinct hash set BROADCASTS and the corpus-side join is
    * map-side; only matching (id) rows reach the per-doc count
    * exchange — contamination is rare by construction, so that
    * exchange is near-empty. Documents under `n` tokens have no
    * windows and come back clean (match the window length to the
    * shortest eval item you care about).
    */
  def flagNgramOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val benchGrams = CorpusOps
      .distinctWindowHashes(benchmark, idCol, textCol, n)
      .select(col("g")).distinct()
    val matches = CorpusOps
      .distinctWindowHashes(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol))
      .join(matches, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= 1).as("contaminated"))
  }

  /** The enforcement form: corpus minus contaminated docs (map-side
    * broadcast anti-join, same single-pass shape).
    */
  def remove(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bench = benchmark
      .select(fingerprintMd5(col(textCol)).as("fp")).distinct()
    corpus
      .withColumn("_fp", fingerprintMd5(col(textCol)))
      .join(broadcast(bench), col("_fp") === col("fp"), "left_anti")
      .drop("_fp")
  }

  /** Streaming [[flagNgramOverlap]]: decontaminate documents AS THEY
    * ARRIVE. Contamination against a static eval set is per-document
    * work — a doc's verdict never depends on other docs — so the
    * streaming form is deliberately STATELESS: no watermark, no state
    * store, nothing to evict. The eval set's distinct window hashes
    * collapse to ONE static row (`collect_set`) that broadcasts into
    * a stream-static join, and each arriving doc intersects its own
    * scan-local window-hash array with it (`array_intersect` — all
    * codegen'd, no UDF). Exact, not probabilistic: same verdicts as
    * the batch operator, proven by StreamingSpec parity.
    *
    * At scale: the broadcast row costs 8 bytes per distinct eval
    * window (a 100k-item benchmark suite ≈ tens of MB — benchmark
    * sides are small by nature; for a reference CORPUS as the filter
    * side use [[BloomDedup]] instead). Persist the eval set upstream
    * so the static side isn't recomputed per microbatch.
    */
  def flagNgramOverlapStream(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    withEvalOverlap(docs, benchmark, idCol, textCol, n)
      .select(col(idCol),
        size(array_intersect(col("_ws"), col("_eval_ws")))
          .cast("long").as("n_overlap"),
        (size(array_intersect(col("_ws"), col("_eval_ws"))) >= 1)
          .as("contaminated"))

  /** [[flagNgramOverlapStream]]'s filtering form: the input rows (ALL
    * columns carried) that are NOT contaminated — the stage a
    * streaming ingestion pipeline actually composes (verdict-only
    * output would need a stream-stream join to recover the doc).
    * Same stateless shape: broadcast eval hashes, per-doc
    * array_intersect, no state store.
    */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val out = docs.columns.map(col)
    withEvalOverlap(docs, benchmark, idCol, textCol, n)
      .filter(size(array_intersect(col("_ws"), col("_eval_ws"))) === 0)
      .select(out: _*)
  }

  /** Shared stateless prefix of the two streaming forms: docs with
    * their distinct window-hash set (`_ws`) and the broadcast eval
    * set (`_eval_ws`) joined alongside — the gram hashing and
    * broadcast shape live HERE exactly once.
    */
  private def withEvalOverlap(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalRow = CorpusOps
      .distinctWindowHashes(benchmark, idCol, textCol, n)
      .agg(collect_set(col("g")).as("_eval_ws"))
      .withColumn("_one", lit(1))
    docs
      .withColumn("_th", CorpusOps.tokenHashes(textCol))
      .withColumn("_ws",
        array_distinct(CorpusOps.windowHashes(col("_th"), n)))
      .withColumn("_one", lit(1))
      .join(broadcast(evalRow), Seq("_one"))
  }
}
