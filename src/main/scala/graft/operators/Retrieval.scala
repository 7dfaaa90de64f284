package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 scoring and
  * reciprocal-rank fusion — the retrieval half of a curation stack
  * (targeted decontamination sweeps, "find training docs about X"
  * audits, hybrid lexical+vector search). The reference has no
  * retrieval operator; this is LLM-pipeline extension surface like
  * the dedup/ANN families.
  *
  * Cross-engine exactness (the q71/q78 discipline): `ln` is the one
  * non-IEEE-pinned step, so idf is rounded to 4 decimals; every
  * per-(query,term,doc) score is rounded to 6 decimals and summed as
  * DECIMAL — order-independent under repartitioning and bit-identical
  * in any SQL engine replaying the same op tree. +, −, ×, ÷ on
  * doubles are IEEE-754-pinned and need no rounding; corpus constants
  * (N, avgdl) are carried as a one-row aggregate CROSS JOINed into
  * the plan rather than driver-collected literals, so both engines
  * derive them from the same arithmetic.
  *
  * Scale shape: the term→doc posting table is the corpus exploded
  * once and map-side combined to (doc, term, tf); document
  * frequencies collapse to vocabulary size; the query-term table is
  * small by construction and broadcast, so candidate generation is a
  * scan over the posting table — no all-pairs anywhere. Top-k per
  * query is a window over each query's CANDIDATES (docs sharing ≥1
  * term), the standard inverted-index shape. Both rankers consume
  * the same [[postings]] table — a fused pipeline (q120) tokenizes
  * the corpus ONCE, checkpoints the postings, and derives BM25,
  * Jaccard, and the corpus stats from it.
  */
object Retrieval {

  /** BM25 constants (the Robertson defaults; Lucene's idf variant
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` keeps idf positive for
    * df > N/2).
    */
  val K1 = 1.2
  val B = 0.75

  /** (doc_id, dl, term, tf) postings from whitespace tokens — one
    * explode, map-side combined; distinct per (doc, term); `dl` the
    * raw token length. The single corpus-derived input of every
    * ranker here — build once, `localCheckpoint`, feed all of them.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_t"))
      .select(col("doc_id"), size(col("_t")).as("dl"),
        explode(col("_t")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` BM25 hits per query, from a prebuilt [[postings]] table.
    *
    * `queries`: (qid, term) rows — distinct terms per query id. Must
    * be small (it is broadcast). Self-hits (doc_id == qid) are
    * excluded so corpus-derived query sets don't trivially retrieve
    * their own source document.
    *
    * Output: (qid, doc_id, rank, score) with rank 1 = best, ties
    * broken by doc_id, score a double reconstructed exactly from the
    * DECIMAL sum.
    */
  def bm25FromPostings(post: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k")
    // One-row corpus stats: N docs and avgdl = Σdl / N (double
    // division, IEEE-pinned — both engines compute it from the same
    // two exact integers). Derived from the postings (dl is constant
    // per doc) so the corpus is not re-scanned.
    val stats = post.groupBy("doc_id").agg(max(col("dl")).as("_dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    // post is already distinct per (doc, term), so df is a plain count
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("dfc"))
    val idf = round(
      log(lit(1.0) + (col("n_docs") - col("dfc") + lit(0.5)) /
        (col("dfc") + lit(0.5))), 4).cast("decimal(18,4)")
    // K1+1 written as the literal 2.2 so a SQL replay parses the
    // IDENTICAL double (a computed 1.2 + 1.0 is a round-to-even
    // near-tie — not worth betting the hash gate on); 0.25 = 1 − B
    // and 0.75 are exact binary.
    val termScore = round(
      col("idf4").cast("double") *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(K1) *
          (lit(1.0 - B) + lit(B) * (col("dl").cast("double") / col("avgdl")))),
      6).cast("decimal(28,6)")
    val scored = post
      .join(broadcast(queries.select(col("qid"), col("term"))), Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(dfreq.crossJoin(stats).select(col("term"), idf.as("idf4"))),
        Seq("term"))
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(termScore).as("score_dec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_dec").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"),
        col("score_dec").cast("double").as("score"))
  }

  /** [[bm25FromPostings]] over a corpus — builds the postings inline. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int): DataFrame =
    bm25FromPostings(postings(docs, idCol, textCol), queries, k)

  /** Top-`k` token-set-Jaccard hits per query — the second,
    * structurally different lexical ranking [[rrfTopK]] fuses with
    * BM25. Jaccard = |q∩d| / (|q| + |d| − |q∩d|) over DISTINCT
    * tokens (the postings table IS the distinct (doc, term) set);
    * one double division, IEEE-pinned, rounded to 6 for the
    * deterministic ordering.
    */
  def jaccardFromPostings(post: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k")
    val dTerms = post.select(col("doc_id"), col("term"))
    val dSizes = dTerms.groupBy("doc_id").agg(count(lit(1)).as("dn"))
    val qSizes = queries.groupBy("qid").agg(count(lit(1)).as("qn"))
    val inter = dTerms
      .join(broadcast(queries.select(col("qid"), col("term"))), Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("xn"))
    val jac = round(col("xn").cast("double") /
      (col("qn") + col("dn") - col("xn")).cast("double"), 6)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("jac").desc, col("doc_id"))
    inter
      .join(broadcast(qSizes), Seq("qid"))
      .join(dSizes, Seq("doc_id"))
      .select(col("qid"), col("doc_id"), jac.as("jac"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"), col("jac"))
  }

  /** [[jaccardFromPostings]] over a corpus — builds the postings inline. */
  def jaccardTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int): DataFrame =
    jaccardFromPostings(postings(docs, idCol, textCol), queries, k)

  /** Reciprocal-rank fusion of two (qid, doc_id, rank) rankings:
    * rrf(d) = Σ_r 1/(c + rank_r(d)) over the rankings that contain
    * d — the standard Cormack/Clarke combiner for lexical+semantic
    * hybrid search. Each reciprocal is one IEEE-pinned double
    * division rounded to 6 decimals; the (≤2-term) sum runs in
    * DECIMAL. Output re-ranked top-`k` per qid with `n_lists` = how
    * many input rankings contained the doc.
    */
  def rrfTopK(a: DataFrame, b: DataFrame, c: Int, k: Int): DataFrame = {
    require(c >= 1 && k >= 1, s"c=$c k=$k")
    val contrib = round(lit(1.0) / (lit(c) + col("rank")).cast("double"), 6)
      .cast("decimal(18,6)")
    val pooled = a.select(col("qid"), col("doc_id"), contrib.as("rc"))
      .unionByName(b.select(col("qid"), col("doc_id"), contrib.as("rc")))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("rc")).as("rrf_dec"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_dec").desc, col("doc_id"))
    pooled
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("rank"),
        col("rrf_dec").cast("double").as("rrf"), col("n_lists"))
  }
}
