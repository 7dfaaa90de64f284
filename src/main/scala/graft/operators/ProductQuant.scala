package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011): split every d-dim
  * vector into M contiguous subvectors, k-means each subspace to a
  * `k`-entry codebook, store each vector as M small codes
  * (M bytes at k ≤ 256 — a 32× compression of a 64-dim float
  * vector), and answer top-k with ASYMMETRIC DISTANCE (ADC): the
  * query stays exact, each subspace contributes the exact distance
  * from the query subvector to the corpus vector's ASSIGNED
  * centroid, and the total approximate distance is the sum of M
  * table lookups — no corpus vector is ever read at query time.
  *
  * Exactness contract: the codebooks come from [[KMeansExact]]
  * (6-decimal fixed-point Lloyd, deterministic seeding), ADC terms
  * are exact DECIMAL squared differences of 6-decimal fixed points,
  * and the ranking key is the exact DECIMAL distance with id
  * tie-break — bit-replayable by the DuckDB oracle from the same
  * parquet artifacts.
  *
  * Scale shape: training + encoding are the OFFLINE artifact pass
  * (the q46 IVF build/probe split); the online probe joins the
  * (M·k·subDim)-row codebook — broadcast — against the bounded query
  * frame to form the per-query distance table (queries × M × k rows,
  * broadcast), then scans the codes table once, scan-local, with one
  * (query, id) partial-aggregated exchange for the M-term sums.
  * The float vectors never move at query time.
  */
object ProductQuant {

  /** Train per-subspace codebooks and encode the corpus.
    * `emb`: (id, vec: array<float>) with dim = m·subDim. Returns
    * (codebook: (m, cluster, j, c DECIMAL(18,6)),
    *  codes: (id, m, code)).
    */
  def build(emb: DataFrame, m: Int, subDim: Int, k: Int, iters: Int)
      : (DataFrame, DataFrame) = {
    require(m >= 2 && subDim >= 1 && k >= 2, s"m=$m subDim=$subDim k=$k")
    val parts = (0 until m).map { s =>
      val sub = emb.select(col("id"),
        slice(col("vec"), s * subDim + 1, subDim).as("vec"))
      val (assigned, cent) = KMeansExact.assignAndModel(
        sub, "id", "vec", k, iters)
      (assigned.select(col("id"), lit(s).as("m"),
          col("cluster").as("code")),
        cent.select(lit(s).as("m"), col("cluster"), col("j"), col("c")))
    }
    (parts.map(_._2).reduce(_ union _), parts.map(_._1).reduce(_ union _))
  }

  /** Persist codebook + codes under `path` iff absent (fingerprint-
    * guarded, the IVF/BPE artifact contract), then return the loaded
    * parquet-backed pair.
    */
  def buildIfAbsent(spark: SparkSession, emb: => DataFrame, path: String,
      m: Int, subDim: Int, k: Int, iters: Int,
      fingerprint: Option[String] = None): (DataFrame, DataFrame) = {
    import graft.sources.ArtifactGuard
    if (!ArtifactGuard.fresh(spark, path, s"$path/codes/_SUCCESS",
        fingerprint)) {
      val e = emb
      require(e.limit(1).count() > 0, "empty corpus: PQ codebook " +
        "training requires vectors")
      val (codebook, codes) = build(e, m, subDim, k, iters)
      codebook.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/codebook")
      codes.write.mode("overwrite").parquet(s"$path/codes")
      ArtifactGuard.stamp(spark, path, fingerprint)
    }
    (spark.read.parquet(s"$path/codebook"),
      spark.read.parquet(s"$path/codes"))
  }

  /** L2-normalize (id, vec) — norm computed ONCE per vector, then one
    * element-wise transform. Quantizing NORMALIZED vectors makes ADC
    * chase the cosine order (‖u−v‖² = 2 − 2·cos on the unit sphere).
    * All-zero vectors have no direction on the unit sphere: they are
    * dropped (r10 ADVICE — an unguarded x/0 would feed NaN
    * coordinates into codebook training and poison every centroid
    * they touch; a zero query simply has no cosine neighbors).
    */
  def normalize(emb: DataFrame): DataFrame =
    emb.select(col("id"), col("vec").as("v0"),
        graft.functions.VectorFunctions.l2Norm(col("vec")).as("nm"))
      .filter(col("nm") > 0)
      .select(col("id"),
        transform(col("v0"), x => x.cast("double") / col("nm"))
          .as("vec"))

  /** The deployed probe: ADC-rank the corpus from codes alone, then
    * exact-cosine rescore ONLY the top-`overfetch` shortlist (the
    * int8-overfetch discipline — PQ codes carry quantization noise
    * comparable to neighbor gaps on unstructured embeddings, so the
    * shortlist recalls and the rescore ranks). `corpus`/`queries`
    * are RAW (id, vec float) — queries are normalized internally to
    * match the codebook space; the rescore is the brute-force cosine
    * arithmetic verbatim (round 9, id tie-break), so
    * overfetch ≥ |corpus| degenerates to exactly the brute-force
    * result. Output: (query_id, neighbor_id, cosine, rnk).
    */
  def rescoredTopK(corpus: DataFrame, queries: DataFrame,
      codebook: DataFrame, codes: DataFrame, subDim: Int, kTop: Int,
      overfetch: Int): DataFrame = {
    val short = adcTopK(normalize(queries), codebook, codes, subDim,
        kTop = overfetch)
      .select(col("query_id"), col("neighbor_id"))
    rescoreShortlist(short, corpus, queries, kTop)
  }

  /** Exact-cosine rescore of a (query_id, neighbor_id) shortlist —
    * the brute-force arithmetic verbatim (round 9, id tie-break),
    * shared by the whole-corpus ADC probe and the IVF-PQ probe.
    */
  private def rescoreShortlist(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, kTop: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions
    val q = queries
      .select(col("id").as("query_id"), col("vec").as("qvec"))
      .withColumn("qn", VectorFunctions.l2Norm(col("qvec")))
    val c = corpus.select(col("id").as("neighbor_id"),
        col("vec").as("cvec"))
      .withColumn("cn", VectorFunctions.l2Norm(col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    short.join(c, Seq("neighbor_id")).join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", round(VectorFunctions.cosineWithNorms(
        col("qvec"), col("cvec"), col("qn"), col("cn")), 9))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= kTop)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("rnk"))
  }

  /** IVF-PQ probe — the FAISS-at-scale layout (Jégou 2011 §V): the
    * coarse quantizer's probed cells bound the candidate set, ADC
    * ranks ONLY those candidates from codes, and the exact rescore
    * touches only the top-`overfetch` shortlist. At 100 TB the three
    * tiers move three very different byte volumes: the probe reads
    * nProbe/nLists of the id-only postings (partition-pruned), ADC
    * reads 8-byte codes for just those ids (one id-keyed join — the
    * only corpus-bounded exchange, nProbe/nLists of the codes), and
    * float vectors move only for the shortlist (queries × overfetch
    * rows). Probing all lists with overfetch ≥ |corpus| degenerates
    * to exactly the brute-force result (AnnSpec).
    */
  def ivfPqRescoredTopK(corpus: DataFrame, queries: DataFrame,
      index: Similarity.IvfIndex, codebook: DataFrame, codes: DataFrame,
      subDim: Int, kTop: Int, nProbe: Int, overfetch: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = index.candidateIds(queries, nProbe)
      .select(col("query_id").as("_cq"), col("neighbor_id").as("id"))
    val dtab = distanceTable(normalize(queries), codebook, subDim)
      .select(col("query_id"), col("m").as("_dm"),
        col("cluster").as("_dc"), col("sub_d2"))
    val adist = codes.join(cands, Seq("id"))
      .join(broadcast(dtab),
        col("_cq") === col("query_id") && col("m") === col("_dm") &&
          col("code") === col("_dc"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("sub_d2")).as("adist_x"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist_x"), col("neighbor_id"))
    val short = adist.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= overfetch)
      .select(col("query_id"), col("neighbor_id"))
    rescoreShortlist(short, corpus, queries, kTop)
  }

  /** The codebook collected as the broadcastable standing model for
    * the STREAMING face (M·k·subDim rows — a bounded model boundary,
    * the fitModel/fitted-BM25 pattern): (m, cluster, j) → 6-decimal
    * centroid coordinate.
    */
  def codebookModel(codebook: DataFrame)
      : Map[(Int, Int, Int), java.math.BigDecimal] =
    codebook.select(col("m"), col("cluster"), col("j"), col("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getDecimal(3).setScale(6))
      .toMap

  /** The standing-query ADC distance table collected as a model
    * (queries × M × k rows, bounded by the standing query set):
    * (query_id, m, cluster) → exact DECIMAL sub-distance. Computed by
    * the BATCH [[distanceTable]] arithmetic verbatim (queries
    * normalized internally), so the streaming scorer that sums these
    * entries is bit-identical to the batch ADC join.
    */
  def queryDistanceModel(queries: DataFrame, codebook: DataFrame,
      subDim: Int): Map[(Long, Int, Int), java.math.BigDecimal] =
    distanceTable(normalize(queries), codebook, subDim)
      .select(col("query_id").cast("long"), col("m"), col("cluster"),
        col("sub_d2"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        r.getDecimal(3))
      .toMap

  /** Per-(query, subspace, centroid) exact DECIMAL distance table —
    * queries × M × k rows, broadcast-sized; shared by [[adcTopK]]
    * and [[ivfPqRescoredTopK]]. `queries` must be normalized.
    */
  private def distanceTable(queries: DataFrame, codebook: DataFrame,
      subDim: Int): DataFrame = {
    val qd = queries
      .select(col("id").as("query_id"),
        posexplode(col("vec")).as(Seq("jg", "x")))
      .select(col("query_id"),
        (col("jg") / subDim).cast("int").as("m"),
        pmod(col("jg"), lit(subDim)).as("j"),
        round(col("x").cast("double"), 6).cast("decimal(18,6)").as("qx"))
    val diff = (col("qx") - col("c")).cast("decimal(18,6)")
    qd.join(broadcast(codebook), Seq("m", "j"))
      .groupBy(col("query_id"), col("m"), col("cluster"))
      .agg(sum(diff * diff).as("sub_d2"))
  }

  /** ADC top-k: exact query subvectors against assigned centroids.
    * `queries`: (id, vec). Output: (query_id, neighbor_id, adist, rnk),
    * self-matches excluded, adist the 6-rounded double of the exact
    * DECIMAL sum.
    */
  def adcTopK(queries: DataFrame, codebook: DataFrame, codes: DataFrame,
      subDim: Int, kTop: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dtab = distanceTable(queries, codebook, subDim)
    // one scan of the codes table against the broadcast distance
    // table; the (query, id) sum is M-term, partial-aggregated
    val cand = codes.join(broadcast(dtab),
        codes("m") === dtab("m") && codes("code") === dtab("cluster"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("sub_d2")).as("adist_x"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist_x"), col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= kTop)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adist_x").cast("double"), 6).as("adist"), col("rnk"))
  }
}
