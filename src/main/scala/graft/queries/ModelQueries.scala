package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{KMeansExact, LanguageModel, LogReg, Pca}
import graft.functions.TextFunctions.qualityScore

/** Trained-model corpus operators: Stupid Backoff LM scoring, the
  * logistic-regression quality gate (train / score / exact AUC), PCA
  * power iteration, and the quality-annealed curriculum schedule.
  * Every query is hash-gated: training loops are replayed by the
  * oracle as unrolled CTE stages over the same fixed-point
  * arithmetic (the q81 recursive-replay contract, without needing
  * recursion because round counts are config constants).
  */
object ModelQueries {

  private val enLabelSql = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
  private val LrDim = 32
  private val LrRounds = 3
  private val LrLr = 0.5

  private def lrScored(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.load(s, dir, "documents")
    val feats = LogReg.features(d, "doc_id", "text",
      col("lang") === "en", LrDim).localCheckpoint(eager = false)
    val w = LogReg.train(feats, "doc_id", LrDim, LrRounds, LrLr)
    LogReg.score(feats, "doc_id", w)
  }

  def defs: Seq[QueryDef] = Seq(

    // ---- q136: Stupid Backoff trigram LM scoring ----
    // Brants et al. 2007 — the LM design built FOR distributed count
    // tables (score = raw count ratios with α-backoff, no
    // normalization), which is why it was THE web-scale LM. Trained
    // on the corpus minus src1, scored over everything: positions
    // unseen in training back off to bigram/unigram evidence, OOV
    // words floor at 0. Linear-space scores, 6-decimal fixed point.
    QueryDef(
      "q136_stupid_backoff",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        LanguageModel.stupidBackoff(
          d.filter(col("source") =!= "src1"), d, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tr AS (
          SELECT string_split(text, ' ') AS tk FROM documents
          WHERE source <> 'src1'),
        uni AS (
          SELECT tk[i] AS w, count(*) AS c
          FROM tr, LATERAL unnest(range(1, len(tk) + 1)) AS u(i)
          GROUP BY 1),
        n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        big AS (
          SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS c
          FROM tr, LATERAL unnest(range(1, greatest(len(tk), 1))) AS u(i)
          GROUP BY 1, 2),
        tri AS (
          SELECT tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3, count(*) AS c
          FROM tr, LATERAL unnest(range(1, greatest(len(tk) - 1, 1))) AS u(i)
          GROUP BY 1, 2, 3),
        sd AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        pos AS (
          SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3
          FROM sd, LATERAL unnest(range(1, greatest(len(tk) - 1, 1))) AS u(i)),
        dt AS (
          SELECT doc_id, w1, w2, w3, count(*) AS k FROM pos GROUP BY ALL),
        j AS (
          SELECT dt.doc_id, dt.k,
                 t.c AS c3, b12.c AS c2, b23.c AS c23,
                 u2.c AS cu2, u3.c AS cu3, n.n
          FROM dt
          LEFT JOIN tri t ON dt.w1 = t.w1 AND dt.w2 = t.w2 AND dt.w3 = t.w3
          LEFT JOIN big b12 ON dt.w1 = b12.w1 AND dt.w2 = b12.w2
          LEFT JOIN big b23 ON dt.w2 = b23.w1 AND dt.w3 = b23.w2
          LEFT JOIN uni u2 ON dt.w2 = u2.w
          LEFT JOIN uni u3 ON dt.w3 = u3.w
          CROSS JOIN n),
        per AS (
          SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_trigrams,
                 sum(CAST(round(CASE
                   WHEN c3 IS NOT NULL THEN c3 / CAST(c2 AS DOUBLE)
                   WHEN c23 IS NOT NULL
                     THEN CAST(0.4 AS DOUBLE) * c23 / CAST(cu2 AS DOUBLE)
                   WHEN cu3 IS NOT NULL
                     THEN CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                          * cu3 / CAST(n AS DOUBLE)
                   ELSE 0 END, 6) AS DECIMAL(18,6)) * k) AS sb
          FROM j GROUP BY 1)
        SELECT d.doc_id, per.n_trigrams,
               CAST(per.sb AS DOUBLE) / per.n_trigrams AS avg_sb
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY d.doc_id""")),

    // ---- q137: logistic-regression training ----
    // The fastText-style trained quality/language gate: 3 full-batch
    // GD rounds over md5-hashed bag-of-words, every margin/gradient
    // an exact DECIMAL sum, weights 6-decimal fixed points — the
    // oracle replays training as unrolled CTE stages and must land
    // on the IDENTICAL weight table.
    QueryDef(
      "q137_logreg_train",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val feats = LogReg.features(d, "doc_id", "text",
          col("lang") === "en", LrDim).localCheckpoint(eager = false)
        LogReg.train(feats, "doc_id", LrDim, LrRounds, LrLr)
          .select(col("feat"), col("weight").cast("double").as("weight"))
          .orderBy(col("feat"))
      },
      Some(s"""
        WITH ${LogReg.trainOracleCtes(enLabelSql, LrDim, LrRounds, "0.5")}
        SELECT feat, CAST(w AS DOUBLE) AS weight
        FROM w$LrRounds ORDER BY feat""")),

    // ---- q138: logistic-regression scoring ----
    // The trained gate applied corpus-wide: one broadcast of dim+1
    // weights against the exploded features, p = 6-decimal sigmoid,
    // pred = 0.5 threshold.
    QueryDef(
      "q138_logreg_score",
      (s, dir) => lrScored(s, dir).orderBy(col("doc_id")),
      Some(s"""
        WITH ${LogReg.scoreOracleCtes(enLabelSql, LrDim, LrRounds, "0.5")}
        SELECT doc_id, y, p, CAST(p >= 0.5 AS INT) AS pred
        FROM scored ORDER BY doc_id""")),

    // ---- q139: exact ROC AUC of the trained classifier ----
    // Mann–Whitney over average ranks, computed per DISTINCT score
    // from cumulative counts (scores are 6-decimal fixed points, so
    // the groupBy is exact): 2·rsum stays integer in DECIMAL(38,0)
    // and the whole statistic is ONE pinned double division.
    QueryDef(
      "q139_auc",
      (s, dir) => LogReg.auc(lrScored(s, dir), "p", "y"),
      Some(s"""
        WITH ${LogReg.scoreOracleCtes(enLabelSql, LrDim, LrRounds, "0.5")},
        bys AS (
          SELECT p AS s, count(*) AS c, sum(y) AS cp FROM scored GROUP BY 1),
        rk AS (
          SELECT s, c, cp, sum(c) OVER (ORDER BY s) AS cum FROM bys),
        agg AS (
          SELECT CAST(sum(cp) AS DECIMAL(38,0)) AS np,
                 CAST(sum(c) - sum(cp) AS DECIMAL(38,0)) AS nn,
                 sum(CAST(2*cum - c + 1 AS DECIMAL(38,0))
                     * CAST(cp AS DECIMAL(38,0))) AS rsum2
          FROM rk)
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round(CAST(rsum2 - np * (np + 1) AS DOUBLE)
                 / CAST(2 * np * nn AS DOUBLE), 6) AS auc
        FROM agg""")),

    // ---- q140: PCA top component by power iteration ----
    // Dominant-direction projection (the "all-but-the-top" embedding
    // hygiene primitive): 5 power-iteration rounds over the 6-decimal
    // covariance, every matvec an exact DECIMAL sum, iteration
    // unrolled in the oracle — projections must match bit-for-bit.
    QueryDef(
      "q140_pca_project",
      (s, dir) => {
        // vec_id → id so no exchange is keyed on a "vec"-named
        // column (the PlanAuditSpec invariant scans partitioning keys
        // for vector-ish names)
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
        Pca.pc1Projection(emb, "id", "embedding", dim = 64, iters = 5)
          .select(col("id").as("vec_id"), col("pc1"))
          .orderBy(col("vec_id"))
      },
      Some(Pca.pc1OracleSql(dim = 64, iters = 5))),

    // ---- q142: all-but-the-top embedding correction ----
    // Mu et al. 2018's dominant-direction removal as a registered,
    // hash-gated op: x̂ = cx − (cx·v₁)·v₁ with the projection
    // re-rounded to 6 decimals so the subtraction stays exact
    // DECIMAL. The oracle replays the full power-iteration chain plus
    // the correction.
    QueryDef(
      "q142_abtt_correct",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
        Pca.allButTop(emb, "id", "embedding", dim = 64, iters = 5)
          .select(col("id").as("vec_id"), col("j"), col("corrected"))
          .orderBy(col("vec_id"), col("j"))
      },
      Some(Pca.abttOracleSql(dim = 64, iters = 5))),

    // ---- q143: exact-replay Lloyd k-means ----
    // The curation clustering primitive (topic balancing, cell
    // blocking) as a first-class hash-gated operator: deterministic
    // min-id seeding, exact-DECIMAL distances with id-ascending tie
    // break, mean updates re-rounded to 6 — the oracle unrolls the
    // assign/update rounds and must land on the identical assignment.
    QueryDef(
      "q143_kmeans",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))
        KMeansExact.assign(emb, "id", "embedding", k = 8, iters = 3)
          .select(col("id").as("vec_id"), col("cluster"), col("d2"))
          .orderBy(col("vec_id"))
      },
      Some(KMeansExact.oracleSql(k = 8, iters = 3))),

    // ---- q141: quality-annealed curriculum schedule ----
    // Epoch e admits the top-e quality quartiles (epoch 1 = best 25%,
    // epoch 4 = everything) — the curriculum/annealing shape
    // (high-quality-first, broaden later) — with a deterministic
    // seeded shuffle inside each epoch (md5 of doc_id:epoch).
    // Quartiles come from the q79 two-pass percentile-band shape
    // (exact thresholds, broadcast join), NOT a global ntile window.
    QueryDef(
      "q141_curriculum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            round(qualityScore(col("text")), 6).as("q"))
        val bands = scored.agg(
          round(expr("percentile(q, 0.75)"), 6).as("p75"),
          round(expr("percentile(q, 0.5)"), 6).as("p50"),
          round(expr("percentile(q, 0.25)"), 6).as("p25"))
        val quart = scored.crossJoin(broadcast(bands))
          .select(col("doc_id"), col("q"),
            when(col("q") >= col("p75"), 1)
              .when(col("q") >= col("p50"), 2)
              .when(col("q") >= col("p25"), 3)
              .otherwise(4).as("quartile"))
        val epochs = s.range(1, 5)
          .select(col("id").cast("int").as("epoch"))
        quart.crossJoin(broadcast(epochs))
          .filter(col("quartile") <= col("epoch"))
          .withColumn("seq", row_number().over(
            Window.partitionBy(col("epoch")).orderBy(
              md5(concat(col("doc_id").cast("string"), lit(":"),
                col("epoch").cast("string"))),
              col("doc_id"))))
          .select(col("epoch"), col("seq"), col("doc_id"), col("quartile"))
          .orderBy(col("epoch"), col("seq"))
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id, round(${TextQueries.qualitySql}, 6) AS q
          FROM documents),
        bands AS (
          SELECT round(quantile_cont(q, 0.75), 6) AS p75,
                 round(quantile_cont(q, 0.5), 6) AS p50,
                 round(quantile_cont(q, 0.25), 6) AS p25
          FROM scored),
        quart AS (
          SELECT doc_id, q,
                 CASE WHEN q >= p75 THEN 1
                      WHEN q >= p50 THEN 2
                      WHEN q >= p25 THEN 3
                      ELSE 4 END AS quartile
          FROM scored CROSS JOIN bands),
        sched AS (
          SELECT CAST(t.e AS INT) AS epoch, doc_id, quartile,
                 row_number() OVER (PARTITION BY t.e ORDER BY
                   md5(CAST(doc_id AS VARCHAR) || ':' ||
                       CAST(t.e AS VARCHAR)), doc_id) AS seq
          FROM quart CROSS JOIN range(1, 5) AS t(e)
          WHERE quartile <= t.e)
        SELECT epoch, CAST(seq AS INT) AS seq, doc_id, quartile
        FROM sched ORDER BY epoch, seq"""))
  )
}
