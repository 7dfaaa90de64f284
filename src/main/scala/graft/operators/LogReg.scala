package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}

/** Binary logistic-regression quality classifier over feature-hashed
  * bag-of-words — the fastText-style trained filter production corpus
  * pipelines run (the GPT-3/LLaMA-class "looks like reference text?"
  * gate), kept deliberately small and EXACTLY replayable:
  *
  *  - features: md5 token hashing into `dim` buckets (md5, not
  *    xxhash64, because the oracle must reproduce the bucketing
  *    bit-for-bit and md5 is the hash both engines share — the q74
  *    argument), x_f = count_f / n_tokens as a 6-decimal DECIMAL,
  *    plus a bias feature (index -1, value 1);
  *  - training: `rounds` full-batch gradient-descent steps from zero
  *    weights at fixed learning rate. Margins and gradients are EXACT
  *    DECIMAL sums (order-free — no per-term rounding needed at all);
  *    the only two non-exact steps per round are the sigmoid (exp is
  *    the one non-IEEE-pinned function — its output is rounded to 6
  *    decimals before entering any sum, the q71 discipline) and the
  *    lr·g/n step division (IEEE-pinned double division, rounded to 6
  *    back into DECIMAL). Weights therefore stay 6-decimal fixed
  *    points that any engine reproduces bit-for-bit — the DuckDB
  *    oracle replays training as `rounds` unrolled CTE stages and
  *    lands on the identical weight table.
  *
  * Scale shape: ONE corpus pass builds the exploded
  * (doc, feat, x, y) table, localCheckpoint-ed because every GD round
  * re-reads it; each round is two map-side-combined aggregations
  * (margin per doc → gradient per feature) whose exchange carries
  * (id, feat:int, decimal) and never text. Between rounds the weights
  * are dim+1 decimals on the driver — the same bounded-model-boundary
  * contract as the NB model and the BPE merge table; driver work is
  * O(rounds · dim), independent of corpus size. Scoring broadcasts
  * the weight table against the same exploded features — one scan,
  * one keyed per-doc sum.
  */
object LogReg {

  /** Exploded fixed-point feature table:
    * (idCol, feat:int, y:int, x:decimal(18,6)), bias row (feat=-1,
    * x=1) included for every document so empty docs still score.
    */
  def features(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, dim: Int): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim")
    val tf = df
      .select(col(idCol), labelCol.cast("int").as("y"),
        split(col(textCol), " ").as("tk"))
      .select(col(idCol), col("y"), size(col("tk")).as("n"),
        explode(col("tk")).as("t"))
      .groupBy(col(idCol), col("y"), col("n"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
          % dim).cast("int").as("feat"))
      .agg(count(lit(1)).as("c"))
      .select(col(idCol), col("feat"), col("y"),
        round(col("c").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(18,6)").as("x"))
    val bias = df.select(col(idCol), lit(-1).as("feat"),
      labelCol.cast("int").as("y"),
      lit(1).cast("decimal(18,6)").as("x"))
    tf.unionByName(bias)
  }

  private def weightsDf(spark: SparkSession, dim: Int,
      w: Map[Int, java.math.BigDecimal]): DataFrame = {
    val rows = ((-1) until dim).map(f =>
      Row(f, new java.math.BigDecimal(
        w(f).unscaledValue, w(f).scale)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("feat", IntegerType, nullable = false),
        StructField("w", DecimalType(18, 6), nullable = false))))
  }

  /** Per-document 6-decimal sigmoid of the margin under weights `wDf`
    * (feat, w:decimal(18,6)): (idCol, y, sig:decimal(18,6)). The
    * margin Σ w·x is an exact DECIMAL sum; only the sigmoid output is
    * rounded.
    */
  private def sigmoids(feats: DataFrame, idCol: String,
      wDf: DataFrame): DataFrame =
    feats
      .join(broadcast(wDf), Seq("feat"))
      .groupBy(col(idCol), col("y"))
      .agg(sum(col("w") * col("x")).as("z"))
      .select(col(idCol), col("y"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 6)
          .cast("decimal(18,6)").as("sig"))

  /** `rounds` GD steps; returns (feat, weight:decimal(18,6)) with
    * dim+1 rows. `feats` must be the [[features]] output and should
    * be localCheckpoint-ed by the caller (every round scans it).
    */
  def train(feats: DataFrame, idCol: String, dim: Int, rounds: Int,
      lr: Double): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds")
    val spark = feats.sparkSession
    val nDocs = feats.filter(col("feat") === -1).count()
    require(nDocs > 0, "empty corpus")
    val zero = java.math.BigDecimal.ZERO.setScale(6)
    var w: Map[Int, java.math.BigDecimal] =
      ((-1) until dim).map(_ -> zero).toMap
    for (_ <- 1 to rounds) {
      val wDf = weightsDf(spark, dim, w)
      val sig = sigmoids(feats, idCol, wDf)
      // gradient: exact DECIMAL sum of (σ − y)·x per feature, then
      // ONE pinned double division and one 6-decimal round for the
      // step — computed IN catalyst so round() parity with the
      // oracle is the same contract every other query relies on
      val next = wDf
        .join(
          feats.join(sig.select(col(idCol),
              (col("sig") - col("y").cast("decimal(18,6)")).as("e")),
            Seq(idCol))
            .groupBy(col("feat"))
            .agg(sum(col("e") * col("x")).as("g")),
          Seq("feat"), "left")
        .select(col("feat"),
          (col("w") - round(lit(lr) * coalesce(col("g"), lit(0))
            .cast("double") / lit(nDocs).cast("double"), 6)
            .cast("decimal(18,6)")).cast("decimal(18,6)").as("w"))
        .collect()
      w = next.map(r => r.getInt(0) -> r.getDecimal(1).setScale(6)).toMap
    }
    weightsDf(spark, dim, w).withColumnRenamed("w", "weight")
  }

  /** Score every document: (idCol, y, p:double, pred:int) with p the
    * 6-decimal sigmoid and pred the 0.5-thresholded class.
    */
  def score(feats: DataFrame, idCol: String, weights: DataFrame): DataFrame =
    sigmoids(feats, idCol,
      weights.select(col("feat"), col("weight").as("w")))
      .select(col(idCol), col("y"), col("sig").cast("double").as("p"))
      .withColumn("pred", (col("p") >= 0.5).cast("int"))

  /** Standing (streaming) scorer: the trained dim+1 weight table is
    * a broadcast-sized model by construction, so arriving documents
    * score completely scan-locally (stateless mapPartitions — the
    * standing-LM shape): same function on a static frame and an
    * append-mode ingest stream. Replicates the batch arithmetic
    * EXACTLY: md5 bucketing, x = round(c/n, 6) half-up, exact
    * BigDecimal margin, one sigmoid rounded to 6
    * (differential-gated in StreamingSpec). Output: (idCol, p, pred).
    */
  def scoreFitted(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w: Map[Int, java.math.BigDecimal] = weights
      .select(col("feat"), col("weight").cast("decimal(18,6)"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val bc = spark.sparkContext.broadcast(w)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val wm = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val tk = text.split(" ", -1)
          val counts = new scala.collection.mutable.HashMap[Int, Long]()
          tk.foreach { t =>
            md.reset()
            val hex = md.digest(t.getBytes("UTF-8"))
              .take(4).map(b => f"$b%02x").mkString
            val f = (java.lang.Long.parseLong(hex, 16) % dim).toInt
            counts.update(f, counts.getOrElse(f, 0L) + 1L)
          }
          var z = wm(-1) // bias (x = 1)
          counts.foreach { case (f, c) =>
            val x = java.math.BigDecimal
              .valueOf(c.toDouble / tk.length.toDouble)
              .setScale(6, java.math.RoundingMode.HALF_UP)
            z = z.add(wm(f).multiply(x))
          }
          val p = java.math.BigDecimal
            .valueOf(1.0 / (1.0 + math.exp(-z.doubleValue)))
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .doubleValue
          (id, p, if (p >= 0.5) 1 else 0)
        }
      }
      .toDF(idCol, "p", "pred")
  }

  /** DuckDB WITH-clause body replaying [[features]] + [[train]]:
    * defines CTEs `feats`, `nd`, and `w0..w<rounds>` (the final
    * weight table is `w<rounds>`), for `labelSql` ∈ {0,1} over
    * `documents`. Kept HERE so the arithmetic and its replay live
    * side by side (the q119/Pca pattern).
    */
  /** The feature prologue alone (CTEs `tk`..`feats`, `nd`) — shared
    * by the unrolled training replay and the artifact-based scoring
    * replay below.
    */
  def featureOracleCtes(labelSql: String, dim: Int): String =
    s"""tk AS (
        SELECT doc_id, $labelSql AS y, string_split(text, ' ') AS tk
        FROM documents),
      tf AS (SELECT doc_id, y, len(tk) AS n, unnest(tk) AS t FROM tk),
      hf AS (
        SELECT doc_id, y, n,
               CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % $dim AS INT)
                 AS feat,
               count(*) AS c
        FROM tf GROUP BY ALL),
      feats AS (
        SELECT doc_id, feat, y,
               CAST(round(c / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
        FROM hf
        UNION ALL
        SELECT doc_id, CAST(-1 AS INT), $labelSql, CAST(1 AS DECIMAL(18,6))
        FROM documents),
      nd AS (SELECT count(*) AS n FROM documents)"""

  /** CTE body replaying [[score]] from the SAVED weight artifact (the
    * train-once-reuse contract): `wart` scans the parquet the q137
    * build wrote — whose content the unrolled-CTE train gate verifies
    * — so dependent queries pay scoring cost only, on both engines.
    * Defines `feats`, `mz`, `scored` with the same shapes as
    * [[scoreOracleCtes]].
    */
  def scoreArtifactCtes(labelSql: String, dim: Int,
      weightsDir: String): String =
    s"""${featureOracleCtes(labelSql, dim)},
      wart AS (
        SELECT feat, CAST(weight AS DECIMAL(18,6)) AS w
        FROM '$weightsDir/*.parquet'),
      mz AS (
        SELECT doc_id, y, sum(w * x) AS z
        FROM feats JOIN wart USING (feat) GROUP BY 1, 2),
      scored AS (
        SELECT doc_id, y,
               CAST(CAST(round(1.0 / (1.0 + exp(-CAST(z AS DOUBLE))), 6)
                 AS DECIMAL(18,6)) AS DOUBLE) AS p
        FROM mz)"""

  def trainOracleCtes(labelSql: String, dim: Int, rounds: Int,
      lr: String): String = {
    val steps = (1 to rounds).map { r =>
      s"""m$r AS (
        SELECT doc_id, y, sum(w * x) AS z
        FROM feats JOIN w${r - 1} USING (feat) GROUP BY 1, 2),
      s$r AS (
        SELECT doc_id, y,
               CAST(round(1.0 / (1.0 + exp(-CAST(z AS DOUBLE))), 6)
                 AS DECIMAL(18,6)) AS sig
        FROM m$r),
      g$r AS (
        SELECT feat, sum((s.sig - s.y) * f.x) AS g
        FROM feats f JOIN s$r s USING (doc_id) GROUP BY 1),
      w$r AS (
        SELECT w.feat,
               CAST(w.w - CAST(round($lr * CAST(coalesce(g.g, 0) AS DOUBLE)
                 / (SELECT CAST(n AS DOUBLE) FROM nd), 6)
                 AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS w
        FROM w${r - 1} w LEFT JOIN g$r g USING (feat))"""
    }.mkString(",\n      ")
    s"""${featureOracleCtes(labelSql, dim)},
      w0 AS (
        SELECT CAST(t.f AS INT) AS feat, CAST(0 AS DECIMAL(18,6)) AS w
        FROM range(-1, $dim) AS t(f)),
      $steps"""
  }

  /** CTE body extending [[trainOracleCtes]] with a `scored` table:
    * (doc_id, y, p, pred) under the final weights.
    */
  def scoreOracleCtes(labelSql: String, dim: Int, rounds: Int,
      lr: String): String =
    s"""${trainOracleCtes(labelSql, dim, rounds, lr)},
      mz AS (
        SELECT doc_id, y, sum(w * x) AS z
        FROM feats JOIN w$rounds USING (feat) GROUP BY 1, 2),
      scored AS (
        SELECT doc_id, y,
               CAST(CAST(round(1.0 / (1.0 + exp(-CAST(z AS DOUBLE))), 6)
                 AS DECIMAL(18,6)) AS DOUBLE) AS p
        FROM mz)"""

  /** Exact tie-aware ROC AUC of `scoreCol` against binary `yCol` —
    * the Mann–Whitney U form over average ranks:
    * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N). Ties share their
    * average rank, which IS the exact ROC trapezoid. One row out:
    * (n_pos, n_neg, auc).
    *
    * Scale shape: ranks are computed per DISTINCT score from
    * cumulative counts — scores are 6-decimal fixed points, so the
    * groupBy is EXACT, not a binning approximation, and the only
    * ordered step is a window over the score-vocabulary table
    * (≤ 10⁶ distinct values by construction), never over the corpus.
    */
  def auc(scored: DataFrame, scoreCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"), sum(col(yCol)).as("cp"))
    // integer rank algebra: avgrank = (2·cum − c + 1)/2, so
    // 2·rsum = Σ (2cum − c + 1)·cp is EXACT in DECIMAL(38,0) — the
    // whole statistic reduces to one pinned double division at the
    // end (no order-dependent double sum anywhere)
    val ranked = byScore
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("s"))))
    ranked.agg(
        sum(col("cp")).cast("decimal(38,0)").as("np"),
        (sum(col("c")) - sum(col("cp"))).cast("decimal(38,0)").as("nn"),
        sum((lit(2) * col("cum") - col("c") + lit(1)).cast("decimal(38,0)")
          * col("cp").cast("decimal(38,0)")).as("rsum2"))
      .select(col("np").cast("bigint").as("n_pos"),
        col("nn").cast("bigint").as("n_neg"),
        // single-class guard (r8 ADVICE): AUC is undefined when either
        // class is absent — emit an explicit null instead of a silent
        // NaN from the 0 denominator (DuckDB mirrors null here too)
        when(col("np") > 0 && col("nn") > 0,
          round((col("rsum2") - col("np") * (col("np") + lit(1)))
              .cast("double")
            / (lit(2) * col("np") * col("nn")).cast("double"), 6))
          .otherwise(lit(null).cast("double"))
          .as("auc"))
  }
}
