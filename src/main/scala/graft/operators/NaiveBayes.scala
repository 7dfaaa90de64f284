package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * counting classifier a curation pipeline trains when it needs a
  * TEXT-side label model (fastText-style quality/domain/language
  * scoring) rather than the embedding-side centroid route
  * (`Similarity.classifyByCentroid`, q94/q96). The reference has no
  * classifier at all; this is LLM-pipeline battery, not parity
  * (reference scope: `pythonql/Executor.py` has only relational ops).
  *
  * Why NB and not logistic regression: NB training IS aggregation —
  * `P(t|l) = (count(l,t)+1) / (count(l)+V)` with add-one smoothing —
  * so the whole model build is two `groupBy`s and the classifier is a
  * join + sum, every step ANSI-SQL-expressible and therefore
  * hash-gateable against DuckDB, the same exactness bar as the rest of
  * the registry. An iterative optimizer would buy accuracy on this
  * synthetic corpus at the price of an un-replayable gate.
  *
  * Determinism discipline (the q71/q78 rule): `ln` is the one step not
  * pinned by IEEE semantics across engines, so every log-probability
  * is rounded to 6 decimals and cast to DECIMAL(18,6) at the PER-TERM
  * level; all sums are DECIMAL (exact, order-independent under
  * repartitioning) and ties in the argmax break on label ascending.
  *
  * Scale shape: the scoring join never materializes the dense V×L
  * matrix. `score(d,l) = prior(l) + n_d·smooth(l) + Σ_{t∈d} k·Δ(l,t)`
  * where `Δ(l,t) = lp(l,t) − smooth(l)` exists only for OBSERVED
  * (label, token) pairs — the exchange is keyed on an 8-byte token
  * hash and carries one decimal per observed pair, so a 100 TB corpus
  * shuffles its distinct (token, label) counts, not a dense model.
  * Token identity rides `xxhash64` (grouping key only — results equal
  * up to 64-bit collisions, the q71 discipline).
  */
object NaiveBayes {

  private val LP = DecimalType(18, 6)

  /** Tokens as 8-byte hashes: (idCol, labelCol?, h, k) per distinct
    * token per row.
    */
  private def tokenCounts(df: DataFrame, textCol: String, keep: Column*)
      : DataFrame = {
    val base = df.select(keep :+ explode(split(col(textCol), " ")).as("_t"): _*)
    val names = base.columns.dropRight(1).toSeq
    base
      .select(names.map(col) :+ xxhash64(col("_t")).as("h"): _*)
      .groupBy((names :+ "h").map(col): _*)
      .agg(count(lit(1)).as("k"))
  }

  /** The trained model as a TABLE — one row per observed
    * (label, token) pair: `(label, token, cnt, logp)` with
    * `logp = round(ln((cnt+1)/(tot_label+V)), 6)`. Token STRINGS are
    * kept here (the model is the deliverable, q75's vocabulary
    * argument); the scoring path below re-derives hashed counts
    * instead of joining this table so its exchanges stay 8-byte-keyed.
    */
  def train(df: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val tok = df
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("token"))
    val lt = tok.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val tot = lt.groupBy("label").agg(sum("cnt").as("tot"))
    val v = lt.select("token").distinct().count()
    lt.join(broadcast(tot), "label")
      .select(col("label"), col("token"), col("cnt"),
        round(log((col("cnt") + lit(1)).cast("double") /
          (col("tot") + lit(v)).cast("double")), 6).cast(LP).as("logp"))
  }

  /** Classify every row of `df` under the model trained on
    * (`trainDf`, `labelCol`): output `(idCol, pred_label, score)` with
    * `score = prior + Σ_t k_t · lp(label, t)` (unseen tokens at the
    * label's smoothing floor) and argmax ties broken on label asc.
    * Self-classification (`df eq trainDf`) is the registry's use; any
    * corpus sharing the training vocabulary domain works — tokens the
    * model has NEVER seen (in no label) still score via each label's
    * smoothing floor, so nothing fails to classify.
    */
  def classify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      trainDf: DataFrame,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // observed (label, token-hash) counts + per-label totals
    val lt = tokenCounts(trainDf, textCol, col(labelCol).as("label"))
      .withColumnRenamed("k", "cnt")
      .localCheckpoint(eager = false)
    val tot = lt.groupBy("label").agg(sum("cnt").as("tot"))
    val v = lt.select("h").distinct().count()
    val nTrain = trainDf.count()

    // per-label constants: prior ln(n_l/N), smoothing floor
    // ln(1/(tot_l+V)) — tiny (|labels| rows), broadcast everywhere
    val labelConsts = trainDf
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("nl"))
      .join(tot, "label")
      .select(col("label"),
        round(log(col("nl").cast("double") / lit(nTrain.toDouble)), 6)
          .cast(LP).as("prior"),
        round(log(lit(1.0) / (col("tot") + lit(v)).cast("double")), 6)
          .cast(LP).as("smooth"))

    // Δ(l,t) = lp − smooth for observed pairs only
    val delta = lt
      .join(broadcast(tot), "label")
      .join(broadcast(labelConsts.select("label", "smooth")), "label")
      .select(col("h"), col("label"),
        (round(log((col("cnt") + lit(1)).cast("double") /
          (col("tot") + lit(v)).cast("double")), 6).cast(LP) -
          col("smooth")).as("delta"))

    // per-document observed-pair contribution: one token-hash-keyed
    // join, then Σ k·Δ per (doc, label)
    val dt = tokenCounts(df, textCol, col(idCol))
    val obs = dt.join(delta, "h")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("k") * col("delta")).as("obs_sum"))
    val docLen = dt.groupBy(col(idCol)).agg(sum("k").as("n_tok"))

    // score over the full doc × label frame (labels broadcast);
    // docs × |labels| rows, never docs × V
    val scored = docLen
      .crossJoin(broadcast(labelConsts))
      .join(obs, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (col("prior") + col("n_tok") * col("smooth") +
          coalesce(col("obs_sum"), lit(0).cast(LP))).as("score"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("label").as("pred_label"),
        col("score").cast("double").as("score"))
  }
}
