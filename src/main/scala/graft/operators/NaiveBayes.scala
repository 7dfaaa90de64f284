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
/** A fitted NB model small enough to broadcast: per-label priors and
  * smoothing floors plus, per observed token, the per-label score
  * deltas — all as 1e-6-scaled longs so JVM-side scoring reproduces
  * the DECIMAL(18,6) arithmetic of the distributed path EXACTLY
  * (integer adds, no float drift). `labels` is sorted ascending so
  * the first strict maximum reproduces the batch argmax tie-break.
  */
final case class NbModel(
    labels: Array[String],
    priors: Array[Long],
    smooths: Array[Long],
    deltas: scala.collection.Map[String, Array[Long]]) {

  /** (predicted label, score as double) for one document — stateless,
    * so it runs identically in batch and Structured Streaming.
    */
  def predict(text: String): (String, Double) = {
    val toks = text.split(" ", -1)
    val nL = labels.length
    val acc = new Array[Long](nL)
    var i = 0
    while (i < toks.length) {
      val d = deltas.getOrElse(toks(i), null)
      if (d != null) {
        var l = 0
        while (l < nL) { acc(l) += d(l); l += 1 }
      }
      i += 1
    }
    var best = 0
    var bestScore = Long.MinValue
    var l = 0
    while (l < nL) {
      val s = priors(l) + toks.length * smooths(l) + acc(l)
      if (s > bestScore) { best = l; bestScore = s }
      l += 1
    }
    (labels(best), bestScore / 1e6)
  }
}

object NaiveBayes {

  private val LP = DecimalType(18, 6)

  private def scaled(d: java.math.BigDecimal): Long =
    d.setScale(6).unscaledValue().longValueExact()

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

  /** Fit the model into a driver-side `NbModel` for broadcast scoring
    * (the streaming / per-row route). This is a MODEL BOUNDARY
    * collect, budget-gated like the centroid literal route
    * (`Similarity.classifyByCentroid`): it requires the observed
    * (label, token) pair count ≤ `maxEntries` — fastText-scale
    * vocabularies fit comfortably; past the gate, score with the
    * distributed `classify` join instead. Token keys are STRINGS
    * (no hash collisions), values are the same rounded DECIMAL(18,6)
    * log-probs as the distributed path, scaled to exact longs.
    */
  def fitModel(trainDf: DataFrame, textCol: String, labelCol: String,
      maxEntries: Long = 2000000L): NbModel = {
    val tok = trainDf.select(col(labelCol).cast("string").as("label"),
      explode(split(col(textCol), " ")).as("token"))
    val lt = tok.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val nPairs = lt.count()
    require(nPairs <= maxEntries,
      s"NB model boundary: $nPairs observed (label, token) pairs exceed " +
        s"the $maxEntries driver budget — use the distributed classify()")
    val tot = lt.groupBy("label").agg(sum("cnt").as("tot"))
    val v = lt.select("token").distinct().count()
    val nTrain = trainDf.count()

    val consts = trainDf
      .groupBy(col(labelCol).cast("string").as("label"))
      .agg(count(lit(1)).as("nl"))
      .join(tot, "label")
      .select(col("label"),
        round(log(col("nl").cast("double") / lit(nTrain.toDouble)), 6)
          .cast(LP).as("prior"),
        round(log(lit(1.0) / (col("tot") + lit(v)).cast("double")), 6)
          .cast(LP).as("smooth"))
      .collect()
      .sortBy(_.getString(0))
    val labels = consts.map(_.getString(0))
    val idx = labels.zipWithIndex.toMap
    val priors = consts.map(r => scaled(r.getDecimal(1)))
    val smooths = consts.map(r => scaled(r.getDecimal(2)))

    val deltas = new scala.collection.mutable.HashMap[String, Array[Long]]()
    lt.join(broadcast(tot), "label")
      .select(col("token"), col("label"),
        round(log((col("cnt") + lit(1)).cast("double") /
          (col("tot") + lit(v)).cast("double")), 6).cast(LP).as("lp"))
      .collect()
      .foreach { r =>
        val l = idx(r.getString(1))
        val arr = deltas.getOrElseUpdate(r.getString(0),
          new Array[Long](labels.length))
        arr(l) = scaled(r.getDecimal(2)) - smooths(l)
      }
    NbModel(labels, priors, smooths, deltas)
  }

  /** Score with a broadcast `NbModel` as a stateless per-row map —
    * identical output contract to `classify` (equal wherever token
    * xxhash64 is collision-free), and legal in Structured Streaming
    * append mode (no aggregation, no state). The production shape for
    * scoring an incoming crawl against a trained quality model.
    */
  def classifyWithModel(df: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (label, score) = bc.value.predict(text)
        (id, label, score)
      }
      .toDF(idCol, "pred_label", "score")
  }
}
