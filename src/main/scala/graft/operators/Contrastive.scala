package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training triples from the dedup machinery — the
  * (anchor, positive, negative) generator an embedding-model training
  * pipeline runs over a curated corpus: positives are the near-dup
  * pairs the MinHash family already finds (true paraphrase-grade
  * neighbors at the Jaccard threshold), negatives are deterministic
  * pseudo-random corpus draws.
  *
  * Negative selection without a global structure: every doc lands in
  * one of `nShards` hash shards; an anchor draws its negative from
  * ITS OWN shard by minimal `h60(anchor:candidate)` — a pure function
  * of the ids, so the draw is reproducible across engines,
  * re-partitionings and reruns (and SQL-replayable — h60 is the
  * cross-engine md5 hash, not xxhash). The candidate join is keyed on
  * the shard id: each anchor meets |corpus|/nShards candidates, so
  * nShards tunes the exchange (scale nShards with the corpus; the
  * negative stays uniform because shard assignment is itself a hash).
  * A shard holding only the anchor/positive yields no negative and
  * the pair drops — at realistic corpus-to-shard ratios that case is
  * empty, and the oracle replays the same semantics either way.
  */
object Contrastive {

  def triples(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, nShards: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards")
    val pos = MinHashDedup
      .nearDuplicatePairs(docs, idCol, textCol, threshold)
      .select(col("doc_a"), col("doc_b"))
    val cands = docs
      .select(col(idCol).as("negative"))
      .withColumn("_cs",
        Sketches.h60(col("negative").cast("string")) % nShards)
    val anch = pos.withColumn("_cs",
      Sketches.h60(col("doc_a").cast("string")) % nShards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b")
      .orderBy(col("_rk"), col("negative"))
    anch.join(cands, Seq("_cs"))
      .where(col("negative") =!= col("doc_a") &&
        col("negative") =!= col("doc_b"))
      .withColumn("_rk", Sketches.h60(concat(
        col("doc_a").cast("string"), lit(":"),
        col("negative").cast("string"))))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("doc_a").as("anchor"), col("doc_b").as("positive"),
        col("negative"))
  }
}
