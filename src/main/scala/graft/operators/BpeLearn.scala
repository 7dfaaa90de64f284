package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-TRAINING pass that q75/q76's vocabulary statistics feed:
  * repeatedly find the most frequent adjacent symbol pair across the
  * corpus and fuse it into a new symbol. The learned merge table (in
  * rank order) IS a tokenizer: applying merges 1..k to new text
  * reproduces the training segmentation.
  *
  * Scale shape: BPE operates on the word-TYPE table, not the corpus —
  * the one corpus-sized pass is the word count (map-side-combined
  * groupBy); every iteration after that touches only distinct words
  * (vocabulary-sized, orders of magnitude below corpus scale), kept
  * distributed as a Dataset so a 100 TB corpus's vocabulary never has
  * to fit the driver. Each merge round is one pair-count aggregation
  * (map-side combine, 8-byte-ish keys) plus a TakeOrdered(1) — the
  * per-round driver sync is a single row, the same bounded-sync
  * pattern as DupClusters' label-propagation rounds. Words reduced to
  * one symbol leave the working set (they can never pair again), so
  * rounds get cheaper as merges accumulate. Lineage is truncated per
  * round with localCheckpoint, or the 2·numMerges-deep plan would
  * recompute everything each round.
  *
  * Determinism: pair counts are exact longs and the winner is the
  * total order (count desc, left asc, right asc) — the merge table is
  * identical under repartitioning, retries, and engines, which is what
  * BpeSpec's single-node differential gate checks.
  */
object BpeLearn {

  /** One left-to-right merge pass: fuse every non-overlapping
    * occurrence of (a, b), leftmost first — the classic BPE rule
    * ("aaa" under (a,a) becomes ["aa", "a"]).
    */
  private[operators] def mergePair(s: Seq[String], a: String, b: String)
      : Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn up to `numMerges` merges from the corpus. Returns
    * (rank, left, right, merged, pair_count), rank 1 = first merge.
    * Stops early when no adjacent pair occurs `minPairCount` times.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1 && minPairCount >= 1,
      s"numMerges=$numMerges minPairCount=$minPairCount")
    val spark = df.sparkSession
    import spark.implicits._

    // the one corpus-sized pass: word-type counts. The working set is
    // vocabulary-sized from here on — coalesce so the per-round jobs
    // don't pay 32 near-empty tasks each.
    var seqs: Dataset[(Seq[String], Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
      .filter(_._1.lengthCompare(2) >= 0)
      .coalesce(8)
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var done = false
    var rank = 1L
    while (!done && rank <= numMerges) {
      val best = seqs
        .flatMap { case (s, c) =>
          s.sliding(2).filter(_.lengthCompare(2) == 0)
            .map(p => (p(0), p(1), c))
        }
        .toDF("a", "b", "c")
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case Some((a, b, cnt)) if cnt >= minPairCount =>
          merges += ((rank, a, b, a + b, cnt))
          val next = seqs
            .map { case (s, c) => (mergePair(s, a, b), c) }
            .filter(_._1.lengthCompare(2) >= 0)
            .localCheckpoint()
          seqs.unpersist()
          seqs = next
          rank += 1L
        case _ => done = true
      }
    }
    seqs.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Canonical artifact location for a corpus directory: the merge
    * budget is part of the name (derived, not hand-synced — advisor
    * r5) so changing `numMerges` can never silently reuse an
    * artifact trained with a different budget.
    */
  def artifactPath(dataDir: String, numMerges: Int): String =
    "/tmp/graft_bpe/" + dataDir.replaceAll("[^A-Za-z0-9]", "_") +
      s"_m$numMerges"

  /** Fingerprint of the input data's file listing — see
    * [[graft.sources.ArtifactGuard.dataFingerprint]] (shared with the
    * IVF index guard).
    */
  def dataFingerprint(
      spark: org.apache.spark.sql.SparkSession, path: String): String =
    graft.sources.ArtifactGuard.dataFingerprint(spark, path)

  /** Learn-once artifact (the IvfIndex.buildIfAbsent pattern):
    * tokenizer training is an OFFLINE pass — queries load the saved
    * merge table and only pay encoding. First caller trains and
    * writes; everyone after reads the parquet. When `fingerprint` is
    * provided it is stored beside the parquet and checked on reuse —
    * a stale artifact (data regenerated at the same path) retrains
    * instead of silently serving old merges. The artifact path stays
    * STABLE for a given (corpus dir, numMerges) so the DuckDB oracle
    * can replay the saved merges from a static location.
    */
  def learnMergesIfAbsent(
      spark: org.apache.spark.sql.SparkSession,
      corpus: => DataFrame,
      textCol: String,
      path: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      fingerprint: Option[String] = None): DataFrame = {
    import graft.sources.ArtifactGuard
    if (!ArtifactGuard.fresh(spark, path, s"$path/_SUCCESS", fingerprint)) {
      learnMerges(corpus, textCol, numMerges, minPairCount)
        .coalesce(1).write.mode("overwrite").parquet(path)
      ArtifactGuard.stamp(spark, path, fingerprint)
    }
    spark.read.parquet(path)
  }

  /** Encode one word by replaying the merges in rank order — the same
    * `mergePair` walk training used, so encode(training word) IS the
    * training segmentation by construction, not by proof.
    */
  private[operators] def encodeWord(
      w: String, merges: Seq[(String, String)]): Seq[String] = {
    var s: Seq[String] = w.map(_.toString)
    var i = 0
    while (i < merges.length && s.lengthCompare(2) >= 0) {
      s = mergePair(s, merges(i)._1, merges(i)._2)
      i += 1
    }
    s
  }

  /** Tokenize the corpus with a learned merge table: per document,
    * the whitespace-word count, BPE token count, and the chars/token
    * compression ratio (the number a tokenizer is judged by).
    *
    * Scale shape: the merge table is tokenizer-sized (≤ numMerges
    * rows — tens of thousands at most), collected once and torrent-
    * broadcast; encoding is then completely scan-local — ZERO
    * exchanges at any corpus size. Zipf makes word TYPES per
    * partition a small fraction of word tokens, so each partition
    * encodes a word once and memoizes (cache cleared at `memoCap`
    * entries to bound executor memory against adversarial vocab).
    */
  def encodeTokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: DataFrame,
      memoCap: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tbl: Array[(String, String)] = merges
      .orderBy(col("rank"))
      .select(col("left"), col("right"))
      .as[(String, String)]
      .collect()
    val bc = spark.sparkContext.broadcast(tbl)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms: Seq[(String, String)] = bc.value.toSeq
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split(" ").filter(_.nonEmpty)
          var toks = 0L
          var chars = 0L
          words.foreach { w =>
            chars += w.length
            if (memo.size >= memoCap) memo.clear()
            toks += memo.getOrElseUpdate(w, encodeWord(w, ms).length.toLong)
          }
          (id, words.length.toLong, toks,
            if (toks == 0L) 0.0 else chars.toDouble / toks)
        }
      }
      .toDF(idCol, "n_words", "n_tokens", "chars_per_token")
  }
}
