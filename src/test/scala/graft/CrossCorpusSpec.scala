package graft

import org.apache.spark.sql.functions._
import graft.operators.{MinHashDedup, Similarity}

/** Round-5 curation operators: cross-corpus near-dup decontamination
  * (q91) and cluster-balanced sampling over the IVF quantizer (q92).
  */
class CrossCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val refDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "machine learning models require large amounts of training data"),
    (3L, "completely unrelated reference text about cooking pasta dinners"))
    .toDF("doc_id", "text")

  private val corpDocs = Seq(
    // near-copy of ref 1 (one word edited) → must be flagged
    (10L, "the quick brown fox jumps over the lazy cat near the river bank"),
    // verbatim copy of ref 2 → flagged with jaccard 1.0
    (11L, "machine learning models require large amounts of training data"),
    // unrelated → survives
    (12L, "spark catalyst optimizes logical plans into physical operators"),
    // id COLLIDING with a reference id but different text → survives
    (1L, "completely different corpus document sharing a reference id"))
    .toDF("doc_id", "text")

  test("near-copies and verbatim copies of reference docs are flagged; " +
      "unrelated and id-colliding docs survive") {
    val pairs = MinHashDedup.crossCorpusNearDupPairs(
      corpDocs, refDocs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (11L, 2L)), pairs.toString)

    val survivors = MinHashDedup.dedupNearAgainstReference(
      corpDocs, refDocs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(12L, 1L), survivors.toString)
  }

  test("cross-corpus flags match the brute-force cross-join Jaccard " +
      "on the real corpus at threshold 0.8") {
    val d = Tables.load(spark, sf0001, "documents")
    val refSrc = Seq("src0", "src1", "src2", "src3")
    val ref = d.filter(col("source").isin(refSrc: _*))
    val corp = d.filter(!col("source").isin(refSrc: _*))
    def shingles(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      MinHashDedup.shingleHashesFromTokens(
        MinHashDedup.tokenHashes(col("text"))).as("sh"))
    val brute = shingles(corp).crossJoin(
        shingles(ref).select(col("doc_id").as("rid"), col("sh").as("sh_r")))
      .withColumn("jac",
        size(array_intersect(col("sh"), col("sh_r"))).cast("double") /
          size(array_union(col("sh"), col("sh_r"))))
      .filter(col("jac") >= 0.8)
      .select(col("doc_id"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashDedup.crossCorpusNearDupPairs(
      corp, ref, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"lsh=$lsh brute=$brute")
  }

  test("cluster-balanced sample equals the window replay, caps every " +
      "cell, and is repartition-invariant") {
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val idx = Similarity.IvfIndex.build(emb, nLists = 8)
    val perCell = 16
    val got = Similarity.clusterBalancedSample(idx, perCell)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("list_id").orderBy(col("h"), col("vec_id"))
    val want = idx.assigned
      .select(col("list_id"), col("neighbor_id").as("vec_id"),
        pmod(col("neighbor_id") * lit(2654435761L), lit(2147483647L)).as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perCell)
      .select(col("list_id").cast("int"), col("rnk").cast("long"),
        col("vec_id"))
    assert(got.collect().toSet ==
      want.toDF(got.columns: _*).collect().toSet)

    val sizes = got.groupBy("list_id").count().select("count")
      .as[Long].collect()
    assert(sizes.forall(_ <= perCell))

    // repartition-invariance: rebuild the index (same seed → same
    // assignment) and sample from a repartitioned postings layout via
    // the saved-index route
    val path = new java.io.File("target/ivf_idx_q92_spec").getAbsolutePath
    idx.save(path)
    val loaded = Similarity.IvfIndex.load(spark, path)
    val reparted = Similarity.clusterBalancedSample(loaded, perCell)
    assert(reparted.collect().toSet == got.collect().toSet)
  }
}
