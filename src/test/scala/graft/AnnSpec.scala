package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN acceptance: LSH recall against the exact baseline, and the
  * plan-shape guarantee that no exchange is keyed on embedding
  * payloads (the round-1 scale bug).
  */
class AnnSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf0001, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("LSH recall@5 vs exact top-k averages >= 0.9 (q29 gate)") {
    val rec = Similarity.lshRecallAtK(emb, emb.filter(col("id") < 20), k = 5,
      dim = 64, bitsPerTable = 4, numTables = 20)
    val a = rec.agg(avg(col("recall_at_5"))).head.getDouble(0)
    assert(a >= 0.9, s"avg recall@5 = $a")
  }

  test("LSH plan: no exchange keyed on vector columns") {
    val lsh = Similarity.lshTopK(emb, emb.filter(col("id") < 20), k = 5,
      dim = 64, bitsPerTable = 4, numTables = 20)
    val plan = lsh.queryExecution.executedPlan.toString
    val partitionings = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList
    assert(partitionings.nonEmpty)
    partitionings.foreach(p =>
      assert(!p.contains("vec"), s"vector-keyed exchange: $p"))
  }

  test("IVF: probing every list equals brute force; recall grows with nProbe") {
    val queries = emb.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toString).sorted.toSeq
    val full = Similarity.ivfTopK(emb, queries, k = 5, nLists = 16, nProbe = 16)
      .collect().map(_.toString).sorted.toSeq
    assert(full == exact)

    def recall(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(emb, queries, k = 5, nLists = 16, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(want).size.toDouble / want.size
    }
    val r4 = recall(4)
    val r12 = recall(12)
    assert(r12 >= r4, s"recall not monotone: nProbe=4 → $r4, nProbe=12 → $r12")
    assert(r12 >= 0.5, s"recall@12/16 lists too low: $r12")
  }

  test("brute-force top-k is reproducible run to run") {
    val a = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
