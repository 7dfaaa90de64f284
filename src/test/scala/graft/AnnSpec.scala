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

  test("brute-force top-k is reproducible run to run") {
    val a = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.bruteForceTopK(emb, emb.filter(col("id") < 5), k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
