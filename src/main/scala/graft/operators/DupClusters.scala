package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution — the dedup endgame: near-dup PAIRS
  * (MinHash/SimHash/embedding operators) induce an undirected graph,
  * and the pipeline keeps ONE representative per connected component.
  *
  * Algorithm: min-label propagation to fixpoint — every node starts
  * labeled with its own id; each round takes the min of its label and
  * its neighbors' labels. Converges in O(component diameter) rounds,
  * and near-dup components are shallow by construction (a duplicate
  * cluster is near-clique shaped: diameter 2-3), so the loop runs 3-5
  * rounds in practice, each round ONE shuffle join keyed on id plus a
  * min-aggregate.
  *
  * Scale notes (the GraphX/production framing): labels only ever
  * DECREASE, so `sum(label)` is a monotone convergence metric — one
  * cheap aggregate per round instead of a change-count join. Lineage
  * is cut every round with `localCheckpoint` (iterative self-joins
  * otherwise stack exponentially); at cluster scale the checkpoint
  * becomes a written table or `checkpoint()` on a reliable store. For
  * adversarial graphs (long chains — not near-dup shaped), swap the
  * iteration for the large-star/small-star decomposition; the
  * interface stays (ids, pairs) → (id, cluster).
  */
object DupClusters {

  /** `ids`: one row per node (`id`); `pairs`: undirected edges
    * (id_a, id_b). Output: (id, cluster) where cluster = min id
    * reachable in the pair graph (singletons map to themselves).
    */
  def components(ids: DataFrame, pairs: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = ids.select(col("id"), col("id").as("cluster"))
      .localCheckpoint()
    // sum over an empty node set is NULL — an emptied-upstream corpus
    // must yield an empty labeling, not a NULL-row crash
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("cluster"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("nc")),
          "dst")
        .groupBy(col("src")).agg(min(col("nc")).as("nm"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nm"), col("cluster")))
            .as("cluster"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum // labels are monotone non-increasing
      prevSum = s
      labels = next
      iter += 1
    }
    labels
  }

  /** Full resolution over a corpus: every doc labeled with its
    * cluster id (min doc_id of its near-dup component) and whether it
    * is the kept representative. Downstream dedup is
    * `filter(is_rep)`.
    */
  def resolve(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"))
    val edges = pairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
    components(ids, edges)
      .select(col("id").as(idCol), col("cluster").as("cluster_id"),
        (col("id") === col("cluster")).as("is_rep"))
  }

  /** Leakage-safe train/test split: the split key is the CLUSTER, not
    * the document, so near-duplicates can never straddle train and
    * test (the classic eval-leakage bug: a test doc's near-copy in the
    * training set). Assignment is a Knuth multiplicative hash of the
    * cluster id — deterministic, cross-engine computable (same
    * arithmetic as the q55 consistent sampler), and stable under
    * re-partitioning and corpus growth (an existing cluster keeps its
    * split when new members join it, as long as its min id is stable).
    * Output: (idCol, cluster_id, split = 'train' | 'test').
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, "trainPct in [0, 100]")
    resolve(docs, idCol, pairs)
      .select(col(idCol), col("cluster_id"),
        when(pmod(pmod(col("cluster_id") * lit(2654435761L),
          lit(2147483647L)), lit(100)) < trainPct, "train")
          .otherwise("test").as("split"))
  }
}
