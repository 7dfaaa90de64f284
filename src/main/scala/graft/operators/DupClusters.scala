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
  * becomes a written table or `checkpoint()` on a reliable store.
  *
  * Adversarial graphs (long chains/lattices — NOT near-dup shaped):
  * propagation moves the min one hop per round, so a diameter above
  * `maxIter` would exhaust it. That case is DETECTED (the monotone
  * sum not having converged) and loudly delegated to
  * [[starComponents]] — the alternating large-star/small-star
  * decomposition (Kiveris et al. 2014, "Connected Components in
  * MapReduce and Beyond"), which contracts any graph in O(log²)
  * rounds regardless of diameter. Same interface, same output
  * contract, spec-gated equal on random graphs and a diameter-59
  * chain.
  */
object DupClusters {

  /** `ids`: one row per node (`id`); `pairs`: undirected edges
    * (id_a, id_b). Output: (id, cluster) where cluster = min id
    * reachable in the pair graph (singletons map to themselves).
    *
    * BUDGET-GATED driver resolution (r6, the BloomDedup pattern): the
    * edge set is measured FIRST — it is already materialized for the
    * loop's benefit, so the count is a free cache read — and below
    * `driverEdgeBudget` the whole graph resolves with one driver
    * union-find and a broadcast label join: zero iterative rounds,
    * zero per-round checkpoints. This is a bounded MODEL boundary,
    * not a data collect: verified near-dup edges are a vanishing
    * fraction of any real corpus (every edge means two nearly
    * identical documents survived verification), and the label map is
    * smaller still (touched nodes only). Above the budget the
    * propagation loop runs unchanged, with the large-star/small-star
    * fallback for diameters past `maxIter`. All three routes are
    * spec-gated equal on random graphs.
    */
  def components(ids: DataFrame, pairs: DataFrame,
      maxIter: Int = 25, driverEdgeBudget: Long = 500000L): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    if (edges.count() <= driverEdgeBudget) {
      val es = edges.as[(Long, Long)].collect()
      val uf = new MinUnionFind
      es.foreach { case (a, b) => uf.union(a, b) }
      // touched nodes → their component min; everyone else is a
      // singleton and labels itself through the coalesce
      val labels = es.iterator.map(_._1).toSet[Long]
        .map(n => (n, uf.find(n))).toSeq.toDF("id", "_cluster")
      return ids.select(col("id"))
        .join(broadcast(labels), Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("_cluster"), col("id")).as("cluster"))
    }
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
    if (converged) labels
    else {
      // diameter exceeded the propagation budget: not silent — log and
      // hand the ORIGINAL edges to the diameter-independent algorithm
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"[graft] min-label propagation unconverged after " +
          s"$maxIter rounds (component diameter > budget); " +
          s"delegating to large-star/small-star")
      starComponents(ids, pairs)
    }
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al. 2014): each operation is one groupBy over the
    * edge relation — large-star hangs every node's larger neighbors
    * under its neighborhood minimum, small-star re-hangs the smaller
    * ones — and the edge set contracts to per-component stars rooted
    * at the component minimum in O(log²) rounds for ANY diameter.
    * Every emitted edge is oriented (larger, smaller), so the edge
    * set has a canonical form and the fixpoint probe is one
    * count+hash aggregate per round. The near-dup default remains
    * [[components]]' propagation (cheaper on the shallow graphs dedup
    * actually produces); this is the adversarial-shape path.
    */
  private[graft] def starComponents(ids: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    def bothDir(e: DataFrame): DataFrame =
      e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val nbr = bothDir(e)
      val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nbr.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val nbr = bothDir(e)
      val smaller = nbr.filter(col("v") < col("u"))
      val mins = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
      smaller.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }
    // canonical signature of the (larger, smaller)-oriented edge set;
    // bit_xor can't overflow (ANSI) and the edge set is distinct, so
    // XOR-cancellation of duplicates can't occur
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
    var edges = pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .distinct()
      .localCheckpoint()
    var sig = signature(edges)
    var iter = 0
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val s = signature(next)
      // the (count, xor-of-hashes) signature is a 64-bit probe — a
      // collision between two DIFFERENT consecutive edge sets would
      // falsely converge and silently emit a wrong partial labeling
      // (advisor r6). Paid once at the fixpoint, the exact distinct
      // set-difference confirm makes the probe sound: counts already
      // match, so one-sided emptiness proves set equality.
      converged = s == sig &&
        next.exceptAll(edges).isEmpty
      sig = s
      edges = next
      iter += 1
    }
    require(converged || iter < maxIter,
      s"large-star/small-star failed to converge in $maxIter rounds — " +
        "this should be impossible (O(log^2 n) bound); investigate the " +
        "edge relation instead of trusting a partial labeling")
    // at the fixpoint every non-root node's sole neighbor is its
    // component root; the min-aggregate is belt-and-braces
    val lbl = edges.groupBy(col("u")).agg(min(col("v")).as("cluster"))
      .select(col("u").as("id"), col("cluster"))
    ids.select(col("id"))
      .join(lbl, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
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

  /** Quality-aware survivor selection: within each near-dup cluster,
    * keep the member with the highest `scoreCol` (ties → lowest id)
    * instead of [[resolve]]'s keep-first policy — the canonical-
    * document choice a curation pipeline actually wants (the best
    * copy survives, not the one that happened to be crawled first).
    * `docs` must carry `idCol` and `scoreCol`. Output:
    * (idCol, cluster_id, scoreCol, is_kept).
    *
    * Scale shape: [[resolve]]'s alternating-star rounds plus one
    * id-keyed score join and a per-cluster `row_number` window —
    * cluster sizes bound the window partitions, so no frame is ever
    * corpus-wide.
    */
  def bestRepresentative(docs: DataFrame, idCol: String,
      pairs: DataFrame, scoreCol: String,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    resolve(docs, idCol, pairs, aCol, bCol)
      .join(docs.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col(scoreCol).desc, col(idCol))))
      .select(col(idCol), col("cluster_id"), col(scoreCol),
        (col("_rn") === 1).as("is_kept"))
  }
}
