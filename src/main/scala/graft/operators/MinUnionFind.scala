package graft.operators

/** Union-find over Long ids with path compression whose component
  * representative is always the component's MINIMUM id (union parents
  * the larger root under the smaller, so roots only ever decrease
  * toward the min). That invariant — label = min reachable id — is
  * load-bearing for the q59/q73 hash gates, so it lives in exactly
  * one place: [[DupClusters.components]]' driver fast path and
  * [[Similarity.semDedup]]'s cell-local pass both use this (reviewer
  * r6 — previously two hand-rolled copies). Ids never touched by a
  * union find() to themselves, i.e. singletons label themselves.
  */
private[graft] final class MinUnionFind {
  private val parent = scala.collection.mutable.Map.empty[Long, Long]

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent(r)
    var c = x
    while (parent.getOrElse(c, c) != r) {
      val n = parent(c); parent(c) = r; c = n
    }
    r
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a)
    val rb = find(b)
    if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
  }
}
