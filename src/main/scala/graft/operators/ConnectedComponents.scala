package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by min-label propagation — the
  * transitive-closure step a dedup pipeline needs to turn verified
  * near-dup PAIRS into duplicate CLUSTERS (pairs say a≈b and b≈c; the
  * cluster {a,b,c} requires reachability).
  *
  * Pregel-style loop: every node starts labeled with its own id; each
  * iteration every node takes the min of its label and its neighbors'
  * labels; convergence when no label changes. Iteration count is the
  * graph diameter — for near-dup clusters (small, dense) a handful; the
  * loop is driver-coordinated but each step is one distributed
  * join + groupBy, and the only driver-side read is the one-row
  * convergence count. At extreme diameters the large-star/small-star
  * variant halves rounds; not needed at dedup-cluster shapes.
  *
  * Deterministic: min-label propagation has a unique fixpoint
  * (component = smallest id reachable), independent of partitioning and
  * join order.
  */
object ConnectedComponents {

  /** @param nodes one column `id`
    * @param edges columns `src`, `dst` (undirected; symmetrized here)
    * @return (id, component) — component = min id in the node's
    *         connected component; isolated nodes map to themselves. */
  def labels(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("id"), col("id").as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // neighbor-min per node, one shuffle (labels keyed by id join on dst)
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count() // bounded driver read: one long
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    // the caller consumes the persisted fixpoint lazily, so release is
    // deferred to the session owner via the retained-frames registry
    graft.Resources.retain(labels)
  }
}
