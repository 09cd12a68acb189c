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
    // Size EVERYTHING in the fixpoint — sym's own distinct shuffle, the
    // per-round joins, the eager checkpoints — to the measured input
    // edge count (graft.Tuning): dedup-cluster graphs are tiny and were
    // paying full-width (32-partition) cached frames and shuffle
    // fan-out per superstep; a corpus-scale graph gets proportionally
    // many partitions. The one count of the caller's edge frame is the
    // price of sizing (for every repo caller that frame is a filter
    // over an already-pinned artifact).
    val loopParts = graft.Tuning.partsFor(2 * edges.count())
    graft.Tuning.withSuperstepConf(nodes.sparkSession, loopParts,
      allowBroadcast = true) {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("id"), col("id").as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize BOTH loop frames before round 0's plan is made
    // (r14 ADVICE #2): allowBroadcast above hands the broadcast call to
    // Spark's size estimates, and an unmaterialized cache estimates
    // from the caller's plan — which can underestimate and mis-broadcast
    // a large frame. Two node/edge-sized count jobs ground every
    // round's estimate (incl. round 0) in real cached-block sizes.
    sym.count()
    labels.count()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // neighbor-min per node, one shuffle (labels keyed by id join on dst)
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("component")).as("nbr_min"))
      // eager localCheckpoint, not persist: each round's frame embeds
      // the previous round's plan (the join here), so logical-plan size
      // grows per round and the optimizer OOMs near ~15 rounds even on
      // tiny data. The per-round CHANGE FLAG rides the checkpointed
      // frame itself (min-propagation labels only decrease, so
      // changed ⟺ new ≠ old is computable row-local in the same
      // projection) — and the changed-row COUNT rides the checkpoint
      // job itself via Tuning.checkpointWithStats (Dataset.observe),
      // so a round is ONE driver job, not checkpoint + probe.
      val newComp =
        least(col("component"), coalesce(col("nbr_min"), col("component")))
      val (next, st) = graft.Tuning.checkpointWithStats(
        labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(col("id"), newComp.as("component"),
            (newComp =!= col("component")).as("chg")),
        sum(when(col("chg"), 1L).otherwise(0L)).cast("long").as("changed"))
      changed = st("changed") match {
        case null => 0L
        case v    => v.asInstanceOf[Long]
      }
      labels.unpersist()
      // checkpoint RDDs bypass the CacheManager — but ONLY release
      // rounds ≥ 1: their frames are self-contained LogicalRDDs,
      // whereas round 0's frame still carries the CALLER's lineage,
      // and releaseCheckpoint walks every LogicalRDD leaf in it — a
      // caller whose `nodes` derives from its own retained checkpoint
      // (q170's endpoint set over the pinned pair frame) would have
      // that checkpoint's blocks silently dropped from under it
      // (measured: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND at bench)
      if (i > 0) graft.Resources.releaseCheckpoint(labels)
      labels = next
      i += 1
    }
    sym.unpersist()
    // the caller consumes the persisted fixpoint lazily, so release is
    // deferred to the session owner via the retained-frames registry;
    // the change-flag column is internal — project it away (narrow,
    // reads the pinned frame)
    graft.Resources.retain(labels)
    labels.select(col("id"), col("component"))
    }
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * the O(log n)-round variant for graphs whose diameter is NOT small:
    * min-label propagation above needs diameter rounds (a 10^6-node
    * chain = 10^6 joins), star contraction collapses any graph in
    * ~log n alternations by repeatedly re-pointing nodes at their
    * neighborhood minimum.
    *
    * Per round: large-star connects every node's larger neighbors to its
    * neighborhood min (one groupBy + join on the symmetrized list);
    * small-star re-points the smaller neighbors (one groupBy + join on
    * the oriented list). The fixpoint is the star forest (node →
    * component min), unique and partitioning-independent, so the result
    * is deterministic and identical to [[labels]].
    *
    * The convergence probe is SIGNATURE-GATED: a (count, hash-sum)
    * signature per round — computed inside the round's own checkpoint
    * job via Dataset.observe, zero extra jobs — proves
    * non-convergence whenever the signatures differ, and the exact
    * two-sided `except` runs only on a signature match — once, at the
    * true fixpoint. A hash collision merely runs the exact probe early
    * and finds "not converged"; exactness never rests on the hash.
    *
    * @return (labels frame as in [[labels]], rounds used) */
  def labelsStar(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 50): (DataFrame, Int) = {
    // eager localCheckpoint, NOT persist: each round's edge set refers to
    // the previous round's several times (sym, ls, and the convergence
    // except), so the LOGICAL plan grows ~4× per round — by round 8 the
    // optimizer OOMs on the tree even though the data is tiny. Truncating
    // lineage per round keeps plan size O(1); this is the same reason
    // GraphX/GraphFrames checkpoint inside Pregel loops.
    // (count, hash-sum) signature of an edge frame, folded into the
    // SAME job that materializes the frame's checkpoint
    // (Tuning.checkpointWithStats / Dataset.observe) — a round is ONE
    // driver job, not checkpoint + signature probe. Different
    // signatures PROVE the sets differ, so the expensive exact probe
    // below only runs on a signature match (in practice: once, at the
    // true fixpoint; a hash collision merely runs the exact probe
    // early and finds "not converged" — exactness never rests on the
    // hash). The initial count doubles as the isEmpty gate and the
    // partsFor loop sizing, so round 0 is one job too.
    val sigCols = Seq(count(lit(1)).cast("long").as("sig_n"),
      sum(expr("hash(u, v)")).cast("long").as("sig_h"))
    def sigOf(st: Map[String, Any]): (Long, Long) =
      (st("sig_n").asInstanceOf[Long], st("sig_h") match {
        case null => 0L
        case v    => v.asInstanceOf[Long]
      })
    val (cur0, st0) = graft.Tuning.checkpointWithStats(
      edges.select(col("src").as("u"), col("dst").as("v"))
        .filter(col("u") =!= col("v")).distinct(), sigCols: _*)
    var cur = cur0
    var rounds = 0
    var curSig = sigOf(st0)
    var done = curSig._1 == 0L
    val loopParts = graft.Tuning.partsFor(curSig._1)
    // one large-star + small-star alternation as a LAZY plan transform
    def starRound(in: DataFrame): DataFrame = {
      // large-star: for each u, attach strictly-larger neighbors to
      // m = min(N(u) ∪ {u}); every output edge points bigger → smaller
      val sym = in.union(in.select(col("v").as("u"), col("u").as("v")))
      val nMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val ls = sym.join(nMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
        .distinct()
      // small-star: edges now orient bigger → smaller; re-point each
      // node's smaller neighbors (and itself) at their minimum
      val sMin = ls.groupBy(col("u")).agg(min(col("v")).as("mn"))
      ls.join(sMin, Seq("u"))
        .filter(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v"))
        .union(sMin.select(col("u"), col("mn").as("v")))
        .distinct()
    }
    graft.Tuning.withSuperstepConf(edges.sparkSession, loopParts,
      allowBroadcast = true) {
    while (!done && rounds < maxIters) {
      // ONE round per checkpoint. Pairwise fusion (two starRounds per
      // checkpoint) was built and MEASURED here (r14): the fused plan
      // references the checkpoint leaf ~16× and Catalyst's
      // optimize/plan time on it dominated — q65b 3.1 s → 12.3 s at
      // sf0.1 with 10.7 s of driver-side gap. Like q153's 2-hop stride
      // (reverted in r10), per-round materialization is the floor.
      val (next, stN) = graft.Tuning.checkpointWithStats(
        starRound(cur), sigCols: _*)
      val nextSig = sigOf(stN)
      done = nextSig == curSig &&
        next.except(cur).union(cur.except(next)).isEmpty
      graft.Resources.releaseCheckpoint(cur)
      cur = next
      curSig = nextSig
      rounds += 1
    }
    }
    val lbl = nodes
      .join(cur.select(col("u").as("id"), col("v").as("component")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    lbl.count() // materialize before releasing the edge frame
    graft.Resources.releaseCheckpoint(cur)
    (graft.Resources.retain(lbl), rounds)
  }
}
