package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** General d-dimensional skyline (Pareto frontier, maximize every
  * dimension — callers negate a dimension to minimize it): the
  * block-partitioned BNL shape (Börzsönyi et al., ICDE '01) that lifts
  * q158's 2-D prefix-max limit.
  *
  * Two phases, both distributed:
  *
  *  1. LOCAL skyline per partition — a block-nested-loops pass over each
  *     partition keeping a window of locally non-dominated points. Sound
  *     because dominance is transitive and partition-local: a point
  *     dominated by nobody globally is dominated by nobody in its own
  *     partition, so the global skyline is a subset of the union of
  *     local skylines. The window is sorted-insert by descending dim 0,
  *     so each incoming point only scans window entries with dim0 ≥ its
  *     own (a point never dominates an entry with strictly smaller
  *     dim0), the classic presort pruning.
  *  2. GLOBAL filter over the phase-1 candidates — candidates are the
  *     only possible dominators of candidates (any dominator is itself
  *     dominated only by other candidates, and dominance is transitive,
  *     so every dominated candidate has a CANDIDATE dominator). The
  *     candidate set is broadcast and each candidate checked against it:
  *     a deliberate bounded nested-loop join — |C|² comparisons where C
  *     is the candidate union, which is small by construction (each
  *     partition contributes only its frontier; callers with grouping
  *     structure reduce first, as q160 does with its per-(day, priority)
  *     max-price collapse).
  *
  * At 100 TB phase 1 streams each partition once with frontier-sized
  * state, and phase 2's broadcast is frontier-sized — the corpus itself
  * is never joined pairwise and never collected. If a pathological
  * corpus makes the candidate union too large to broadcast
  * (anti-correlated dimensions), an ELIMINATION round runs first:
  * range-repartition the candidates on dim 0 descending and re-run the
  * local BNL — now each partition holds a contiguous dim-0 slice, so
  * the dominated points that phase 1's arbitrary partitioning couldn't
  * see each other get eliminated before anything is broadcast (any
  * partitioning is CORRECT for a local pass; a dim-0-sorted one is
  * maximally effective, the distributed-prefix idea generalized). The
  * round triggers off a one-row control-plane count, never a collect.
  *
  * Input contract: `points` has exactly one column `dims`:
  * array<bigint> of fixed length d ≥ 1; rows with the SAME dims vector
  * are collapsed (ties are equal points — callers re-attach payload rows
  * by joining dims back, so all tied rows ship, the q158 convention).
  */
object Skyline {

  /** a dominates b: ≥ on every dim, > on at least one. */
  private[operators] def dominates(a: Seq[Long], b: Seq[Long]): Boolean = {
    var i = 0
    var strict = false
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) strict = true
      i += 1
    }
    strict
  }

  /** BNL over one partition's points: returns the partition skyline. */
  private def localSkyline(it: Iterator[Seq[Long]]): Iterator[Seq[Long]] = {
    // window ordered by dim0 DESC; an incoming point p can only be
    // dominated by entries with dims(0) >= p(0), and can only dominate
    // entries with dims(0) <= p(0) — one ordered scan decides both
    val window = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    it.foreach { p =>
      var i = 0
      var dominated = false
      while (i < window.length && !dominated && window(i)(0) >= p(0)) {
        dominated = dominates(window(i), p) ||
          window(i) == p // duplicate vector: keep one copy
        i += 1
      }
      if (!dominated) {
        // drop entries p dominates (all at index >= the insert point in
        // dim0 order, but ties on dim0 can sit earlier — scan from the
        // first entry with dims(0) <= p(0))
        var j = window.length - 1
        while (j >= 0 && window(j)(0) <= p(0)) {
          if (dominates(p, window(j))) { window.remove(j); () }
          j -= 1
        }
        // sorted insert by dim0 desc
        var k = window.length
        while (k > 0 && window(k - 1)(0) < p(0)) k -= 1
        window.insert(k, p)
      }
    }
    window.iterator
  }

  /** Candidate-count bound above which an extra elimination round runs
    * before the broadcast filter (≈ a few MB of broadcast state). */
  private[operators] val BroadcastBound = 100000L

  def skyline(points: DataFrame,
      broadcastBound: Long = BroadcastBound): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // eager localCheckpoint: the frontier frame is read by the count,
    // the distinct, AND the broadcast side — without truncation each
    // reference would re-run the whole phase-1 scan (the q153 lineage
    // discipline); Resources-retained so the session release points
    // reclaim it (HygieneSpec contract)
    val local = graft.Resources.retain(points.select(col("dims"))
      .as[Seq[Long]]
      .mapPartitions(localSkyline)
      .toDF("dims")
      .localCheckpoint())
    val cand =
      if (local.count() <= broadcastBound) local
      else graft.Resources.retain(
        local.repartitionByRange(col("dims").getItem(0).desc)
          .as[Seq[Long]].mapPartitions(localSkyline).toDF("dims")
          .localCheckpoint())
    val dominance =
      expr("""forall(zip_with(odims, dims, (x, y) -> x >= y), v -> v)
             |AND exists(zip_with(odims, dims, (x, y) -> x > y), v -> v)"""
        .stripMargin)
    // The broadcast is GATED on the post-elimination count: a strongly
    // anti-correlated corpus whose TRUE frontier exceeds the bound
    // cannot be shrunk by any elimination round, and broadcasting it
    // anyway would OOM the driver. Such a frontier falls back to the
    // bucketed dominance pass below — distributed, equi-joined, no
    // broadcast of the large set.
    if (cand eq local) broadcastFilter(cand, dominance)
    else if (cand.count() <= broadcastBound) broadcastFilter(cand, dominance)
    else {
      // Bucketed dominance: range-partition the candidates on dim 0
      // descending into B buckets (bucket id frozen by the checkpoint —
      // RangePartitioner keeps equal keys together, so a dominator's
      // dim0 ≥ victim's dim0 implies dominator.bucket ≤ victim.bucket).
      // Replicate each potential-dominator row to every bucket at or
      // after its own via a tiny broadcast pair table, then one
      // DISTRIBUTED hash join on the bucket id carries the dominance
      // predicate as a post-join filter — |C|·B/2 rows shuffle, nothing
      // big broadcasts, nothing collects.
      val b = 64
      val bucketed = graft.Resources.retain(
        cand.distinct()
          .repartitionByRange(b, col("dims").getItem(0).desc)
          .withColumn("bkt", spark_partition_id())
          .localCheckpoint())
      val ids = spark.range(b).selectExpr("CAST(id AS INT) AS bl")
      val pairs = ids.join(spark.range(b).selectExpr("CAST(id AS INT) AS br"),
        col("br") <= col("bl"))
      val dominators = bucketed
        .select(col("dims").as("odims"), col("bkt").as("br"))
        .join(broadcast(pairs), "br")
      bucketed
        .join(dominators, col("bkt") === col("bl") && dominance, "left_anti")
        .select(col("dims"))
    }
  }

  /** Frontier-sized phase 2: survivor iff no OTHER candidate dominates
    * it (strict-> in the predicate excludes self; distinct keeps one
    * copy of tied vectors). */
  private def broadcastFilter(cand: DataFrame,
      dominance: org.apache.spark.sql.Column): DataFrame = {
    val other = cand.select(col("dims").as("odims")).distinct()
    cand.distinct()
      .join(broadcast(other), dominance, "left_anti")
  }
}
