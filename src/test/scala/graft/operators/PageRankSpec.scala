package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def star() = {
    import spark.implicits._
    // a <-> b, a <-> c
    Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")).toDF("src", "dst")
  }

  test("3-iteration fixed-point ranks match the hand computation") {
    // r0 = 1e6 each; deg(a)=2, deg(b)=deg(c)=1
    // r1: a = 150000 + 85*(2*10^6) div 100 = 1850000; b = c = 575000
    // r2: a = 1127500; b = c = 936250
    // r3: a = 150000 + (85*1872500) div 100 = 1741625
    //     b = c = 150000 + (85*(1127500 div 2)) div 100 = 629187
    val out = PageRank.run(star(), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1741625L, "b" -> 629187L, "c" -> 629187L))
    graft.Resources.releaseAll()
  }

  test("ranks are partition-invariant and floored at the teleport term") {
    val e = star()
    val base = PageRank.run(e, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val repart = PageRank.run(e.repartition(7), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base == repart)
    assert(base.values.forall(_ >= 150000L),
      "every node keeps at least the teleport mass")
    // floor division only ever LOSES mass: total stays under N * 1e6
    assert(base.values.sum <= 3000000L)
    graft.Resources.releaseAll()
  }

  test("checkpoint cadence never changes ranks") {
    // every-iteration truncation (interval=1) vs the fused default
    // (interval=8 > iters): identical integer sequences — the cadence
    // is purely a lineage/scheduling trade
    val e = star()
    val fused = PageRank.run(e, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truncated = PageRank.run(e, 3, checkpointInterval = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused == truncated)
    graft.Resources.releaseAll()
  }

  test("everyNodeHasInEdge skips the re-attach without changing ranks") {
    // the star graph is bidirectional, so the invariant holds; the
    // fast path must produce the identical integer sequence, and its
    // plan must not contain the nodes-side left join
    val e = star()
    val slow = PageRank.run(e, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fast = PageRank.run(e, 3, everyNodeHasInEdge = true)
    val fastMap =
      fast.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(slow == fastMap)
    val plan = fast.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("leftouter"),
      "fast path must not re-attach via a left join")
    graft.Resources.releaseAll()
  }

  test("weighted with w=1 is bit-identical to unweighted") {
    import spark.implicits._
    val e = star()
    val unw = PageRank.run(e, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (we2, wnodes) =
      PageRank.prepareWeighted(e.withColumn("w", lit(1L)))
    val w = PageRank.runPreparedWeighted(we2, wnodes, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unw == w,
      "w ≡ 1 must reduce to the unweighted integer sequence")
    graft.Resources.releaseAll()
  }

  test("weighted ranks match the hand computation") {
    import spark.implicits._
    // a -> b (w=3), a -> c (w=1), b -> a (w=1), c -> a (w=1)
    // wsum(a)=4, wsum(b)=wsum(c)=1
    // r1: a receives 1e6 + 1e6                  -> 150000 + 85*2e6//100   = 1850000
    //     b receives (1e6*3)//4 = 750000        -> 150000 + 85*750000//100 = 787500
    //     c receives (1e6*1)//4 = 250000        -> 150000 + 85*250000//100 = 362500
    // r2: a receives 787500 + 362500 = 1150000  -> 150000 + 85*1150000//100 = 1127500
    //     b receives (1850000*3)//4 = 1387500   -> 150000 + 85*1387500//100 = 1329375
    //     c receives (1850000*1)//4 = 462500    -> 150000 + 85*462500//100  = 543125
    val e = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val (e2, nodes) = PageRank.prepareWeighted(e)
    val out = PageRank.runPreparedWeighted(e2, nodes, 2,
        everyNodeHasInEdge = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out ==
      Map("a" -> 1127500L, "b" -> 1329375L, "c" -> 543125L))
    graft.Resources.releaseAll()
  }

  test("a node with no in-edges gets exactly the teleport term") {
    import spark.implicits._
    // d -> a only: d never receives, a never gives (deg(a) missing is
    // fine — a has no out-edges, so it contributes nothing)
    val e = Seq(("d", "a")).toDF("src", "dst")
    val out = PageRank.run(e, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("d") == 150000L)
    graft.Resources.releaseAll()
  }
}
