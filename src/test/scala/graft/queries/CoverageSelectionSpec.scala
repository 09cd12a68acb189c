package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q179 against an independent plain-Scala greedy replay on collected
  * (doc_id, bigram-set) pairs: same (gain DESC, doc_id ASC) tie-break,
  * same early stop on zero achievable gain — rank, pick, gain, and
  * cumulative covered count must all match. Also pins the submodular
  * sanity property the operator exists for: marginal gains never
  * increase down the greedy prefix. */
class CoverageSelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def bigramSets: Map[Long, Set[String]] = {
    import org.apache.spark.sql.functions._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        r.getLong(0) ->
          toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }.toMap
  }

  private def greedy(sets: Map[Long, Set[String]], k: Int)
      : Vector[(Long, Long, Long, Long)] = {
    var covered = Set.empty[String]
    var picked = Vector.empty[(Long, Long, Long, Long)]
    var chosen = Set.empty[Long]
    var stop = false
    while (picked.size < k && !stop) {
      val cand = sets.view
        .filterKeys(id => !chosen.contains(id))
        .map { case (id, ws) => id -> (ws -- covered).size.toLong }
        .filter(_._2 > 0L)
      if (cand.isEmpty) stop = true
      else {
        val (id, g) = cand.minBy { case (i, gain) => (-gain, i) }
        covered ++= sets(id); chosen += id
        picked :+= ((picked.size + 1L, id, g, covered.size.toLong))
      }
    }
    picked
  }

  test("greedy prefix matches a local set replay, gains non-increasing") {
    val sets = bigramSets
    val expected = greedy(sets, 8)
    val got = SparkEntry.queries("q179_coverage_selection")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector.sortBy(_._1)
    assert(got == expected, s"greedy prefixes differ:\n$got\n$expected")
    // submodularity: conditional gains can only fall along the prefix
    val gains = got.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"marginal gains must be non-increasing: $gains")
    assert(got.nonEmpty && got.last._4 <= sets.values.flatten.toSet.size)
  }

  test("pool certificate: a starved pool falls back and stays exact") {
    // CoverPoolM = CoverPoolM2 = 2 makes the lazy-greedy bound fail on
    // nearly every round (two-doc tier, no bulk fetch possible beyond
    // it), forcing the distributed per-round fallback — the output
    // must be bit-identical to the full-pool run and the local replay
    val sets = bigramSets
    val expected = greedy(sets, 8)
    val (savedM, savedM2) = (Mixing.CoverPoolM, Mixing.CoverPoolM2)
    try {
      Mixing.CoverPoolM = 2
      Mixing.CoverPoolM2 = 2
      val got = SparkEntry.queries("q179_coverage_selection")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toVector.sortBy(_._1)
      assert(got == expected,
        s"fallback path diverged from replay:\n$got\n$expected")
      assert(Mixing.lastCoverStats("dist_rounds") > 0L,
        s"a 2-doc tier must exercise the distributed fallback: " +
          s"${Mixing.lastCoverStats}")
    } finally {
      Mixing.CoverPoolM = savedM
      Mixing.CoverPoolM2 = savedM2
    }
  }

  test("pool certificate: a starved tier 1 bulk-fetches tier 2, exact") {
    // CoverPoolM = 2 with a roomy tier 2: the held-set certificate
    // fails immediately, the remaining tier-2 sets arrive in ONE
    // batched fetch, and every pick thereafter is driver-certified —
    // zero distributed rounds, identical output
    val sets = bigramSets
    val expected = greedy(sets, 8)
    val (savedM, savedM2) = (Mixing.CoverPoolM, Mixing.CoverPoolM2)
    try {
      Mixing.CoverPoolM = 2
      Mixing.CoverPoolM2 = 1 << 20
      val got = SparkEntry.queries("q179_coverage_selection")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toVector.sortBy(_._1)
      assert(got == expected,
        s"bulk-fetch path diverged from replay:\n$got\n$expected")
      assert(Mixing.lastCoverStats("bulk_fetches") == 1L &&
        Mixing.lastCoverStats("dist_rounds") == 0L,
        s"a whole-corpus tier 2 must certify every pick after one " +
          s"bulk fetch: ${Mixing.lastCoverStats}")
    } finally {
      Mixing.CoverPoolM = savedM
      Mixing.CoverPoolM2 = savedM2
    }
  }

  test("early stop: a corpus whose bigrams one doc covers yields rank 1 only") {
    // synthetic: every doc's bigrams ⊆ doc 1's — after doc 1 no gain
    val sets = Map(
      1L -> Set("a b", "b c", "c d"),
      2L -> Set("a b"),
      3L -> Set("b c", "c d"))
    val picks = greedy(sets, 8)
    assert(picks == Vector((1L, 1L, 3L, 3L)),
      "zero-gain rounds must stop the selection, not pad it")
  }
}
