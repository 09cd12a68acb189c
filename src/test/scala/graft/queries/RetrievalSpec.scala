package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The q142 oracle pins bit-exact replay of both stages; this spec pins
  * the cross-encoder stub's contract (the part a real model would
  * replace) and the end-to-end invariants of the two-stage shape. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("crossScore weights early positions and ignores absent terms") {
    // term at position 1 (1-based) scores 1e6; position 2 half; absent 0
    assert(Retrieval.crossScore("a", "a b c") == 1000000L)
    assert(Retrieval.crossScore("b", "a b c") == 500000L)
    assert(Retrieval.crossScore("z", "a b c") == 0L)
    // multi-term queries sum contributions
    assert(Retrieval.crossScore("a c", "a b c") == 1000000L + 333333L)
    // only the FIRST occurrence counts
    assert(Retrieval.crossScore("a", "a b a") == 1000000L)
  }

  test("crossScore raw-split semantics match string_split (empties kept)") {
    // "a  b" splits to [a, '', b]: b sits at position 3, not 2
    assert(Retrieval.crossScore("b", "a  b") == 333333L)
    // an empty doc yields one empty token; no query term matches it
    assert(Retrieval.crossScore("a", "") == 0L)
  }

  test("q142 rerank output is well-formed and deterministic") {
    val run1 = SparkEntry.queries("q142_crossencoder_rerank")(spark, sfDir)
      .collect()
    val run2 = SparkEntry.queries("q142_crossencoder_rerank")(spark, sfDir)
      .collect()
    assert(run1.toSeq == run2.toSeq, "re-run must be identical")
    assert(run1.nonEmpty)
    run1.groupBy(_.getInt(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length),
        s"query $qid ranks must be 1..k")
      assert(byRank.length <= 3)
      // rerank order follows the cross-encoder score, descending
      val scores = byRank.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $qid scores must be non-increasing: ${scores.toList}")
      // every survivor came from the stage-1 candidate pool
      assert(rows.forall(r => r.getInt(4) >= 1 && r.getInt(4) <= 20),
        s"query $qid stage1_rank outside the candidate pool")
    }
  }
}
