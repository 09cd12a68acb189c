package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q199's bucket-cap audit against a DELIBERATELY degenerate bucket:
  * [[Dedup.bucketPairs]] must truncate at the cap, and
  * [[Dedup.capAuditOf]] must count exactly the truncated buckets and
  * dropped pairs — the "no silent caps" readout. Fixture buckets sit
  * far under the production cap, so the degenerate case runs through
  * the parameterized cap at test scale. */
class CapAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** band 0 has a 12-member degenerate bucket "x" and a 3-member
    * bucket "y"; cap 5 must truncate only "x". */
  private def degenerate = {
    import spark.implicits._
    ((1L to 12L).map(id => (0, "x", id)) ++
      Seq(20L, 21L, 22L).map(id => (0, "y", id)))
      .toDF("band", "bkey", "doc_id")
  }

  test("bucketPairs truncates a degenerate bucket at the cap") {
    val pairs = Dedup.bucketPairs(degenerate, cap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // kept: all pairs among the 5 smallest ids of "x" + all of "y"
    val expected =
      (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet ++
        Set((20L, 21L), (20L, 22L), (21L, 22L))
    assert(pairs == expected,
      s"extra=${pairs -- expected} missing=${expected -- pairs}")
    // uncapped: the full 66 + 3
    assert(Dedup.bucketPairs(degenerate).count() == 69)
  }

  test("bucket cap bounds the aggregation BUFFER, not just emission") {
    // The rank filter must sit BELOW the collect_list aggregate so a
    // degenerate bucket can never materialize an unbounded array in one
    // reduce buffer; Catalyst further rewrites `row_number() <= cap`
    // into WindowGroupLimit with a Partial mode BELOW the shuffle, so
    // past-cap members are dropped map-side and never shuffled.
    val plan = Dedup.bucketPairs(degenerate, cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit rank-filter rewrite in:\n$plan")
    assert(plan.contains("Partial"), // map-side partial group-limit
      s"expected a Partial (pre-shuffle) WindowGroupLimit in:\n$plan")
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    val wglIdx = plan.lastIndexOf("WindowGroupLimit")
    assert(aggIdx >= 0 && wglIdx > aggIdx,
      "the group-limit must appear below (after, in tree print order) " +
        s"the collect_list aggregate:\n$plan")
    // and a bucket wider than the cap still yields exactly capped pairs
    val wide = {
      import spark.implicits._
      (1L to 50L).map(id => (0, "z", id)).toDF("band", "bkey", "doc_id")
    }
    assert(Dedup.bucketPairs(wide, cap = 10).count() == 45L) // C(10,2)
  }

  test("capAuditOf counts capped buckets and dropped pairs exactly") {
    val row = Dedup.capAuditOf(degenerate, "t", cap = 5).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getString(0) == "t")
    assert(r.getLong(1) == 0L) // band
    assert(r.getLong(2) == 2L, "n_buckets")
    assert(r.getLong(3) == 12L, "max_bucket")
    assert(r.getLong(4) == 1L, "capped_buckets: only the 12-member one")
    assert(r.getLong(5) == 13L, "pairs_kept: C(5,2) + C(3,2)")
    assert(r.getLong(6) == 56L, "dropped_pairs: C(12,2) - C(5,2)")
  }

  test("q199 on the fixture: both spaces, all bands, zero capped") {
    val rows = SparkEntry.queries("q199_lsh_cap_audit")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSet == Set("minhash", "simhash"))
    // every emitted band row is under the production cap here
    rows.foreach { r =>
      assert(r.getLong(4) == 0L, s"fixture bucket over cap: $r")
      assert(r.getLong(6) == 0L, s"fixture dropped pairs: $r")
      assert(r.getLong(5) > 0L, "bands must emit candidate pairs")
      assert(r.getLong(3) <= 10000L)
    }
    // minhash emits 4 bands on this fixture (near-dups exist per band)
    assert(rows.count(_.getString(0) == "minhash") == 4)
  }
}
