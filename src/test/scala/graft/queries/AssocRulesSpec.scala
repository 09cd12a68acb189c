package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q152 rule-algebra invariants (the oracle pins the values): support
  * symmetry, the s_pair ≤ min(s_ante, s_cons) containment, confidence
  * within (0, 1e6], and the lift identity under its documented nested
  * truncation. */
class AssocRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("rule algebra holds on every emitted rule") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q152_assoc_rules")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "fixture must contain pairs with support >= 2")
    val nBaskets = graft.Tables.raw(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 35)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (ante, cons) = (r.getAs[Long]("ante"), r.getAs[Long]("cons"))
      val (sp, sa, sc) = (r.getAs[Long]("s_pair"),
        r.getAs[Long]("s_ante"), r.getAs[Long]("s_cons"))
      val (conf, lift) = (r.getAs[Long]("confidence_micro"),
        r.getAs[Long]("lift_micro"))
      assert(ante != cons)
      assert(sp >= 2 && sp <= math.min(sa, sc),
        s"pair support $sp must sit within item supports ($sa, $sc)")
      assert(conf == 1000000L * sp / sa)
      assert(conf > 0 && conf <= 1000000L)
      // replay the documented nested truncation exactly: lift is
      // computed ONCE on the canonical x<y orientation (x = smaller
      // item id), so the replay divides by s_x first regardless of
      // which direction this rule points
      val (sx, sy) = if (ante < cons) (sa, sc) else (sc, sa)
      assert(lift == ((1000000L * sp / sx) * nBaskets) / sy,
        s"lift $lift must follow the canonical nested-division order")
    }
    // directionality: both orientations of a frequent pair carry the
    // same s_pair AND the same lift (both are symmetric; only
    // confidence is directional)
    val bySupport = rows.groupBy(r =>
      (math.min(r.getAs[Long]("ante"), r.getAs[Long]("cons")),
        math.max(r.getAs[Long]("ante"), r.getAs[Long]("cons"))))
    bySupport.values.filter(_.length == 2).foreach { pair =>
      assert(pair(0).getAs[Long]("s_pair") == pair(1).getAs[Long]("s_pair"))
      assert(pair(0).getAs[Long]("lift_micro") ==
        pair(1).getAs[Long]("lift_micro"),
        "lift must be orientation-invariant")
    }
  }
}
