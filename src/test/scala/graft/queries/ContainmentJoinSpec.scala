package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q150's A-prefix × B-full-index candidate chain is an OPTIMIZATION,
  * never a semantic: the result must equal the ground truth computed
  * with no prefix or positional filter (candidates = every DIRECTED
  * pair sharing ANY shingle — complete, since containment ≥ 4/5 > 0
  * requires a shared element). Equality on the fixture proves the
  * no-false-negative property of both the containment prefix bound
  * (earliest shared element within the first s1 − ⌈4s1/5⌉ + 1 slots)
  * and the transferred PPJoin positional bound. */
class ContainmentJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def shingleSets = {
    val sh = TextExprs.shingles3("toks")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        s"""array_distinct(transform($sh,
           | s -> cast(conv(substring(md5(s), 1, 10), 16, 10) as bigint)))"""
          .stripMargin).as("sh"))
  }

  test("containment prefix filter loses no qualifying directed pair") {
    val sets = shingleSets
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("h"))
    val truth = ex.select(col("doc_id").as("d1"), col("h"))
      .join(ex.select(col("doc_id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") =!= col("d2"))
      .select("d1", "d2").distinct()
      .join(sets.withColumnsRenamed(Map("doc_id" -> "d1", "sh" -> "sa")),
        "d1")
      .join(sets.withColumnsRenamed(Map("doc_id" -> "d2", "sh" -> "sb")),
        "d2")
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("s1", size(col("sa")).cast("long"))
      .filter(col("inter") * 5 >= col("s1") * 4)
      .select(col("d1"), col("d2"), col("inter"), col("s1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(truth.nonEmpty, "fixture must contain containment pairs")

    val got = SparkEntry.queries("q150_containment_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == truth)
    graft.Resources.releaseAll()
  }

  test("every emitted pair clears the directed threshold exactly") {
    // (whether STRICTLY one-directional pairs exist is a fixture
    // property — at sf0.001 every planted pair happens to be mutual —
    // so this pins the per-row contract instead: direction-specific
    // denominator, threshold, and score)
    val rows = SparkEntry.queries("q150_containment_join")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (inter, sz) =
        (r.getAs[Long]("inter"), r.getAs[Long]("sz"))
      assert(a != b)
      assert(inter > 0 && inter <= sz && 5 * inter >= 4 * sz)
      assert(r.getAs[Long]("containment_micro") == inter * 1000000L / sz)
    }
  }
}
