package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q132's prefix filter is an OPTIMIZATION, never a semantic: the result
  * must equal the ground truth computed with NO prefix filter (candidates
  * = every pair sharing ANY shingle — complete by definition, since a
  * pair with Jaccard ≥ 0.5 > 0 shares at least one element). Equality on
  * the fixture proves the no-false-negative property the operator's
  * derivation claims; the oracle then independently pins the values.
  */
class ExactJaccardJoinSpec extends AnyFunSuite {
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

  test("prefix filtering loses no qualifying pair (vs full overlap join)") {
    val sets = shingleSets
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("h"))
    val truth = ex.select(col("doc_id").as("d1"), col("h"))
      .join(ex.select(col("doc_id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
      .join(sets.withColumnsRenamed(Map("doc_id" -> "d1", "sh" -> "sa")), "d1")
      .join(sets.withColumnsRenamed(Map("doc_id" -> "d2", "sh" -> "sb")), "d2")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("uni",
        size(col("sa")) + size(col("sb")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("d1"), col("d2"), col("inter").cast("long"),
        col("uni").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dup pairs")

    val got = SparkEntry.queries("q132_exact_jaccard_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == truth)
    graft.Resources.releaseAll()
  }

  test("every emitted pair clears the threshold with exact set math") {
    val rows = SparkEntry.queries("q132_exact_jaccard_join")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (inter, uni) = (r.getAs[Long]("inter"), r.getAs[Long]("uni"))
      assert(inter > 0 && uni >= inter && 2 * inter >= uni,
        s"pair (${r.get(0)}, ${r.get(1)}): inter=$inter uni=$uni")
    }
    graft.Resources.releaseAll()
  }
}
