package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q146's oracle pins bit-exact replay; this spec pins the index's
  * meaning: bounded in [0, 1e6), 0 exactly for a one-token vocabulary,
  * and monotone with concentration on a hand-built corpus. */
class DiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q146 gini is bounded and consistent with its own counts") {
    val rows = SparkEntry
      .queries("q146_diversity_index")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, dct, gini) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(gini >= 0L && gini < 1000000L, s"gini out of range: $r")
      // Σc² >= T²/d (Cauchy–Schwarz) → gini <= 1e6·(1 − 1/d)
      assert(gini <= 1000000L - 1000000L / dct + 1,
        s"gini exceeds the distinct-count bound: $r")
      assert(t >= dct, "token total >= distinct terms")
    }
  }

  test("gini is 0 for a constant stream and higher for diverse text") {
    import spark.implicits._
    val df = Seq(
      ("mono", "a a a a a a"),
      ("poly", "a b c d e f")).toDF("source", "text")
    df.createOrReplaceTempView("tmp_docs")
    // replicate the query's arithmetic directly on the tiny frame
    val out = spark.sql(
      """SELECT source, sum(c) AS t, sum(c * c) AS s2 FROM (
        |  SELECT source, term, count(1) AS c FROM (
        |    SELECT source, explode(filter(split(text, ' '), x -> x <> '')) AS term
        |    FROM tmp_docs) GROUP BY source, term)
        |GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (1000000L * (r.getLong(1) * r.getLong(1) - r.getLong(2)) /
          (r.getLong(1) * r.getLong(1)))).toMap
    assert(out("mono") == 0L)
    assert(out("poly") > 800000L, s"six distinct tokens: ${out("poly")}")
  }
}
