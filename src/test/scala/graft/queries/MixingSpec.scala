package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Water-filling invariants for q165 (budget respected, max-min
  * fairness, exact integer replay) and doc-level replay of q168's
  * deterministic sampling rule. */
class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tokenCounts(): Map[String, (Long, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("tk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  /** Local exact water-fill, independent of the SQL formulation. */
  private def waterFill(tokens: Map[String, Long], b: Long)
      : Map[String, Long] = {
    val sorted = tokens.toSeq.sortBy { case (s, t) => (t, s) }
    val n = sorted.length
    val prefix = sorted.scanLeft(0L)(_ + _._2).tail
    val kstar = (1 to n).filter(k =>
      prefix(k - 1) + (n - k) * sorted(k - 1)._2 <= b)
      .lastOption.getOrElse(0)
    val theta = if (kstar < n)
      (b - (if (kstar == 0) 0L else prefix(kstar - 1))) / (n - kstar)
    else Long.MaxValue
    sorted.zipWithIndex.map { case ((s, t), i) =>
      s -> (if (i < kstar) t else math.min(t, theta))
    }.toMap
  }

  test("q165 equals a local exact water-fill and respects the budget") {
    val counts = tokenCounts()
    val total = counts.values.map(_._2).sum
    val b = total * 9 / 10
    val expected = waterFill(counts.map { case (s, (_, t)) => s -> t }, b)
    val got = SparkEntry.queries("q165_mixture_allocation")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.map(_._1).toSet == counts.keySet)
    got.foreach { case (s, nd, tk, alloc, ppm, full) =>
      assert((nd, tk) == counts(s))
      assert(alloc == expected(s), s"source $s")
      assert(alloc <= tk, "never allocate more than a source has")
      assert(ppm == alloc * 1000000L / tk)
      if (full) assert(alloc == tk)
    }
    val allocSum = got.map(_._4).sum
    val nCapped = got.count(a => !a._6)
    assert(allocSum <= b, "budget is a hard ceiling")
    // integer floor loses < 1 token per capped source
    assert(nCapped == 0 || b - allocSum < nCapped.toLong,
      s"leftover ${b - allocSum} with $nCapped capped sources")
    // max-min fairness: every capped source sits at the same water level
    val capped = got.filter(a => !a._6).map(_._4).distinct
    assert(capped.length <= 1, s"capped allocations must share θ: $capped")
    capped.headOption.foreach(theta =>
      got.filter(_._6).foreach { case (s, _, tk, _, _, _) =>
        assert(tk <= theta + (b - allocSum) + 1,
          s"whole-kept source $s above the water level")
      })
  }

  test("q168 keeps exactly the docs the hash rule selects") {
    val rates = SparkEntry.queries("q165_mixture_allocation")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n"),
        expr("""cast(conv(substring(md5(cast(doc_id as string)), 1, 8),
              |  16, 10) as bigint) % 1000000""".stripMargin).as("hp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expKept = docs.filter { case (s, _, _, hp) => hp < rates(s) }
      .groupBy(_._1)
      .map { case (s, ds) => s -> (ds.length.toLong, ds.map(_._3).sum) }
    val got = SparkEntry.queries("q168_budget_sample")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    got.foreach { case (s, kd, kt) =>
      val (ed, et) = expKept.getOrElse(s, (0L, 0L))
      assert((kd, kt) == (ed, et), s"source $s")
    }
    assert(got.map(_._1).toSet == rates.keySet,
      "every source reports, kept or not")
    graft.Resources.releaseAll()
  }
}
