package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q181 against an independent local replay of the SEQUENTIAL CUSUM
  * recurrence S_k = max(0, S_{k−1} + x_k): the query computes S via the
  * distributed prefix rewrite (S_k = P_k − min(0, min prefix of P)),
  * and this spec proves the identity on the real fixture series AND on
  * adversarial synthetic series (all-negative drift, alternating sign,
  * a sustained shift) — bit-for-bit in integer µ-units. */
class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The textbook sequential fold. */
  private def cusumSeq(xs: Seq[Long]): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x)).drop(1)

  /** The q181 rewrite, replayed locally. */
  private def cusumPrefix(xs: Seq[Long]): Seq[Long] = {
    val p = xs.scanLeft(0L)(_ + _).drop(1)
    val runMin = p.scanLeft(Long.MaxValue)(math.min).drop(1)
    p.lazyZip(runMin).map((pk, mk) => pk - math.min(mk, 0L))
  }

  test("prefix rewrite ≡ sequential recurrence on adversarial series") {
    val cases = Seq(
      Seq(5L, -3L, -9L, 4L, 4L, -1L),          // dips below zero mid-run
      Seq(-2L, -2L, -2L, -2L),                  // all-negative: S stays 0
      Seq(3L, -3L, 3L, -3L, 3L),                // alternating
      Seq(-5L, -5L, 1L, 1L, 1L, 1L, 1L, 1L),    // sustained shift after dip
      Seq(7L),                                  // singleton
      (1 to 50).map(i => ((i * 2654435761L) % 21L) - 10L) // pseudo-random
    )
    cases.foreach { xs =>
      assert(cusumPrefix(xs) == cusumSeq(xs), s"diverged on $xs")
    }
  }

  test("q181 equals the sequential recurrence on the fixture series") {
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000L").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hourly.groupBy(_._1).flatMap { case (t, rows) =>
      val series = rows.sortBy(_._2)
      val tot = series.map(_._3).sum
      val mean = tot * 1000000L / series.length
      val xs = series.map(_._3 * 1000000L - mean).toSeq
      cusumSeq(xs).zip(series).collect {
        case (s, (_, hr, y)) if s > 2L * mean => (t, hr) -> (y, s, mean)
      }
    }
    val got = SparkEntry.queries("q181_cusum_changepoints")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"alarm sets differ: got ${got.size}, want ${expected.size}")
    assert(expected.nonEmpty,
      "fixture should trip at least one sustained-shift alarm")
  }
}
