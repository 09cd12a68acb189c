package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** q182 against the SEQUENTIAL weighted-round-robin it replaces: a
  * priority-queue WFQ simulation (pop the source with the smallest
  * next virtual finish time, same (v, source, k) tie-break) must emit
  * the exact slot sequence the one-sort closed form prints — on the
  * fixture weights and on synthetic extreme-skew weights. Also pins
  * the fairness property that justifies the operator: over any prefix
  * of the schedule each source's emitted count tracks its weight share
  * with bounded lag. */
class MixtureScheduleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The inherently sequential form: a priority queue of (v, source, k). */
  private def wfqSim(weights: Map[String, Long], slots: Int)
      : Vector[(String, Long, Long)] = {
    implicit val ord: Ordering[(Long, String, Long)] =
      Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.Long)
    val pq = mutable.PriorityQueue.empty[(Long, String, Long)](ord.reverse)
    weights.foreach { case (s, w) =>
      pq.enqueue((1000000000000L / math.max(w, 1L), s, 0L))
    }
    val out = Vector.newBuilder[(String, Long, Long)]
    var n = 0
    while (n < slots && pq.nonEmpty) {
      val (v, s, k) = pq.dequeue()
      out += ((s, k, v))
      n += 1
      pq.enqueue((((k + 2) * 1000000000000L) /
        math.max(weights(s), 1L), s, k + 1))
    }
    out.result()
  }

  private def fixtureWeights: Map[String, Long] = {
    import org.apache.spark.sql.functions._
    graft.Tables.documents(spark, sfDir)
      .select(col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("closed-form schedule equals the sequential WFQ simulation") {
    val got = SparkEntry.queries("q182_mixture_schedule")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector.sortBy(_._1)
    val sim = wfqSim(fixtureWeights, 200)
    assert(got.length == 200)
    got.zip(sim).foreach { case ((slot, s, k, v), (es, ek, ev)) =>
      assert((s, k, v) == ((es, ek, ev)),
        s"slot $slot: got ($s,$k,$v), sim ($es,$ek,$ev)")
    }
  }

  test("proportional fairness with bounded lag under extreme skew") {
    val weights = Map("big" -> 1000L, "mid" -> 100L, "tiny" -> 1L)
    val wsum = weights.values.sum
    val sched = wfqSim(weights, 500)
    // over every prefix, each source's emitted count is within ±2 of
    // its weight share of emitted virtual time (the WFQ lag bound)
    (1 to 500).foreach { n =>
      val prefix = sched.take(n)
      val horizon = prefix.last._3 // virtual time of the n-th emission
      weights.foreach { case (s, w) =>
        val emitted = prefix.count(_._1 == s).toLong
        val ideal = (BigInt(horizon) * w / 1000000000000L).toLong
        assert(math.abs(emitted - ideal) <= 2,
          s"prefix $n: $s emitted $emitted vs ideal $ideal " +
            s"(horizon $horizon, share ${w}/$wsum)")
      }
    }
    // the skewed source dominates in proportion: ~10x mid, ~1000x tiny
    val counts = sched.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts("big") > 9 * counts("mid"))
    assert(counts.getOrElse("tiny", 0) <= 1)
  }
}
