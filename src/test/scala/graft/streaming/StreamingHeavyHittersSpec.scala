package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, Tables, TestSpark}
import graft.functions.MisraGriesAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standing Misra–Gries fold against batch q166: the fixture's
  * events arrive in 4 micro-batches; after every batch the summary's
  * candidate set must contain every id that is heavy ON THE ROWS SEEN
  * SO FAR, and after the last batch the q166-style exact recount over
  * the candidates must equal batch q166's whole-corpus answer. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("standing fold carries the superset guarantee across batches") {
    import spark.implicits._
    val users = Tables.eventsRaw(spark, sfDir)
      .select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val chunks = users.grouped(math.max(1, users.length / 4 + 1)).toSeq
    assert(chunks.length >= 3)

    val state = new IncrementalHeavyHitters.State
    val summaries =
      scala.collection.mutable.ArrayBuffer.empty[IncrementalHeavyHitters.Summary]
    implicit val sc = spark.sqlContext
    val src = MemoryStream[Long]
    val q = IncrementalHeavyHitters.start(
      src.toDF().toDF("user_id"), state,
      Files.createTempDirectory("hh-ck").toString,
      s => { summaries.synchronized { summaries += s }; () })
    try {
      var seen = Vector.empty[Long]
      chunks.foreach { c =>
        src.addData(c.toSeq)
        q.processAllAvailable()
        seen = seen ++ c
        val snap = state.get
        assert(snap.n == seen.length.toLong, "running count must be exact")
        // superset on the prefix: every currently-heavy id is a candidate
        val exactPrefix = seen.groupBy(identity)
          .collect { case (u, xs)
            if xs.length.toLong * MisraGriesAgg.K > seen.length => u }
          .toSet
        assert(exactPrefix.subsetOf(snap.buf.keySet),
          s"missing heavy ids after ${seen.length} rows")
        // undercount bound on kept counters
        snap.buf.foreach { case (u, est) =>
          val truth = seen.count(_ == u).toLong
          assert(est <= truth && truth - est <= snap.n / MisraGriesAgg.K)
        }
      }
      assert(summaries.synchronized(summaries.length) == chunks.length)
      // final recount over candidates == batch q166 on the same corpus
      val expected = SparkEntry.queries("q166_heavy_hitters")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val candSet = state.get.candidates.toSet
      val recount = seen.groupBy(identity)
        .collect { case (u, xs)
          if candSet(u) &&
            xs.length.toLong * MisraGriesAgg.K > seen.length =>
          u -> xs.length.toLong }
      assert(recount == expected,
        s"stream-only=${recount.toSet -- expected.toSet} " +
          s"batch-only=${expected.toSet -- recount.toSet}")
    } finally q.stop()
  }
}
