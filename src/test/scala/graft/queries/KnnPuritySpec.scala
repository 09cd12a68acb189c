package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q197 against a full plain-Scala replay: embeddings collected once,
  * cosine top-10 per 1-in-25 probe recomputed with the same
  * left-associative fold and (score DESC, id ASC) tie-break, purity
  * re-aggregated per label — every output cell must match. Plus the
  * *ALL* row's conservation identity (it is exactly the per-label sums). */
class KnnPuritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("per-label purity replays a local cosine top-10") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // left-associative double folds — the q40/q106 parity contract
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val perProbe = vecs.filter(_._1 % 25 == 0).map { case (pid, pl, pe) =>
      val top = vecs.filter(_._1 != pid)
        .map { case (id, l, e) => (id, l, cos(pe, e)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(10)
      (pid, pl, top.count(_._2 == pl).toLong, top.length.toLong)
    }
    val expected = perProbe.groupBy(_._2).map { case (l, ps) =>
      l.toString -> (ps.length.toLong, ps.map(_._3).sum, ps.map(_._4).sum)
    } + ("*ALL*" -> ((perProbe.length.toLong,
      perProbe.map(_._3).sum, perProbe.map(_._4).sum)))

    val got = SparkEntry.queries("q197_knn_label_purity")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap == expected,
      s"purity table diverged:\n$got\n$expected")
    got.foreach { case (l, (_, hits, nn, ppm)) =>
      assert(ppm == hits * 1000000L / math.max(nn, 1L), s"$l ppm wrong")
    }
    // conservation: *ALL* is the per-label sum
    val all = got("*ALL*")
    val rest = got.removed("*ALL*").values
    assert((rest.map(_._1).sum, rest.map(_._2).sum, rest.map(_._3).sum) ==
      ((all._1, all._2, all._3)))
  }
}
