package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Structural sketch properties q81's oracle relies on: the merged
  * distributed sketch equals the single-partition one (mergeability),
  * and every point estimate dominates the true count (soundness). */
class CountMinAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(7)

  test("sketch is partition-invariant (mergeable) and sound") {
    val toks = Seq.fill(5000)(s"t${rnd.nextInt(300)}")
    val cms = udaf(CountMinAgg)
    val one = toks.toDF("token").repartition(1)
      .agg(cms($"token")).as[Seq[Long]].head()
    val many = toks.toDF("token").repartition(13)
      .agg(cms($"token")).as[Seq[Long]].head()
    assert(one == many, "partition count must not change the sketch")

    val exact = toks.groupBy(identity).view.mapValues(_.size).toMap
    exact.foreach { case (t, c) =>
      val h = MinHashSig.hash20(t.getBytes("UTF-8"))
      val est = (0 until CountMinAgg.D).map { i =>
        val b = (((MinHashSig.A(i) * h + MinHashSig.B(i)) % MinHashSig.P)
          % CountMinAgg.W).toInt
        one(i * CountMinAgg.W + b)
      }.min
      assert(est >= c, s"token $t: est $est < exact $c")
    }
  }

  test("total mass per hash row equals the input size") {
    val toks = Seq.fill(2000)(s"w${rnd.nextInt(50)}")
    val cms = udaf(CountMinAgg)
    val sk = toks.toDF("token").agg(cms($"token")).as[Seq[Long]].head()
    (0 until CountMinAgg.D).foreach { i =>
      val mass = sk.slice(i * CountMinAgg.W, (i + 1) * CountMinAgg.W).sum
      assert(mass == toks.size, s"row $i mass $mass != ${toks.size}")
    }
  }
}
