package graft.ingest

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage (SURVEY.md §5.2): the Spark predicates must
  * agree with a direct Scala model of the reference's Go checks on
  * arbitrary generated inputs (fixed seed — no bridge artifact for
  * scalatest+scalacheck ships offline, so generators are sampled
  * directly). */
class IngestPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  /** Direct port of checkTopic (message.go:38-47) as the test model:
    * starts with '/' and ≥ 4 slashes. */
  private def modelValid(topic: String): Boolean =
    topic.startsWith("/") && topic.count(_ == '/') >= 4

  private val segGen = Gen.alphaNumStr.map(_.take(8))
  private val topicGen: Gen[String] = for {
    n <- Gen.choose(0, 7)
    segs <- Gen.listOfN(n, segGen)
    lead <- Gen.oneOf("", "/")
  } yield lead + segs.mkString("/")

  test("topicValid agrees with the reference model on 300 random topics") {
    val topics = sample(topicGen, 300)
    val df = topics.map((_, "{}")).toDF("topic", "payload")
    val got = df.select(Ingest.topicValid(col("topic")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == topics.map(modelValid))
  }

  test("numeric payload values round-trip through parse") {
    val vals = sample(Gen.chooseNum(-1e6, 1e6), 100)
    val rows = vals.map(v => ("/c/d/x/y/s", s"""{"value":$v}"""))
    val got = Ingest.records(rows.toDF("topic", "payload"))
      .select("value_d").collect().map(_.getDouble(0)).toSet
    assert(got == vals.map(v => s"$v".toDouble).toSet)
  }

  test("string payload values survive exactly (JSON-safe strings)") {
    val vals = sample(Gen.alphaNumStr.map(_.take(20)), 80).distinct
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (s"/c/d$i/x/y/s", s"""{"value":"$v"}""") }
    val got = Ingest.records(rows.toDF("topic", "payload"))
      .select("value_s").collect().map(_.getString(0)).toSet
    assert(got == vals.toSet)
  }

  test("minhash LSH symmetry: jaccard-identical docs always bucket together") {
    import graft.functions.MinHashSig
    val docs = sample(Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d")), 40)
      .map(_.mkString(" "))
    // same token sequence → same signature, regardless of surrounding rows
    docs.foreach { d =>
      val toks = d.split(" ")
      val s1 = MinHashSig.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      val s2 = MinHashSig.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      assert(s1.array.toSeq == s2.array.toSeq)
    }
  }
}
