package graft.operators

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout contract: joining two tables bucketed the same
  * way on the join key plans WITHOUT shuffle exchanges (the shuffle was
  * paid at write time), and the layout never changes results. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = Files.createTempDirectory("bkt").toString
  private def facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
  private def dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
  private lazy val setup: Unit = {
    BucketedLayout.ensure(spark, "bjs_facts", s"$dir/facts", "k", 4)(facts)
    BucketedLayout.ensure(spark, "bjs_dims", s"$dir/dims", "k", 4)(dims)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // settle AQE
    df.queryExecution.executedPlan.toString
  }

  test("co-located join plans with zero shuffle exchanges") {
    setup
    val joined = BucketedLayout.colocatedJoin(
      spark, "bjs_facts", "bjs_dims", Seq("k"))
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // layout must not change answers
    val expected = facts.join(dims, Seq("k")).as[(Long, Long, String)]
      .collect().toSet
    assert(joined.as[(Long, Long, String)].collect().toSet == expected)
  }

  test("aggregation on the bucket key also skips the exchange") {
    setup
    val agg = spark.table("bjs_facts").groupBy($"k").count()
    val plan = planOf(agg)
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregate must reuse the write-time partitioning:\n$plan")
  }

  test("ensure() re-registers existing files on a fresh catalog") {
    setup
    val pre = spark.table("bjs_facts").count()
    spark.sql("DROP TABLE bjs_facts") // simulates a new session's catalog
    // data directory still on disk → ensure must re-declare, not rebuild
    BucketedLayout.ensure(spark, "bjs_facts", s"$dir/facts", "k", 4) {
      fail("must not rebuild when the layout already exists on disk")
    }
    assert(spark.table("bjs_facts").count() == pre)
    val joined = BucketedLayout.colocatedJoin(
      spark, "bjs_facts", "bjs_dims", Seq("k"))
    assert(!planOf(joined).contains("Exchange"),
      "re-registered table must keep the co-located plan")
  }
}
