package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val corpus = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def trained() =
    PqIndex.train(corpus, nCells = 8, m = 4, subDim = 16, kSub = 8, iters = 2)

  test("codes are complete, in-range, and partition-invariant") {
    val cb = trained()
    def codeMap(df: org.apache.spark.sql.DataFrame) =
      PqIndex.encode(df, cb).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2)))
        .toMap
    val base = codeMap(corpus)
    val repart = codeMap(corpus.repartition(17))
    assert(base == repart, "encoding must not depend on partitioning")
    assert(base.size == corpus.count())
    base.values.foreach { case (cell, codes) =>
      assert(cell >= 0 && cell < 8)
      assert(codes.length == 4)
      codes.foreach(c => assert(c >= 0 && c < 8))
    }
    // training converged to a real partition, not one degenerate cell
    assert(base.values.map(_._1).toSet.size > 1)
    graft.Resources.releaseAll()
  }

  test("search returns k ranked rows per probe with monotone distances") {
    val cb = trained()
    val codes = PqIndex.encode(corpus, cb)
    val probes = corpus.filter(col("vec_id") < 5)
    val out = PqIndex.search(codes, cb, probes, k = 5, nProbe = 2)
      .orderBy(col("probe_id"), col("rank")).collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.size == 5)
    byProbe.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length))
      val dists = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      assert(rows.forall(r => r.getLong(1) != r.getLong(0)),
        "self must be excluded")
    }
    graft.Resources.releaseAll()
  }

  test("prebuilt (ensure + searchPrebuilt) equals in-memory search bit-for-bit") {
    val cb = trained()
    val codes = PqIndex.encode(corpus, cb)
    val probes = corpus.filter(col("vec_id") < 5)
    val inMem = PqIndex.search(codes, cb, probes, k = 5, nProbe = 2)
      .orderBy(col("probe_id"), col("rank")).collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("pq-spec").toString
    PqIndex.ensure(corpus, nCells = 8, m = 4, subDim = 16, kSub = 8,
      iters = 2, dir = dir)
    // second ensure must load, not retrain (idempotent offline job)
    PqIndex.ensure(corpus, nCells = 8, m = 4, subDim = 16, kSub = 8,
      iters = 2, dir = dir)
    val pre = PqIndex.searchPrebuilt(spark, dir, probes, k = 5, nProbe = 2,
      m = 4, subDim = 16, nCells = 8)
      .orderBy(col("probe_id"), col("rank")).collect().toSeq
    assert(pre == inMem,
      "prebuilt index must reproduce the in-memory search exactly")
    graft.Resources.releaseAll()
  }

  test("widening nProbe to all cells can only improve (shrink) ADC top-1") {
    val cb = trained()
    val codes = PqIndex.encode(corpus, cb)
    val probes = corpus.filter(col("vec_id") < 5)
    def top1(nProbe: Int) =
      PqIndex.search(codes, cb, probes, k = 1, nProbe = nProbe)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val narrow = top1(1)
    val full = top1(8)
    narrow.foreach { case (p, d) => assert(full(p) <= d) }
    graft.Resources.releaseAll()
  }
}
