package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the training-pipeline operators added after
  * the round-3 sweep: q74 sequence packing, q75 inverted index, q76
  * mixture sampling. Value-exactness is the DuckDB oracle's job; these
  * pin the arithmetic relationships that must hold at ANY scale, so a
  * future refactor that keeps the oracle green at fixture scale but
  * breaks the math's internal consistency (e.g. a capped count leaking
  * into a total) still fails fast.
  */
class TrainingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("q74: packing accounts for every document and token") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    val rows = run("q74_sequence_packing")
    val docs = Tables.documents(spark, sfDir)
    val totalDocs = docs.count()
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    rows.foreach { r =>
      val (tok, seqs, cross, docsN) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_sequences"), r.getAs[Long]("n_crossings"),
        r.getAs[Long]("n_docs"))
      assert(seqs == (tok + 511) / 512, s"shard ${r.get(0)}: ceil-div")
      // a document can straddle at most (its tokens / 512 + 1) cuts and
      // there are only seqs - 1 interior cuts in the shard stream
      assert(cross >= 0 && cross <= seqs - 1 + docsN)
      val fill = r.getAs[Double]("fill_frac")
      assert(fill > 0.0 && fill <= 1.0)
      // fill re-derives from the integer columns exactly
      assert(fill == tok.toDouble / (seqs * 512))
    }
  }

  test("q75: postings are capped, ordered, and consistent with df/tf") {
    val rows = run("q75_inverted_index")
    assert(rows.nonEmpty)
    var tfSum = 0L
    rows.foreach { r =>
      val (df, tf) = (r.getAs[Long]("df"), r.getAs[Long]("tf"))
      val postings = r.getAs[String]("postings").split(";")
      assert(df >= 1 && tf >= df)
      assert(postings.length == math.min(df, 64L),
        s"token ${r.get(0)}: postings length vs min(df, 64)")
      val entries = postings.map(_.split(":").map(_.toLong))
      // ordered by doc_id, per-doc tf >= 1, positions non-negative
      assert(entries.map(_(0)).sliding(2).forall(
        w => w.length < 2 || w(0) < w(1)))
      assert(entries.forall(e => e(1) >= 1 && e(2) >= 0))
      // when nothing was capped, per-doc tfs must sum to the total tf
      if (df <= 64) assert(entries.map(_(1)).sum == tf)
      tfSum += tf
    }
    import graft.Tables
    import org.apache.spark.sql.functions._
    val totalTokens = Tables.documents(spark, sfDir)
      .agg(sum(size(filter(split(col("text"), " "),
        t => t =!= lit(""))))).head().getLong(0)
    assert(tfSum == totalTokens, "tf over all tokens = corpus token count")
  }

  test("q76: targets respect the budget and sampling stays in range") {
    val rows = run("q76_mixture_sample")
    assert(rows.length == 5) // fixture languages
    val fracSum = rows.map(_.getAs[Double]("target_frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-9)
    val targetSum = rows.map(_.getAs[Long]("n_target")).sum
    assert(targetSum <= 1000) // floor() never overshoots the budget
    rows.foreach { r =>
      val (nDocs, tgt, got) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_target"), r.getAs[Long]("n_sampled"))
      assert(tgt <= nDocs, "cannot target more docs than exist")
      assert(got <= nDocs)
      // the hash sample is binomial(nDocs, tgt/nDocs): allow 5 sigma
      val sigma = math.sqrt(tgt.toDouble * (1.0 - tgt.toDouble / nDocs))
      assert(math.abs(got - tgt) <= 5 * sigma + 1,
        s"lang ${r.get(0)}: sampled $got vs target $tgt")
    }
    // sqrt-temperature flattening: minority langs get a larger share than
    // their raw proportion, the majority lang a smaller one
    val byDocs = rows.sortBy(_.getAs[Long]("n_docs"))
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val minority = byDocs.head
    val majority = byDocs.last
    assert(minority.getAs[Double]("target_frac") >
      minority.getAs[Long]("n_docs").toDouble / totalDocs)
    assert(majority.getAs[Double]("target_frac") <
      majority.getAs[Long]("n_docs").toDouble / totalDocs)
  }
}
