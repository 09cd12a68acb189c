package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q148 against an independent local replay: features, the three GD
  * steps, scoring, and the tie-corrected AUC are all reimplemented here
  * in plain Scala (no Spark expressions, no shared helpers) from the
  * documented µ-unit recurrences, then compared bit-for-bit with the
  * engine's single output row. This is the only check that exercises
  * the distributed-prefix rank machinery against a NAIVE sorted-rank
  * AUC — the DuckDB oracle replays the same grouped-cumsum formula, so
  * a shared algebra mistake (e.g. a wrong mid-rank term) would pass the
  * oracle but fail here. */
class ClassifierEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val M = 1000000L

  private def cp(text: String): Iterator[Int] = {
    val it = text.codePoints().iterator()
    new Iterator[Int] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }

  /** (x0..x4, y) in µ-units — Spark `length`/`regexp_replace` count
    * code points, so the replay must too. */
  private def feats(text: String, lang: String): (Array[Long], Long) = {
    var n, nv, nsp, nl = 0L
    cp(text).foreach { c =>
      n += 1
      if ("aeiou".indexOf(c) >= 0) nv += 1
      if (c == ' ') nsp += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) nl += 1
    }
    (Array(M, (M * math.min(n, 2000L)) / 2000L, (M * nv) / (n + 1),
      (M * nsp) / (n + 1), (M * nl) / (n + 1)),
      if (lang == "en") M else 0L)
  }

  test("confusion + mid-rank AUC match a naive local replay") {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("text", "lang")
      .collect()
      .map(r => feats(r.getString(0), r.getString(1)))
    val nDocs = docs.length.toLong
    assert(nDocs > 0)

    // three GD steps, per-doc truncating µ-unit arithmetic
    val w = Array.fill(5)(0L)
    for (_ <- 1 to 3) {
      val g = Array.fill(5)(0L)
      docs.foreach { case (x, y) =>
        val err = (0 until 5).map(j => x(j) * w(j)).sum / M - y
        for (j <- 0 until 5) g(j) += (x(j) * err) / M
      }
      for (j <- 0 until 5) w(j) -= g(j) / (4L * nDocs)
    }

    val scored = docs.map { case (x, y) =>
      ((0 until 5).map(j => x(j) * w(j)).sum / M, y == M)
    }
    val nPos = scored.count(_._2).toLong
    val nNeg = nDocs - nPos
    val tp = scored.count(s => s._2 && s._1 >= M / 2).toLong
    val fp = scored.count(s => !s._2 && s._1 >= M / 2).toLong

    // naive sorted-rank mid-rank AUC: Σ over positives of mid-rank,
    // via per-score groups walked in ascending order
    var below = 0L
    var aucNum = 0L
    scored.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, grp) =>
      val p = grp.count(_._2).toLong
      val nn = grp.length - p
      aucNum += p * (2 * below + nn)
      below += nn
    }
    val aucMicro = (aucNum * 500000L) / (nPos * nNeg)

    val r = SparkEntry.queries("q148_classifier_eval")(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_pos")) == nPos)
    assert(row.getLong(row.fieldIndex("n_neg")) == nNeg)
    assert(row.getLong(row.fieldIndex("tp")) == tp)
    assert(row.getLong(row.fieldIndex("fp")) == fp)
    assert(row.getLong(row.fieldIndex("fn")) == nPos - tp)
    assert(row.getLong(row.fieldIndex("tn")) == nNeg - fp)
    assert(row.getLong(row.fieldIndex("accuracy_micro")) ==
      (tp + nNeg - fp) * M / nDocs)
    assert(row.getLong(row.fieldIndex("auc_micro")) == aucMicro,
      s"distributed AUC ${row.getLong(row.fieldIndex("auc_micro"))} " +
        s"!= naive $aucMicro")
    // sanity bounds only — whether 3 integer GD steps beat chance at
    // this SF is a model property, not an operator property (measured:
    // 0.456 at sf0.001 — the bias-dominated early steps rank poorly
    // even as the loss strictly decreases)
    assert(aucMicro >= 0L && aucMicro <= M)
    assert(aucNum <= 2 * nPos * nNeg)
  }
}
