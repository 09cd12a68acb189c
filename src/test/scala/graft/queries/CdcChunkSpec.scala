package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q172 against an independent local chunker (same md5-mod-8 boundary
  * rule in plain Scala), the empty/short-doc conventions, and the
  * property that MAKES chunking content-defined: an insertion disturbs
  * only the chunk it lands in. */
class CdcChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The local replay of the boundary + chunk-hash rule. */
  private def chunks(text: String): Seq[String] = {
    val tk = text.split(" ").filter(_.nonEmpty)
    if (tk.isEmpty) Seq.empty
    else {
      // boundary AFTER 1-based position i (never the last token)
      val bp = (1 until tk.length).filter { i =>
        java.lang.Long.parseLong(md5hex(tk(i - 1)).take(8), 16) % 8 == 0
      }
      val starts = 1 +: bp.map(_ + 1)
      val ends = bp :+ tk.length
      starts.zip(ends).map { case (st, en) =>
        md5hex(tk.slice(st - 1, en).mkString(" ")).take(16)
      }
    }
  }

  test("fixture replay matches the local chunker doc-for-doc") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> chunks(t) }.toMap
    val docsPerHash = perDoc.toSeq
      .flatMap { case (id, ch) => ch.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.size }
    val got = SparkEntry.queries("q172_cdc_chunk_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docs.length)
    got.foreach { case (id, nCh, nDup, ppm) =>
      val ch = perDoc(id)
      assert(nCh == ch.size.toLong, s"doc $id chunk count")
      val dup = ch.count(h => docsPerHash(h) >= 2).toLong
      assert(nDup == dup, s"doc $id dup count")
      val expPpm = if (ch.isEmpty) 0L else dup * 1000000L / ch.size
      assert(ppm == expPpm, s"doc $id ppm")
    }
    // non-trivial fixture: some chunk is shared across docs, some isn't
    assert(got.exists(_._3 > 0L), "fixture has no cross-doc chunks?")
    assert(got.exists(g => g._2 > 0 && g._3 == 0L))
  }

  test("synthetic corpus: exact dup, partial overlap, empty, 1-token") {
    val dir = Files.createTempDirectory("cdcchunk").toFile
    dir.deleteOnExit()
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),            // first occurrence
      (2L, base),            // exact dup → every chunk duplicated
      (3L, "solo"),          // 1 token → 1 chunk, unique
      (4L, ""))              // empty → 0 chunks, ppm 0
    spark.createDataFrame(docs.map { case (id, t) => (id, "en", "src", t) })
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = SparkEntry.queries("q172_cdc_chunk_dedup")(spark, dir.getPath)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val nBase = chunks(base).size.toLong
    assert(got(1L) == ((nBase, nBase, 1000000L)))
    assert(got(2L) == ((nBase, nBase, 1000000L)))
    assert(got(3L) == ((1L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L)))
  }

  test("an insertion disturbs at most one chunk (content-defined)") {
    // 60 deterministic pseudo-tokens; insert one token mid-stream.
    val toks = (0 until 60).map(i => md5hex(s"tok$i").take(6))
    val before = chunks(toks.mkString(" "))
    val after =
      chunks((toks.take(30) ++ Seq("INSERTED") ++ toks.drop(30)).mkString(" "))
    // the chunk containing the insertion point changes (and may split
    // in two if the new token is itself a boundary); everything else —
    // including ALL chunks after the insertion — is byte-identical.
    val removed = before.diff(after)
    val added = after.diff(before)
    assert(removed.size <= 1, s"removed=$removed")
    assert(added.size <= 2, s"added=$added")
    assert(before.size >= 3, "fixture too short to be meaningful")
    // contrast: fixed-stride 8-token windows would shift EVERY chunk
    // after the insertion — here the shared prefix/suffix survive
    assert(before.intersect(after).size >= before.size - 1)
  }
}
