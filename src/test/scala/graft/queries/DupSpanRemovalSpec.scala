package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q163 against an independent local replay of the Lee-et-al removal
  * rule (first occurrence of every repeated 8-gram survives, all other
  * occurrences' positions are deleted), plus hand-computed crafted
  * cases: a cross-doc shared span, a within-doc repeat, and a short
  * doc no span can touch. */
class DupSpanRemovalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Local replay: returns (nTokens, nKept, keptFp) per doc. */
  private def replay(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq
      i <- 0 to tk.length - 8
    } yield (md5hex(tk.slice(i, i + 8).mkString(" ")).take(16), id, i)
    val byH = occ.groupBy(_._1).filter(_._2.length > 1)
    val removed = byH.values.flatten.toSeq
      .groupBy(o => o._1)
      .flatMap { case (_, os) =>
        val first = os.minBy(o => (o._2, o._3))
        os.filterNot(_ == first)
      }
      .flatMap { case (_, id, p) => (p to p + 7).map(id -> _) }
      .toSet
    toks.map { case (id, tk) =>
      val kept = tk.zipWithIndex.collect {
        case (t, i) if !removed((id, i)) => t
      }
      id -> ((tk.length.toLong, kept.length.toLong,
        md5hex(kept.mkString(" "))))
    }
  }

  test("crafted cases: cross-doc span, within-doc repeat, short doc") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("dupspan").toFile
    dir.deleteOnExit()
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // owns the first occurrence
      (2L, "x a b c d e f g h y"), // shares span "a..h" -> loses pos 1-8
      (3L, "p q r s t u v w p q r s t u v w"), // within-doc repeat
      (4L, "too short to span")) // < 8 tokens, untouched
    spark.createDataFrame(docs.map { case (id, t) =>
        (id, "en", "src", t)
      }).toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = SparkEntry.queries("q163_dup_span_removal")(
        spark, dir.getPath).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((10L, 10L, 0L, md5hex("a b c d e f g h i j"))))
    assert(got(2L) == ((10L, 2L, 8L, md5hex("x y"))))
    // doc 3: span at p=0 equals span at p=8; first (p=0) survives,
    // p=8's positions 8-15 are deleted -> first half remains
    assert(got(3L) == ((16L, 8L, 8L, md5hex("p q r s t u v w"))))
    assert(got(4L) == ((4L, 4L, 0L, md5hex("too short to span"))))
  }

  test("fixture replay matches the engine bit-for-bit") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = replay(docs)
    val got = SparkEntry.queries("q163_dup_span_removal")(spark, sfDir)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getString(4)) == e,
        s"doc ${r.getLong(0)}")
      assert(r.getLong(3) == e._1 - e._2)
    }
    // the transform must actually fire on the fixture (it contains
    // near-dup families sharing long spans)
    assert(got.exists(_.getLong(3) > 0), "no spans removed on fixture")
    graft.Resources.releaseAll()
  }
}
