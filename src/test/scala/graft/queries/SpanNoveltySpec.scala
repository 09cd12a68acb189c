package graft.queries

import java.security.MessageDigest

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q167 against an independent local replay (tokenize → distinct 8-token
  * span hashes → first-occurrence by min doc_id → per-doc fraction), plus
  * the convention and duplicate-document edge cases. */
class SpanNoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def spans(text: String): Set[String] = {
    val tk = text.split(" ").filter(_.nonEmpty)
    if (tk.length < 8) Set.empty
    else (0 to tk.length - 8)
      .map(i => md5hex(tk.slice(i, i + 8).mkString(" ")).take(16)).toSet
  }

  test("novelty equals a local first-occurrence replay") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docSpans = docs.map { case (id, t) => id -> spans(t) }.toMap
    val firstDoc = docSpans.toSeq
      .flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).min }
    val got = SparkEntry.queries("q167_span_novelty")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docs.length)
    got.foreach { case (id, nSpans, nNovel, ppm) =>
      val sh = docSpans(id)
      assert(nSpans == sh.size.toLong, s"doc $id span count")
      val novel = sh.count(h => firstDoc(h) == id).toLong
      assert(nNovel == novel, s"doc $id novel count")
      val expPpm = if (sh.isEmpty) 1000000L else novel * 1000000L / sh.size
      assert(ppm == expPpm, s"doc $id ppm")
    }
    // the readout must be non-trivial on the fixture: some doc restates
    // earlier content (novelty < 1), some doc is fully novel
    assert(got.exists(_._4 < 1000000L), "fixture has no duplicated spans?")
    assert(got.exists(g => g._2 > 0 && g._4 == 1000000L))
  }

  test("an exact duplicate of an earlier doc has zero novelty") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base),                      // first occurrence of everything
      (2L, base),                      // exact dup → novelty 0
      (3L, "one two three"),           // < 8 tokens → convention 1e6
      (4L, "p q r s t u v w x y z a")) // all-new spans → novelty 1e6
      .toDF("doc_id", "text")
    // replicate the query body on an injected frame via the same SQL
    // shapes (the query itself is corpus-bound; the rule is what's pinned)
    val spanArr = df
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("tk"))
      .select(col("doc_id"), array_distinct(expr(
        """CASE WHEN size(tk) >= 8 THEN
          |  transform(sequence(0, size(tk) - 8),
          |    i -> substring(md5(concat_ws(' ', slice(tk, i + 1, 8))), 1, 16))
          |ELSE array() END""".stripMargin)).as("sh"))
    val novel = spanArr.select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    val out = spanArr
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_spans"))
      .join(novel, Seq("doc_id"), "left")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))).toMap
    assert(out(1L) == (3L, 3L))   // 10 tokens → 3 spans, all first
    assert(out(2L) == (3L, 0L))   // dup: same spans, none first
    assert(out(3L) == (0L, 0L))   // too short
    assert(out(4L) == (5L, 5L))   // 12 tokens → 5 spans, all first
  }
}
