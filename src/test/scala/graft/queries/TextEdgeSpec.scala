package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-document behavior of the guarded n-gram expressions. The
  * fixture corpus never has <3-token docs, so the CASE guards in
  * [[TextExprs.shingles3]] and q70's bigram expression are exercised
  * here: Spark's sequence(0, n) runs DESCENDING when n < 0, which would
  * index toks[-1] — an ANSI error (Spark 4 default) that a production
  * corpus with one-word documents WOULD hit. */
class TextEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ngrams(text: String, expr: String => String): Seq[String] = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
      .selectExpr("split(text, ' ') AS toks")
      .selectExpr(s"${expr("toks")} AS grams")
    df.collect().head.getSeq[String](0)
  }

  private def bigrams(c: String) =
    s"""CASE WHEN size($c) >= 2 THEN
       |  transform(sequence(0, size($c) - 2),
       |    i -> concat_ws(' ', $c[i], $c[i+1]))
       |ELSE array() END""".stripMargin

  test("trigram shingles: empty on 0/1/2-token docs, rolling on longer") {
    assert(ngrams("", TextExprs.shingles3) == Nil) // split("") = [""]
    assert(ngrams("one", TextExprs.shingles3) == Nil)
    assert(ngrams("one two", TextExprs.shingles3) == Nil)
    assert(ngrams("a b c", TextExprs.shingles3) == Seq("a b c"))
    assert(ngrams("a b c d", TextExprs.shingles3) == Seq("a b c", "b c d"))
  }

  test("bigrams (q70 expression): empty below 2 tokens, rolling above") {
    assert(ngrams("one", bigrams) == Nil)
    assert(ngrams("a b", bigrams) == Seq("a b"))
    assert(ngrams("a b c", bigrams) == Seq("a b", "b c"))
  }

  test("q145 digest of an empty fingerprint set is md5('')") {
    // a <3-token doc has zero shingles → fps = []; the engine digests
    // the empty concat (md5('') = d41d8cd9...) and the ORACLE matches
    // only through its COALESCE(array_to_string(fps, ','), '') — DuckDB
    // returns NULL for array_to_string([]) where Spark concat_ws gives
    // ''. This pins the engine half of that contract.
    import spark.implicits._
    val out = Seq("hi there").toDF("text")
      .selectExpr("split(text, ' ') AS tokens")
      .selectExpr(s"""transform(${TextExprs.shingles3("tokens")},
           g -> cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))
           AS sh""")
      .selectExpr("sort_array(array_distinct(sh)) AS fps")
      .selectExpr(
        "md5(concat_ws(',', transform(fps, x -> cast(x as string)))) AS d")
      .collect().head.getString(0)
    assert(out == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
