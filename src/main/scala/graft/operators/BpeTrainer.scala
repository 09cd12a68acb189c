package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** BPE (byte-pair-encoding) vocabulary training — the tokenizer-building
  * step of an LLM data pipeline, run as a distributed Spark job.
  *
  * Classic greedy BPE (Sennrich ACL'16): start from characters, repeat
  * "count adjacent symbol pairs (weighted by word frequency) → merge the
  * most frequent pair everywhere". Everything here is engine-replayable:
  *
  *  - pair counts are exact integer sums over the DISTINCT-WORD frame
  *    (corpus-frequency weighted — the standard trick that makes the
  *    working set |vocab|, not |corpus|);
  *  - the winning pair breaks ties by (count DESC, p1, p2) — total order;
  *  - merge application uses the DOUBLE-SPACE encoding: symbols are
  *    joined by two spaces and a merge of (x, y) is the plain-string
  *    `replace(s, ' x  y ', ' x~y ')`. Non-overlapping left-to-right
  *    replace IS greedy BPE merging — each boundary keeps one space on
  *    each flank, so "a a a" merges only its first pair, exactly like
  *    the sequential algorithm, and both Spark and DuckDB implement
  *    replace() with these semantics.
  *
  * Scale shape per merge step: one explode → partial-aggregated
  * (p1, p2) integer-sum shuffle over the words frame, one global top-1
  * (TakeOrdered — a bounded driver read of ONE row), and one narrow
  * per-row replace with the winner inlined as a literal (no re-plan
  * doubling: state advances by literal substitution, so the plan grows
  * linearly in steps). The words frame is tiny relative to the corpus
  * (distinct words), which is why production BPE trainers all work on
  * it.
  */
object BpeTrainer {

  /** One learned merge: step number (1-based), the two symbols joined,
    * and the frequency-weighted pair count that won the step. */
  case class Merge(step: Int, p1: String, p2: String, weight: Long)

  /** The marker inserted between merged symbols — must not occur in the
    * corpus alphabet (asserted on every winner). */
  val Marker = "~"

  /** @param words (word, freq) distinct-word frame
    * @return learned merges + the final symbolized frame
    *         (word, freq, s) with `s` in double-space encoding */
  def train(words: DataFrame, steps: Int): (Seq[Merge], DataFrame) = {
    var cur = words.withColumn("s", expr(
      """concat('  ', concat_ws('  ',
        |  transform(sequence(1, length(word)), i -> substring(word, i, 1))),
        |  '  ')""".stripMargin))
    val merges = Seq.newBuilder[Merge]
    var k = 1
    while (k <= steps) {
      val best = cur
        .withColumn("t", expr("filter(split(s, '  '), x -> x != '')"))
        .filter(expr("size(t) >= 2"))
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS p1, t[i+1] AS p2))"))
          .as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("p1"), col("p2"))
        .limit(1).collect() // bounded control-plane read: exactly one row
      if (best.isEmpty) {
        k = steps + 1 // corpus fully merged — stop early
      } else {
        val (p1, p2, w) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        // winners are inlined as SQL literals below — keep that safe
        require((p1 + p2).matches("[a-z~]+"),
          s"symbol outside the corpus alphabet: '$p1' '$p2'")
        merges += Merge(k, p1, p2, w)
        cur = cur.withColumn("s", expr(
          s"replace(s, ' $p1  $p2 ', ' $p1$Marker$p2 ')"))
        k += 1
      }
    }
    (merges.result(), cur)
  }
}
