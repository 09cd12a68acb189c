package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q177's distribution-drift readout as a STANDING streaming stage — the
  * fourth standing fold next to [[IncrementalDedup]],
  * [[IncrementalHeavyHitters]] and [[IncrementalDistinct]]: the stream's
  * token distribution is folded into 2^13 hashed buckets (the q126
  * md5-unigram contract, so any batch job hashes identically) and after
  * every micro-batch the stage reports the exact total-variation
  * distance between everything-seen-so-far and a FROZEN reference
  * distribution. This is the ingest-side "is today's traffic still
  * distributed like the corpus we trained on" monitor — the number a
  * data-quality pager alerts on — and hashing makes the state O(2^13)
  * REGARDLESS of vocabulary, where q177's exact per-token form is
  * vocabulary-sized (the bucketing is the scale trade, taken once,
  * here).
  *
  * The fold is EXACT over the hashed domain: bucket counts are a pure
  * additive function of the multiset seen, so after any number of
  * micro-batches the standing counts equal one batch aggregate over the
  * concatenated stream (merge-order-free), and the TV number is
  * RATIONAL in the counts (the q177 common-denominator form) — the
  * same ppm a nightly batch recompute would print, bit-for-bit.
  *
  * DURABILITY — identical discipline to [[IncrementalDistinct]] (the
  * batch-commit-marker pattern): after folding batch b the
  * (counts, n, b) snapshot is written atomically under the query's own
  * checkpoint dir, `start()` restores it before the first batch, and a
  * redelivered batchId ≤ the persisted one is skipped, so the counts
  * survive kill/restart and at-least-once batch retry.
  */
object IncrementalDrift {

  /** Hashed-bucket domain: 2^13, the q126 hashed-unigram contract. */
  val Buckets = 8192

  /** The bucket expression over a string column `w` — SQL so a batch
    * twin or oracle hashes identically (q126/q93 md5 contract). */
  def bucketExpr(c: String): String =
    s"cast(conv(substring(md5($c), 1, 8), 16, 10) as bigint) % $Buckets"

  /** A frozen reference distribution: sparse bucket counts + total. */
  final case class Reference(counts: Map[Long, Long], total: Long)

  /** Build a [[Reference]] from a batch token frame (column `w`) — the
    * "corpus we trained on" side, computed once at stage start. The
    * collect is bounded at ≤2^13 rows. */
  def referenceOf(tokens: DataFrame): Reference = {
    val rows = tokens.select(expr(bucketExpr("w")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    Reference(rows.toMap, rows.map(_._2).sum)
  }

  /** Running state: sparse standing bucket counts, total tokens seen,
    * and the last merged micro-batch id (−1 before any batch). */
  final case class Summary(counts: Map[Long, Long], n: Long,
      lastBatch: Long = -1L) {
    /** Exact TV vs the reference in ppm — the q177 rational form on the
      * union of occupied buckets (≤2·2^13 driver-side terms):
      * tv_ppm = (Σ_b |c_b·T_r − r_b·T| · 10⁶) div max(2·T·T_r, 1).
      * The max(…, 1) denominator guard is EXACTLY the batch twin's
      * GREATEST(2*t*tr, 1) (q180), so an empty stream or empty
      * reference reads 0 ppm in BOTH — the documented bit-for-bit twin
      * parity holds on degenerate inputs too (r10 ADVICE: the stage
      * used to return 10⁶ where the twin printed 0). BigInt keeps the
      * cross products safe at any stream length. */
    def tvPpm(ref: Reference): Long = {
      val t = BigInt(n); val tr = BigInt(ref.total)
      val keys = counts.keySet ++ ref.counts.keySet
      val num = keys.iterator.map { b =>
        (BigInt(counts.getOrElse(b, 0L)) * tr -
          BigInt(ref.counts.getOrElse(b, 0L)) * t).abs
      }.sum
      ((num * 1000000) / ((2 * t * tr) max BigInt(1))).toLong
    }
  }

  final class State {
    private[streaming] val ref =
      new AtomicReference(Summary(Map.empty, 0L))
    def get: Summary = ref.get()
  }

  private def stateFile(checkpointDir: String): Path =
    Paths.get(checkpointDir, "graft-drift-state", "counts")

  private def refFile(checkpointDir: String): Path =
    Paths.get(checkpointDir, "graft-drift-state", "reference")

  /** Atomic persist of the FROZEN reference (same temp + ATOMIC_MOVE
    * discipline as the summary snapshot). Written once, at the first
    * `start()` against this checkpoint dir. */
  private[streaming] def persistRef(file: Path, r: Reference): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling("reference.tmp")
    val body = (s"${r.total}" +:
      r.counts.toSeq.sorted.map { case (b, c) => s"$b $c" })
      .mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private[streaming] def loadRef(file: Path): Option[Reference] =
    if (!Files.exists(file)) None
    else
      try {
        val lines = Files.readAllLines(file, StandardCharsets.UTF_8)
        val counts = (1 until lines.size).iterator
          .map(lines.get(_).trim).filter(_.nonEmpty)
          .map { l => val p = l.split(' '); p(0).toLong -> p(1).toLong }
          .toMap
        Some(Reference(counts, lines.get(0).trim.toLong))
      } catch {
        // A reference this stage wrote is never torn (temp+ATOMIC_MOVE);
        // an unparsable file means a hand edit or a copy that skipped the
        // atomic-move discipline. Name the file and the re-baseline
        // contract instead of letting a bare NumberFormatException escape
        // start() with no hint which file caused it.
        case e @ (_: NumberFormatException | _: IndexOutOfBoundsException) =>
          throw new IllegalStateException(
            s"corrupt frozen-reference file $file: ${e.getMessage}. " +
              "The reference freezes at the first start() against this " +
              "checkpoint dir; delete the checkpoint dir to re-freeze " +
              "from the reference offered at the next start().", e)
      }

  /** Atomic persist (temp sibling + ATOMIC_MOVE): old or new snapshot,
    * never a torn read. ≤2^13 lines. */
  private[streaming] def persist(file: Path, s: Summary): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling("counts.tmp")
    val body = (s"${s.lastBatch} ${s.n}" +:
      s.counts.toSeq.sorted.map { case (b, c) => s"$b $c" })
      .mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private[streaming] def load(file: Path): Option[Summary] =
    if (!Files.exists(file)) None
    else {
      val lines = Files.readAllLines(file, StandardCharsets.UTF_8)
      val head = lines.get(0).split(' ')
      val counts = (1 until lines.size).iterator
        .map(lines.get(_).trim).filter(_.nonEmpty)
        .map { l => val p = l.split(' '); p(0).toLong -> p(1).toLong }
        .toMap
      Some(Summary(counts, head(1).toLong, head(0).toLong))
    }

  /** Run the standing fold over a streaming frame with a string column
    * `w`. Each micro-batch is ONE bucket-grouped aggregate (map-side
    * partials; the collect is bounded at ≤2^13 rows), merged into the
    * standing counts. `onUpdate` fires after every micro-batch
    * (including skipped redeliveries) with the summary and its TV vs
    * the EFFECTIVE reference.
    *
    * The reference FREEZES at the first `start()` against a checkpoint
    * dir: it is persisted beside the summary snapshot (same atomic
    * discipline) and every later start LOADS it, ignoring the offered
    * `reference`. Without this, a restarting caller recomputes
    * `referenceOf` against whatever the reference corpus looks like
    * NOW — if that corpus moved between runs, the TV series silently
    * changes meaning mid-stream (r10 VERDICT #4). A caller that
    * genuinely wants to re-baseline starts a fresh checkpoint dir —
    * the same contract as changing a streaming query's aggregation. */
  def start(tokenStream: DataFrame, reference: Reference, state: State,
      checkpointDir: String,
      onUpdate: (Summary, Long) => Unit): StreamingQuery = {
    val file = stateFile(checkpointDir)
    load(file).foreach(state.ref.set)
    val rFile = refFile(checkpointDir)
    val frozenRef = loadRef(rFile).getOrElse {
      persistRef(rFile, reference); reference
    }
    tokenStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cur = state.ref.get()
        if (batchId <= cur.lastBatch) {
          onUpdate(cur, cur.tvPpm(frozenRef)) // redelivery: already merged
        } else {
          val rows = batch.select(expr(bucketExpr("w")).as("b"))
            .groupBy(col("b")).agg(count(lit(1)).as("c"))
            .collect()
          var counts = cur.counts
          var added = 0L
          rows.foreach { r =>
            val b = r.getLong(0); val c = r.getLong(1)
            counts = counts.updated(b, counts.getOrElse(b, 0L) + c)
            added += c
          }
          val next = Summary(counts, cur.n + added, batchId)
          // persist BEFORE publishing (the TableRouter order): a crash
          // between the two replays the batch, the guard skips it
          persist(file, next)
          state.ref.set(next)
          onUpdate(next, next.tvPpm(frozenRef))
        }
        ()
      }
      .start()
  }
}
