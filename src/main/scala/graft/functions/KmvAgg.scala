package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. RANDOM'02;
  * the bottom-k / theta-sketch family) as a typed mergeable `Aggregator`
  * — the set-cardinality sketch alongside the engine's HLL++ (q18), GK
  * quantiles (q19), count-min (q81) and Bloom (q82) sketches. Unlike
  * HLL++, a KMV sketch's state is a plain set of hash values, so set
  * EXPRESSIONS compose: merging two sketches estimates the union, and
  * the estimate is exactly reproducible by any engine that can take the
  * k smallest distinct hashes — which is how q105's DuckDB oracle pins
  * every estimated value bit-for-bit (`min(h, k)`), not just an error
  * bound.
  *
  * Input is the 48-bit md5-derived hash, computed IN SQL upstream (q93's
  * `conv(substring(md5(w),1,12),16,10)` shape) so both engines hash
  * identically. Buffer: ascending `Array[Long]` of at most [[K]] distinct
  * values — inserts past the current k-th minimum are dropped without
  * allocation, so a partition's partial costs O(K) memory and the shuffle
  * carries ≤ 512 bytes per partition regardless of input size.
  *
  * Estimate (computed in SQL from the finished array, shared with the
  * oracle): full sketch → `(K-1) * 2^48 div h_K`; fewer than K distinct
  * hashes → the sketch IS the exact distinct set, use its size.
  * Relative error concentrates at 1/sqrt(K-2) ≈ 12.7% for K = 64.
  */
object KmvAgg extends Aggregator[Long, Array[Long], Seq[Long]] {
  val K = 64

  /** 2^48 — the hash domain size; the estimate scales the k-th minimum
    * back up to the domain. 63 * 2^48 ≈ 1.8e16 stays in BIGINT. */
  val Domain: Long = 1L << 48

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    insert(buf, h)

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present — set semantics
    else {
      val ins = -pos - 1
      if (buf.length >= K && ins >= K) buf // above the k-th min: drop
      else {
        val n = math.min(buf.length + 1, K)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        if (ins < n - 1) System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Union of the two hash sets, re-truncated to the k smallest — the
    * KMV union rule (mergeability is what makes map-side partials and
    * cross-group set algebra work). */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
