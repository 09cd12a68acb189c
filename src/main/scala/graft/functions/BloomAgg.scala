package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter over int64 keys, as a typed mergeable `Aggregator` — the
  * build side of a runtime semi-join filter (q82): build on the small
  * filtered dimension, broadcast the bit array, and prune the fact-table
  * probe BEFORE its shuffle, which is where the classic runtime-filter
  * optimization saves its bytes at 100 TB.
  *
  * Layout: [[MBits]] = 2^20 bits in 16 K longs (128 KB — broadcastable).
  * [[K]] = 4 probe positions by Kirsch–Mitzenmacher double hashing
  * `pos_i = (h1 + i*h2) mod m`, where h1/h2 are the first/second 5 hex
  * chars of md5 of the key's decimal string — both SQL-expressible
  * (`conv(substring(md5(cast(k as string)), 1|6, 5), 16, 10)`), so a
  * DuckDB oracle reconstructs the exact bit set and q82 pins every
  * admitted/rejected decision, not a false-positive-rate envelope.
  *
  * Mergeable: word-wise OR ⇒ map-side partials; one 128 KB buffer per
  * partition on the shuffle. No-false-negative soundness is structural
  * and asserted both in spec and as a q82 output column.
  */
object BloomAgg extends Aggregator[Long, Array[Long], Seq[Long]] {
  val MBits = 1 << 20
  val K = 4
  val Words: Int = MBits / 64

  /** (h1, h2): first and second 5-hex-char (20-bit) windows of
    * md5(key.toString) — the SQL-mirrorable double-hash pair. */
  def hashes(key: Long): (Long, Long) = {
    val md = MinHashSig.md5(String.valueOf(key).getBytes("UTF-8"))
    val h1 = ((md(0) & 0xffL) << 12) | ((md(1) & 0xffL) << 4) |
      ((md(2) & 0xf0L) >> 4)
    val h2 = ((md(2) & 0x0fL) << 16) | ((md(3) & 0xffL) << 8) |
      (md(4) & 0xffL)
    (h1, h2)
  }

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val (h1, h2) = hashes(key)
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) % MBits).toInt
      buf(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) |= b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  /** Driver-side membership probe (spec + diagnostics; the query path
    * tests bits with codegen'd SQL expressions on the broadcast array). */
  def mightContain(words: Seq[Long], key: Long): Boolean = {
    val (h1, h2) = hashes(key)
    (0 until K).forall { i =>
      val pos = ((h1 + i * h2) % MBits).toInt
      (words(pos >> 6) >> (pos & 63) & 1L) == 1L
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
